from . import rtl_tcp as _rtl_tcp  # registers the "rtl_tcp" SdrSource driver
