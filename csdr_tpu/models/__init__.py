from .receivers import (
    front_end, wbfm_receiver, nbfm_receiver, am_receiver, raw_capture,
    channelized_receiver, channelized_fm_receiver,
)
from .stereo import StereoFMDecoder, stereo_fm_decoder
from .symsync import SymSync, sym_sync_r, sym_sync_c, sym_tracker, fm_dem_with_sync
