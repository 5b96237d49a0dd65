from .channelized import ShardedChannelizedFM, make_mesh
from .mesh import init_distributed, build_mesh
