from .mesh import DATA_AXIS, make_mesh
from .sharded import ShardedHNSW
