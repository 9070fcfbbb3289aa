from .mesh import make_mesh
from .sharded import make_sharded_count_step, sharded_count
from .streaming import ShardedCountTable

__all__ = ["make_mesh", "make_sharded_count_step", "sharded_count", "ShardedCountTable"]
