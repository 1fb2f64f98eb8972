from .mesh import make_mesh, device_count
from .sweep import shard_round, sharded_sweep

__all__ = ["make_mesh", "device_count", "shard_round", "sharded_sweep"]
