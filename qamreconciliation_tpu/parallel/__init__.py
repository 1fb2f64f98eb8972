from .mesh import make_mesh, device_count, maybe_distributed_init
from .sweep import shard_round, sharded_sweep
from .graph_shard import ShardedDecoder

__all__ = [
    "make_mesh",
    "device_count",
    "maybe_distributed_init",
    "shard_round",
    "sharded_sweep",
    "ShardedDecoder",
]
