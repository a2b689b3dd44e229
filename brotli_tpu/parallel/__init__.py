"""Multi-chip / multi-host scaling: mesh-sharded batch decode, parallel
metablock-sharded encode, dictionary broadcast, ordered gather."""

from .mesh import get_mesh, sharded_decode_batch
from .shard import parallel_encode, shard_file

__all__ = ["get_mesh", "sharded_decode_batch", "parallel_encode", "shard_file"]
