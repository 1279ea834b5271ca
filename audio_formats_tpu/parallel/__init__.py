from .batch import BatchDecoder
from .mesh import make_mesh, batch_sharding, shard_batch

__all__ = ["BatchDecoder", "make_mesh", "batch_sharding", "shard_batch"]
