from dip_tpu.parallel.mesh import make_mesh, shard_batch
from dip_tpu.parallel.batch import BatchEngine

__all__ = ["make_mesh", "shard_batch", "BatchEngine"]
