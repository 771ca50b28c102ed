from dip_tpu.parallel.mesh import make_mesh, shard_batch
from dip_tpu.parallel.batch import BatchEngine
from dip_tpu.parallel.queue import FitQueue

__all__ = ["make_mesh", "shard_batch", "BatchEngine", "FitQueue"]
