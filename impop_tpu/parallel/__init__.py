from impop_tpu.parallel.mesh import make_mesh, window_sharding, replicated
from impop_tpu.parallel.scan import (
    WindowBatch,
    batch_pi_panels,
    batch_hudson,
    batch_allele_stats,
)

__all__ = [
    "make_mesh",
    "window_sharding",
    "replicated",
    "WindowBatch",
    "batch_pi_panels",
    "batch_hudson",
    "batch_allele_stats",
]
