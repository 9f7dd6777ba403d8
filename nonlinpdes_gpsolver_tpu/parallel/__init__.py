from .mesh import make_mesh, device_count
from .cholesky import (
    cholesky_blockcyclic,
    trsm_blockcyclic,
    pad_to_blocks,
    shard_rows_blockcyclic,
    unshard_rows_blockcyclic,
)

__all__ = [
    "make_mesh",
    "device_count",
    "cholesky_blockcyclic",
    "trsm_blockcyclic",
    "pad_to_blocks",
    "shard_rows_blockcyclic",
    "unshard_rows_blockcyclic",
]
