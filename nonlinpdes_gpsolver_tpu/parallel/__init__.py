from .mesh import make_mesh, device_count, initialize_distributed
from .cholesky import (
    cholesky_blockcyclic,
    trsm_blockcyclic,
    kernel_solve_blockcyclic,
    matvec_blockcyclic,
    pad_to_blocks,
    shard_rows_blockcyclic,
    unshard_rows_blockcyclic,
)
from .gram import assemble_gram_sharded

__all__ = [
    "make_mesh",
    "device_count",
    "initialize_distributed",
    "cholesky_blockcyclic",
    "trsm_blockcyclic",
    "kernel_solve_blockcyclic",
    "matvec_blockcyclic",
    "pad_to_blocks",
    "shard_rows_blockcyclic",
    "unshard_rows_blockcyclic",
    "assemble_gram_sharded",
]
