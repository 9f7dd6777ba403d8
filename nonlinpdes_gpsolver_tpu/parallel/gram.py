"""Mesh-sharded Gram assembly, producing the block-cyclic layout directly.

The reference materializes N^2 coordinate pairs on host and writes Gram
blocks back into host numpy (``src/Gram_matrice.py:23-56`` upstream). Here
the whole assembly - closed-form derivative blocks, nugget diagonal, padding,
and the block-cyclic row permutation the distributed Cholesky wants - is one
jitted computation whose *output sharding* is the 1-D mesh row layout; XLA
SPMD partitions the work and inserts the (one-time) block-row permute
collective. No host round-trip, no replicated ``n x n`` intermediate on any
single device beyond what XLA chooses to fuse.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.assembly import adaptive_nugget_diag, gram_matrix, observable_sizes
from .cholesky import _block_perm, pad_to_blocks


@partial(jax.jit, static_argnums=(0, 1, 3, 4, 5, 6, 7))
def _assemble_arranged(
    kernel,
    observables,
    points,
    nugget_type: str,
    nugget: float,
    mesh: Mesh,
    axis: str,
    block: int,
):
    theta = gram_matrix(kernel, observables, points)
    sizes = observable_sizes(observables, points)
    nug = adaptive_nugget_diag(theta, observables, sizes, nugget, nugget_type)
    theta = theta + jnp.diag(nug)
    # diagonal equilibration (same convention as the single-device
    # factorize): factor the unit-diagonal matrix, return d^{-1/2} so the
    # solvers can fold the scale into whitening - fp32-critical.
    d_isqrt = jax.lax.rsqrt(jnp.diagonal(theta))
    theta = theta * (d_isqrt[:, None] * d_isqrt[None, :])
    n = theta.shape[0]
    theta = theta.at[jnp.arange(n), jnp.arange(n)].set(1.0)
    P_ = mesh.shape[axis]
    n_pad = pad_to_blocks(n, block, P_)
    if n_pad > n:
        pad = n_pad - n
        theta = jnp.pad(theta, ((0, pad), (0, pad)))
        theta = theta.at[
            jnp.arange(n, n_pad), jnp.arange(n, n_pad)
        ].set(jnp.ones(pad, dtype=theta.dtype))
    nb = n_pad // block
    arranged = theta.reshape(nb, block, n_pad)[_block_perm(nb, P_)]
    arranged = jax.lax.with_sharding_constraint(
        arranged, NamedSharding(mesh, P(axis, None, None))
    )
    return arranged, d_isqrt


def assemble_gram_sharded(
    kernel,
    observables: Tuple,
    points,
    mesh: Mesh,
    axis: str = "p",
    block: int = 256,
    nugget: float = 1e-10,
    nugget_type: str = "adaptive",
) -> jax.Array:
    """Equilibrated regularized Gram matrix in sharded block-cyclic
    (nb, B, n_pad) layout, plus the ``d^{-1/2}`` equilibration vector."""
    pts = {k: jnp.asarray(v) for k, v in points.items()}
    return _assemble_arranged(
        kernel, tuple(observables), pts, nugget_type, nugget, mesh, axis, block
    )
