"""Mesh-distributed solve path: sharded assembly + distributed Cholesky +
whitened Gauss-Newton with collective reductions.

The scale-out counterpart of :mod:`.gn` (SURVEY.md section 2, "new
components" - no reference counterpart exists; the reference is capped at
~10k collocation points by single-device dense storage,
``/root/reference/README.md:9``). Structure of one training step:

1. every GP block's Gram matrix is assembled directly into the sharded
   block-cyclic layout (:func:`..parallel.gram.assemble_gram_sharded`);
2. factored in place by the distributed panel Cholesky
   (:func:`..parallel.cholesky.cholesky_blockcyclic`);
3. the Gauss-Newton iteration whitens the stacked residual and its Jacobian
   panels with the distributed TRSM; the normal matrix ``J^T J`` (latent x
   latent, replicated) is formed from the whitened panels and solved by SPD
   Cholesky; the latent iterate stays replicated.

The same code runs on a virtual CPU mesh for testing and on an ICI mesh on
hardware; device count appears only in the ``Mesh``.
"""

from __future__ import annotations

import dataclasses
from typing import Dict

import jax
import jax.numpy as jnp

from ..models.spec import CollocationProblem
from ..ops.linalg import spd_solve
from ..parallel.cholesky import (
    BlockCyclicFactor,
    _chol_sharded,
    kernel_solve_blockcyclic,
    trsm_blockcyclic,
)
from ..parallel.gram import assemble_gram_sharded
from .gn import GNState


@dataclasses.dataclass
class DistributedFactoredProblem:
    problem: CollocationProblem
    factors: Dict[str, BlockCyclicFactor]
    col_scales: Dict[str, jnp.ndarray] = dataclasses.field(default_factory=dict)

    def _scale(self, name: str, v: jnp.ndarray) -> jnp.ndarray:
        s = self.col_scales.get(name)
        if s is None:
            return v
        return v * (s if v.ndim == 1 else s[:, None])

    def whitened_residual(self, z: jnp.ndarray) -> jnp.ndarray:
        p = self.problem
        parts = [
            trsm_blockcyclic(
                self.factors[b.name], self._scale(b.name, b.residual(z, p.data))
            )
            for b in p.blocks
        ]
        for m in p.misfits:
            parts.append(jnp.sqrt(m.weight) * m.residual(z, p.data))
        return jnp.concatenate(parts)

    def loss(self, z: jnp.ndarray) -> jnp.ndarray:
        r = self.whitened_residual(z)
        return jnp.dot(r, r)


def factorize_distributed(
    problem: CollocationProblem,
    mesh,
    nugget: float,
    nugget_type: str = "adaptive",
    axis: str = "p",
    block: int = 256,
) -> DistributedFactoredProblem:
    factors = {}
    col_scales = {}
    for b in problem.blocks:
        arranged, d_isqrt = assemble_gram_sharded(
            b.kernel, b.observables, problem.points, mesh,
            axis=axis, block=block, nugget=nugget, nugget_type=nugget_type,
        )
        local = _chol_sharded(arranged, mesh, axis, block)
        n = sum(problem.points[o.points].shape[0] for o in b.observables)
        factors[b.name] = BlockCyclicFactor(
            local=local, mesh=mesh, axis=axis, block=block,
            n=n, n_pad=local.shape[0] * block,
        )
        col_scales[b.name] = d_isqrt
    return DistributedFactoredProblem(problem, factors, col_scales)


def gn_step_distributed(
    fp: DistributedFactoredProblem, z: jnp.ndarray, step_size: float = 1.0
) -> jnp.ndarray:
    """One whitened GN step; distributed TRSMs whiten residual + Jacobian."""
    p = fp.problem

    # Jacobian of each block residual wrt z (replicated), whitened by the
    # distributed TRSM along with the residual itself in one multi-RHS solve.
    parts_r = []
    parts_J = []
    for b in p.blocks:
        F = b.residual(z, p.data)
        JF = jax.jacfwd(lambda zz: b.residual(zz, p.data))(z)  # (n_b, m)
        rhs = fp._scale(b.name, jnp.concatenate([F[:, None], JF], axis=1))
        sol = trsm_blockcyclic(fp.factors[b.name], rhs)
        parts_r.append(sol[:, 0])
        parts_J.append(sol[:, 1:])
    for mis in p.misfits:
        w = jnp.sqrt(mis.weight)
        parts_r.append(w * mis.residual(z, p.data))
        parts_J.append(w * jax.jacfwd(lambda zz: mis.residual(zz, p.data))(z))
    r = jnp.concatenate(parts_r)
    J = jnp.concatenate(parts_J, axis=0)
    H = J.T @ J
    g = J.T @ r
    delta = spd_solve(H, g)
    z_new = z - step_size * delta
    finite = jnp.all(jnp.isfinite(z_new))
    return jnp.where(finite, z_new, z)


class DistributedPosterior:
    """Posterior means with representer weights computed by distributed
    forward+backward triangular solves against the sharded factors (the
    distributed analog of :class:`.posterior.Posterior`)."""

    def __init__(self, fp: DistributedFactoredProblem, z_star: jnp.ndarray):
        self.fp = fp
        self.z_star = jnp.asarray(z_star)
        p = fp.problem
        self._weights = {
            b.name: fp._scale(
                b.name,
                kernel_solve_blockcyclic(
                    fp.factors[b.name],
                    fp._scale(b.name, b.residual(self.z_star, p.data)),
                ),
            )
            for b in p.blocks
        }

    def extend(self, X_test, block: str | None = None, op=None) -> jnp.ndarray:
        from ..ops.assembly import cross_gram
        from ..ops.operators import identity

        p = self.fp.problem
        b = p.block(block) if block is not None else p.blocks[0]
        if op is None:
            op = identity(b.kernel.dim)
        ct = cross_gram(b.kernel, op, jnp.asarray(X_test), b.observables, p.points)
        return ct @ self._weights[b.name]


def gn_solve_distributed(
    fp: DistributedFactoredProblem,
    z0: jnp.ndarray | None = None,
    max_iter: int = 8,
    step_size: float = 1.0,
) -> GNState:
    """The full GN loop as one compiled ``lax.scan`` over distributed steps
    (one executable launch for the whole iteration, like the single-device
    path; each step's TRSMs run the shard_map collectives)."""
    z = fp.problem.init_latent() if z0 is None else jnp.asarray(z0)
    dtype = next(iter(fp.factors.values())).local.dtype
    z = z.astype(dtype)

    @jax.jit
    def run(z):
        def step(zc, _):
            z_new = gn_step_distributed(fp, zc, step_size=step_size)
            return z_new, fp.loss(z_new)

        return jax.lax.scan(step, z, None, length=max_iter)

    z_final, losses = run(z)
    return GNState(
        z=z_final,
        losses=losses,
        converged_finite=jnp.all(jnp.isfinite(losses)),
    )
