"""GP posterior-mean extension with cached representer weights.

The reference recomputes the representer weights ``Theta^{-1} F(z*)`` (two
triangular solves against the full training factor) on *every* call to
``extend_sol`` (``src/PDEs.py:203-208`` upstream, see SURVEY.md section 3.3) -
the exact quantity a serving path should cache. Here the weights are computed
once per block at construction; each posterior evaluation is then a single
rectangular cross-Gram assembly plus one matvec (MXU-friendly, batched over
arbitrarily many test points).
"""

from __future__ import annotations

from typing import Dict

import jax
import jax.numpy as jnp

from functools import partial

from ..ops.assembly import cross_gram
from ..ops.operators import LinearOp, identity
from .gn import FactoredProblem

# kernel / operator / observables are hashable statics, so repeated posterior
# queries (and rebuilt same-config problems) reuse one compiled cross-Gram.
_cross_gram_jit = partial(jax.jit, static_argnums=(0, 1, 3))(cross_gram)


class Posterior:
    """Posterior means of every GP block at the Gauss-Newton solution."""

    def __init__(self, fp: FactoredProblem, z_star: jnp.ndarray):
        self.fp = fp
        self.z_star = jnp.asarray(z_star)
        p = fp.problem
        self._weights: Dict[str, jnp.ndarray] = {}
        for b in p.blocks:
            F = b.residual(self.z_star, p.data)
            self._weights[b.name] = fp.kernel_solve(b.name, F)

    def weights(self, block: str) -> jnp.ndarray:
        return self._weights[block]

    def extend(
        self,
        X_test: jnp.ndarray,
        block: str | None = None,
        op: LinearOp | None = None,
    ) -> jnp.ndarray:
        """Posterior mean of ``op`` applied to the block's GP at ``X_test``.

        ``op`` defaults to point evaluation (the reference only ever extends
        function values; derivative fields come free here).
        """
        p = self.fp.problem
        b = p.block(block) if block is not None else p.blocks[0]
        if op is None:
            op = identity(b.kernel.dim)
        ct = _cross_gram_jit(
            b.kernel, op, jnp.asarray(X_test), b.observables, p.points
        )
        return jnp.matmul(
            ct, self._weights[b.name], precision=jax.lax.Precision.HIGHEST
        )

    def variance(
        self,
        X_test: jnp.ndarray,
        block: str | None = None,
        op: LinearOp | None = None,
    ) -> jnp.ndarray:
        """Pointwise posterior variance of ``op`` applied to the block's GP.

        ``var(x) = (op (x) op) kappa(x, x) - c(x)^T Theta^{-1} c(x)`` with
        ``c(x)`` the cross-covariance row; the quadratic form reuses the
        factorization's whitening operator (one matmul on TPU), so the cost
        is the same as a posterior-mean query. The reference has no
        uncertainty output at all - this is a capability it lacks.

        The variance is with respect to the *nugget-regularized* prior (the
        GP actually conditioned on), and is clipped at zero against f32
        rounding.
        """
        p = self.fp.problem
        b = p.block(block) if block is not None else p.blocks[0]
        if op is None:
            op = identity(b.kernel.dim)
        X_test = jnp.asarray(X_test)
        ct = _cross_gram_jit(b.kernel, op, X_test, b.observables, p.points)
        pair = b.kernel.pair_fn(op, op)
        prior = jax.vmap(lambda x: pair(x[None], x[None])[0, 0])(X_test)
        V = self.fp._whiten(b.name, ct.T)  # (n_train, N_test)
        return jnp.clip(prior - jnp.sum(V * V, axis=0), 0.0)

    def std(
        self,
        X_test: jnp.ndarray,
        block: str | None = None,
        op: LinearOp | None = None,
    ) -> jnp.ndarray:
        """Pointwise posterior standard deviation (see :meth:`variance`)."""
        return jnp.sqrt(self.variance(X_test, block=block, op=op))
