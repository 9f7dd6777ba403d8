"""Dense linear-algebra substrate: guarded Cholesky and triangular solves.

The reference wraps ``jnp.linalg.cholesky`` in a dead ``try/except``
(``src/PDEs.py:75-80`` upstream — XLA never raises, it yields NaNs) and uses
general LU ``jnp.linalg.solve`` on triangular factors (``src/PDEs.py:86,118,205``).
Here:

* :func:`cholesky_with_retry` detects NaN factorizations on the host and
  escalates the nugget geometrically (setup-time only; the factor itself is
  one XLA call);
* triangular systems use ``jax.scipy.linalg.solve_triangular`` (TRSM), which
  XLA maps to the blocked triangular-solve path instead of a general LU;
* :func:`whiten` is the ``L^{-1} v`` operation used throughout the
  Gauss-Newton loop and the posterior.
"""

from __future__ import annotations

from typing import Callable, Tuple

import jax
import jax.numpy as jnp
from jax.scipy.linalg import solve_triangular


def cholesky(theta: jnp.ndarray) -> jnp.ndarray:
    """Lower-triangular Cholesky factor (XLA native)."""
    return jnp.linalg.cholesky(theta)


def cholesky_with_retry(
    theta: jnp.ndarray,
    nugget_diag: jnp.ndarray,
    max_retries: int = 6,
    escalation: float = 10.0,
) -> Tuple[jnp.ndarray, float]:
    """Factor ``theta + s * diag(nugget_diag)``, escalating ``s`` until finite.

    Returns ``(L, s)`` where ``s`` is the nugget scale that succeeded
    (1.0 when the requested nugget was already enough). Host-side retry
    loop: runs at setup time, so eager dispatch is fine and lets us report
    the escalation to the user instead of silently propagating NaNs.
    """
    s = 1.0
    for _ in range(max_retries):
        L = jnp.linalg.cholesky(theta + s * jnp.diag(nugget_diag))
        if bool(jnp.all(jnp.isfinite(L))):
            return L, s
        s *= escalation
    raise FloatingPointError(
        f"Cholesky failed after {max_retries} nugget escalations "
        f"(final scale {s / escalation:g}); Gram matrix is numerically "
        "indefinite - increase the nugget or the kernel lengthscale."
    )


def whiten(L: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``L^{-1} v`` via forward substitution (v may be a matrix of columns)."""
    return solve_triangular(L, v, lower=True)


def tri_inverse(L: jnp.ndarray) -> jnp.ndarray:
    """Explicit ``L^{-1}`` (lower triangular).

    On TPU, repeated triangular solves against many right-hand sides map
    poorly onto the MXU (sequential substitution), while a one-time inverse
    turns every subsequent whitening into a plain matmul. Used by the
    ``solve_mode='inverse'`` path of :func:`..solvers.gn.factorize`.
    """
    eye = jnp.eye(L.shape[0], dtype=L.dtype)
    return solve_triangular(L, eye, lower=True)


def kernel_solve(L: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """``Theta^{-1} v = L^{-T} L^{-1} v`` via two triangular solves."""
    return solve_triangular(L, solve_triangular(L, v, lower=True), lower=True, trans=1)


def spd_solve(H: jnp.ndarray, g: jnp.ndarray, jitter: float = 0.0) -> jnp.ndarray:
    """Solve the SPD Gauss-Newton system ``H x = g`` by Cholesky.

    The reference uses general LU (``jnp.linalg.solve(Hessian, grad)``,
    ``src/PDEs.py:118``); the GN normal matrix is symmetric PSD so a
    Cholesky solve is both faster and more stable.
    """
    if jitter:
        H = H + jitter * jnp.eye(H.shape[0], dtype=H.dtype)
    Lh = jnp.linalg.cholesky(H)
    return solve_triangular(
        Lh, solve_triangular(Lh, g, lower=True), lower=True, trans=1
    )
