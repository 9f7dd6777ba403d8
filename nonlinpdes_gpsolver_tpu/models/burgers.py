"""Viscous Burgers equation ``u_t + alpha * u u_x - nu * u_xx = f`` on (t, x).

Capability match for upstream ``Burgers`` (``src/PDEs.py:211-350``):

* coordinates are ``(t, x)``; space-time anisotropic kernels are the norm
  (upstream ``Anisotropic_Gaussian_kernel``, ``src/kernels.py:91-179``);
* observed functionals: ``[u_t, u_x, u_xx, u] @ interior, u @ boundary``
  where "boundary" = initial-time face plus spatial faces;
* latent ``z = (v0, v2, v3) = (u, u_x, u_xx)`` at interior points (3 N_d);
  ``u_t`` is eliminated through the PDE:
  ``u_t = nu u_xx + f - alpha u u_x`` (upstream ``src/PDEs.py:284``).

The reference's explicit-Jacobian Gauss-Newton (``src/PDEs.py:295-307``, the
one problem where it avoids ``jax.hessian``-through-a-solve) is the pattern
the generic engine applies to every problem, so this module carries no GN
code at all.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.assembly import Observable
from ..ops.kernels import SquaredExponential
from ..ops.operators import d, d2, identity
from .spec import CollocationProblem, GPBlock
from .elliptic import _eval_on


@lru_cache(maxsize=None)
def _burgers_residual(alpha: float, nu: float, N_d: int):
    def residual(z, data):
        v0, v2, v3 = z[:N_d], z[N_d : 2 * N_d], z[2 * N_d :]
        u_t = nu * v3 + data["f"] - alpha * v0 * v2
        return jnp.concatenate([u_t, v2, v3, v0, data["g"]])

    return residual


def burgers(
    kernel: SquaredExponential,
    X_domain: jnp.ndarray,
    X_boundary: jnp.ndarray,
    bdy_g: Callable | jnp.ndarray | None,
    rhs_f: Callable | jnp.ndarray | None = None,
    alpha: float = 1.0,
    nu: float = 0.02,
    init: str = "random",
    seed: int = 0,
) -> CollocationProblem:
    X_domain = jnp.asarray(X_domain)
    X_boundary = jnp.asarray(X_boundary)
    N_d = X_domain.shape[0]
    f_vals = rhs_f if isinstance(rhs_f, jnp.ndarray) else _eval_on(rhs_f, X_domain)
    g_vals = bdy_g if isinstance(bdy_g, jnp.ndarray) else _eval_on(bdy_g, X_boundary)
    data = {"f": f_vals, "g": g_vals}

    residual = _burgers_residual(float(alpha), float(nu), N_d)

    observables = (
        Observable("domain", d(0)),        # u_t
        Observable("domain", d(1)),        # u_x
        Observable("domain", d2(1, 1)),    # u_xx
        Observable("domain", identity()),  # u
        Observable("boundary", identity()),
    )

    def latent_init():
        if init == "zero":
            return jnp.zeros(3 * N_d)
        return jax.random.normal(jax.random.PRNGKey(seed), (3 * N_d,))

    return CollocationProblem(
        name="burgers",
        blocks=(GPBlock("u", kernel, observables, residual),),
        points={"domain": X_domain, "boundary": X_boundary},
        data=data,
        latent_dim=3 * N_d,
        latent_init=latent_init,
    )
