"""Regularized Eikonal equation ``|grad u|^2 = f^2 + eps * Delta u``.

Capability match for upstream ``Eikonal`` (``src/PDEs.py:352-505``). Note the
``f^2``: the reference's banner prints the un-squared form but the code (and
the notebook) squares the right-hand side (``src/PDEs.py:423`` vs
``src/solver.py:71`` upstream; SURVEY.md quirk list) - we follow the code.

* observed functionals: ``[u_x1, u_x2, Delta u, u] @ interior, u @ boundary``;
* latent ``z = (v0, v1, v2) = (u, u_x1, u_x2)`` (3 N_d); ``Delta u`` is
  eliminated: ``Delta u = -(f^2 - v1^2 - v2^2) / eps``;
* conventional initialization is zero (upstream driver default,
  ``main_Eikonal2d.py:35``).
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.assembly import Observable
from ..ops.kernels import SquaredExponential
from ..ops.operators import d, identity, laplacian
from .spec import CollocationProblem, GPBlock
from .elliptic import _eval_on


@lru_cache(maxsize=None)
def _eikonal_residual(eps: float, N_d: int):
    def residual(z, data):
        v0, v1, v2 = z[:N_d], z[N_d : 2 * N_d], z[2 * N_d :]
        lap_u = -(data["f"] ** 2 - v1**2 - v2**2) / eps
        return jnp.concatenate([v1, v2, lap_u, v0, data["g"]])

    return residual


def eikonal(
    kernel: SquaredExponential,
    X_domain: jnp.ndarray,
    X_boundary: jnp.ndarray,
    rhs_f: Callable | jnp.ndarray | None,
    bdy_g: Callable | jnp.ndarray | None = None,
    eps: float = 0.1,
    init: str = "zero",
    seed: int = 0,
) -> CollocationProblem:
    X_domain = jnp.asarray(X_domain)
    X_boundary = jnp.asarray(X_boundary)
    N_d = X_domain.shape[0]
    f_vals = rhs_f if isinstance(rhs_f, jnp.ndarray) else _eval_on(rhs_f, X_domain)
    g_vals = bdy_g if isinstance(bdy_g, jnp.ndarray) else _eval_on(bdy_g, X_boundary)
    data = {"f": f_vals, "g": g_vals}

    residual = _eikonal_residual(float(eps), N_d)

    observables = (
        Observable("domain", d(0)),
        Observable("domain", d(1)),
        Observable("domain", laplacian()),
        Observable("domain", identity()),
        Observable("boundary", identity()),
    )

    def latent_init():
        if init == "zero":
            return jnp.zeros(3 * N_d)
        return jax.random.normal(jax.random.PRNGKey(seed), (3 * N_d,))

    return CollocationProblem(
        name="eikonal",
        blocks=(GPBlock("u", kernel, observables, residual),),
        points={"domain": X_domain, "boundary": X_boundary},
        data=data,
        latent_dim=3 * N_d,
        latent_init=latent_init,
    )
