"""Darcy-flow inverse problem: infer ``a`` and ``u`` in ``-div(a grad u) = f``
from noisy point observations of ``u``.

Capability match for upstream ``Darcy_flow2d`` (``src/InverseProblems.py:16-196``):
joint GPs on the state ``u`` and log-coefficient ``phi = log a``, coupled
through the eliminated Laplacian

    Delta u = -u_x1 phi_x1 - u_x2 phi_x2 - f exp(-phi)

(expand ``-div(a grad u) = -a Delta u - a grad(phi) . grad(u)`` with
``a = exp(phi)``; upstream ``src/InverseProblems.py:114``), plus a data misfit
``(1/noise^2) sum (u(X_data) - data)^2``. Data points are by convention the
first ``N_data`` rows of ``X_domain`` (upstream ``:30-47``).

Latent ``z = (w0, w1, w2, v0, v1, v2)`` = (phi, phi_x1, phi_x2, u, u_x1, u_x2)
at interior points (6 N_d).

GP block layouts (functional row order == Gram block order):
* ``a``-block: ``[phi_x1, phi_x2, phi] @ interior``;
* ``u``-block: ``[u_x1, u_x2, Delta u, u] @ interior, u @ boundary``.
"""

from __future__ import annotations

from functools import lru_cache
from typing import Callable

import jax
import jax.numpy as jnp

from ..ops.assembly import Observable
from ..ops.kernels import SquaredExponential
from ..ops.operators import d, identity, laplacian
from .spec import CollocationProblem, GPBlock, Misfit
from .elliptic import _eval_on


@lru_cache(maxsize=None)
def _darcy_residuals(N_d: int, N_data: int):
    def split(z):
        w0, w1, w2 = z[:N_d], z[N_d : 2 * N_d], z[2 * N_d : 3 * N_d]
        v0, v1, v2 = (
            z[3 * N_d : 4 * N_d],
            z[4 * N_d : 5 * N_d],
            z[5 * N_d : 6 * N_d],
        )
        return w0, w1, w2, v0, v1, v2

    def residual_a(z, data):
        w0, w1, w2, *_ = split(z)
        return jnp.concatenate([w1, w2, w0])

    def residual_u(z, data):
        w0, w1, w2, v0, v1, v2 = split(z)
        lap_u = -v1 * w1 - v2 * w2 - data["f"] * jnp.exp(-w0)
        return jnp.concatenate([v1, v2, lap_u, v0, data["g"]])

    def data_misfit(z, data):
        _, _, _, v0, _, _ = split(z)
        return v0[:N_data] - data["obs"]

    return residual_a, residual_u, data_misfit


def darcy_flow(
    kernel_u: SquaredExponential,
    kernel_a: SquaredExponential,
    X_domain: jnp.ndarray,
    X_boundary: jnp.ndarray,
    data_u: jnp.ndarray,
    rhs_f: Callable | jnp.ndarray | None,
    bdy_g: Callable | jnp.ndarray | None = None,
    noise_level: float = 1e-3,
    init: str = "random",
    seed: int = 0,
) -> CollocationProblem:
    """``data_u``: noisy observations of ``u`` at ``X_domain[:N_data]``."""
    X_domain = jnp.asarray(X_domain)
    X_boundary = jnp.asarray(X_boundary)
    data_u = jnp.asarray(data_u)
    N_d = X_domain.shape[0]
    N_data = data_u.shape[0]
    f_vals = rhs_f if isinstance(rhs_f, jnp.ndarray) else _eval_on(rhs_f, X_domain)
    g_vals = bdy_g if isinstance(bdy_g, jnp.ndarray) else _eval_on(bdy_g, X_boundary)
    data = {"f": f_vals, "g": g_vals, "obs": data_u}

    residual_a, residual_u, data_misfit = _darcy_residuals(N_d, N_data)

    obs_a = (
        Observable("domain", d(0)),
        Observable("domain", d(1)),
        Observable("domain", identity()),
    )
    obs_u = (
        Observable("domain", d(0)),
        Observable("domain", d(1)),
        Observable("domain", laplacian()),
        Observable("domain", identity()),
        Observable("boundary", identity()),
    )

    def latent_init():
        if init == "zero":
            return jnp.zeros(6 * N_d)
        return jax.random.normal(jax.random.PRNGKey(seed), (6 * N_d,))

    return CollocationProblem(
        name="darcy_flow",
        blocks=(
            GPBlock("a", kernel_a, obs_a, residual_a),
            GPBlock("u", kernel_u, obs_u, residual_u),
        ),
        points={"domain": X_domain, "boundary": X_boundary},
        data=data,
        latent_dim=6 * N_d,
        misfits=(Misfit("data", data_misfit, 1.0 / noise_level**2),),
        latent_init=latent_init,
    )
