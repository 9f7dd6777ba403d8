"""Declarative collocation-problem specification.

The reference hard-codes one Python class per PDE, each hand-writing its Gram
block layout, loss, Gauss-Newton linearization, and posterior extension
(upstream ``src/PDEs.py:18-505``, ``src/InverseProblems.py:16-196``, dispatched
by string in ``src/Gram_matrice.py:41-187`` and ``src/solver.py:46-82``). Here a
problem is *data*:

* one or more :class:`GPBlock`\\ s - independent GP priors, each with a kernel,
  a list of observed linear functionals (rows of its Gram matrix), and a
  ``residual`` map sending the free latent vector ``z`` to the stacked
  functional values (the eliminated functionals are plain JAX expressions of
  ``z``, so Gauss-Newton linearization falls out of ``jax.jacfwd`` instead of
  being hand-derived per problem);
* optional :class:`Misfit` terms - weighted least-squares penalties (the Darcy
  data misfit, ``src/InverseProblems.py:118-120`` upstream, and the elliptic
  "relaxed" penalty, ``src/PDEs.py:137-147`` upstream).

Total loss:  ``sum_b ||L_b^{-1} F_b(z)||^2 + sum_m w_m ||r_m(z)||^2``.

Everything downstream (assembly, whitened GN, posterior) is generic over this
spec.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Optional, Tuple

import jax.numpy as jnp

from ..ops.assembly import Observable
from ..ops.kernels import SquaredExponential


@dataclasses.dataclass(frozen=True)
class GPBlock:
    """One GP prior: kernel + observed functionals + residual map.

    ``residual(z, data)`` must return the functional values stacked in the
    order of ``observables`` (matching the Gram matrix row order). ``data``
    is the problem's static data pytree (rhs values, boundary values, ...).
    """

    name: str
    kernel: SquaredExponential
    observables: Tuple[Observable, ...]
    residual: Callable[[jnp.ndarray, Any], jnp.ndarray]


@dataclasses.dataclass(frozen=True)
class Misfit:
    """Weighted penalty ``weight * ||r(z)||^2`` added to the loss."""

    name: str
    residual: Callable[[jnp.ndarray, Any], jnp.ndarray]
    weight: float


@dataclasses.dataclass(frozen=True)
class CollocationProblem:
    """A complete GP collocation problem over point sets ``points``.

    ``latent_dim`` is the length of the free latent vector ``z`` (after any
    variable elimination). ``extensions`` maps a solution-field name to
    ``(block_name, row_op, weights_fn)`` used by the posterior: the field at
    test points is ``cross_gram(kernel_b, row_op, X_test, obs_b) @ w_b`` with
    ``w_b = Theta_b^{-1} F_b(z*)`` the representer weights - ``weights_fn``
    is just ``residual`` of that block (reference ``extend_sol``,
    ``src/PDEs.py:203-208`` upstream).
    """

    name: str
    blocks: Tuple[GPBlock, ...]
    points: Dict[str, jnp.ndarray]
    data: Any
    latent_dim: int
    misfits: Tuple[Misfit, ...] = ()
    latent_init: Optional[Callable[[], jnp.ndarray]] = None

    def block(self, name: str) -> GPBlock:
        for b in self.blocks:
            if b.name == name:
                return b
        raise KeyError(f"no GP block named {name!r} in problem {self.name!r}")

    def init_latent(self) -> jnp.ndarray:
        if self.latent_init is not None:
            return jnp.asarray(self.latent_init())
        return jnp.zeros(self.latent_dim)
