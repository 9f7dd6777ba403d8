"""Collocation-point sampling on rectangular (space or time-space) domains.

Capability match for upstream ``src/sample_points.py:5-102`` with two
deliberate divergences (SURVEY.md "quirks - do not replicate"):

* deterministic, explicitly-seeded ``jax.random`` instead of the global host
  NumPy RNG (the reference is only seedable in two of four drivers);
* ``N_boundary`` is honored exactly - the remainder after dividing points
  across faces is spread over the first faces instead of silently dropping
  up to ``faces-1`` points (upstream ``src/sample_points.py:15-16,35-36``).

Conventions (matching the reference):
* ``time_dependent=False``: domain ``[a0,b0] x [a1,b1]``, boundary = all four
  faces.
* ``time_dependent=True``: coordinates are ``(t, x)``; "boundary" = the
  initial-time face ``t=a0`` plus the two spatial faces ``x=a1`` and
  ``x=b1`` (no final-time face).
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np


def _face_counts(n: int, faces: int) -> list[int]:
    base, rem = divmod(n, faces)
    return [base + (1 if i < rem else 0) for i in range(faces)]


def sample_random(
    key: jax.Array,
    N_domain: int,
    N_boundary: int,
    domain=((0.0, 1.0), (0.0, 1.0)),
    time_dependent: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform interior points + per-face uniform boundary points."""
    (a0, b0), (a1, b1) = domain
    k_int, k_bd = jax.random.split(key)
    X_domain = jax.random.uniform(
        k_int, (N_domain, 2),
        minval=jnp.array([a0, a1]), maxval=jnp.array([b0, b1]),
    )

    if not time_dependent:
        # faces: bottom (x2=a1), right (x1=b0), top (x2=b1), left (x1=a0)
        specs = [
            (0, (a0, b0), 1, a1),
            (1, (a1, b1), 0, b0),
            (0, (a0, b0), 1, b1),
            (1, (a1, b1), 0, a0),
        ]
    else:
        # faces: initial time (t=a0), x=b1, x=a1
        specs = [
            (1, (a1, b1), 0, a0),
            (0, (a0, b0), 1, b1),
            (0, (a0, b0), 1, a1),
        ]

    counts = _face_counts(N_boundary, len(specs))
    keys = jax.random.split(k_bd, len(specs))
    parts = []
    for (free_ax, (lo, hi), fixed_ax, fixed_val), cnt, kk in zip(specs, counts, keys):
        if cnt == 0:
            continue
        pts = jnp.zeros((cnt, 2))
        free = jax.random.uniform(kk, (cnt,), minval=lo, maxval=hi)
        pts = pts.at[:, free_ax].set(free)
        pts = pts.at[:, fixed_ax].set(fixed_val)
        parts.append(pts)
    X_boundary = jnp.concatenate(parts) if parts else jnp.zeros((0, 2))
    return X_domain, X_boundary


def sample_grid(
    N_domain: int,
    N_boundary: int,
    domain=((0.0, 1.0), (0.0, 1.0)),
    time_dependent: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Uniform tensor-grid interior + boundary points.

    The grid resolution is chosen so interior+boundary totals approximately
    ``N_domain + N_boundary`` (reference behavior,
    ``src/sample_points.py:50-102`` upstream: actual returned counts are
    grid-determined, not the requested numbers).
    """
    (a0, b0), (a1, b1) = domain
    n = int(np.sqrt(N_domain + N_boundary)) - 2
    xs = np.linspace(a0, b0, n + 2)
    ys = np.linspace(a1, b1, n + 2)
    XX, YY = np.meshgrid(xs, ys, indexing="ij")
    if not time_dependent:
        interior = np.stack(
            [XX[1:-1, 1:-1].ravel(), YY[1:-1, 1:-1].ravel()], axis=1
        )
        mask = np.zeros_like(XX, dtype=bool)
        mask[0, :] = mask[-1, :] = mask[:, 0] = mask[:, -1] = True
        boundary = np.stack([XX[mask], YY[mask]], axis=1)
    else:
        # (t, x): interior includes the final-time face; boundary = t=a0 and
        # x = a1 / b1 faces.
        interior = np.stack(
            [XX[1:, 1:-1].ravel(), YY[1:, 1:-1].ravel()], axis=1
        )
        mask = np.zeros_like(XX, dtype=bool)
        mask[0, :] = True          # t = a0
        mask[:, 0] = mask[:, -1] = True  # x faces
        boundary = np.stack([XX[mask], YY[mask]], axis=1)
    return jnp.asarray(interior), jnp.asarray(boundary)


def test_grid(
    n0: int,
    n1: int,
    domain=((0.0, 1.0), (0.0, 1.0)),
    endpoint: bool = True,
) -> jnp.ndarray:
    """Dense evaluation grid (n0*n1, 2) for posterior testing/plotting."""
    (a0, b0), (a1, b1) = domain
    xs = np.linspace(a0, b0, n0, endpoint=endpoint)
    ys = np.linspace(a1, b1, n1, endpoint=endpoint)
    XX, YY = np.meshgrid(xs, ys, indexing="ij")
    return jnp.asarray(np.stack([XX.ravel(), YY.ravel()], axis=1))
