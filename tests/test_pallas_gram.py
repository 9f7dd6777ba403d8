"""Pallas Gram tile kernel vs. the XLA closed-form path (interpret mode on
CPU; the same kernel compiles for TPU)."""

import jax.numpy as jnp
import numpy as np
import pytest

from nonlinpdes_gpsolver_tpu.ops import SquaredExponential, d, d2, identity, laplacian
from nonlinpdes_gpsolver_tpu.ops.pallas_gram import pallas_pair_fn

KERNEL = SquaredExponential.gaussian(0.2)
ANISO = SquaredExponential.anisotropic([0.3, 0.05])


def _pts(n, m, seed=0):
    rng = np.random.default_rng(seed)
    return (
        jnp.asarray(rng.uniform(0, 1, (n, 2)), dtype=jnp.float64),
        jnp.asarray(rng.uniform(0, 1, (m, 2)), dtype=jnp.float64),
    )


@pytest.mark.parametrize(
    "ox,oy",
    [
        (identity(), identity()),
        (laplacian(), identity()),
        (laplacian(), laplacian()),
        (d(0), d2(1, 1)),
    ],
)
def test_pallas_matches_xla_closed_form(ox, oy):
    X, Y = _pts(50, 70)
    ref = KERNEL.pair_fn(ox, oy)(X, Y)
    got = pallas_pair_fn(KERNEL, ox, oy, tile_m=16, tile_n=16, interpret=True)(X, Y)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)


def test_pallas_nonsquare_tiles_and_padding():
    """Sizes that don't divide the tile exercise the padded edge path."""
    X, Y = _pts(33, 17, seed=5)
    ox, oy = laplacian(), d(1)
    ref = ANISO.pair_fn(ox, oy)(X, Y)
    got = pallas_pair_fn(ANISO, ox, oy, tile_m=16, tile_n=16, interpret=True)(X, Y)
    assert got.shape == (33, 17)
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref), rtol=1e-12)
    assert bool(jnp.all(jnp.isfinite(got)))
