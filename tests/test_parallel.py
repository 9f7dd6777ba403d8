"""Distributed Cholesky / TRSM vs. single-device reference on the virtual
8-device CPU mesh (the 'distributed without a cluster' mechanism,
SURVEY.md section 4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nonlinpdes_gpsolver_tpu.parallel import (
    cholesky_blockcyclic,
    make_mesh,
    trsm_blockcyclic,
)


def _spd(n, seed=0, dtype=np.float64):
    rng = np.random.default_rng(seed)
    A = rng.standard_normal((n, n))
    return (A @ A.T + n * np.eye(n)).astype(dtype)


@pytest.mark.parametrize("n,block", [(96, 16), (200, 16), (256, 32), (130, 32)])
def test_distributed_cholesky_matches_dense(eight_devices, n, block):
    mesh = make_mesh(8)
    A = _spd(n, seed=n)
    fac = cholesky_blockcyclic(A, mesh, block=block)
    L = np.asarray(fac.dense())
    L_ref = np.linalg.cholesky(A)
    np.testing.assert_allclose(L, L_ref, atol=1e-8 * n)


def test_distributed_cholesky_nondivisible_mesh(eight_devices):
    """Mesh sizes that do not divide n force padding; result must be exact."""
    mesh = make_mesh(4)
    A = _spd(100, seed=3)
    fac = cholesky_blockcyclic(A, mesh, block=16)
    np.testing.assert_allclose(
        np.asarray(fac.dense()), np.linalg.cholesky(A), atol=1e-6
    )


@pytest.mark.parametrize("m", [1, 7, 64])
def test_distributed_trsm_matches_dense(eight_devices, m):
    mesh = make_mesh(8)
    n = 160
    A = _spd(n, seed=7)
    rng = np.random.default_rng(1)
    V = rng.standard_normal((n, m))
    fac = cholesky_blockcyclic(A, mesh, block=16)
    Y = np.asarray(trsm_blockcyclic(fac, V))
    L = np.linalg.cholesky(A)
    Y_ref = np.linalg.solve(L, V)
    np.testing.assert_allclose(Y, Y_ref, atol=1e-8)


def test_distributed_trsm_vector_rhs(eight_devices):
    mesh = make_mesh(8)
    n = 96
    A = _spd(n, seed=11)
    v = np.random.default_rng(2).standard_normal(n)
    fac = cholesky_blockcyclic(A, mesh, block=16)
    y = np.asarray(trsm_blockcyclic(fac, v))
    assert y.shape == (n,)
    np.testing.assert_allclose(y, np.linalg.solve(np.linalg.cholesky(A), v), atol=1e-8)


def test_distributed_trsm_transposed(eight_devices):
    mesh = make_mesh(8)
    n = 144
    A = _spd(n, seed=13)
    rng = np.random.default_rng(4)
    V = rng.standard_normal((n, 5))
    fac = cholesky_blockcyclic(A, mesh, block=16)
    Y = np.asarray(trsm_blockcyclic(fac, V, trans=True))
    L = np.linalg.cholesky(A)
    np.testing.assert_allclose(Y, np.linalg.solve(L.T, V), atol=1e-8)


def test_distributed_kernel_solve(eight_devices):
    from nonlinpdes_gpsolver_tpu.parallel.cholesky import kernel_solve_blockcyclic

    mesh = make_mesh(8)
    n = 128
    A = _spd(n, seed=17)
    v = np.random.default_rng(5).standard_normal(n)
    fac = cholesky_blockcyclic(A, mesh, block=16)
    w = np.asarray(kernel_solve_blockcyclic(fac, v))
    np.testing.assert_allclose(w, np.linalg.solve(A, v), atol=1e-7)
