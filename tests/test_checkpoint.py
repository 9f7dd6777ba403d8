"""Checkpoint round-trip: factors + GN state must resume exactly."""

import jax
import jax.numpy as jnp
import numpy as np

import nonlinpdes_gpsolver_tpu as gpt
from nonlinpdes_gpsolver_tpu.solvers import factorize, gn_solve, Posterior
from nonlinpdes_gpsolver_tpu.utils.checkpoint import (
    load_solver_state,
    save_solver_state,
)


def _problem(N=80, Nb=24, seed=0):
    def u_truth(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def rhs_f(x):
        return -jnp.trace(jax.hessian(u_truth)(x)) + u_truth(x) ** 3

    Xd, Xb = gpt.utils.sample_random(jax.random.PRNGKey(seed), N, Nb)
    k = gpt.SquaredExponential.gaussian(0.3)
    return gpt.models.nonlinear_elliptic(k, Xd, Xb, rhs_f, u_truth, seed=1)


def test_checkpoint_roundtrip_and_resume(tmp_path):
    prob = _problem()
    fp = factorize(prob, nugget=1e-10)
    st = gn_solve(fp, max_iter=2)
    ckpt = tmp_path / "solve.npz"
    save_solver_state(ckpt, fp, st)

    fp2, st2 = load_solver_state(ckpt, prob)
    np.testing.assert_array_equal(np.asarray(fp2.factors["u"]), np.asarray(fp.factors["u"]))
    np.testing.assert_array_equal(np.asarray(st2.z), np.asarray(st.z))

    # resuming from the checkpointed iterate must continue the descent
    st3 = gn_solve(fp2, z0=st2.z, max_iter=2)
    assert float(st3.losses[-1]) <= float(st2.losses[-1]) * 1.01

    # posterior from restored factors matches
    p1 = Posterior(fp, st.z).extend(prob.points["domain"][:5])
    p2 = Posterior(fp2, st2.z).extend(prob.points["domain"][:5])
    np.testing.assert_allclose(np.asarray(p1), np.asarray(p2), rtol=1e-12)


def test_checkpoint_rejects_mismatched_problem(tmp_path):
    prob = _problem()
    fp = factorize(prob, nugget=1e-10)
    ckpt = tmp_path / "solve.npz"
    save_solver_state(ckpt, fp)

    other = _problem(N=60)  # different size
    try:
        load_solver_state(ckpt, other)
    except ValueError as e:
        assert "size" in str(e)
    else:
        raise AssertionError("expected ValueError on size mismatch")


def test_flop_model_sane():
    from nonlinpdes_gpsolver_tpu.utils.profiling import flop_model

    prob = _problem()
    fm = flop_model(prob, gn_iters=4)
    n = 2 * 80 + 24
    assert abs(fm["cholesky"] - n**3 / 3) < 1e-6 * n**3
    assert fm["total"] > fm["cholesky"]
