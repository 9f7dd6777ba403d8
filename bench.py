#!/usr/bin/env python
"""Benchmark: canonical nonlinear-elliptic workload, end-to-end.

Prints ONE JSON line:
  {"metric": ..., "value": ..., "unit": ..., "vs_baseline": ...}

Workload = BASELINE.md config 1 (the reference's README command):
NonLinElliptic2d, Gaussian sigma=0.2, N_domain=900, N_boundary=124, 4 GN
steps, posterior extension to a 60x60 test grid. Wall-clock covers
assembly + factorization + the full GN loop + posterior weights + test
extension, after one warm-up run (compile cache hot - the serving regime).

vs_baseline: speedup over the reference implementation executing its own
pipeline end-to-end on this host's CPU (f64, the only mode it supports),
measured by `scripts/measure_reference.py` into REF_BASELINE.json - re-run
that script to re-derive the constant on a new host. Higher is better.

Accuracy is checked in the same run: the resulting test L2 error must be at
least as good as the notebook-recorded baseline 3.402e-3
(BASELINE.md row 1) or the benchmark reports failure.
"""

import json
import os
import sys
import time

_FALLBACK_REF_SECONDS = 11.42  # scripts/measure_reference.py, 2026-08-19
BASELINE_L2 = 3.402e-3


def _ref_seconds() -> float:
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "REF_BASELINE.json")
    try:
        with open(path) as f:
            return float(json.load(f)["elliptic"]["seconds"])
    except Exception:
        return _FALLBACK_REF_SECONDS


def main():
    import os

    import jax

    # Persistent compile cache: the tunneled-TPU compile service is slow
    # (minutes per novel executable); cached executables load in seconds.
    cache_dir = os.path.join(os.path.dirname(os.path.abspath(__file__)), ".jax_cache")
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    on_tpu = jax.default_backend() not in ("cpu",)
    if not on_tpu:
        jax.config.update("jax_enable_x64", True)
    import jax.numpy as jnp
    import numpy as np
    import nonlinpdes_gpsolver_tpu as gpt

    def u_truth(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1]) + 2 * jnp.sin(
            4 * jnp.pi * x[0]
        ) * jnp.sin(4 * jnp.pi * x[1])

    def rhs_f(x):
        return -jnp.trace(jax.hessian(u_truth)(x)) + u_truth(x) ** 3

    # f64/CPU can afford the reference's 1e-13 nugget; f32/TPU needs more.
    nugget = 1e-5 if on_tpu else 1e-13
    Xd, Xb = gpt.utils.sample_random(jax.random.PRNGKey(0), 900, 124)
    kernel = gpt.SquaredExponential.gaussian(0.2)
    Xt = gpt.utils.test_grid(60, 60)
    truth = jax.vmap(u_truth)(Xt)

    def run():
        prob = gpt.models.nonlinear_elliptic(kernel, Xd, Xb, rhs_f, u_truth, seed=1)
        solver = gpt.GPSolver(prob, nugget=nugget)
        res = solver.solve(max_iter=4)
        pred = res.posterior.extend(Xt)
        # GPSolver.errors reduces on device and fetches two scalars - the
        # fetch is the completion barrier (no separate block_until_ready)
        return gpt.GPSolver.errors(pred, truth)

    run()  # warm-up: compile cache
    t0 = time.perf_counter()
    err = run()
    seconds = time.perf_counter() - t0

    if err.l2 > BASELINE_L2:
        print(
            json.dumps(
                {
                    "metric": "elliptic2d_e2e_n900_seconds",
                    "value": seconds,
                    "unit": "s",
                    "vs_baseline": 0.0,
                    "error": f"accuracy regression: L2 {err.l2:.3e} > {BASELINE_L2}",
                }
            )
        )
        sys.exit(1)

    print(
        json.dumps(
            {
                "metric": "elliptic2d_e2e_n900_seconds",
                "value": round(seconds, 4),
                "unit": "s",
                "vs_baseline": round(_ref_seconds() / seconds, 2),
                "test_l2": float(f"{err.l2:.4e}"),
                "accuracy_gate": BASELINE_L2,
            }
        )
    )


if __name__ == "__main__":
    main()
