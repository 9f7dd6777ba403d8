#!/usr/bin/env python
"""Performance harness: per-phase wall-clock + TFLOP/s for the elliptic
workload at one or more sizes (the SURVEY.md section 6 north-star metrics:
assembly / Cholesky TFLOP/s per chip, GN iterations per second).

  python examples/perf_report.py --sizes 900 4000 10000 --warm
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("--sizes", type=int, nargs="+", default=[900, 2000])
    parser.add_argument("--gn_steps", type=int, default=4)
    parser.add_argument("--nugget", type=float, default=1e-5)
    parser.add_argument("--platform", type=str, default=None)
    parser.add_argument("--x64", action=argparse.BooleanOptionalAction, default=False)
    parser.add_argument(
        "--warm", action="store_true",
        help="run each size twice and report the second (compile-free) pass",
    )
    parser.add_argument(
        "--mesh", type=int, default=0,
        help="run the memory-bounded distributed path on an N-device mesh "
             "(1 is valid: same code path, single chip)",
    )
    parser.add_argument("--mesh_block", type=int, default=512)
    parser.add_argument(
        "--step_solver", type=str, default="auto",
        choices=["auto", "direct", "cg", "structured"],
    )
    parser.add_argument("--test_grid", type=int, default=60)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    jax.config.update("jax_enable_x64", bool(args.x64))
    # persistent compile cache: the tunneled-TPU compile service costs
    # minutes per novel executable; cached ones reload in seconds
    cache = Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import nonlinpdes_gpsolver_tpu as gpt
    from nonlinpdes_gpsolver_tpu.solvers import Posterior, factorize, gn_solve
    from nonlinpdes_gpsolver_tpu.utils.profiling import flop_model, tflops

    def u_truth(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1]) + 2 * jnp.sin(
            4 * jnp.pi * x[0]
        ) * jnp.sin(4 * jnp.pi * x[1])

    def rhs_f(x):
        return -jnp.trace(jax.hessian(u_truth)(x)) + u_truth(x) ** 3

    kernel = gpt.SquaredExponential.gaussian(0.2)
    Xt = gpt.utils.test_grid(args.test_grid, args.test_grid)
    truth = jax.vmap(u_truth)(Xt)
    mesh = None
    if args.mesh:
        from nonlinpdes_gpsolver_tpu.parallel import make_mesh

        mesh = make_mesh(args.mesh)
    print(
        f"backend={jax.default_backend()} x64={args.x64} "
        f"mesh={args.mesh or 'off'} solver={args.step_solver}"
    )
    print(
        f"{'N':>7} {'factor_s':>9} {'gn_s':>8} {'post_s':>8} "
        f"{'chol_TF/s':>10} {'gn_TF/s':>9} {'gn_it/s':>8} {'test_L2':>10}"
    )

    for N in args.sizes:
        Nb = max(4, N // 8)

        def run(seed):
            Xd, Xb = gpt.utils.sample_random(jax.random.PRNGKey(seed), N, Nb)
            prob = gpt.models.nonlinear_elliptic(
                kernel, Xd, Xb, rhs_f, u_truth, seed=seed + 1
            )
            t0 = time.perf_counter()
            if mesh is not None:
                from nonlinpdes_gpsolver_tpu.solvers.distributed import (
                    DistributedPosterior,
                    factorize_distributed,
                    gn_solve_distributed,
                )

                fp = factorize_distributed(
                    prob, mesh, nugget=args.nugget, block=args.mesh_block
                )
                t1 = time.perf_counter()
                st = gn_solve_distributed(
                    fp, max_iter=args.gn_steps, step_solver=args.step_solver,
                )
                # NOTE a real value fetch is the only reliable completion
                # barrier on this backend (block_until_ready can return
                # before execution; compiles are async and are absorbed by
                # the first fetch)
                jax.device_get(st.z)
                t2 = time.perf_counter()
                pred = DistributedPosterior(fp, st.z).extend(Xt)
            else:
                fp = factorize(prob, nugget=args.nugget)
                t1 = time.perf_counter()
                st = gn_solve(
                    fp, max_iter=args.gn_steps, step_solver=args.step_solver
                )
                jax.device_get(st.z)  # real fetch = reliable barrier
                t2 = time.perf_counter()
                pred = Posterior(fp, st.z).extend(Xt)
            jax.device_get(pred)  # real fetch = reliable barrier
            t3 = time.perf_counter()
            return prob, (t1 - t0, t2 - t1, t3 - t2), gpt.GPSolver.errors(pred, truth)

        prob, ts, err = run(0)
        if args.warm:
            prob, ts, err = run(1)
        fm = flop_model(prob, gn_iters=args.gn_steps)
        print(
            f"{N:>7} {ts[0]:>9.3f} {ts[1]:>8.3f} {ts[2]:>8.3f} "
            f"{tflops(fm['cholesky'], ts[0]):>10.2f} "
            f"{tflops(fm['gn_total'], ts[1]):>9.2f} "
            f"{args.gn_steps / ts[1]:>8.1f} {err.l2:>10.3e}",
            flush=True,
        )


if __name__ == "__main__":
    main()
