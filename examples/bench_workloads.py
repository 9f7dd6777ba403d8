#!/usr/bin/env python
"""End-to-end wall-clock for all four reference workloads at their CLI configs.

Each workload runs twice — the first pass pays compilation (cached under
``.jax_cache``), the second is the reported warm number — and prints one line
with the warm end-to-end seconds plus accuracy, e.g.::

    [elliptic 900/124 GN4] warm end-to-end 0.571s  ->  ErrorStats(l2=2.09e-03, ...)

Configs mirror the reference's README commands (``README.md:15-21`` upstream):
elliptic 900/124 GN4, Burgers 1000/200 GN8 (anisotropic [0.3, 0.05]),
Eikonal 1000/200 GN8 (eps=0.1), Darcy inverse 400/100 N_data=60 GN8.
Ground truths follow the reference drivers: manufactured elliptic solution,
Cole-Hopf quadrature for Burgers, Cole-Hopf FD for Eikonal, FD Darcy solve +
noisy interpolated observations for the inverse problem.

    python examples/bench_workloads.py              # all four
    python examples/bench_workloads.py --only burgers darcy
"""

import argparse
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument(
        "--only", nargs="+", default=["elliptic", "burgers", "eikonal", "darcy"],
        choices=["elliptic", "burgers", "eikonal", "darcy", "mesh"],
        help="'mesh' runs the elliptic workload through the distributed "
             "mesh path at --mesh_N collocation points - PAST the "
             "reference's ~10k dense limit (first compile of the CG scan "
             "on the tunneled backend is slow; warm runs come from "
             ".jax_cache)",
    )
    parser.add_argument("--mesh_N", type=int, default=20000)
    parser.add_argument("--platform", type=str, default=None)
    args = parser.parse_args()

    import jax

    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    cache = Path(__file__).resolve().parent.parent / ".jax_cache"
    jax.config.update("jax_compilation_cache_dir", str(cache))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp
    import numpy as np
    import nonlinpdes_gpsolver_tpu as gpt
    from nonlinpdes_gpsolver_tpu.utils.classical import (
        burgers_cole_hopf_truth,
        darcy_fd_solve,
        eikonal_cole_hopf_solve,
    )

    print("backend:", jax.default_backend(), flush=True)

    import json

    ref_path = Path(__file__).resolve().parent.parent / "REF_BASELINE.json"
    ref = json.loads(ref_path.read_text()) if ref_path.exists() else {}

    def timed(name, fn, ref_key=None):
        fn()  # warm: compile (persistent-cached)
        t0 = time.perf_counter()
        out = fn()
        dt = time.perf_counter() - t0
        vs = ""
        if ref_key in ref:
            vs = (f"  ({ref[ref_key]['seconds']:.1f}s reference CPU -> "
                  f"{ref[ref_key]['seconds'] / dt:.1f}x)")
        print(f"[{name}] warm end-to-end {dt:.3f}s{vs}  ->  {out}", flush=True)

    k02 = gpt.SquaredExponential.gaussian(0.2)

    if "elliptic" in args.only:

        def u_ell(x):
            return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1]) + 2 * jnp.sin(
                4 * jnp.pi * x[0]
            ) * jnp.sin(4 * jnp.pi * x[1])

        def rhs_ell(x):
            return -jnp.trace(jax.hessian(u_ell)(x)) + u_ell(x) ** 3

        Xd, Xb = gpt.utils.sample_random(jax.random.PRNGKey(0), 900, 124)
        Xt = gpt.utils.test_grid(60, 60)
        truth = jax.vmap(u_ell)(Xt)

        def run():
            prob = gpt.models.nonlinear_elliptic(k02, Xd, Xb, rhs_ell, u_ell, seed=1)
            res = gpt.GPSolver(prob, nugget=1e-5).solve(max_iter=4)
            pred = res.posterior.extend(Xt)
            pred.block_until_ready()
            return gpt.GPSolver.errors(pred, truth)

        timed("elliptic 900/124 GN4", run, "elliptic")

    if "burgers" in args.only:
        kb = gpt.SquaredExponential.anisotropic([0.3, 0.05])
        Xd, Xb = gpt.utils.sample_random(
            jax.random.PRNGKey(0), 1000, 200,
            domain=((0.0, 1.0), (-1.0, 1.0)), time_dependent=True,
        )

        def g_burg(x):
            return jnp.where(x[0] == 0.0, -jnp.sin(jnp.pi * x[1]), 0.0)

        u_bt = burgers_cole_hopf_truth(0.02)
        Xt = gpt.utils.test_grid(60, 60, domain=((0.0, 1.0), (-1.0, 1.0)))
        truth = u_bt(np.asarray(Xt[:, 0]), np.asarray(Xt[:, 1]))

        def run():
            prob = gpt.models.burgers(kb, Xd, Xb, g_burg, nu=0.02, seed=3)
            res = gpt.GPSolver(prob, nugget=1e-5).solve(max_iter=8)
            pred = res.posterior.extend(Xt)
            pred.block_until_ready()
            return gpt.GPSolver.errors(pred, truth)

        timed("burgers 1000/200 GN8", run, "burgers")

    if "eikonal" in args.only:
        Xd, Xb = gpt.utils.sample_random(jax.random.PRNGKey(1), 1000, 200)
        X1, X2, U = eikonal_cole_hopf_solve(58, 0.1)
        Xt = jnp.asarray(np.stack([X1.ravel(), X2.ravel()], axis=1))

        def run():
            prob = gpt.models.eikonal(k02, Xd, Xb, rhs_f=lambda x: 1.0, eps=0.1)
            res = gpt.GPSolver(prob, nugget=1e-5).solve(max_iter=8)
            pred = res.posterior.extend(Xt)
            pred.block_until_ready()
            return gpt.GPSolver.errors(pred, U.ravel())

        timed("eikonal 1000/200 GN8", run, "eikonal")

    if "darcy" in args.only:
        from scipy.interpolate import RegularGridInterpolator

        def a_true(x1, x2):
            s = np.sin(2 * np.pi * x1) + np.sin(2 * np.pi * x2)
            return np.exp(s) + np.exp(-s)

        xs, ys, Ud = darcy_fd_solve(78, a_true, lambda x1, x2: np.ones_like(x1))
        interp = RegularGridInterpolator((ys, xs), Ud)
        Xd, Xb = gpt.utils.sample_random(jax.random.PRNGKey(5), 400, 100)
        N_data = 60
        Xdata = np.asarray(Xd[:N_data])
        clean = interp(np.stack([Xdata[:, 1], Xdata[:, 0]], axis=1))
        noisy = clean + 1e-3 * np.random.default_rng(9999).standard_normal(N_data)
        X1, X2 = np.meshgrid(xs, ys)
        Xt = jnp.asarray(np.stack([X1.ravel(), X2.ravel()], axis=1))

        def run():
            prob = gpt.models.darcy_flow(
                k02, k02, Xd, Xb, jnp.asarray(noisy),
                rhs_f=lambda x: 1.0, noise_level=1e-3, seed=7,
            )
            res = gpt.GPSolver(prob, nugget=1e-8).solve(max_iter=8)
            pred = res.posterior.extend(Xt, block="u")
            pred.block_until_ready()
            return gpt.GPSolver.errors(pred, Ud.ravel())

        timed("darcy-IP 400/100/60 GN8", run, "darcy")

    if "mesh" in args.only:
        # elliptic at N past the reference's dense wall (upstream
        # README.md:9), through the memory-bounded mesh path on however
        # many devices are visible (1 real chip here). PERF.md "mesh path"
        # table records 10k/15k/20k/26k rows measured this way.
        from nonlinpdes_gpsolver_tpu.parallel import make_mesh
        from nonlinpdes_gpsolver_tpu.solvers.distributed import (
            DistributedPosterior, factorize_distributed, gn_solve_distributed,
        )

        def u_ell(x):
            return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1]) + 2 * jnp.sin(
                4 * jnp.pi * x[0]
            ) * jnp.sin(4 * jnp.pi * x[1])

        def rhs_ell(x):
            return -jnp.trace(jax.hessian(u_ell)(x)) + u_ell(x) ** 3

        N = args.mesh_N
        Xd, Xb = gpt.utils.sample_random(jax.random.PRNGKey(1), N, N // 8)
        Xt = gpt.utils.test_grid(60, 60)
        truth = jax.vmap(u_ell)(Xt)
        mesh = make_mesh()

        def run():
            prob = gpt.models.nonlinear_elliptic(
                gpt.SquaredExponential.gaussian(0.2), Xd, Xb, rhs_ell, u_ell,
                seed=1,
            )
            fp = factorize_distributed(prob, mesh, nugget=1e-5, block=512)
            st = gn_solve_distributed(fp, max_iter=4)
            pred = DistributedPosterior(fp, st.z).extend(Xt)
            pred.block_until_ready()
            return gpt.GPSolver.errors(pred, truth)

        timed(f"mesh-elliptic N={N} ({mesh.devices.size} dev) GN4", run)


if __name__ == "__main__":
    main()
