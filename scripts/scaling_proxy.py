#!/usr/bin/env python
"""Scaling-shape proxy on the virtual CPU mesh (round-2 VERDICT item 5).

Real multi-chip hardware is not reachable from this environment, but the
scaling *shape* of the distributed path is measurable today: for fixed N and
P = 1/2/4/8 virtual devices this script records, per device,

* compiled-executable memory (``memory_analysis``) of the sharded assembly
  and the distributed Cholesky - the per-device footprint must shrink ~1/P;
* the analytic compute share (n_pad^3/3 / P flops) and received collective
  volume (4 n_pad^2 (1 - 1/P) bytes: one panel column broadcast per step),
  whose ratio is the model-level scaling efficiency on real ICI;
* wall-clock per phase (CAVEAT: all virtual devices share this host's 2
  cores, so virtual-mesh wall-clock measures overhead/serialization, not
  speedup - it is recorded for completeness, the memory + volume columns
  are the proxy).

  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
      python scripts/scaling_proxy.py --N 2000 --block 64
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--N", type=int, default=2000)
    ap.add_argument("--block", type=int, default=64)
    ap.add_argument("--gn_steps", type=int, default=2)
    ap.add_argument("--ps", type=int, nargs="+", default=[1, 2, 4, 8])
    args = ap.parse_args()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_enable_x64", False)
    import jax.numpy as jnp
    import numpy as np
    import nonlinpdes_gpsolver_tpu as gpt
    from jax.sharding import NamedSharding, PartitionSpec as P
    from nonlinpdes_gpsolver_tpu.parallel import make_mesh
    from nonlinpdes_gpsolver_tpu.parallel.cholesky import (
        _chol_sharded, pad_to_blocks,
    )
    from nonlinpdes_gpsolver_tpu.parallel.fused import _fused_arranged
    from nonlinpdes_gpsolver_tpu.parallel.gram import _assemble_arranged
    from nonlinpdes_gpsolver_tpu.solvers.distributed import (
        factorize_distributed, gn_solve_distributed,
    )

    def u_truth(x):
        return jnp.sin(jnp.pi * x[0]) * jnp.sin(jnp.pi * x[1])

    def rhs_f(x):
        return -jnp.trace(jax.hessian(u_truth)(x)) + u_truth(x) ** 3

    N = args.N
    Xd, Xb = gpt.utils.sample_random(jax.random.PRNGKey(0), N, max(4, N // 8))
    kernel = gpt.SquaredExponential.gaussian(0.2)
    prob = gpt.models.nonlinear_elliptic(kernel, Xd, Xb, rhs_f, u_truth, seed=1)
    b = prob.blocks[0]
    pts = {k: jnp.asarray(v) for k, v in prob.points.items()}
    n = sum(pts[o.points].shape[0] for o in b.observables)
    dtype = np.asarray(Xd).dtype
    itemsize = np.dtype(dtype).itemsize

    rows = []
    print(
        f"{'P':>3} {'n_pad':>7} {'asm_MiB/dev':>12} {'chol_MiB/dev':>13} "
        f"{'fused_MiB/dev':>14} {'recv_GiB/dev':>13} {'flops/dev':>11} "
        f"{'fac_s':>7} {'gn_s':>7}"
    )
    for P_ in args.ps:
        mesh = make_mesh(P_)
        n_pad = pad_to_blocks(n, args.block, P_)
        nb = n_pad // args.block

        # compiled per-device memory of the two big executables
        out = jax.ShapeDtypeStruct(
            (nb, args.block, n_pad), dtype,
            sharding=NamedSharding(mesh, P("p", None, None)),
        )
        asm = _assemble_arranged.lower(
            out, b.kernel, tuple(b.observables), pts, jnp.asarray(1.0),
            "adaptive", 1e-9, mesh, "p", args.block, 8192,
        ).compile().memory_analysis()
        asm_dev = (
            asm.output_size_in_bytes + asm.temp_size_in_bytes
            - asm.alias_size_in_bytes
        )
        arr = jax.ShapeDtypeStruct(
            (nb, args.block, n_pad), dtype,
            sharding=NamedSharding(mesh, P("p", None, None)),
        )
        chol = _chol_sharded.lower(
            arr, mesh, "p", args.block, 4096
        ).compile().memory_analysis()
        chol_dev = (
            chol.output_size_in_bytes + chol.temp_size_in_bytes
            - chol.alias_size_in_bytes
        )
        fused = _fused_arranged.lower(
            out, b.kernel, tuple(b.observables), pts, jnp.asarray(1.0),
            "adaptive", 1e-9, mesh, "p", args.block, 4096,
        ).compile().memory_analysis()
        fused_dev = (
            fused.output_size_in_bytes + fused.temp_size_in_bytes
            - fused.alias_size_in_bytes
        )

        # analytic per-device compute + received collective volume; their
        # time ratio at real-hardware rates (ICI all-gather ~150 GB/s/chip,
        # ~10 TF/s sustained f32-HIGHEST factorization) gives the model-
        # level scaling efficiency 1 / (1 + comm_share) on an actual mesh
        flops_dev = n_pad**3 / 3 / P_
        recv_dev = 4 * n_pad**2 * (1 - 1 / P_) * itemsize / 4
        comm_s = recv_dev / 150e9
        compute_s = flops_dev / 10e12
        model_eff = 1.0 / (1.0 + comm_s / max(compute_s, 1e-30))

        # wall-clock (2-core host: records overhead shape only)
        t0 = time.perf_counter()
        fp = factorize_distributed(
            prob, mesh, nugget=1e-9, block=args.block, guard=False
        )
        jax.block_until_ready(next(iter(fp.factors.values())).local)
        t1 = time.perf_counter()
        st = gn_solve_distributed(fp, max_iter=args.gn_steps)
        st.z.block_until_ready()
        t2 = time.perf_counter()

        rows.append(dict(
            P=P_, n_pad=n_pad, asm_bytes_dev=int(asm_dev),
            chol_bytes_dev=int(chol_dev), fused_bytes_dev=int(fused_dev),
            recv_bytes_dev=int(recv_dev),
            flops_dev=flops_dev, model_efficiency=round(model_eff, 4),
            fac_s=t1 - t0, gn_s=t2 - t1,
        ))
        print(
            f"{P_:>3} {n_pad:>7} {asm_dev / 2**20:>12.1f} "
            f"{chol_dev / 2**20:>13.1f} {fused_dev / 2**20:>14.1f} "
            f"{recv_dev / 2**30:>13.2f} "
            f"{flops_dev:>11.2e} {t1 - t0:>7.2f} {t2 - t1:>7.2f}",
            flush=True,
        )

    out_path = Path(__file__).resolve().parent.parent / "SCALING_PROXY.json"
    out_path.write_text(json.dumps({
        "N": N,
        "block": args.block,
        "notes": {
            "fac_s, gn_s": (
                "virtual CPU mesh wall-clock: all P virtual devices share "
                "this host's 2 cores, so these columns measure "
                "serialization/overhead shape ONLY, never speedup - do not "
                "read a P=1 -> P=8 slowdown here as a scaling result"
            ),
            "model_efficiency": (
                "analytic 1/(1 + comm_share) at real-hardware rates "
                "(ICI all-gather 150 GB/s/chip, 10 TF/s sustained f32 "
                "factorization): the scaling efficiency the same "
                "executables reach on an actual ICI mesh"
            ),
            "memory": (
                "asm/chol/fused bytes are compiled per-device "
                "memory_analysis of the real executables - the "
                "~1/P-shrinking footprint is the load-bearing proxy column"
            ),
        },
        "rows": rows,
    }, indent=1))
    print(f"wrote {out_path}")


if __name__ == "__main__":
    main()
