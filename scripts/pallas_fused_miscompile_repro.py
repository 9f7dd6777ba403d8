#!/usr/bin/env python
"""Minimal repro harness for the round-4 Pallas-in-fused-executable
miscompile (PERF.md "Robustness", failure 2; round-4 VERDICT weak item 5).

Observed on the tunneled-TPU backend: the SAME ``pallas_call`` Gram tile
kernel that is bit-identical to the XLA closed form standalone and inside
the two-pass assembly executable returned deterministically wrong values
for some trailing-row tiles when embedded in the fused superblock
factorization executable - Darcy a-block layout (d/d/id segments), 512
blocks, wrong region [rows >= 4096] x [cols < 4096], error ~1.5e-3 in the
implied Gram entries. The production fix: the fused kernel evaluates tiles
with the closed-form pair functions (``parallel/fused.py``), costing ~2% of
factorize time; the sampled-row probe caught the corruption as designed.

This script reconstructs the failing context shape as a STANDALONE
executable: the Pallas tile evaluators run inside one jitted program that
mimics the fused kernel's structure (row-chunked ``fori_loop`` assembly of
a superblock column window with per-row-operator ``jnp.where`` masks,
``dynamic_update_slice`` writes, and a trailing MXU contraction consuming
the result), and the window is compared against the closed-form evaluation
of the same program. Exit status is 0 when the two agree (miscompile not
reproduced in this reduced harness - expected if the backend has been
fixed, or if the trigger needs the full factorization graph) and 1 with a
diff report when it reproduces.

Run on the TPU:  python scripts/pallas_fused_miscompile_repro.py
"""

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    import nonlinpdes_gpsolver_tpu as gpt
    from nonlinpdes_gpsolver_tpu.ops.operators import d, identity
    from nonlinpdes_gpsolver_tpu.ops.pallas_gram import pallas_pair_fn

    print("backend:", jax.default_backend())
    kernel = gpt.SquaredExponential.gaussian(0.2)
    dim = 2
    # Darcy a-block layout: [d/dx1, d/dx2, id] @ interior, 512-blocks.
    N = 2048  # per segment -> 6144 rows total; window rows 4096.. hit seg 3
    rng = np.random.default_rng(0)
    X = jnp.asarray(rng.random((N, dim)), jnp.float32)
    ops = (d(0), d(1), identity())
    segs = [(i * N, N, op) for i, op in enumerate(ops)]
    n = 3 * N
    rows0, rows1 = 4096, 6144      # trailing rows (the corrupt region)
    cols0, cols1 = 0, 2048         # first superblock columns
    S = cols1 - cols0
    Rch = 512                      # row chunks, as in the fused kernel
    X_all = jnp.concatenate([X, X, X], axis=0)

    def row_op_masks(rg):
        out = []
        for rop in ops:
            m = jnp.zeros(rg.shape, bool)
            for start, size, o in segs:
                if o == rop:
                    m = m | ((rg >= start) & (rg < start + size))
            out.append(m)
        return out

    def build_window(use_pallas: bool):
        pair = {
            op: (
                pallas_pair_fn(kernel, op, ops[0], tile_m=256, tile_n=256)
                if use_pallas
                else kernel.pair_fn(op, ops[0])
            )
            for op in ops
        }
        # column operator varies per segment range inside the window
        col_ranges = [
            (cop, max(lo, cols0) - cols0, min(lo + sz, cols1) - cols0)
            for lo, sz, cop in segs
            if min(lo + sz, cols1) > max(lo, cols0)
        ]
        pair2 = {
            (rop, cop): (
                pallas_pair_fn(kernel, rop, cop, tile_m=256, tile_n=256)
                if use_pallas
                else kernel.pair_fn(rop, cop)
            )
            for rop in ops
            for cop, _, _ in col_ranges
        }

        @jax.jit
        def win():
            h = rows1 - rows0
            nrc = h // Rch

            def row_chunk(i, Acol):
                r0 = i * Rch
                rg = rows0 + r0 + jnp.arange(Rch)
                Xr = lax.dynamic_slice(X_all, (rows0 + r0, 0), (Rch, dim))
                masks = row_op_masks(rg)
                pieces = []
                for cop, lo, hi in col_ranges:
                    Xc = lax.slice_in_dim(
                        X_all, cols0 + lo, cols0 + hi, axis=0
                    )
                    piece = jnp.zeros((Rch, hi - lo), jnp.float32)
                    for rop, mask in zip(ops, masks):
                        K = pair2[(rop, cop)](Xr, Xc)
                        piece = jnp.where(mask[:, None], K, piece)
                    pieces.append(piece)
                acc = jnp.concatenate(pieces, axis=1)
                return lax.dynamic_update_slice(Acol, acc, (r0, 0))

            Acol = lax.fori_loop(
                0, nrc, row_chunk, jnp.zeros((h, S), jnp.float32)
            )
            # trailing MXU contraction consuming the window, as the fused
            # kernel's left-looking update does
            probe = jnp.ones((S, 8), jnp.float32)
            y = jnp.matmul(Acol, probe, precision=jax.lax.Precision.HIGHEST)
            return Acol, y

        return win()

    A_pl, y_pl = jax.device_get(build_window(True))
    A_cf, y_cf = jax.device_get(build_window(False))
    diff = np.max(np.abs(A_pl - A_cf))
    scale = np.max(np.abs(A_cf))
    print(f"window [{rows0}:{rows1}] x [{cols0}:{cols1}]  "
          f"max |pallas - closed| = {diff:.3e}  (scale {scale:.3e})")
    if diff > 1e-5 * scale:
        bad = np.argwhere(np.abs(A_pl - A_cf) > 1e-5 * scale)
        print(f"REPRODUCED: {len(bad)} mismatching entries; first rows:")
        print(bad[:10])
        return 1
    print("not reproduced in this reduced harness (agreement to "
          f"{diff:.1e}); the original trigger lived inside the full fused "
          "factorization graph - see PERF.md 'Robustness' for the "
          "production guard that caught it")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
