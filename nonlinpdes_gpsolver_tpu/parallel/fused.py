"""Fused streaming assembly + factorization: the Gram matrix is never
materialized.

SURVEY.md section 7 "hard parts" item 5 (assembly/factorization overlap at
scale): the two-pass path (:func:`.gram.assemble_gram_sharded` writing the
full equilibrated Gram shard, then :func:`.cholesky._chol_sharded` factoring
it in place) streams the whole ``n^2/P`` shard through HBM twice and
evaluates derivative-kernel tiles for BOTH triangles of a symmetric matrix.
This module fuses the two into a single *left-looking* block-cyclic panel
factorization in which block-column ``k`` of the (equilibrated, regularized)
Gram matrix is assembled on the fly at step ``k`` - by the same closed-form
derivative-kernel tile evaluators - immediately combined with the update
from the already-finished panels, factored, and written once as a column of
``L``:

* kernel-evaluation work halves (only the lower triangle is ever assembled);
* the update GEMM contracts ``L[:, :kB] @ L[k-row, :kB]^T`` - the textbook
  ``n^3/6`` MAC count, where the right-looking trailing update applies
  rank-``B`` updates to the full trailing *rectangle* (2x the MACs, since
  the symmetric upper half is updated too so later panels can read it);
* HBM write traffic per step is one block column (the factor is written
  exactly once; the right-looking path rewrites the trailing shard every
  panel step);
* per-device peak memory is unchanged: the ``n_pad^2/P`` factor shard
  (allocated zero and donated) plus one block-column temporary.

Zero-initialization is load-bearing: at step ``k`` every read of ``L``
columns ``>= kB`` returns 0 (those columns are written only at their own
step), so the chunked update GEMMs need no masking - a chunk that overruns
``kB`` contracts against zeros. Chunk boundaries never overlap (the chunk
width in block-columns divides ``nb``), so nothing is double-counted.

The matrix A~ being factored is identical (same tile evaluators, same
trace-adaptive nugget, same equilibration) to the two-pass path's - asserted
by equivalence tests on the virtual CPU mesh. Since A~ never exists, the
factor-quality guard uses :func:`sampled_row_quality`: a handful of
statically-chosen rows of A~ are re-assembled independently (cost
``O(sample * n)``) and compared against ``L (L^T v)`` on a fixed probe
vector - the same finite-but-corrupt-factor failure class coverage as the
full pre-factorization matvec (a corrupt factor corrupts essentially every
row product), at negligible cost.

Reference counterpart: none (the reference assembles dense host-side numpy,
``src/Gram_matrice.py:11-187`` upstream, and calls ``jnp.linalg.cholesky``,
``src/PDEs.py:75-80`` upstream).
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax import shard_map
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops.assembly import _pair_impl, cross_gram
from .cholesky import BlockCyclicFactor, _block_perm, pad_to_blocks
from .gram import _segments


def _col_signatures(segs, nb: int, B: int, n: int):
    """Static per-block-column operator layout.

    Block-column ``kb`` covers global columns ``[kb*B, (kb+1)*B)``; its
    *signature* is the tuple of ``(op, lo, hi)`` intra-block ranges cut from
    the (static) segment layout, with ``op=None`` for the padding tail.
    Most blocks lie inside one segment, so the number of distinct
    signatures is at most ``len(segs) + len(segs) - 1 + 1`` - each gets one
    ``lax.switch`` branch evaluating only the operator pairs that actually
    occur in that column block.
    """
    sig_of_block = []
    sig_index: dict = {}
    for kb in range(nb):
        c0, c1 = kb * B, (kb + 1) * B
        ranges = []
        for start, size, op in segs:
            lo, hi = max(start, c0), min(start + size, c1)
            if hi > lo:
                ranges.append((op, lo - c0, hi - c0))
        if c1 > n:  # padding tail: no operator, zeros (+ identity diagonal)
            ranges.append((None, max(n, c0) - c0, B))
        sig = tuple(ranges)
        if sig not in sig_index:
            sig_index[sig] = len(sig_index)
        sig_of_block.append(sig_index[sig])
    sigs = [None] * len(sig_index)
    for sig, i in sig_index.items():
        sigs[i] = sig
    return np.asarray(sig_of_block, np.int32), tuple(sigs)


def _chunk_blocks(nb: int, chunk_cols: int, B: int) -> int:
    """Largest block-column chunk width that divides ``nb`` and keeps the
    chunk at most ``chunk_cols`` columns wide - divisibility guarantees
    chunks never overlap, which the no-masking zero-read argument needs."""
    Wb = max(1, min(nb, chunk_cols // B))
    while nb % Wb:
        Wb -= 1
    return Wb


def _fused_chol_kernel(
    local, Xrow, Xcols, diag_const_pad, nug_share_pad, s0, *,
    kernel, segs, nb: int, B: int, P_: int, axis: str, n: int,
    chunk_cols: int = 4096, max_attempts: int = 8,
):
    """shard_map body: left-looking fused assemble+factorize with
    IN-EXECUTABLE nugget escalation.

    ``local`` (nbl, B, n_pad): this device's ZERO-INITIALIZED donated factor
    shard. ``Xrow`` (nbl, B, d): its block-cyclic row coordinates.
    ``Xcols`` (n_pad, d): replicated. ``diag_const_pad``/``nug_share_pad``
    (n_pad,): the per-row stationary diagonal constant and its trace-
    adaptive nugget share, so the equilibration ``d^{-1/2} =
    rsqrt(c + s * nug)`` is recomputed per attempt from the live scale
    ``s``. Returns ``(factor shard, diag inverses, d_isqrt_pad, s, ok)``.

    Escalation: a too-small nugget at f32 shows up as a non-finite diagonal
    Cholesky block. That block is computed from the all_gather'd (hence
    REPLICATED) diagonal, so every device sees the same failure flag: the
    panel loop skips all remaining work via ``lax.cond`` (branch choice is
    replicated, so the collectives stay aligned), a device-side while_loop
    multiplies ``s`` tenfold and restarts on the zeroed buffer. A failed
    attempt therefore costs only the panels up to first failure and no host
    round trip - the previous host-side ladder re-dispatched the whole
    O(n^3) executable per rung (round-2's measured N>=20k runs paid ~2x for
    exactly this). Non-finite entries confined to one device's off-diagonal
    rows reach a later (replicated) pivot block within a few panels, so
    detection is at most a few panels late, never missed. The
    finite-but-WRONG factor class (round-1 backend miscompile) is invisible
    to finiteness checks by construction; the host-side sampled-row probe
    ladder still guards that.
    """
    from ..ops.linalg import _cholesky_rec, _tri_inverse_rec

    nbl = nb // P_
    n_pad = nb * B
    dim = Xcols.shape[1]
    p = lax.axis_index(axis)
    g_idx = jnp.arange(nbl) * P_ + p
    row_global = (g_idx[:, None] * B + jnp.arange(B)[None, :]).reshape(-1)
    Xr = Xrow.reshape(nbl * B, dim)
    leaf = min(B, 128)
    Wb = _chunk_blocks(nb, chunk_cols, B)
    Wc = Wb * B
    hi = jax.lax.Precision.HIGHEST

    # row operators and their (static-layout) row masks, as in the two-pass
    # assembly kernel
    row_ops = []
    for _, _, op in segs:
        if op not in row_ops:
            row_ops.append(op)
    row_masks = {}
    for op in row_ops:
        m = jnp.zeros(row_global.shape, bool)
        for start, size, o in segs:
            if o == op:
                m = m | ((row_global >= start) & (row_global < start + size))
        row_masks[op] = m

    sig_table_np, sigs = _col_signatures(segs, nb, B, n)
    sig_table = jnp.asarray(sig_table_np)

    def make_branch(sig):
        def branch(Xc):
            pieces = []
            for cop, lo, hi_ in sig:
                w = hi_ - lo
                if cop is None:
                    pieces.append(jnp.zeros((nbl * B, w), Xr.dtype))
                    continue
                Xc_sub = lax.slice_in_dim(Xc, lo, hi_, axis=0)
                piece = jnp.zeros((nbl * B, w), Xr.dtype)
                for rop in row_ops:
                    K = _pair_impl(kernel, rop, cop)(Xr, Xc_sub)
                    piece = jnp.where(row_masks[rop][:, None], K, piece)
                pieces.append(piece)
            return pieces[0] if len(pieces) == 1 else jnp.concatenate(
                pieces, axis=1
            )

        return branch

    branches = tuple(make_branch(sig) for sig in sigs)
    one = jnp.asarray(1.0, Xr.dtype)

    def factor_once(local, winvs, d_isqrt_pad):
        dr = d_isqrt_pad[row_global]

        def do_panel(k, local, winvs):
            kB = k * B
            owner = k % P_
            slot = k // P_

            # assemble my rows of (equilibrated, regularized) block-column k
            Xc = lax.dynamic_slice(Xcols, (kB, 0), (B, dim))
            acc = lax.switch(sig_table[k], branches, Xc)
            dc = lax.dynamic_slice(d_isqrt_pad, (kB,), (B,))
            acc = acc * (dr[:, None] * dc[None, :])
            on_diag = (kB + jnp.arange(B))[None, :] == row_global[:, None]
            Acol = jnp.where(on_diag, one, acc)  # (nbl*B, B)

            # left-looking update: Acol -= L[:, :kB] @ row_k[:, :kB]^T.
            # The owner's block-row k is final on columns < kB and zero
            # beyond, so the chunk loop can overrun kB and contract zeros.
            cand_row = lax.dynamic_index_in_dim(local, slot, 0, keepdims=False)
            rowk = lax.all_gather(cand_row, axis)[owner]  # (B, n_pad)

            def chunk_body(c, Acol):
                start = c * Wc
                Lc = lax.dynamic_slice(
                    local, (0, 0, start), (nbl, B, Wc)
                ).reshape(nbl * B, Wc)
                Rc = lax.dynamic_slice(rowk, (0, start), (B, Wc))
                return Acol - jnp.matmul(Lc, Rc.T, precision=hi)

            nch = (kB + Wc - 1) // Wc
            Acol = lax.fori_loop(0, nch, chunk_body, Acol)
            Acol3 = Acol.reshape(nbl, B, B)

            # factor the diagonal block (owner's slot, shared to everyone)
            diag_cand = lax.dynamic_index_in_dim(Acol3, slot, 0, keepdims=False)
            A_kk = lax.all_gather(diag_cand, axis)[owner]
            L_kk = _cholesky_rec(A_kk, leaf)
            # REPLICATED failure signal (same A_kk everywhere)
            fin = jnp.all(jnp.isfinite(L_kk))
            W_kk = _tri_inverse_rec(L_kk, leaf)
            E = jnp.eye(B, dtype=local.dtype) - jnp.matmul(
                W_kk, L_kk, precision=hi
            )
            W_kk = W_kk + jnp.matmul(E, W_kk, precision=hi)
            winvs = lax.dynamic_update_slice(winvs, W_kk[None], (k, 0, 0))

            # panel solve L_ik = A_ik W_kk^T for my below-diagonal rows
            Lcol = jnp.einsum("sbc,dc->sbd", Acol3, W_kk,
                              preferred_element_type=local.dtype, precision=hi)
            below = (g_idx > k)[:, None, None]
            diag_here = (g_idx == k)[:, None, None]
            new_colk = jnp.where(
                below, Lcol,
                jnp.where(
                    diag_here, jnp.broadcast_to(L_kk, Lcol.shape),
                    jnp.zeros_like(Lcol),
                ),
            )
            local = lax.dynamic_update_slice(local, new_colk, (0, 0, kB))
            return local, winvs, fin

        def body(k, carry):
            local, winvs, ok = carry
            # replicated predicate: all devices take the same branch, so the
            # collectives inside do_panel stay aligned; after a failure the
            # remaining panels each cost one skipped cond
            local, winvs, fin = lax.cond(
                ok,
                lambda args: do_panel(k, args[0], args[1]),
                lambda args: (args[0], args[1], jnp.asarray(True)),
                (local, winvs),
            )
            return local, winvs, ok & fin

        winvs = jnp.zeros((nb, B, B), local.dtype)
        local, winvs, ok = lax.fori_loop(
            0, nb, body, (local, winvs, jnp.asarray(True))
        )
        return local, winvs, ok

    def attempt_cond(carry):
        local, winvs, d_pad, s, att, ok = carry
        return (~ok) & (att < max_attempts)

    def attempt_body(carry):
        local, winvs, d_pad, s, att, ok = carry
        d_pad = jax.lax.rsqrt(diag_const_pad + s * nug_share_pad)
        local = jnp.zeros_like(local)
        local, winvs, ok = factor_once(local, winvs, d_pad)
        s_next = jnp.where(ok, s, s * 10.0)
        return local, winvs, d_pad, s_next, att + 1, ok

    d_pad0 = jax.lax.rsqrt(diag_const_pad + s0 * nug_share_pad)
    init = (
        local, jnp.zeros((nb, B, B), local.dtype), d_pad0,
        jnp.asarray(s0, local.dtype), jnp.asarray(0), jnp.asarray(False),
    )
    local, winvs, d_pad, s, att, ok = lax.while_loop(
        attempt_cond, attempt_body, init
    )
    # s was advanced past the used value only on failure; on success it is
    # the scale the accepted factor used
    return local, winvs, d_pad, s, ok


@partial(jax.jit, static_argnums=(1, 2, 5, 6, 7, 8, 9, 10), donate_argnums=(0,))
def _fused_arranged(
    out,
    kernel,
    observables,
    points,
    nugget_scale,
    nugget_type: str,
    nugget: float,
    mesh: Mesh,
    axis: str,
    block: int,
    chunk_cols: int = 4096,
):
    """One executable: equilibration constants + fused assemble/factorize
    with in-executable nugget escalation.

    Mirrors the preamble of ``gram._assemble_arranged`` (same trace-adaptive
    nugget rule, same block-cyclic row-coordinate arrangement), then runs
    the left-looking kernel. ``nugget_scale`` is the traced escalation
    STARTING scale. Returns ``(factor shards, diag inverses, d_isqrt, s,
    ok)`` with ``s`` the scale the accepted factor actually used.
    """
    from .gram import _equilibration_parts

    segs_pts = _segments(observables, points)
    X_all = jnp.concatenate(
        [jnp.asarray(points[o.points]) for o in observables], axis=0
    )
    n, dim = X_all.shape
    dtype = X_all.dtype
    c_vec, nug_vec = _equilibration_parts(
        kernel, segs_pts, nugget_type, nugget, dtype
    )

    P_ = mesh.shape[axis]
    n_pad = pad_to_blocks(n, block, P_)
    nb = n_pad // block
    pad = n_pad - n
    # padded identity tail: constant 1, no nugget -> d = 1 exactly
    c_pad = jnp.concatenate([c_vec, jnp.ones(pad, dtype)])
    nug_pad = jnp.concatenate([nug_vec, jnp.zeros(pad, dtype)])
    X_pad = jnp.pad(X_all, ((0, pad), (0, 0)), mode="edge")
    perm = _block_perm(nb, P_)
    Xrow = X_pad.reshape(nb, block, dim)[perm]
    Xrow = jax.lax.with_sharding_constraint(
        Xrow, NamedSharding(mesh, P(axis, None, None))
    )

    fn = shard_map(
        partial(
            _fused_chol_kernel,
            kernel=kernel, segs=segs_pts, nb=nb, B=block, P_=P_,
            axis=axis, n=n, chunk_cols=chunk_cols,
        ),
        mesh=mesh,
        in_specs=(
            P(axis, None, None), P(axis, None, None), P(None, None),
            P(None), P(None), P(),
        ),
        out_specs=(
            P(axis, None, None), P(None, None, None), P(None), P(), P(),
        ),
        check_vma=False,
    )
    local, winvs, d_pad, s, ok = fn(
        out, Xrow, X_pad, c_pad, nug_pad, jnp.asarray(nugget_scale, dtype)
    )
    return local, winvs, d_pad[:n], s, ok


def assemble_factor_fused(
    kernel,
    observables: Tuple,
    points,
    mesh: Mesh,
    axis: str = "p",
    block: int = 256,
    nugget: float = 1e-10,
    nugget_type: str = "adaptive",
    nugget_scale=1.0,
    chunk_cols: int = 4096,
):
    """Factor the (never-materialized) equilibrated regularized Gram matrix.

    Returns ``(BlockCyclicFactor, d_isqrt, s, ok)`` - drop-in for the
    ``assemble_gram_sharded`` + ``cholesky`` pair, at half the kernel
    evaluations, half the update MACs, and one executable launch. ``s``/
    ``ok`` are DEVICE scalars: the nugget-escalation scale the in-executable
    ladder settled on starting from ``nugget_scale``, and whether the factor
    is finite (fetch them together with other results - no sync here).
    """
    pts = {k: jnp.asarray(v) for k, v in points.items()}
    observables = tuple(observables)
    n = sum(int(pts[o.points].shape[0]) for o in observables)
    dtype = jnp.result_type(*(pts[o.points] for o in observables))
    P_ = mesh.shape[axis]
    n_pad = pad_to_blocks(n, block, P_)
    nb = n_pad // block
    sharding = NamedSharding(mesh, P(axis, None, None))
    out = jax.jit(
        lambda: jnp.zeros((nb, block, n_pad), dtype), out_shardings=sharding
    )()
    local, winvs, d_isqrt, s, ok = _fused_arranged(
        out, kernel, observables, pts, jnp.asarray(nugget_scale),
        nugget_type, nugget, mesh, axis, block, chunk_cols,
    )
    fac = BlockCyclicFactor(
        local=local, mesh=mesh, axis=axis, block=block,
        n=n, n_pad=n_pad, diag_inv=winvs,
    )
    return fac, d_isqrt, s, ok


# --------------------------------------------------------------------------
# sampled-row factor-quality probe
# --------------------------------------------------------------------------


@partial(jax.jit, static_argnums=(0, 1, 3))
def _sampled_rows_matvec(kernel, observables, points, row_layout, d_isqrt, v):
    """``y_S = A~[S, :] v`` for the statically-chosen sample rows - the rows
    are re-assembled here via ``cross_gram`` strips (independent of the
    factorization), so agreement with ``L(L^T v)`` checks the factor against
    ground truth. ``row_layout`` = tuple of (op, points key, segment row
    offset, local indices tuple) per segment."""
    n = d_isqrt.shape[0]
    vn = v[:n] * d_isqrt
    parts = []
    for (op, pts_key, off, idx) in row_layout:
        X_rows = jnp.asarray(points[pts_key])[jnp.asarray(idx)]
        strip = cross_gram(kernel, op, X_rows, observables, points)
        y = jnp.matmul(strip, vn, precision=jax.lax.Precision.HIGHEST)
        rows = off + jnp.asarray(idx)
        d_r = d_isqrt[rows]
        y = y * d_r
        # the assembled matrix has an exact unit diagonal (nugget folded into
        # d): correct the sampled rows' diagonal term theta(x,x)*d^2 -> 1
        c = kernel.pair_fn(op, op)(X_rows[:1], X_rows[:1])[0, 0]
        y = y + v[rows] * (1.0 - d_r * d_r * c)
        parts.append((rows, y))
    rows = jnp.concatenate([r for r, _ in parts])
    ys = jnp.concatenate([y for _, y in parts])
    return rows, ys


def sampled_row_quality(
    fac: BlockCyclicFactor,
    kernel,
    observables,
    points,
    d_isqrt,
    rows_per_segment: int = 32,
) -> jnp.ndarray:
    """Relative residual ``max|(L L^T v - A~ v)[S]| / max|A~ v[S]|`` on a
    fixed probe vector over statically-sampled rows S (``rows_per_segment``
    evenly spaced rows from every observable segment, so every operator
    block is covered). Returns a device scalar - callers fetch it together
    with their other results."""
    from .cholesky import matvec_blockcyclic

    pts = {k: jnp.asarray(v) for k, v in points.items()}
    observables = tuple(observables)
    segs = _segments(observables, pts)
    layout = []
    for o, (off, size, op) in zip(observables, segs):
        take = min(rows_per_segment, size)
        idx = tuple(np.linspace(0, size - 1, take).astype(int).tolist())
        layout.append((op, o.points, off, idx))
    n_pad = fac.n_pad
    v = jnp.asarray(
        np.random.default_rng(0).standard_normal(n_pad), fac.local.dtype
    )
    rows, y = _sampled_rows_matvec(
        kernel, observables, pts, tuple(layout), d_isqrt, v
    )
    w = matvec_blockcyclic(
        fac.local, fac.mesh, fac.axis, fac.block,
        matvec_blockcyclic(fac.local, fac.mesh, fac.axis, fac.block, v,
                           trans=True, n=n_pad),
        n=n_pad,
    )
    w_s = w[rows]
    return jnp.max(jnp.abs(w_s - y)) / jnp.max(jnp.abs(y))
