"""Checkpoint / resume for factorizations and Gauss-Newton state.

The reference has no persistence at all (SURVEY.md section 5; one
commented-out ``np.savez`` in a notebook). At 100k collocation points the
Cholesky factor is the expensive artifact - hours of compute on a small
mesh - so it must be reusable across processes. Plain ``.npz`` keeps the
format dependency-free and inspectable; factors, nugget escalations, the
latent iterate, and the loss history round-trip.
"""

from __future__ import annotations

import json
from pathlib import Path
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..models.spec import CollocationProblem
from ..solvers.gn import FactoredProblem, GNState


def save_solver_state(
    path,
    fp: FactoredProblem,
    state: Optional[GNState] = None,
) -> None:
    path = Path(path)
    payload = {}
    meta = {
        "problem": fp.problem.name,
        "blocks": [b.name for b in fp.problem.blocks],
        "nugget_scales": fp.nugget_scales,
        "has_inverse": sorted(fp.inv_factors.keys()),
        "has_col_scales": sorted(fp.col_scales.keys()),
        "has_state": state is not None,
    }
    for name, L in fp.factors.items():
        payload[f"factor__{name}"] = np.asarray(L)
    for name, Li in fp.inv_factors.items():
        payload[f"inv_factor__{name}"] = np.asarray(Li)
    for name, cs in fp.col_scales.items():
        payload[f"col_scale__{name}"] = np.asarray(cs)
    if state is not None:
        payload["z"] = np.asarray(state.z)
        payload["losses"] = np.asarray(state.losses)
        payload["converged_finite"] = np.asarray(state.converged_finite)
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **payload)


def save_distributed_state(
    path,
    dfp,
    state: Optional[GNState] = None,
) -> None:
    """Persist a :class:`..solvers.distributed.DistributedFactoredProblem`.

    The expensive artifact at scale is the distributed Cholesky factor
    (hours of compute at 100k points); its block-cyclic layout
    ``(nb, B, n_pad)`` is saved verbatim along with the mesh size it was
    laid out for, so reloading onto the same-size mesh is a single
    ``device_put`` per block - no dense round-trip. Loading onto a
    different mesh size goes through a host-side re-layout (documented in
    :func:`load_distributed_state`).
    """
    path = Path(path)
    payload = {}
    meta = {
        "problem": dfp.problem.name,
        "blocks": [],
        "nugget_scales": {k: float(v) for k, v in dfp.nugget_scales.items()},
        "has_col_scales": sorted(dfp.col_scales.keys()),
        "has_state": state is not None,
        "kind": "distributed",
    }
    for name, fac in dfp.factors.items():
        meta["blocks"].append(
            {
                "name": name,
                "block": fac.block,
                "n": fac.n,
                "n_pad": fac.n_pad,
                "axis": fac.axis,
                "mesh_size": int(fac.mesh.shape[fac.axis]),
            }
        )
        payload[f"factor_local__{name}"] = np.asarray(jax.device_get(fac.local))
    for name, cs in dfp.col_scales.items():
        payload[f"col_scale__{name}"] = np.asarray(cs)
    if state is not None:
        payload["z"] = np.asarray(state.z)
        payload["losses"] = np.asarray(state.losses)
        payload["converged_finite"] = np.asarray(state.converged_finite)
    payload["meta_json"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8
    )
    np.savez_compressed(path, **payload)


def load_distributed_state(path, problem: CollocationProblem, mesh, axis="p"):
    """Rebuild a ``DistributedFactoredProblem`` from a checkpoint.

    Same mesh size as at save time: each block's factor is re-sharded by one
    ``device_put`` of the stored block-cyclic layout. Different mesh size:
    the factor is re-interleaved on host (natural row order is
    P-independent; only the slot permutation changes) before sharding -
    O(n_pad^2) host memory for the duration of the load.
    """
    from jax.sharding import NamedSharding, PartitionSpec
    from ..parallel.cholesky import BlockCyclicFactor, _block_perm
    from ..solvers.distributed import DistributedFactoredProblem

    P_new = int(mesh.shape[axis])
    with np.load(Path(path)) as data:
        meta = json.loads(bytes(data["meta_json"]).decode())
        if meta.get("kind") != "distributed":
            raise ValueError("not a distributed checkpoint")
        if meta["problem"] != problem.name:
            raise ValueError(
                f"checkpoint is for problem {meta['problem']!r}, "
                f"got {problem.name!r}"
            )
        factors = {}
        col_scales = {}
        by_name = {bm["name"]: bm for bm in meta["blocks"]}
        for b in problem.blocks:
            bm = by_name.get(b.name)
            if bm is None:
                raise ValueError(f"checkpoint missing block {b.name!r}")
            n_expected = sum(
                problem.points[o.points].shape[0] for o in b.observables
            )
            if bm["n"] != n_expected:
                raise ValueError(
                    f"block {b.name!r}: factor size {bm['n']} != problem "
                    f"size {n_expected} (points changed?)"
                )
            local = data[f"factor_local__{b.name}"]
            nb = bm["n_pad"] // bm["block"]
            if bm["mesh_size"] != P_new:
                if nb % P_new:
                    raise ValueError(
                        f"block {b.name!r}: {nb} block rows not divisible "
                        f"by new mesh size {P_new}"
                    )
                # saved layout -> natural block order -> new layout
                natural = local[np.argsort(_block_perm(nb, bm["mesh_size"]))]
                local = natural[_block_perm(nb, P_new)]
            sharding = NamedSharding(mesh, PartitionSpec(axis, None, None))
            factors[b.name] = BlockCyclicFactor(
                local=jax.device_put(local, sharding),
                mesh=mesh, axis=axis, block=bm["block"],
                n=bm["n"], n_pad=bm["n_pad"],
            )
            if b.name in meta.get("has_col_scales", []):
                col_scales[b.name] = jnp.asarray(data[f"col_scale__{b.name}"])
        dfp = DistributedFactoredProblem(
            problem=problem,
            factors=factors,
            col_scales=col_scales,
            nugget_scales={
                k: float(v) for k, v in meta["nugget_scales"].items()
            },
        )
        state = None
        if meta["has_state"]:
            state = GNState(
                z=jnp.asarray(data["z"]),
                losses=jnp.asarray(data["losses"]),
                converged_finite=jnp.asarray(data["converged_finite"]),
            )
    return dfp, state


def load_solver_state(
    path, problem: CollocationProblem
) -> Tuple[FactoredProblem, Optional[GNState]]:
    """Rebuild a :class:`FactoredProblem` for ``problem`` from a checkpoint.

    The caller reconstructs the problem (points/data are cheap); the factors
    are validated against the problem's block names and sizes.
    """
    with np.load(Path(path)) as data:
        meta = json.loads(bytes(data["meta_json"]).decode())
        if meta["problem"] != problem.name:
            raise ValueError(
                f"checkpoint is for problem {meta['problem']!r}, "
                f"got {problem.name!r}"
            )
        factors = {}
        inv_factors = {}
        col_scales = {}
        for b in problem.blocks:
            if b.name not in meta["blocks"]:
                raise ValueError(f"checkpoint missing block {b.name!r}")
            L = jnp.asarray(data[f"factor__{b.name}"])
            n_expected = sum(
                problem.points[o.points].shape[0] for o in b.observables
            )
            if L.shape[0] != n_expected:
                raise ValueError(
                    f"block {b.name!r}: factor size {L.shape[0]} != "
                    f"problem size {n_expected} (points changed?)"
                )
            factors[b.name] = L
            if b.name in meta["has_inverse"]:
                inv_factors[b.name] = jnp.asarray(data[f"inv_factor__{b.name}"])
            if b.name in meta.get("has_col_scales", []):
                col_scales[b.name] = jnp.asarray(data[f"col_scale__{b.name}"])
        fp = FactoredProblem(
            problem=problem,
            factors=factors,
            inv_factors=inv_factors,
            nugget_scales={k: float(v) for k, v in meta["nugget_scales"].items()},
            col_scales=col_scales,
        )
        state = None
        if meta["has_state"]:
            state = GNState(
                z=jnp.asarray(data["z"]),
                losses=jnp.asarray(data["losses"]),
                converged_finite=jnp.asarray(data["converged_finite"]),
            )
    return fp, state
