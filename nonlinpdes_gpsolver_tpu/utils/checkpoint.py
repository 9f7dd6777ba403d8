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
