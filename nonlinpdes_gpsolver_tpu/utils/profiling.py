"""Performance accounting: FLOP models + profiler hooks.

The reference has zero timing/profiling (SURVEY.md section 5). Here:

* :func:`flop_model` - analytic FLOP counts for each solve phase (assembly,
  Cholesky, per-GN-iteration), so wall-clock timers convert to TFLOP/s and
  utilization against chip peak;
* :func:`trace` - thin wrapper over ``jax.profiler`` for capturing device
  traces (TensorBoard-compatible) around any phase.
"""

from __future__ import annotations

from contextlib import contextmanager
from typing import Dict

from ..models.spec import CollocationProblem


def flop_model(problem: CollocationProblem, gn_iters: int = 1) -> Dict[str, float]:
    """Approximate FLOPs per phase for a factored GN solve.

    Assembly: ~40 flops per Gram entry (difference, polynomial, exp) summed
    over blocks. Cholesky: n^3/3 per block. GN iteration: Jacobian whitening
    (n^2 m TRSM or matmul) + normal matrix (n m^2) + SPD solve (m^3/3).
    """
    out = {"assembly": 0.0, "cholesky": 0.0, "gn_per_iter": 0.0}
    m = problem.latent_dim
    for b in problem.blocks:
        n = sum(problem.points[o.points].shape[0] for o in b.observables)
        out["assembly"] += 40.0 * n * n
        out["cholesky"] += n**3 / 3.0
        out["gn_per_iter"] += n * n * m + 2.0 * n * m * m
    out["gn_per_iter"] += m**3 / 3.0
    out["gn_total"] = out["gn_per_iter"] * gn_iters
    out["total"] = out["assembly"] + out["cholesky"] + out["gn_total"]
    return out


def tflops(flops: float, seconds: float) -> float:
    return flops / max(seconds, 1e-12) / 1e12


@contextmanager
def trace(log_dir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()
