from .sampling import sample_random, sample_grid, test_grid
from .metrics import ErrorStats, PhaseTimers, error_stats
from .checkpoint import (
    save_solver_state,
    load_solver_state,
    save_distributed_state,
    load_distributed_state,
)
from .profiling import flop_model, tflops

__all__ = [
    "sample_random",
    "sample_grid",
    "test_grid",
    "ErrorStats",
    "PhaseTimers",
    "error_stats",
    "save_solver_state",
    "save_distributed_state",
    "load_distributed_state",
    "load_solver_state",
    "flop_model",
    "tflops",
]
