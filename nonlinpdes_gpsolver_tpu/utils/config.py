"""Config schema shared by the example drivers.

The reference duplicates an argparse block per driver with `type=bool` flags
that are always-true footguns (``main_NonLinElliptic2d.py:44-45`` upstream;
SURVEY.md quirk list). Here: one dataclass, per-problem defaults supplied by
each driver, real boolean flags (``--show-figure/--no-show-figure``), and
explicit platform/precision control (the TPU/x64 decisions the reference
hard-codes at import time).
"""

from __future__ import annotations

import argparse
import dataclasses
from typing import List, Optional


@dataclasses.dataclass
class SolverConfig:
    # kernel
    kernel: str = "gaussian"
    kernel_parameter: List[float] = dataclasses.field(default_factory=lambda: [0.2])
    aniso_convention: str = "lengthscale"  # or "precision" (notebook convention)
    nugget: float = 1e-10
    nugget_type: str = "adaptive"
    # sampling
    sampled_type: str = "random"
    N_domain: int = 900
    N_boundary: int = 124
    seed: int = 0
    # Gauss-Newton
    GNsteps: int = 8
    step_size: float = 1.0
    initial: str = "random"
    method: str = "elimination"  # or "relaxation" (elliptic only)
    pen_lambda: float = 1e-10
    # runtime
    platform: Optional[str] = None  # None = whatever JAX picks (TPU if present)
    # None = auto: f64 on CPU (reference parity), f32 on TPU (native precision;
    # f64 on TPU is software emulation and the Pallas paths are f32-only).
    x64: Optional[bool] = None
    show_figure: bool = False


def add_config_args(parser: argparse.ArgumentParser, defaults: SolverConfig) -> None:
    d = defaults
    parser.add_argument("--kernel", type=str, default=d.kernel,
                        choices=["gaussian", "anisotropic_gaussian"])
    parser.add_argument("--kernel_parameter", type=float, nargs="+",
                        default=d.kernel_parameter)
    parser.add_argument("--aniso_convention", type=str, default=d.aniso_convention,
                        choices=["lengthscale", "precision"])
    parser.add_argument("--nugget", type=float, default=d.nugget)
    parser.add_argument("--nugget_type", type=str, default=d.nugget_type,
                        choices=["adaptive", "identity", "none"])
    parser.add_argument("--sampled_type", type=str, default=d.sampled_type,
                        choices=["random", "grid"])
    parser.add_argument("--N_domain", type=int, default=d.N_domain)
    parser.add_argument("--N_boundary", type=int, default=d.N_boundary)
    parser.add_argument("--seed", type=int, default=d.seed)
    parser.add_argument("--GNsteps", type=int, default=d.GNsteps)
    parser.add_argument("--step_size", type=float, default=d.step_size)
    parser.add_argument("--initial", type=str, default=d.initial,
                        choices=["random", "zero"])
    parser.add_argument("--method", type=str, default=d.method,
                        choices=["elimination", "relaxation"])
    parser.add_argument("--pen_lambda", type=float, default=d.pen_lambda)
    parser.add_argument("--platform", type=str, default=d.platform)
    parser.add_argument("--x64", action=argparse.BooleanOptionalAction, default=d.x64)
    parser.add_argument("--show_figure", action=argparse.BooleanOptionalAction,
                        default=d.show_figure)


def config_from_args(args: argparse.Namespace) -> SolverConfig:
    fields = {f.name for f in dataclasses.fields(SolverConfig)}
    return SolverConfig(**{k: v for k, v in vars(args).items() if k in fields})


def apply_runtime(cfg: SolverConfig) -> None:
    """Set platform/precision before any device use."""
    import jax

    if cfg.platform:
        jax.config.update("jax_platforms", cfg.platform)
    from ..ops.backend import is_accelerator

    x64 = cfg.x64
    if x64 is None:
        # f64 only on CPU (reference parity); any accelerator - including
        # the tunneled single-chip backend - gets native f32 + the
        # precision-controlled linalg paths. One shared rule (ops.backend).
        x64 = not is_accelerator()
    jax.config.update("jax_enable_x64", bool(x64))


def build_kernel(cfg: SolverConfig):
    from ..ops.kernels import SquaredExponential

    if cfg.kernel == "gaussian":
        if len(cfg.kernel_parameter) != 1:
            raise ValueError("gaussian kernel takes one parameter (sigma)")
        return SquaredExponential.gaussian(cfg.kernel_parameter[0])
    return SquaredExponential.anisotropic(cfg.kernel_parameter, cfg.aniso_convention)
