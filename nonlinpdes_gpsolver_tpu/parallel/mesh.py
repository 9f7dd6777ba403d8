"""Device-mesh construction.

The reference is strictly single-process / single-device (SURVEY.md section 2,
parallelism inventory: no collectives of any kind). This module is the entry
point of the TPU build's scale-out story: a 1-D (or 2-D) ``jax.sharding.Mesh``
over ICI (and DCN across hosts via ``jax.distributed.initialize``), consumed
by the sharded Gram assembler and the distributed dense factorizations.
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Tuple[str, ...] = ("p",),
    shape: Optional[Sequence[int]] = None,
) -> Mesh:
    """Build a mesh over the first ``n_devices`` devices.

    1-D by default (axis ``'p'`` - the block-cyclic panel axis of the dense
    factorizations). Pass ``shape`` + two axis names for a 2-D mesh.
    """
    devs = jax.devices()
    if n_devices is None:
        n_devices = len(devs)
    if n_devices > len(devs):
        raise ValueError(
            f"requested a {n_devices}-device mesh but only {len(devs)} "
            f"devices are visible (platform {jax.default_backend()!r}; on "
            "CPU set XLA_FLAGS=--xla_force_host_platform_device_count=N)"
        )
    devs = devs[:n_devices]
    if shape is None:
        shape = (n_devices,)
    if int(np.prod(shape)) != n_devices:
        raise ValueError(f"mesh shape {shape} != {n_devices} devices")
    if len(shape) != len(axis_names):
        raise ValueError("shape and axis_names length mismatch")
    return Mesh(np.asarray(devs).reshape(shape), axis_names)


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Multi-host bring-up; returns whether the distributed runtime started.

    Three modes (README "Multi-host launch"):

    * explicit ``num_processes > 1``: pass coordinator/process identity
      through to ``jax.distributed.initialize`` (generic clusters);
    * all arguments ``None`` *on a Cloud TPU environment*
      (``TPU_WORKER_ID`` set): bare ``jax.distributed.initialize()`` -
      JAX auto-detects the coordinator from TPU metadata;
    * otherwise (single process, the tunnel, CPU testing): no-op.

    Call before any device use; each host then builds the same global
    :func:`make_mesh`.
    """
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
        return True
    if (
        num_processes is None
        and coordinator_address is None
        and process_id is None
        and os.environ.get("TPU_WORKER_ID") is not None
    ):
        jax.distributed.initialize()
        return True
    return False
