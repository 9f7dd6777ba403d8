"""Device-mesh construction.

The reference is strictly single-process / single-device (SURVEY.md section 2,
parallelism inventory: no collectives of any kind). This module is the entry
point of the TPU build's scale-out story: a 1-D ``jax.sharding.Mesh``
over ICI (and DCN across hosts via ``jax.distributed.initialize``), consumed
by the sharded Gram assembler and the distributed dense factorizations.

Why 1-D (and not a ScaLAPACK-style 2-D process grid): the panel algorithms'
communication is one panel broadcast per step - ``O(n B)`` bytes - for a
total of ``4 n_pad^2`` bytes received per device over a whole factorization.
At the north-star N=100k elliptic (n_pad ~ 213k) that is ~180 GB, i.e. ~1-2 s
at ICI all-gather bandwidth (~100-200 GB/s per chip), against ~20 s of
per-device O(n^3/3P) compute at P=16 - communication stays sub-dominant
(<10%) through P~64. A 2-D layout would cut per-device traffic to
O(n^2/sqrt(P)) and matters only at much larger P than any BASELINE.json
target; the measured tradeoff is recorded in PERF.md ("1-D vs 2-D layout").
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh


def device_count() -> int:
    return len(jax.devices())


def make_mesh(n_devices: Optional[int] = None, axis_name: str = "p") -> Mesh:
    """Build the 1-D mesh over the first ``n_devices`` devices.

    Axis ``'p'`` is the block-cyclic panel axis consumed by every
    distributed algorithm in :mod:`.cholesky` / :mod:`.gram`.
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
    return Mesh(np.asarray(devs[:n_devices]), (axis_name,))


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
