"""Multi-host runtime: initialization and trajectory-sweep sharding.

The reference has no distributed backend at all (single process,
single GPU — SURVEY.md §5 "communication backend" row). The TPU
framework scales across hosts with ``jax.distributed``: every process
runs the same program, the global mesh spans all hosts' devices, and
waypoint (swarm) shards ride DCN across hosts / ICI within a slice.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op if single-process).

    On Cloud TPU pods the arguments are auto-detected from the
    environment; pass them explicitly elsewhere.
    """
    if num_processes is not None and num_processes <= 1:
        return
    if coordinator_address is None and "JAX_COORDINATOR_ADDRESS" not in os.environ:
        if jax.process_count() == 1 and num_processes is None:
            return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def process_waypoint_slice(num_waypoints: int) -> slice:
    """Which contiguous waypoint block this process owns.

    The host-level decomposition of a trajectory sweep: waypoints are
    split evenly across processes; each process builds only its local
    targets (data never leaves the host it is needed on).
    """
    p = jax.process_count()
    i = jax.process_index()
    per = -(-num_waypoints // p)
    return slice(i * per, min((i + 1) * per, num_waypoints))


def pad_to_multiple(x: np.ndarray, multiple: int, axis: int = 0) -> np.ndarray:
    """Pad a waypoint batch so its swarm axis divides the mesh evenly
    (static shapes per jit trace; SURVEY.md §7 'hard parts')."""
    n = x.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return x
    pad = [(0, 0)] * x.ndim
    pad[axis] = (0, rem)
    return np.pad(x, pad, mode="edge")
