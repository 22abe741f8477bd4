"""Checkpoint / resume for trajectory sweeps.

The reference has no persistence at all — its only carried state is
the scene-graph pose doubling as the warm start (SURVEY.md §5). For
long multi-waypoint sweeps we checkpoint (waypoint cursor, solved
angles, final poses, RNG key) as an npz; resume re-``device_put``s and
continues. Solves are stateless, so a partially-written batch is
simply recomputed (retryable by construction).
"""

from __future__ import annotations

import dataclasses
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass
class SweepState:
    """Resumable state of a waypoint sweep."""

    cursor: int  # first unsolved waypoint index
    angles: np.ndarray  # (W, D) solved joint angles (zeros if unsolved)
    errors: np.ndarray  # (W,) final effector errors (inf if unsolved)
    key_data: np.ndarray  # raw RNG key data

    @property
    def key(self):
        return jax.random.wrap_key_data(jnp.asarray(self.key_data))


def fresh_state(num_waypoints: int, dof: int, key) -> SweepState:
    return SweepState(
        cursor=0,
        angles=np.zeros((num_waypoints, dof), np.float32),
        errors=np.full((num_waypoints,), np.inf, np.float32),
        key_data=np.asarray(jax.random.key_data(key)),
    )


def save(path: str, state: SweepState) -> None:
    directory = os.path.dirname(path)
    if directory:
        os.makedirs(directory, exist_ok=True)
    tmp = path + ".tmp"
    np.savez(
        tmp,
        cursor=np.int64(state.cursor),
        angles=state.angles,
        errors=state.errors,
        key_data=state.key_data,
    )
    # np.savez appends .npz to the temp name.
    os.replace(tmp + ".npz" if not tmp.endswith(".npz") else tmp, path)


def load(path: str) -> Optional[SweepState]:
    if not os.path.exists(path):
        return None
    with np.load(path) as data:
        return SweepState(
            cursor=int(data["cursor"]),
            angles=data["angles"],
            errors=data["errors"],
            key_data=data["key_data"],
        )
