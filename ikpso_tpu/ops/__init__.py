"""Compute ops: rotations, FK, fitness, collision, Pallas kernels.

NOTE: the submodule names ``fk`` and ``fitness`` collide with their main
function names; the package namespace keeps the SUBMODULES (so
``from ikpso_tpu.ops import fk as fk_ops`` works). Import the functions
from the submodules directly: ``from ikpso_tpu.ops.fk import fk``.
"""

from ikpso_tpu.ops import collision, fitness, fk, gjk, pallas_fitness, rotations
from ikpso_tpu.ops.collision import chain_collides, obb_obb_intersect
from ikpso_tpu.ops.gjk import chain_collides_gjk, gjk_box_box, gjk_intersect
from ikpso_tpu.ops.fitness import COLLISION_PENALTY, FitnessConfig, true_effector_error
from ikpso_tpu.ops.fk import (
    angles_to_pose,
    effector_positions,
    fk_points,
    fk_serial_scan,
    pose_to_angles,
)
from ikpso_tpu.ops.pallas_fitness import fused_fitness, make_pallas_fitness

__all__ = [
    "collision",
    "fitness",
    "fk",
    "gjk",
    "chain_collides_gjk",
    "gjk_box_box",
    "gjk_intersect",
    "pallas_fitness",
    "rotations",
    "chain_collides",
    "obb_obb_intersect",
    "COLLISION_PENALTY",
    "FitnessConfig",
    "true_effector_error",
    "angles_to_pose",
    "effector_positions",
    "fk_points",
    "fk_serial_scan",
    "pose_to_angles",
    "fused_fitness",
    "make_pallas_fitness",
]
