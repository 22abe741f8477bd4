"""Compute ops: rotations, FK, fitness, collision, Pallas kernels."""

from ikpso_tpu.ops.collision import chain_collides, obb_obb_intersect
from ikpso_tpu.ops.fitness import COLLISION_PENALTY, FitnessConfig, fitness, true_effector_error
from ikpso_tpu.ops.fk import (
    angles_to_pose,
    effector_positions,
    fk,
    fk_points,
    fk_serial_scan,
    pose_to_angles,
)
from ikpso_tpu.ops.pallas_fitness import fused_fitness, make_pallas_fitness
