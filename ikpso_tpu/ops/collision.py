"""Oriented-box collision tests (branch-free, TPU-friendly).

The reference rejects colliding poses with an iterative support-point
GJK (reference GJKIntersection.cuh / kernel.cu:443-1099, up to 50
iterations with a divergent branch tree per simplex case). For
box-box — the only shape pair the reference ever tests — the
separating-axis theorem (SAT) is **exact** and closed-form: 15 axis
tests, all elementwise arithmetic, no loops, no branches. That is the
TPU-native replacement (SURVEY.md §7 "hard parts"); a masked
fixed-iteration GJK is unnecessary.

All functions broadcast over arbitrary leading batch dimensions, so
one call tests (particles x nodes x colliders) pairs.
"""

from __future__ import annotations

import jax.numpy as jnp

# Fattening epsilon on the |C| matrix — standard SAT robustness guard
# against near-parallel edge pairs (Gottschalk's OBBTree trick). The
# reference's GJK uses FLT_EPSILON on squared magnitudes instead
# (reference GJKIntersection.cuh COL_EPS).
_SAT_EPS = 1e-6


def obb_obb_intersect(
    center_a: jnp.ndarray,
    half_a: jnp.ndarray,
    rot_a: jnp.ndarray,
    center_b: jnp.ndarray,
    half_b: jnp.ndarray,
    rot_b: jnp.ndarray,
) -> jnp.ndarray:
    """Boolean intersection test between oriented boxes A and B.

    Args:
      center_*: ``(..., 3)`` box centers (world).
      half_*: ``(..., 3)`` half extents along the box's local axes.
      rot_*: ``(..., 3, 3)`` world rotation (columns = local axes).

    Returns:
      ``(...,)`` bool — True where the boxes overlap.
    """
    # Everything in A's frame: C = Ra^T Rb, T = Ra^T (pb - pa).
    c = jnp.einsum("...ji,...jk->...ik", rot_a, rot_b, precision="highest")
    t = jnp.einsum("...ji,...j->...i", rot_a, center_b - center_a, precision="highest")
    abs_c = jnp.abs(c) + _SAT_EPS

    a0, a1, a2 = half_a[..., 0], half_a[..., 1], half_a[..., 2]
    b0, b1, b2 = half_b[..., 0], half_b[..., 1], half_b[..., 2]
    a = (a0, a1, a2)
    b = (b0, b1, b2)

    separated = jnp.zeros(t.shape[:-1], dtype=bool)

    # 3 face axes of A: |T_i| > a_i + sum_j b_j |C_ij|
    for i in range(3):
        ra = a[i]
        rb = (
            b0 * abs_c[..., i, 0]
            + b1 * abs_c[..., i, 1]
            + b2 * abs_c[..., i, 2]
        )
        separated |= jnp.abs(t[..., i]) > ra + rb

    # 3 face axes of B: |T . C_:j| > sum_i a_i |C_ij| + b_j
    for j in range(3):
        ra = (
            a0 * abs_c[..., 0, j]
            + a1 * abs_c[..., 1, j]
            + a2 * abs_c[..., 2, j]
        )
        rb = b[j]
        proj = (
            t[..., 0] * c[..., 0, j]
            + t[..., 1] * c[..., 1, j]
            + t[..., 2] * c[..., 2, j]
        )
        separated |= jnp.abs(proj) > ra + rb

    # 9 edge-cross axes A_i x B_j.
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            ra = a[i1] * abs_c[..., i2, j] + a[i2] * abs_c[..., i1, j]
            rb = b[j1] * abs_c[..., i, j2] + b[j2] * abs_c[..., i, j1]
            lhs = jnp.abs(
                t[..., i2] * c[..., i1, j] - t[..., i1] * c[..., i2, j]
            )
            separated |= lhs > ra + rb

    return ~separated


def chain_collides(
    positions: jnp.ndarray,
    rotations: jnp.ndarray,
    parent_positions: jnp.ndarray,
    lengths: jnp.ndarray,
    obstacle_center: jnp.ndarray,
    obstacle_half: jnp.ndarray,
    obstacle_rot: jnp.ndarray,
    gizmo_size: float = 0.2,
) -> jnp.ndarray:
    """Does any joint gizmo or link box hit any scene obstacle?

    Mirrors the reference collider construction
    (reference kernel.cu:104-136): per non-root node, a cube of full
    size ``gizmo_size`` at the node position and a
    ``length x (gizmo_size/4)^2`` box at the link midpoint, both
    oriented by the node's world rotation; any overlap with any scene
    box rejects the pose.

    Args:
      positions: ``(..., K, 3)`` node world positions (non-root nodes).
      rotations: ``(..., K, 3, 3)`` node world rotations.
      parent_positions: ``(..., K, 3)`` world positions of each node's
        parent.
      lengths: ``(K,)`` link lengths.
      obstacle_*: ``(C, 3)`` / ``(C, 3)`` half extents / ``(C, 3, 3)``.

    Returns:
      ``(...,)`` bool — True where the pose must be rejected.
    """
    if obstacle_center.shape[0] == 0:
        return jnp.zeros(positions.shape[:-2], dtype=bool)

    # Broadcast (..., K, 1, *) against (C, *) -> (..., K, C).
    node_center = positions[..., :, None, :]
    node_rot = rotations[..., :, None, :, :]
    node_half = jnp.full((3,), gizmo_size * 0.5, dtype=positions.dtype)

    link_center = ((positions + parent_positions) * 0.5)[..., :, None, :]
    link_half = jnp.stack(
        [
            lengths * 0.5,
            jnp.full_like(lengths, gizmo_size * 0.25 * 0.5),
            jnp.full_like(lengths, gizmo_size * 0.25 * 0.5),
        ],
        axis=-1,
    )[..., :, None, :]

    node_hit = obb_obb_intersect(
        node_center, node_half, node_rot,
        obstacle_center, obstacle_half, obstacle_rot,
    )
    link_hit = obb_obb_intersect(
        link_center, link_half, node_rot,
        obstacle_center, obstacle_half, obstacle_rot,
    )
    return jnp.any(node_hit | link_hit, axis=(-2, -1))
