"""OBB SAT truth tables: known box pairs with analytic answers."""

import numpy as np
import jax.numpy as jnp

from ikpso_tpu.ops.collision import chain_collides, obb_obb_intersect
from ikpso_tpu.ops.rotations import euler_xyz_to_matrix

EYE = jnp.eye(3, dtype=jnp.float32)


def boxes(ca, ha, cb, hb, ra=None, rb=None):
    return (
        jnp.asarray(ca, jnp.float32),
        jnp.asarray(ha, jnp.float32),
        EYE if ra is None else ra,
        jnp.asarray(cb, jnp.float32),
        jnp.asarray(hb, jnp.float32),
        EYE if rb is None else rb,
    )


def test_identical_boxes_intersect():
    assert bool(obb_obb_intersect(*boxes([0, 0, 0], [1, 1, 1], [0, 0, 0], [1, 1, 1])))


def test_clearly_separated():
    assert not bool(
        obb_obb_intersect(*boxes([0, 0, 0], [1, 1, 1], [5, 0, 0], [1, 1, 1]))
    )


def test_face_touching_axis_aligned():
    # Unit half-extent boxes 2 apart along X: exactly touching faces.
    # With the eps fattening, touching counts as intersecting (matches
    # GJK's closed-set semantics).
    assert bool(obb_obb_intersect(*boxes([0, 0, 0], [1, 1, 1], [2.0 - 1e-4, 0, 0], [1, 1, 1])))
    assert not bool(obb_obb_intersect(*boxes([0, 0, 0], [1, 1, 1], [2.0 + 1e-3, 0, 0], [1, 1, 1])))


def test_rotated_45_degrees_corner_overlap():
    # A 45-degree rotated unit box's corner extends sqrt(2) along X:
    # centers 2.3 apart -> overlap (1 + 1.414 > 2.3); 2.5 apart -> none.
    rb = euler_xyz_to_matrix(jnp.asarray([0.0, 0.0, np.pi / 4], jnp.float32))
    assert bool(
        obb_obb_intersect(*boxes([0, 0, 0], [1, 1, 1], [2.3, 0, 0], [1, 1, 1], rb=rb))
    )
    assert not bool(
        obb_obb_intersect(*boxes([0, 0, 0], [1, 1, 1], [2.5, 0, 0], [1, 1, 1], rb=rb))
    )


def test_edge_cross_axis_separation():
    # Two long thin rods crossed at right angles but offset in Z:
    # only the edge-cross axes separate them.
    ra = EYE
    rb = euler_xyz_to_matrix(jnp.asarray([0.0, 0.0, np.pi / 2], jnp.float32))
    ha = jnp.asarray([2.0, 0.1, 0.1], jnp.float32)
    hb = jnp.asarray([2.0, 0.1, 0.1], jnp.float32)
    near = obb_obb_intersect(
        jnp.zeros(3), ha, ra, jnp.asarray([0.0, 0.0, 0.15], jnp.float32), hb, rb
    )
    far = obb_obb_intersect(
        jnp.zeros(3), ha, ra, jnp.asarray([0.0, 0.0, 0.25], jnp.float32), hb, rb
    )
    assert bool(near)
    assert not bool(far)


def test_containment():
    # Small box fully inside a big one: no separating axis exists.
    assert bool(
        obb_obb_intersect(*boxes([0, 0, 0], [2, 2, 2], [0.3, 0.2, -0.1], [0.1, 0.1, 0.1]))
    )


def test_batched_broadcast(rng):
    # (B,) batch of A boxes vs one B box.
    ca = jnp.asarray(rng.uniform(-3, 3, size=(32, 3)), jnp.float32)
    ha = jnp.full((32, 3), 0.5, jnp.float32)
    ra = jnp.broadcast_to(EYE, (32, 3, 3))
    hit = obb_obb_intersect(
        ca, ha, ra, jnp.zeros(3, jnp.float32), jnp.ones(3, jnp.float32), EYE
    )
    assert hit.shape == (32,)
    expected = np.all(np.abs(np.asarray(ca)) < 1.5 + 1e-5, axis=-1)
    np.testing.assert_array_equal(np.asarray(hit), expected)


def test_chain_collides_link_midpoint():
    # Single link from (0,0,0) to (1,0,0); obstacle over the midpoint
    # but far from both endpoints: only the LINK box should hit.
    positions = jnp.asarray([[1.0, 0.0, 0.0]], jnp.float32)
    rotations = jnp.broadcast_to(EYE, (1, 3, 3))
    parents = jnp.zeros((1, 3), jnp.float32)
    lengths = jnp.asarray([1.0], jnp.float32)
    obstacle_c = jnp.asarray([[0.5, 0.0, 0.0]], jnp.float32)
    obstacle_h = jnp.asarray([[0.05, 0.05, 0.05]], jnp.float32)
    obstacle_r = jnp.broadcast_to(EYE, (1, 3, 3))
    hit = chain_collides(
        positions, rotations, parents, lengths, obstacle_c, obstacle_h, obstacle_r
    )
    assert bool(hit)
    # Same obstacle shifted off-axis in Y beyond gizmo/4: no hit.
    hit2 = chain_collides(
        positions,
        rotations,
        parents,
        lengths,
        jnp.asarray([[0.5, 0.2, 0.0]], jnp.float32),
        obstacle_h,
        obstacle_r,
    )
    assert not bool(hit2)


def test_empty_obstacles_never_hit():
    positions = jnp.zeros((4, 2, 3), jnp.float32)
    rotations = jnp.broadcast_to(EYE, (4, 2, 3, 3))
    hit = chain_collides(
        positions,
        rotations,
        positions,
        jnp.ones((2,), jnp.float32),
        jnp.zeros((0, 3), jnp.float32),
        jnp.zeros((0, 3), jnp.float32),
        jnp.zeros((0, 3, 3), jnp.float32),
    )
    assert hit.shape == (4,)
    assert not bool(hit.any())
