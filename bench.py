#!/usr/bin/env python
"""Headline benchmark: batched 7-DOF IK solves/s/chip to <1mm.

BASELINE.json north star: >=10k simultaneous 7-DOF IK solves to <1mm
end-effector error in <10ms per PSO run on a v5p-16 (8 chips)
== 125,000 solves/s/chip. ``vs_baseline`` is measured solves/s/chip
divided by that target.

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N, ...extras}

Protocol: S reachable targets are sampled by FK of random in-limit
joint angles (guaranteed solvable); one batched PSO solve (warm start
from the canonical pose) must bring the p50 true Euclidean effector
error under 1mm. Wall time is best-of-N of the jitted solve;
solves/s = S / wall.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

BASELINE_SOLVES_PER_S_PER_CHIP = 125_000.0

_T0 = time.time()


def _progress(msg: str) -> None:
    """Stderr breadcrumb with elapsed seconds.

    The official driver runs ``python bench.py`` under a timeout and
    records the tail; round 2's capture died silently at rc=124
    (BENCH_r02.json, parsed null) with no way to tell compile from
    hang. These lines make any future timeout diagnosable from the
    recorded tail alone."""
    print(f"[bench +{time.time() - _T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def _obstacle_scene(spec, n):
    """A deterministic n-box scene scaled to the chain's reach.

    Boxes ring the workspace at 0.55x reach, alternating above/below
    the XY plane, each 15% of reach on a side — close enough that a
    measurable fraction of random in-limit poses collide (so the SAT
    term in the kernel genuinely constrains the solve), far enough
    that most targets keep a collision-free solution. The reference's
    analog is the 4 hardcoded scene boxes of its initColliders
    (reference Main.cpp:537-559, disabled in its shipped config).
    """
    from ikpso_tpu.models.chain import Obstacles

    reach = float(np.abs(np.asarray(spec.length)).sum())
    ang = np.arange(n) * (2.0 * np.pi / max(n, 1)) + 0.4
    r = 0.55 * reach
    centers = np.stack(
        [
            r * np.cos(ang),
            r * np.sin(ang),
            0.3 * reach * np.where(np.arange(n) % 2 == 0, 1.0, -1.0),
        ],
        axis=-1,
    ).astype(np.float32)
    dims = np.full((n, 3), 0.15 * reach, np.float32)
    return Obstacles.from_boxes(jnp.asarray(centers), jnp.asarray(dims))


def _target_p50_under_1mm(spec, problem, key, *, num_particles, iterations,
                          impl, s, inertia_mode, init_mode="warm",
                          retry_init_mode=None,
                          swarms_per_tile=1,
                          retries=0, orientation=False,
                          rekick_interval=0, rekick_scale=1.0,
                          rekick_threshold=-1.0, obstacles=None, polish=0,
                          collision_shape="box", fk_impl="unrolled",
                          kernel_sol=False, retry_iterations=None,
                          retry_bucket=None, chained_runs=0,
                          retry_walk=0, retry_walk_jitter=0.0, walk=0,
                          retry_bucket_decay=1):
    from ikpso_tpu.models.library import batched_problem
    from ikpso_tpu.ops import fk as fk_ops
    from ikpso_tpu.ops.fitness import FitnessConfig
    from ikpso_tpu.pso.config import PSOConfig
    from ikpso_tpu.pso.solver import make_solver
    from ikpso_tpu.utils.profiling import measure

    key_t, key_s = jax.random.split(jax.random.key(0))
    # Reachable targets: FK of random in-limit poses.
    lo = spec.min_rotation[1:].reshape(-1)
    hi = spec.max_rotation[1:].reshape(-1)
    rand_angles = jax.random.uniform(
        key_t, (s, spec.dof), minval=lo, maxval=hi, dtype=jnp.float32
    )
    rand_pose = fk_ops.angles_to_pose(
        spec, jnp.broadcast_to(problem.pose[0], (s, 3)), rand_angles
    )
    targets = fk_ops.fk_points(spec, rand_pose, problem.origin)[
        :, list(spec.effector_idx), :
    ]
    target_rot = None
    if orientation:
        # Orientation targets: the effector WORLD rotations of the same
        # sampled poses (as Euler XYZ), so position+orientation is
        # exactly satisfiable and the solver pays for the full 6-DOF
        # task (BASELINE config 2).
        from ikpso_tpu.ops.rotations import (
            matrix_to_quaternion,
            quaternion_to_euler_xyz,
        )

        world_rot = fk_ops.fk(spec, rand_pose, problem.origin)[1][
            :, list(spec.effector_idx)
        ]
        target_rot = quaternion_to_euler_xyz(matrix_to_quaternion(world_rot))
    batched = batched_problem(problem, targets, target_rot=target_rot)

    # With a scene present, score accuracy only on targets whose
    # GENERATING pose is collision-free (a known collision-free
    # solution exists); blocked targets would put an error floor under
    # the percentiles that says nothing about the solver.
    feasible = None
    if obstacles is not None and obstacles.count:
        from ikpso_tpu.ops.collision import get_chain_collider

        chain_collides = get_chain_collider("sat", collision_shape)
        pos, rot = fk_ops.fk(spec, rand_pose, problem.origin)
        parent_pos = pos[..., list(spec.parent[1:]), :]
        # Chunked: the box-SAT einsum's tiny minor dims pad ~50x on
        # TPU (measured 5.9 GB of HLO temp at S=1M — OOM), so the
        # scoring-only feasibility pass runs in fixed-size slices.
        hit_fn = jax.jit(
            lambda p, r, pp: chain_collides(
                p, r, pp, spec.length[1:], obstacles.center,
                obstacles.half_extent, obstacles.rot,
            )
        )
        chunk = 65536
        hits = [
            np.asarray(
                hit_fn(
                    pos[i:i + chunk, 1:, :],
                    rot[i:i + chunk, 1:, :, :],
                    parent_pos[i:i + chunk],
                )
            )
            for i in range(0, s, chunk)
        ]
        feasible = ~np.concatenate(hits) if len(hits) > 1 else ~hits[0]

    rk = dict(rekick_interval=rekick_interval, rekick_scale=rekick_scale,
              rekick_threshold=rekick_threshold, init_mode=init_mode)
    if inertia_mode == "canonical":
        pso = PSOConfig(
            iterations=iterations,
            inertia_mode="canonical",
            inertia=0.5,
            inertia_end=0.2,
            **rk,
        )
    else:
        pso = PSOConfig(iterations=iterations, inertia_mode=inertia_mode, **rk)
    fit = FitnessConfig(
        angle_weight=0.0, distance_weight=0.0,
        orientation_weight=1.0 if orientation else 0.0,
        collision_shape=collision_shape,
        fk_impl=fk_impl,
    )

    def build(pso_cfg):
        if impl == "fused":
            from ikpso_tpu.pso.fused import make_fused_solver

            sv = make_fused_solver(
                spec, pso=pso_cfg, fit=fit, obstacles=obstacles,
                num_particles=num_particles,
                swarms_per_tile=swarms_per_tile,
            )
        else:
            fitness_fn = None
            if impl == "pallas":
                from ikpso_tpu.ops.pallas_fitness import make_pallas_fitness

                fitness_fn = make_pallas_fitness(
                    spec, batched, fit=fit, obstacles=obstacles
                )

            sv = make_solver(
                spec, pso=pso_cfg, fit=fit, obstacles=obstacles,
                num_particles=num_particles, fitness_fn=fitness_fn,
            )
        if polish:
            # Differentiable-FK LM refinement of each swarm's gbest:
            # per-swarm accept-if-better, so it can only tighten the
            # percentiles; lets the PSO stage stop at basin-capture
            # depth instead of polishing stochastically (pso/polish.py).
            from ikpso_tpu.pso.polish import wrap_with_polish

            sv = wrap_with_polish(
                sv, spec, steps=polish, use_orientation=orientation,
                obstacles=obstacles,
                collision_backend=fit.collision_backend,
                collision_shape=fit.collision_shape,
                gizmo_size=fit.gizmo_size,
            )
        if walk:
            # BASE protocol = W-step warm target walk (the reference's
            # own per-frame loop batched): each solve interpolates the
            # targets from the warm pose to the goal, re-solving warm
            # per step — the production recipe for far targets on deep
            # trees (45-DOF humanoid; docs/PERFORMANCE.md r3).
            from ikpso_tpu.pso.restarts import wrap_solver_with_target_walk

            sv = wrap_solver_with_target_walk(sv, spec, walk)
        return sv

    from ikpso_tpu.pso.restarts import wrap_with_topk_retries

    # Bucket scales with the batch (1/16th, min 1024): a fixed 1024
    # stops covering the ~2% pre-retry tail beyond S=49k (99.91% at
    # S=131072 with bucket 1024; out/bench_sweep17.jsonl). Small
    # batches cap at S/8 (r5, ADVICE r3): the 1024 floor made the
    # S=1280 latency preset re-solve 80% of the batch per retry round;
    # S/8 still covers the ~2% tail 6x over. Big batches with DECAYING
    # buckets start at S/32 instead of S/16 (r5): the first round was
    # covering the ~2.3% failure set 2.8x over, and halving it to a
    # 1.35x margin saves 18 ms of the 370 ms headline wall with
    # bitwise-identical accuracy (same 18 residual failures and p90,
    # bench_records/r5_bisect.jsonl r5-retryAB). Constant-bucket
    # models (obstacles, orientation, dual-arm) and sub-262144
    # batches (latency, snakes) keep S/16 — their recipes were
    # validated at that coverage.
    div = 32 if retry_bucket_decay > 1 and s >= 262144 else 16
    solver = wrap_with_topk_retries(
        build, pso, rounds=retries,
        bucket=retry_bucket or min(max(1024, s // div), max(s // 8, 1)),
        retry_init_mode=retry_init_mode,
        retry_iterations=retry_iterations,
        swarms_per_tile=swarms_per_tile if impl == "fused" else 1,
        spec=spec, retry_walk_steps=retry_walk,
        retry_walk_jitter=retry_walk_jitter,
        bucket_decay=retry_bucket_decay,
    )
    # Distinct key per timed call: repeat dispatches of identical
    # args are cache-served by the tunnel transport (~0 ms walls),
    # poisoning the timing stats.
    _progress(
        f"compiling + measuring solve (S={s}, P={num_particles}, "
        f"I={iterations}, impl={impl}; cold Mosaic compiles take "
        "minutes — warm cache hits take seconds)"
    )
    res, wall = measure(
        solver, batched, key_s, warmup=2, iters=5,
        vary=lambda i, a: (a[0], jax.random.fold_in(a[1], i)),
    )
    _progress(f"measured wall {wall * 1e3:.1f} ms per batch")
    err_mm = np.asarray(res.effector_error) * 1000.0
    scored = err_mm if feasible is None else err_mm[feasible]
    # Counted-op model of the base PSO stage (utils.flops traces the
    # actual kernel tile code); retries/polish add uncounted work, so
    # this is a floor on delivered ops.
    from ikpso_tpu.utils.flops import fused_solve_count

    count = fused_solve_count(
        spec, pso, fit,
        num_particles=num_particles, num_swarms=s,
        swarms_per_tile=swarms_per_tile if impl == "fused" else 1,
        num_obstacles=0 if obstacles is None else obstacles.count,
        use_orientation=orientation,
    )
    out = dict(
        wall_s=wall,
        solves_per_s=s / wall,
        p50_err_mm=float(np.percentile(scored, 50)),
        p90_err_mm=float(np.percentile(scored, 90)),
        frac_under_1mm=float((scored < 1.0).mean()),
        gflops=count.flops / wall / 1e9,
        gtranscendentals=count.transcendentals / wall / 1e9,
    )
    if chained_runs:
        # DIRECT device-latency protocol (VERDICT r3 #5): K back-to-back
        # full solver runs (base + polish + retries, static targets,
        # per-run fresh RNG keys) chained in ONE jitted lax.scan — the
        # track_trajectories pattern minus the pose chaining, so every
        # run repeats the exact measured single-shot program. wall/K is
        # ms-per-run with the tunnel dispatch amortized by construction:
        # no slope arithmetic, no dispatch subtraction. (The scan body
        # traces the solver once, so compile cost matches one solve.)
        def _chained():
            k = chained_runs

            @jax.jit
            def run_k(problem, key):
                keys = jax.random.split(key, k)

                def body(carry, kk):
                    r = solver(problem, kk)
                    return carry + r.effector_error.sum(), (
                        r.effector_error.min(),
                        r.effector_error.max(),
                    )

                return jax.lax.scan(body, jnp.float32(0.0), keys)

            _progress(
                f"measuring {k}-chained latency program (one compile, "
                "dispatch amortized over the chain)"
            )
            _, wall = measure(
                run_k, batched, key_s, warmup=1, iters=5,
                vary=lambda i, a: (a[0], jax.random.fold_in(a[1], 500 + i)),
            )
            return dict(
                chained_runs=k,
                chained_wall_s=wall,
                chained_ms_per_run=wall / k * 1e3,
            )

        out["_chained_thunk"] = _chained
    if impl == "fused" and kernel_sol:
        # Deferred: the sol slope compiles two EXTRA fused-solver
        # variants (I and 3I iterations) — minutes each from a cold
        # cache. main() prints the headline JSON line first, then
        # calls this thunk (VERDICT r2 #1: round 2's official capture
        # timed out inside exactly these compiles).
        out["_sol_thunk"] = lambda: _kernel_sol_frac(
            spec, batched, key_s, pso, fit,
            num_particles=num_particles,
            swarms_per_tile=swarms_per_tile,
            obstacles=obstacles, orientation=orientation, s=s,
        )
    if feasible is not None:
        out["frac_targets_feasible"] = float(feasible.mean())
    if orientation:
        from ikpso_tpu.ops.rotations import euler_xyz_to_matrix

        solved_rot = fk_ops.fk(spec, res.pose, batched.origin)[1][
            :, list(spec.effector_idx)
        ]
        tgt = euler_xyz_to_matrix(batched.target_rot)
        # Geodesic angle: acos((tr(Ra^T Rb) - 1) / 2), worst effector.
        tr = jnp.einsum("...ij,...ij->...", solved_rot, tgt)
        ang = np.degrees(
            np.asarray(jnp.arccos(jnp.clip((tr - 1.0) * 0.5, -1.0, 1.0)))
        ).max(axis=-1)
        out["p50_orient_err_deg"] = float(np.percentile(ang, 50))
        out["p90_orient_err_deg"] = float(np.percentile(ang, 90))
    return out


def run_selftest() -> dict:
    """On-TPU self-test: the paths the CPU suite must stub or skip.

    The CPU test suite runs the Pallas kernels under the interpreter,
    whose PRNG is stubbed to zeros — so RNG-dependent behavior
    (convergence, uniform init) and the real-hardware seams (fused
    megakernel under a mesh, GJK's fori_loop on TPU) are validated
    here, in the same process as the nightly bench (VERDICT r1 #9).
    Returns a dict of case -> {ok, metric...}.
    """
    from ikpso_tpu.models import library
    from ikpso_tpu.models.chain import Obstacles
    from ikpso_tpu.ops import fk as fk_ops
    from ikpso_tpu.ops.fitness import FitnessConfig, fitness
    from ikpso_tpu.pso.config import PSOConfig
    from ikpso_tpu.pso.fused import make_fused_solver
    from ikpso_tpu.pso.solver import make_solver

    results = {}

    def case(name):
        def deco(fn):
            try:
                results[name] = {"ok": True, **(fn() or {})}
            except Exception as e:  # noqa: BLE001 - report, don't abort
                results[name] = {"ok": False, "error": f"{type(e).__name__}: {e}"}
            return fn

        return deco

    spec, problem = library.arm_7dof()

    def _batched(s):
        return library.batched_problem(
            problem,
            jnp.broadcast_to(problem.targets, (s,) + problem.targets.shape),
        )

    @case("fused_convergence")
    def _fused_convergence():
        # The CPU-skipped test_fused_converges_on_tpu, verbatim.
        solver = make_fused_solver(
            spec, pso=PSOConfig(iterations=30),
            fit=FitnessConfig(angle_weight=0.0), num_particles=1024,
        )
        res = solver(_batched(8), jax.random.key(0))
        med = float(np.median(np.asarray(res.effector_error)))
        assert med < 0.1, med
        return {"median_err": med}

    @case("fused_uniform_init")
    def _fused_uniform_init():
        # init_mode='uniform' draws positions from the core PRNG — a
        # path that is all-zeros under the interpreter.
        solver = make_fused_solver(
            spec,
            pso=PSOConfig(iterations=30, init_mode="uniform"),
            fit=FitnessConfig(angle_weight=0.0),
            num_particles=1024,
        )
        res = solver(_batched(8), jax.random.key(1))
        med = float(np.median(np.asarray(res.effector_error)))
        assert med < 0.1, med
        # Uniform init must actually spread: solutions differ across
        # swarms even with identical targets.
        a = np.asarray(res.angles)
        assert np.std(a, axis=0).max() > 1e-3
        return {"median_err": med}

    @case("fused_on_mesh_realtpu")
    def _fused_on_mesh():
        # The non-interpret seam: megakernel inside shard_map on real
        # hardware, bit-equal to the unsharded solve (VERDICT r1 #1).
        from ikpso_tpu.parallel.mesh import make_mesh
        from ikpso_tpu.parallel.sharded import solve_sharded

        mesh = make_mesh((1,), ("swarm",), devices=jax.devices()[:1])
        kw = dict(
            pso=PSOConfig(iterations=8), fit=FitnessConfig(angle_weight=0.0),
            num_particles=1024,
        )
        key = jax.random.key(2)
        res_mesh = solve_sharded(
            spec, _batched(8), key, mesh, impl="fused", **kw
        )
        res_local = make_fused_solver(spec, **kw)(
            _batched(8), jax.random.fold_in(key, 0)
        )
        np.testing.assert_array_equal(
            np.asarray(res_mesh.angles), np.asarray(res_local.angles)
        )
        return {"max_err": float(np.asarray(res_mesh.effector_error).max())}

    @case("gjk_backend_tpu")
    def _gjk_tpu():
        # GJK (fixed-iteration fori_loop) compiled for TPU agrees with
        # SAT on random poses; disagreement only at tangency.
        s = 4
        batched = _batched(s)
        obstacles = Obstacles.from_boxes(
            [(1.2, 0.6, -0.4), (-0.8, -0.9, 0.3)],
            [(0.8, 0.8, 0.8), (0.7, 0.7, 0.7)],
        )
        key = jax.random.key(3)
        lo = spec.min_rotation[1:].reshape(-1)
        hi = spec.max_rotation[1:].reshape(-1)
        x = jax.random.uniform(
            key, (s, 256, spec.dof), minval=lo, maxval=hi, dtype=jnp.float32
        )
        f_sat = jax.jit(
            lambda x: fitness(
                spec, x, batched,
                config=FitnessConfig(collision_backend="sat"),
                obstacles=obstacles,
            )
        )(x)
        f_gjk = jax.jit(
            lambda x: fitness(
                spec, x, batched,
                config=FitnessConfig(collision_backend="gjk"),
                obstacles=obstacles,
            )
        )(x)
        hit_sat = np.asarray(f_sat) >= 1e30
        hit_gjk = np.asarray(f_gjk) >= 1e30
        agree = float((hit_sat == hit_gjk).mean())
        assert hit_sat.any() and (~hit_sat).any()
        assert agree > 0.995, agree
        return {"agreement": agree, "hit_frac": float(hit_sat.mean())}

    @case("capsule_kernel_tpu")
    def _capsule_tpu():
        # The in-kernel capsule distances on real hardware vs the jnp
        # capsule collider (CPU suite covers interpret mode only).
        from ikpso_tpu.ops.pallas_fitness import TILE_P, make_pallas_fitness

        batched = _batched(1)
        obstacles = Obstacles.from_boxes(
            [(1.2, 0.6, -0.4)], [(0.9, 0.9, 0.9)]
        )
        cfg = FitnessConfig(angle_weight=0.0, collision_shape="capsule")
        lo = spec.min_rotation[1:].reshape(-1)
        hi = spec.max_rotation[1:].reshape(-1)
        x = jax.random.uniform(
            jax.random.key(4), (1, TILE_P, spec.dof),
            minval=lo, maxval=hi, dtype=jnp.float32,
        )
        ref = np.asarray(fitness(spec, x, batched, config=cfg, obstacles=obstacles))
        got = np.asarray(
            make_pallas_fitness(spec, batched, fit=cfg, obstacles=obstacles)(x)
        )
        hr, hg = ref >= 1e30, got >= 1e30
        agree = float((hr == hg).mean())
        assert agree > 0.999, agree
        np.testing.assert_allclose(got[~hr], ref[~hr], rtol=5e-4, atol=5e-4)
        return {"agreement": agree, "hit_frac": float(hr.mean())}

    @case("deep_chain_megakernel")
    def _deep_chain():
        # dof > 127: the multi-row gbest output (CPU suite skips this
        # — the 129-DOF interpret compile takes ~15 min).
        spec_d, problem_d = library.snake(43)  # 129 DOF
        eff = fk_ops.effector_positions(spec_d, problem_d.pose, problem_d.origin)
        problem_anchor = problem_d.replace(targets=eff)
        batched = library.batched_problem(
            problem_anchor,
            jnp.broadcast_to(eff, (8,) + eff.shape),
        )
        solver = make_fused_solver(
            spec_d, pso=PSOConfig(iterations=2),
            fit=FitnessConfig(angle_weight=0.0),
            num_particles=128, swarms_per_tile=8,
        )
        res = solver(batched, jax.random.key(6))
        assert res.angles.shape == (8, 129)
        np.testing.assert_allclose(np.asarray(res.fitness), 0.0, atol=1e-9)
        anchor = np.asarray(fk_ops.pose_to_angles(spec_d, problem_anchor.pose))
        np.testing.assert_allclose(
            np.asarray(res.angles), anchor[None].repeat(8, 0), atol=1e-6
        )
        # And a real deep solve converges through the multi-row path.
        solver2 = make_fused_solver(
            spec_d, pso=PSOConfig(iterations=20, inertia_mode="canonical",
                                  inertia=0.5, inertia_end=0.2),
            fit=FitnessConfig(angle_weight=0.0),
            num_particles=256, swarms_per_tile=8,
        )
        res2 = solver2(
            library.batched_problem(
                problem_d,
                jnp.broadcast_to(problem_d.targets,
                                 (8,) + problem_d.targets.shape),
            ),
            jax.random.key(7),
        )
        med = float(np.median(np.asarray(res2.effector_error)))
        assert med < 0.1, med
        return {"median_err": med}

    @case("deep_chain_on_mesh")
    def _deep_chain_on_mesh():
        # dof>127 multi-row megakernel UNDER a mesh on real hardware
        # (VERDICT r2 #6b; the CPU dryrun documents why this case
        # lives here: the 129-DOF interpreter compile alone runs >10
        # min). Anchor-exact targets: warm-start particle has fitness
        # 0 and must survive sharded gbest extraction bit-exactly.
        from ikpso_tpu.parallel.mesh import make_mesh
        from ikpso_tpu.parallel.sharded import solve_sharded

        spec_d, problem_d = library.snake(43)  # 129 DOF
        eff = fk_ops.effector_positions(
            spec_d, problem_d.pose, problem_d.origin
        )
        batched = library.batched_problem(
            problem_d.replace(targets=eff),
            jnp.broadcast_to(eff, (16,) + eff.shape),
        )
        mesh = make_mesh((1,), ("swarm",), devices=jax.devices()[:1])
        res = solve_sharded(
            spec_d, batched, jax.random.key(8), mesh, impl="fused",
            pso=PSOConfig(iterations=2),
            fit=FitnessConfig(angle_weight=0.0),
            num_particles=128, swarms_per_tile=8,
        )
        assert res.angles.shape == (16, 129)
        # Not allclose-to-zero at 1e-9: the kernel's polynomial-sincos
        # FK (f32 end-to-end err ~1.2e-6) is scored against targets
        # from the exact-trig tensor FK, so over a 43-link chain the
        # anchor particle's squared-distance fitness is near-zero, not
        # bit-zero (ADVICE r3). The angles assert below pins that the
        # anchor particle survived sharded extraction exactly.
        assert float(np.asarray(res.fitness).max()) < 1e-7, res.fitness
        anchor = np.asarray(fk_ops.pose_to_angles(spec_d, problem_d.pose))
        np.testing.assert_allclose(
            np.asarray(res.angles), anchor[None].repeat(16, 0), atol=1e-6
        )
        # And a GENUINE solve through the same mesh path (VERDICT r3
        # #6): targets from a perturbed pose (not the warm start), so
        # the multi-row dof>127 megakernel + LM polish must actually
        # close a nonzero error under the mesh — not just preserve an
        # anchor. Same kernel config as above (I=2, P=128, sw/tile 8)
        # so the Mosaic variant is reused; the polish is XLA-side.
        from ikpso_tpu.pso.polish import wrap_with_polish

        # +-0.002 rad/joint: rotations COMPOUND down the 43-link chain
        # (+-0.03 displaced the tip by 5.46 units on the first real-TPU
        # run of this case — far outside the I=2+LM warm regime, which
        # closed it to 0.28, not <1mm; selftest_r05.jsonl). +-0.002
        # puts the warm start ~0.35 units out: a genuinely nonzero
        # error the mesh-path kernel + polish must close sub-mm.
        d_angles = jax.random.uniform(
            jax.random.key(88), (16, spec_d.dof), minval=-0.002, maxval=0.002
        )
        pert_pose = fk_ops.angles_to_pose(
            spec_d,
            jnp.broadcast_to(problem_d.pose[0], (16, 3)),
            np.asarray(fk_ops.pose_to_angles(spec_d, problem_d.pose))[None]
            + d_angles,
        )
        pert_targets = fk_ops.fk_points(spec_d, pert_pose, problem_d.origin)[
            :, list(spec_d.effector_idx), :
        ]
        batched2 = library.batched_problem(problem_d, pert_targets)
        from ikpso_tpu.parallel.sharded import make_sharded_solver

        sv = make_sharded_solver(
            spec_d, mesh, impl="fused",
            pso=PSOConfig(iterations=2),
            fit=FitnessConfig(angle_weight=0.0),
            num_particles=128, swarms_per_tile=8,
        )
        sv = wrap_with_polish(sv, spec_d, steps=16)
        res2 = sv(batched2, jax.random.key(9))
        errs = np.asarray(res2.effector_error)
        warm_err = np.linalg.norm(
            np.asarray(pert_targets)
            - np.asarray(eff)[None], axis=-1
        ).max()
        assert warm_err > 0.05, warm_err  # premise: genuinely nonzero
        assert errs.max() < 1e-3, (errs.max(), warm_err)
        return {
            "anchor_max_err": float(np.asarray(res.effector_error).max()),
            "solved_max_err": float(errs.max()),
            "warm_start_err": float(warm_err),
        }

    @case("jnp_solver_convergence")
    def _jnp_convergence():
        solver = make_solver(
            spec,
            pso=PSOConfig(iterations=30, inertia_mode="canonical",
                          inertia=0.5, inertia_end=0.2),
            fit=FitnessConfig(angle_weight=0.0),
            num_particles=256,
        )
        res = solver(_batched(8), jax.random.key(5))
        med = float(np.median(np.asarray(res.effector_error)))
        assert med < 0.1, med
        return {"median_err": med}

    return results


def _kernel_sol_frac(spec, batched, key, pso, fit, *, num_particles,
                     swarms_per_tile, obstacles, orientation, s):
    """Speed-of-light fraction of the bare FK+fitness+PSO kernel.

    Times the fused solver (no polish, no retries) at I and 3I
    iterations; half the difference isolates exactly I iterations of the
    PSO loop — init, dispatch, and result extraction cancel. The
    counted ops of those iterations (utils.flops) divided by the
    microbenchmarked per-class VPU peaks (utils.roofline) give the
    speed-of-light time; sol_frac = t_sol / t_measured.
    """
    import dataclasses

    from ikpso_tpu.pso.fused import make_fused_solver
    from ikpso_tpu.utils.flops import (
        fitness_tile_count,
        gbest_broadcast_count,
        pso_update_count,
    )
    from ikpso_tpu.utils.roofline import MEASURED_PEAKS, speed_of_light_seconds
    from ikpso_tpu.utils.profiling import measure

    walls = {}
    for mult in (1, 3):
        cfg = dataclasses.replace(pso, iterations=pso.iterations * mult)
        solver = make_fused_solver(
            spec, pso=cfg, fit=fit, obstacles=obstacles,
            num_particles=num_particles, swarms_per_tile=swarms_per_tile,
        )
        _, walls[mult] = measure(
            solver, batched, key, warmup=1, iters=5,
            vary=lambda i, a: (a[0], jax.random.fold_in(a[1], 7000 + i)),
        )
    # Wall of exactly pso.iterations loop iterations: the I-vs-3I
    # difference halved (init/dispatch/extraction cancel; the wide span
    # keeps tunnel jitter out of the slope).
    dt = max((walls[3] - walls[1]) / 2.0, 1e-9)
    rows = max(1, num_particles // 128)
    per_iter = (
        fitness_tile_count(
            spec, fit,
            num_obstacles=0 if obstacles is None else obstacles.count,
            use_orientation=orientation, rows=rows * swarms_per_tile,
        )
        + pso_update_count(spec, pso)
        + (1.0 / max(1, pso.gbest_interval))
        * gbest_broadcast_count(spec.dof, rows, swarms_per_tile)
    )
    count = per_iter * (s * num_particles * pso.iterations)
    t_sol = speed_of_light_seconds(count)
    return dict(
        kernel_wall_s=dt,
        kernel_gflops=count.flops / dt / 1e9,
        kernel_gtranscendentals=count.transcendentals / dt / 1e9,
        sol_frac=t_sol / dt,
        sol_peaks=dict(MEASURED_PEAKS),
    )


def main() -> int:
    parser = argparse.ArgumentParser()
    # Default: the model preset's batch. Bigger batches amortize the
    # ~27 ms tunnel/PCIe dispatch (16384 -> 383k, 65536 -> 622k,
    # 262144 -> 766k solves/s @ 100.00% <1mm;
    # out/bench_sweep{17,18,21}.jsonl); deep chains cap at 65536
    # (30-DOF polish intermediates OOM HBM at 262144).
    parser.add_argument("--swarms", type=int, default=None)
    parser.add_argument(
        "--particles",
        type=int,
        default=None,
        help="particles per swarm (default: 256 fused / 1024 jnp)",
    )
    parser.add_argument(
        "--swarms-per-tile",
        type=int,
        default=None,
        help="fused solver swarm packing (default 4 when particles allow)",
    )
    parser.add_argument(
        "--iterations",
        type=int,
        default=None,
        help="PSO iterations (default: 25 for fused/canonical, 60 for jnp)",
    )
    parser.add_argument(
        "--inertia-mode",
        choices=("canonical", "randomized"),
        default=None,
        help="default: canonical for fused (tight p90), randomized otherwise",
    )
    parser.add_argument(
        "--init-mode",
        choices=("warm", "uniform", "hybrid"),
        default="warm",
        help="swarm init: warm (reference default), uniform joint-range "
        "draws, or hybrid (particle 0 warm, rest uniform — basin "
        "coverage for single-shot far targets)",
    )
    parser.add_argument(
        "--retry-init-mode",
        choices=("warm", "uniform", "hybrid"),
        default=None,
        help="swarm init for the top-k retry rounds only (default: same "
        "as --init-mode); hybrid/uniform de-correlates wrong-basin "
        "retries from the failed warm basin",
    )
    parser.add_argument(
        "--impl", choices=("auto", "jnp", "pallas", "fused"), default="auto"
    )
    parser.add_argument(
        "--model",
        choices=None,
        metavar="MODEL",
        default="arm_7dof",
        help="BASELINE.md config to benchmark (headline: arm_7dof); "
        "model-zoo name or 'snake:<links>' for arbitrary chain depth",
    )
    parser.add_argument("--cpu", action="store_true", help="force CPU backend")
    parser.add_argument(
        "--orientation", action="store_true",
        help="position+orientation targets (BASELINE config 2 task); "
        "adds p50/p90 geodesic orientation error to the record",
    )
    parser.add_argument(
        "--retries", type=int, default=None,
        help="re-solve swarms still >1mm with fresh RNG (N rounds; "
        "default: measured per-model best); wall time includes the "
        "retries",
    )
    parser.add_argument(
        "--retry-iterations", type=int, default=None, metavar="N",
        help="PSO iterations for the retry rounds only (default: same "
        "as --iterations); a deep retry budget costs little — only "
        "the failed bucket pays — and closes wrong-basin tails",
    )
    parser.add_argument(
        "--retry-bucket", type=int, default=None, metavar="N",
        help="retry bucket size (worst-N swarms re-solved per round; "
        "default max(1024, swarms/16))",
    )
    parser.add_argument(
        "--walk", type=int, default=0, metavar="W",
        help="run the BASE solve as a W-step warm target walk "
        "(interpolate targets from the warm pose to the goal, "
        "re-solving warm per step, one jitted scan — the reference's "
        "own per-frame protocol, Main.cpp:222-227, batched): the "
        "production recipe for far targets on deep trees; wall time "
        "includes all W steps",
    )
    parser.add_argument(
        "--retry-bucket-decay", type=int, default=None, metavar="K",
        help="shrink the retry bucket K-fold each round (floor 1024): "
        "round 1 covers the base failure set, later rounds chase the "
        "geometrically-shrinking residue with matched compute "
        "(default: the model preset's — 4 where measured safe, 1 for "
        "high-failure-rate models whose rounds need full coverage; "
        "bench_records/r4_sweep.jsonl)",
    )
    parser.add_argument(
        "--retry-walk", type=int, default=None, metavar="W",
        help="retry rounds re-solve via a W-step warm TARGET WALK "
        "(interpolate targets from the warm pose's effector positions "
        "to the goal, re-solving warm per step — the reference's own "
        "per-frame protocol, Main.cpp:222-227) instead of an "
        "independent restart; the tail-closing mode for basins that "
        "resist cold retries (default: the model preset's)",
    )
    parser.add_argument(
        "--retry-walk-jitter", type=float, default=None, metavar="J",
        help="curved-path variation for walk retries: intermediate "
        "waypoints get a random per-round offset scaled by J x the "
        "start-to-target span (annealed to zero at the endpoints), so "
        "each retry round walks a different curve instead of "
        "replaying the straight line (default: the model preset's; "
        "0 = straight)",
    )
    parser.add_argument(
        "--rekick-interval", type=int, default=None,
        help="velocity re-kick every N iterations (0 = off; default: "
        "measured per-model best); rescues prematurely-converged "
        "swarms (PSOConfig.rekick_interval)",
    )
    parser.add_argument(
        "--rekick-scale", type=float, default=0.5,
        help="half-width of the re-kick velocity draw",
    )
    parser.add_argument(
        "--rekick-threshold", type=float, default=1e-6,
        help="only kick swarms with gbest fitness above this "
        "(-1 = kick all)",
    )
    parser.add_argument(
        "--polish", type=int, default=None, metavar="K",
        help="K Levenberg-Marquardt polish steps on each swarm's gbest "
        "through the differentiable FK (accept-if-better per swarm; "
        "default: measured per-model best; 0 = off)",
    )
    parser.add_argument(
        "--obstacles", type=int, default=0, metavar="N",
        help="add an N-box scene (SAT collision term fused into the "
        "kernel); accuracy scored on targets whose generating pose "
        "is collision-free",
    )
    parser.add_argument(
        "--fk-impl", choices=("unrolled", "scan"), default="unrolled",
        help="jnp-path FK strategy: unrolled tree walk or log-depth "
        "associative scan (serial chains; the deep-chain option — "
        "head-to-head numbers in docs/PERFORMANCE.md)",
    )
    parser.add_argument(
        "--collision-shape", choices=("box", "capsule"), default="box",
        help="chain collider shape vs the obstacle scene: 'box' "
        "(reference parity: gizmo cube + link box, SAT) or 'capsule' "
        "(node spheres + link capsules, exact closed form — cheaper "
        "in-kernel)",
    )
    parser.add_argument(
        "--profile",
        default=None,
        metavar="LOGDIR",
        help="capture a jax.profiler trace of the measured solves",
    )
    parser.add_argument(
        "--record",
        default=None,
        metavar="FILE",
        help="append the JSON record (plus model/session metadata) to "
        "FILE — tracked provenance under bench_records/",
    )
    parser.add_argument(
        "--session",
        default=None,
        help="session tag stamped into --record lines",
    )
    parser.add_argument(
        "--sol", action="store_true",
        help="measure the speed-of-light kernel fraction (two extra "
        "compiles of the bare fused solver at I and 3I iterations — "
        "minutes each from a cold cache, so opt-in there; DEFAULT-ON "
        "for the headline model once the persistent cache is warm "
        "(>=64 entries), disable with --no-sol; the headline JSON "
        "line prints before this runs either way)",
    )
    parser.add_argument(
        "--no-sol", action="store_true",
        help="disable the warm-cache --sol default (see --sol)",
    )
    parser.add_argument(
        "--latency", action="store_true",
        help="direct latency protocol (BASELINE '<10 ms per PSO run'): "
        "wall time of ONE S=1280 batch (the v5p-16 per-chip share of "
        "the 10k-solve target, rounded up to the tile multiple) at the "
        "shipping defaults; also reports chained_ms — the wall of one "
        "jitted 64-run chain divided by 64, the DIRECT per-run device "
        "time with the tunnel dispatch amortized by construction — "
        "plus the trivial-program dispatch and the (approximate) "
        "batch-size-slope decomposition",
    )
    parser.add_argument(
        "--selftest", action="store_true",
        help="run the on-TPU self-test (RNG-dependent fused paths, "
        "fused-under-mesh seam, GJK/capsule on real hardware) and "
        "print one JSON line of per-case pass/fail",
    )
    args = parser.parse_args()

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    # Persistent compilation cache: Mosaic/XLA compiles over the TPU
    # tunnel take minutes; cache them across processes.
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import os

    cache_entries = (
        len(os.listdir("/root/repo/.jax_cache"))
        if os.path.isdir("/root/repo/.jax_cache")
        else 0
    )
    platform = jax.devices()[0].platform
    _progress(
        f"platform={platform}, persistent cache entries={cache_entries}"
        + ("" if cache_entries else
           " (COLD cache: expect minutes of Mosaic compiles)")
    )
    if args.selftest:
        results = run_selftest()
        record = {
            "metric": "selftest",
            "platform": platform,
            "passed": sum(1 for r in results.values() if r["ok"]),
            "failed": sum(1 for r in results.values() if not r["ok"]),
            "cases": results,
        }
        print(json.dumps(record))
        if args.record:
            logged = {"session": args.session, **record} if args.session else record
            with open(args.record, "a") as fh:
                fh.write(json.dumps(logged) + "\n")
        return 0 if record["failed"] == 0 else 1
    impl = args.impl
    if impl == "auto":
        impl = "fused" if platform == "tpu" else "jnp"
    if (not args.sol and not args.no_sol and platform == "tpu"
            and args.model == "arm_7dof" and not args.latency
            and not args.obstacles and cache_entries >= 64):
        # Warm-cache default (VERDICT r4 weak #4): the official capture
        # should carry its own speed-of-light fraction. Safe for the
        # capture either way — the headline JSON line prints and
        # flushes BEFORE the sol extras run — and the two extra
        # fused-solver variants are cache hits once any --sol session
        # has compiled them (the 64-entry gate keeps a cold cache from
        # paying minutes of Mosaic compiles here; round-2 lesson).
        args.sol = True
        _progress("warm cache: --sol default-on (headline prints first)")
    if args.impl == "auto" and impl == "fused" and args.model.startswith("snake:"):
        # Deep chains: the megakernel packs the gbest result into
        # multiple 128-lane rows (no dof cap since r2); the binding
        # limit is VMEM-resident state. Fall back to the lax.scan
        # solver only when the preset's tile cannot fit (the same
        # estimate make_fused_solver enforces).
        from ikpso_tpu.pso.presets import fused_preset

        dof = 3 * int(args.model.split(":", 1)[1])
        pre_snake = fused_preset(args.model)
        rows_est = pre_snake.swarms_per_tile * (pre_snake.particles // 128)
        # Same empirical VMEM model make_fused_solver enforces; deep
        # chains halve the tile packing until the state fits, and only
        # an un-packable single-row tile falls back to the jnp solver.
        while rows_est > pre_snake.particles // 128 and (
            9 * dof * rows_est * 128 * 4 > 14 * 2**20
        ):
            rows_est //= 2
        if 9 * dof * rows_est * 128 * 4 > 14 * 2**20:
            impl = "jnp"
        else:
            args.swarms_per_tile = (
                args.swarms_per_tile
                or rows_est // (pre_snake.particles // 128)
            )
    # Canonical inertia with a 0.5 -> 0.2 decay converges much tighter
    # than the reference's randomized mode (p90 0.07mm vs 22mm) and in
    # fewer iterations (20 vs 60); randomized stays available for
    # reference-parity runs.
    inertia_mode = args.inertia_mode or ("canonical" if impl == "fused" else "randomized")
    # Measured per-model frontier recipes — shared with the CLI's
    # --preset (provenance comments in ikpso_tpu/pso/presets.py).
    from ikpso_tpu.pso.presets import FUSED_PRESETS, fused_preset

    pre = fused_preset(args.model)
    if pre is None:
        raise SystemExit(
            f"error: unknown model {args.model!r}; expected one of "
            f"{sorted(FUSED_PRESETS)} or 'snake:<links>'"
        )
    dp, dsw, dit, drk, dpol, dret, dretinit, dretiters = (
        pre.particles, pre.swarms_per_tile, pre.iterations,
        pre.rekick_interval, pre.polish, pre.retries, pre.retry_init_mode,
        pre.retry_iterations,
    )
    if args.swarms is None:
        if args.latency:
            # BASELINE's latency sentence is a 10k-solve batch on a
            # v5p-16 == 1,250 solves/chip; 1280 is the next multiple
            # of the 256-swarm tile. Measured directly, not amortized
            # from big-batch walls (VERDICT r2 weak #3).
            args.swarms = 1280
        else:
            args.swarms = pre.swarms if impl == "fused" else 16384
    particles = args.particles or (dp if impl == "fused" else 1024)
    if args.swarms_per_tile is not None:
        swarms_per_tile = args.swarms_per_tile
    elif impl == "fused":
        # Keep the measured tile height when particles are overridden.
        swarms_per_tile = max(1, (dp * dsw) // particles)
        if args.obstacles:
            # The SAT term's per-band scratch pushes the (32,128) tile
            # past the 16 MB scoped-VMEM budget (measured 22.3 MB at 4
            # boxes); half-height tiles fit.
            swarms_per_tile = min(swarms_per_tile, 16)
    else:
        swarms_per_tile = 1
    default_iters = dit if impl == "fused" else (
        20 if inertia_mode == "canonical" else 60
    )
    iterations = args.iterations or default_iters
    if args.rekick_interval is not None:
        rekick_interval = args.rekick_interval
    elif impl == "fused" and drk and iterations % drk == 0:
        rekick_interval = drk
    else:
        rekick_interval = 0
    if args.polish is not None:
        polish = args.polish
    elif impl == "fused" and iterations == dit:
        polish = dpol
    else:
        polish = 0
    if args.retries is not None:
        retries = args.retries
    elif impl == "fused" and iterations == dit:
        retries = dret
    else:
        retries = 0
    # The preset's retry init applies whenever retries run and the user
    # didn't pick one (keying on count equality silently reverted
    # custom --retries runs to warm retries).
    retry_init_mode = args.retry_init_mode
    if retry_init_mode is None and retries and impl == "fused":
        retry_init_mode = dretinit
    if args.retry_iterations is None and retries and impl == "fused":
        args.retry_iterations = dretiters
    if args.retry_bucket is None and retries and impl == "fused":
        args.retry_bucket = pre.retry_bucket
    if args.retry_walk is None and retries and impl == "fused":
        args.retry_walk = pre.retry_walk
    if args.retry_walk_jitter is None and retries and impl == "fused":
        args.retry_walk_jitter = pre.retry_walk_jitter
    if args.retry_bucket_decay is None:
        # Per-model measured default (r4): shrinking buckets cut the
        # retry share of the headline wall with no accuracy change —
        # but ONLY low-failure-rate models opt in (presets.py); pass
        # --retry-bucket-decay explicitly to A/B. Obstacle scenes keep
        # CONSTANT buckets regardless of the model preset: their
        # failures are wrong-basin (blocked approaches) and do not
        # shrink geometrically, so the headline's decay undercovers
        # them — measured r5: the r3 box recipe (12 uniform x 24 it,
        # S=524288) reads 98.79% under decay 4 vs its published
        # 100.00% at constant buckets (r5_sweep.jsonl
        # r5-obst-r3recipe-decay4 vs -decay1).
        args.retry_bucket_decay = (
            pre.retry_bucket_decay
            if impl == "fused" and not args.obstacles else 1
        )

    from ikpso_tpu.models import library
    from ikpso_tpu.utils.profiling import trace

    if args.model.startswith("snake:"):
        spec, problem = library.snake(int(args.model.split(":", 1)[1]))
    else:
        spec, problem = getattr(library, args.model)()
    obstacles = _obstacle_scene(spec, args.obstacles) if args.obstacles else None

    def _run(s_, chained_runs=0):
        return _target_p50_under_1mm(
            spec,
            problem,
            jax.random.key(0),
            num_particles=particles,
            iterations=iterations,
            impl=impl,
            s=s_,
            inertia_mode=inertia_mode,
            init_mode=args.init_mode,
            retry_init_mode=retry_init_mode,
            swarms_per_tile=swarms_per_tile,
            retries=retries,
            orientation=args.orientation,
            rekick_interval=rekick_interval,
            rekick_scale=args.rekick_scale,
            rekick_threshold=args.rekick_threshold,
            obstacles=obstacles,
            polish=polish,
            collision_shape=args.collision_shape,
            fk_impl=args.fk_impl,
            kernel_sol=(impl == "fused" and platform == "tpu"
                        and args.sol),
            retry_iterations=args.retry_iterations,
            retry_bucket=args.retry_bucket,
            chained_runs=chained_runs,
            retry_walk=args.retry_walk or 0,
            retry_walk_jitter=args.retry_walk_jitter or 0.0,
            walk=args.walk,
            retry_bucket_decay=args.retry_bucket_decay,
        )

    with trace(args.profile):
        stats = _run(args.swarms, chained_runs=64 if args.latency else 0)
    sol_thunk = stats.pop("_sol_thunk", None)
    chained_thunk = stats.pop("_chained_thunk", None)
    if args.latency:
        from ikpso_tpu.utils.profiling import measure as _measure

        # The tunnel's fixed per-dispatch cost, measured on a trivial
        # program with varying inputs (identical args are served from
        # the transport cache — CLAUDE.md TPU timing rules): what a
        # directly-attached host would NOT pay. Measured directly, the
        # S=1280 solve wall is statistically identical to this no-op
        # dispatch (70.8 vs 73.1 ms on the r3 capture), so the device
        # share is ALSO estimated from a batch-size slope: wall(64S) -
        # wall(S) is pure device compute for 63S extra solves
        # (dispatch and fixed costs cancel), scaled back to the S
        # batch. 64x puts the slope (~80 ms at the measured 1.06
        # us/solve marginal rate) far above the tunnel's +-5 ms
        # jitter; an 8x slope (~9 ms) drowned in it (r3-latency2).
        tiny = jax.jit(lambda x: x + 1.0)
        _progress("measuring dispatch overhead (trivial program)")
        _, dispatch_s = _measure(
            tiny, jnp.zeros((8,), jnp.float32), warmup=2, iters=9,
            vary=lambda i, a: (a[0] + np.float32(i),),
        )
        # The DIRECT device measurement: wall of one 64-run chained
        # program / 64 (built by _run above). The batch-size slope
        # below is kept for the dispatch decomposition but is
        # APPROXIMATE: the top-k retry bucket is max(1024, S/16)
        # clamped to S, so at S=1280 each retry round re-solves ~80%
        # of the batch vs ~6% at 64S — the slope's marginal rate
        # under-weights the small batch's retry share (ADVICE r3).
        # chained_ms has no such skew and is the authoritative
        # device-time number.
        chained = chained_thunk() if chained_thunk else {}
        _progress("measuring 64x batch for the device-time slope")
        stats64 = _run(args.swarms * 64)
        stats["dispatch_ms"] = dispatch_s * 1e3
        stats["device_ms"] = max(
            0.0, (stats64["wall_s"] - stats["wall_s"]) / 63.0 * 1e3
        )
        if chained:
            stats["chained_ms"] = chained["chained_ms_per_run"]
            stats["chained_runs"] = chained["chained_runs"]
    model_tag = args.model.replace(":", "")
    if args.latency:
        # Direct evidence for "<10 ms per PSO run": one batched PSO
        # run (init + iterations + polish + retries) of the per-chip
        # share of the 10k-solve target. vs_baseline = 10 ms budget /
        # measured wall (higher is better).
        wall_ms = stats["wall_s"] * 1e3
        metric = f"{model_tag}_latency_ms_per_{args.swarms}solve_run"
        record = {
            "metric": metric,
            "value": round(wall_ms, 3),
            "unit": "ms",
            "vs_baseline": round(10.0 / wall_ms, 4),
            "dispatch_ms": round(stats["dispatch_ms"], 3),
            "device_ms": round(stats["device_ms"], 3),
        }
        if "chained_ms" in stats:
            # Direct per-run device time: one jitted 64-run chain,
            # wall/64 (dispatch amortized by construction; no slope).
            record["chained_ms"] = round(stats["chained_ms"], 4)
            record["chained_runs"] = stats["chained_runs"]
    else:
        value = stats["solves_per_s"]
        metric = (
            "7dof_ik_solves_per_s_per_chip"
            if args.model == "arm_7dof"
            else f"{model_tag}_ik_solves_per_s_per_chip"
        )
        record = {
            "metric": metric,
            "value": round(value, 1),
            "unit": "solves/s/chip",
            "vs_baseline": round(value / BASELINE_SOLVES_PER_S_PER_CHIP, 4),
        }
    record.update({
        "platform": platform,
        "impl": impl,
        "swarms": args.swarms,
        "particles": particles,
        "swarms_per_tile": swarms_per_tile,
        "iterations": iterations,
        "inertia_mode": inertia_mode,
        "init_mode": args.init_mode,
        "retry_init_mode": retry_init_mode,
        "p50_err_mm": round(stats["p50_err_mm"], 4),
        "p90_err_mm": round(stats["p90_err_mm"], 4),
        "frac_under_1mm": round(stats["frac_under_1mm"], 4),
        "obstacles": args.obstacles,
        "wall_ms_per_solve_batch": round(stats["wall_s"] * 1e3, 3),
        "gflops": round(stats["gflops"], 1),
        "gtranscendentals": round(stats["gtranscendentals"], 1),
    })
    if args.walk:
        record["walk_steps"] = args.walk
    if "frac_targets_feasible" in stats:
        record["frac_targets_feasible"] = round(stats["frac_targets_feasible"], 4)
    if args.obstacles:
        record["collision_shape"] = args.collision_shape
    if args.fk_impl != "unrolled":
        record["fk_impl"] = args.fk_impl
    if retries:
        record["retries"] = retries
        if args.retry_iterations:
            record["retry_iterations"] = args.retry_iterations
        if args.retry_bucket:
            record["retry_bucket"] = args.retry_bucket
        if args.retry_walk:
            record["retry_walk"] = args.retry_walk
            if args.retry_walk_jitter:
                record["retry_walk_jitter"] = args.retry_walk_jitter
        if args.retry_bucket_decay != 1:
            record["retry_bucket_decay"] = args.retry_bucket_decay
    if polish:
        record["polish_steps"] = polish
    if rekick_interval:
        record["rekick_interval"] = rekick_interval
        record["rekick_scale"] = args.rekick_scale
        record["rekick_threshold"] = args.rekick_threshold
    if args.orientation:
        record["orientation"] = True
        record["p50_orient_err_deg"] = round(stats["p50_orient_err_deg"], 3)
        record["p90_orient_err_deg"] = round(stats["p90_orient_err_deg"], 3)
    # The official line prints (and flushes) BEFORE any optional
    # extras: a timeout during --sol can no longer cost the capture.
    print(json.dumps(record), flush=True)
    if sol_thunk is not None:
        _progress("headline printed; measuring --sol kernel fraction "
                  "(two extra fused-solver compiles)")
        sol = sol_thunk()
        record["sol_frac"] = round(sol["sol_frac"], 4)
        record["kernel_wall_ms"] = round(sol["kernel_wall_s"] * 1e3, 3)
        record["kernel_gflops"] = round(sol["kernel_gflops"], 1)
        record["kernel_gtranscendentals"] = round(
            sol["kernel_gtranscendentals"], 1
        )
        print(json.dumps({k: record[k] for k in (
            "metric", "sol_frac", "kernel_wall_ms", "kernel_gflops",
            "kernel_gtranscendentals")}), file=sys.stderr, flush=True)
    if args.record:
        logged = {"model": args.model, **record}
        if args.session:
            logged = {"session": args.session, **logged}
        with open(args.record, "a") as fh:
            fh.write(json.dumps(logged) + "\n")
    return 0


if __name__ == "__main__":
    sys.exit(main())
