"""Round-4 stage bisection of the S=1M headline wall (VERDICT r3 #4).

Decomposes the full shipping recipe (arm_7dof, S=1M, P=128, sw/tile
128, I=8, polish 4, retries 4 @ bucket 65536) into separately-jitted
stages, timed with the fetch-synced median-of-N protocol
(utils/profiling.measure). Targets the ~147 ms in-kernel non-loop
share and the retry rounds' fixed costs specifically.

Run from /root/repo: python tools/stage_probe_r4.py
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, "/root/repo")

from ikpso_tpu.models import library
from ikpso_tpu.models.library import batched_problem
from ikpso_tpu.ops import fk as fk_ops
from ikpso_tpu.ops.fitness import FitnessConfig
from ikpso_tpu.ops.pallas_fitness import _pack_meta, _pack_swarm
from ikpso_tpu.pso.config import PSOConfig
from ikpso_tpu.pso.fused import fused_solve_raw, make_fused_solver
from ikpso_tpu.pso.polish import wrap_with_polish
from ikpso_tpu.pso.polish_soa import anchor_positions_flat, true_effector_error_rows
from ikpso_tpu.pso.restarts import wrap_with_topk_retries
from ikpso_tpu.utils.profiling import measure

S = 1 << 20
P = 128
SW = 128
I = 8
POLISH = 4
RETRIES = 4
BUCKET = max(1024, S // 16)
T0 = time.time()


def log(msg):
    print(f"[probe +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr, flush=True)


def rec(**kw):
    print(json.dumps(kw), flush=True)
    with open("bench_records/r4_bisect.jsonl", "a") as fh:
        fh.write(json.dumps({"session": "r4-bisect", **kw}) + "\n")


spec, problem = library.arm_7dof()
key_t, key_s = jax.random.split(jax.random.key(0))
lo = spec.min_rotation[1:].reshape(-1)
hi = spec.max_rotation[1:].reshape(-1)
rand_angles = jax.random.uniform(key_t, (S, spec.dof), minval=lo, maxval=hi,
                                 dtype=jnp.float32)
rand_pose = fk_ops.angles_to_pose(
    spec, jnp.broadcast_to(problem.pose[0], (S, 3)), rand_angles)
targets = fk_ops.fk_points(spec, rand_pose, problem.origin)[
    :, list(spec.effector_idx), :]
batched = batched_problem(problem, targets)
fit = FitnessConfig(angle_weight=0.0, distance_weight=0.0)
pso = PSOConfig(iterations=I, inertia_mode="canonical", inertia=0.5,
                inertia_end=0.2)
limits = jnp.stack([lo, hi])

# ---- stage 1: pack --------------------------------------------------
@jax.jit
def pack(problem, key):
    meta = _pack_meta(spec, fit, None, False)
    anchor_angles = fk_ops.pose_to_angles(spec, problem.pose)
    swarm = _pack_swarm(spec, problem, anchor_angles,
                        anchor_positions_flat(spec, problem), False)
    seeds = jax.random.bits(key, (swarm.shape[0], 2),
                            dtype=jnp.uint32).astype(jnp.int32)
    return meta, swarm, seeds

log("stage 1: pack")
(meta, swarm, seeds), t_pack = measure(
    pack, batched, key_s, warmup=2, iters=5,
    vary=lambda i, a: (a[0], jax.random.fold_in(a[1], i)))
rec(stage="pack", wall_ms=t_pack * 1e3)

# ---- stage 2: kernel at I and 3I ------------------------------------
def kernel_fn(iters):
    import dataclasses
    cfg = dataclasses.replace(pso, iterations=iters)

    @jax.jit
    def run(meta, swarm, seeds):
        return fused_solve_raw(spec, cfg, fit, meta, swarm, limits, seeds,
                               P, 0, swarms_per_tile=SW)
    return run

walls = {}
for iters in (I, 3 * I):
    log(f"stage 2: kernel I={iters} (cold Mosaic compile possible)")
    f = kernel_fn(iters)
    (gbest, gval), walls[iters] = measure(
        f, meta, swarm, seeds, warmup=1, iters=5,
        vary=lambda i, a: (a[0], a[1],
                           jnp.asarray(np.asarray(a[2]) + np.int32(i + 1))))
    rec(stage=f"kernel_I{iters}", wall_ms=walls[iters] * 1e3)
loop_ms = (walls[3 * I] - walls[I]) / 2.0 * 1e3
fixed_ms = walls[I] * 1e3 - loop_ms
rec(stage="kernel_loop_8it", wall_ms=loop_ms)
rec(stage="kernel_fixed(init+extract+grid/io)", wall_ms=fixed_ms)

# ---- stage 3: post (pose + error rows) -------------------------------
@jax.jit
def post(problem, gbest):
    pose = fk_ops.angles_to_pose(spec, problem.pose[..., 0, :], gbest)
    err = true_effector_error_rows(spec, problem, gbest)
    return pose, err

log("stage 3: post")
_, t_post = measure(post, batched, gbest, warmup=2, iters=5,
                    vary=lambda i, a: (a[0], a[1] + np.float32(i) * 1e-7))
rec(stage="post_pose_err", wall_ms=t_post * 1e3)

# ---- stage 4: bare solver end-to-end cross-check ---------------------
bare = make_fused_solver(spec, pso=pso, fit=fit, num_particles=P,
                         swarms_per_tile=SW)
log("stage 4: bare end-to-end")
_, t_bare = measure(bare, batched, key_s, warmup=1, iters=5,
                    vary=lambda i, a: (a[0], jax.random.fold_in(a[1], 50 + i)))
rec(stage="bare_solver", wall_ms=t_bare * 1e3,
    sum_of_stages_ms=(t_pack + walls[I] + t_post) * 1e3)

# ---- stage 5: polish ---------------------------------------------------
pol = wrap_with_polish(bare, spec, steps=POLISH)
log("stage 5: polish")
_, t_pol = measure(pol, batched, key_s, warmup=1, iters=5,
                   vary=lambda i, a: (a[0], jax.random.fold_in(a[1], 100 + i)))
rec(stage="bare+polish", wall_ms=t_pol * 1e3,
    polish_ms=(t_pol - t_bare) * 1e3)

# ---- stage 6: retry rounds slope ----------------------------------------
def build(cfg):
    sv = make_fused_solver(spec, pso=cfg, fit=fit, num_particles=P,
                           swarms_per_tile=SW)
    return wrap_with_polish(sv, spec, steps=POLISH)

for rounds in (1, 2, 4):
    log(f"stage 6: retries={rounds}")
    solver = wrap_with_topk_retries(build, pso, rounds=rounds, bucket=BUCKET,
                                    swarms_per_tile=SW)
    _, t_r = measure(solver, batched, key_s, warmup=1, iters=5,
                     vary=lambda i, a: (a[0],
                                        jax.random.fold_in(a[1], 200 + i)))
    rec(stage=f"full_retries{rounds}", wall_ms=t_r * 1e3,
        per_round_ms=(t_r - t_pol) * 1e3 / rounds)

# ---- stage 7: top_k / approx_max_k / gather ------------------------------
err = jax.random.uniform(key_s, (S,), dtype=jnp.float32)

@jax.jit
def topk(e):
    return jax.lax.top_k(e, BUCKET)[1]

@jax.jit
def approx(e):
    return jax.lax.approx_max_k(e, BUCKET)[1]

log("stage 7: top_k")
_, t_topk = measure(topk, err, warmup=2, iters=5,
                    vary=lambda i, a: (a[0] + np.float32(i) * 1e-9,))
rec(stage="top_k_1M_to_64k", wall_ms=t_topk * 1e3)
log("stage 7: approx_max_k")
_, t_ap = measure(approx, err, warmup=2, iters=5,
                  vary=lambda i, a: (a[0] + np.float32(i) * 1e-9,))
rec(stage="approx_max_k_1M_to_64k", wall_ms=t_ap * 1e3)

worst = topk(err)

@jax.jit
def gather(problem, worst):
    return jax.tree.map(lambda x: jnp.take(x, worst, axis=0), problem)

log("stage 7: gather")
_, t_g = measure(gather, batched, worst, warmup=2, iters=5,
                 vary=lambda i, a: (a[0], (a[1] + i) % S))
rec(stage="gather_bucket_problem", wall_ms=t_g * 1e3)

log("done")
