"""Round-5 probe: re-bisect the headline wall at the post-hoist frontier.

VERDICT r4 weak #4: every stage table in docs/PERFORMANCE.md describes
the dead 443/505 ms walls; the shipped hoisted-constant kernel moved
the frontier to ~372 ms (BENCH_r04.json) with no measured map of where
the next win lives. This probe, in ONE session (within-session A/Bs
are the only trustworthy walls over the axon tunnel —
docs/PERFORMANCE.md round 4):

1. times the FULL shipped pipeline (8 PSO it + 4 LM + 4 decaying
   retry rounds) via bench.py's own `_target_p50_under_1mm`,
2. peels retries (retries=0) and polish (polish=0) off,
3. times the bare fused kernel at I=8 / I=24 (const_mode default =
   the shipped hoisted path) for the loop-vs-fixed slope split,

and derives: retry share = full - no_retries; polish share =
no_retries - base; pack+post+dispatch = base - bare_kernel_I8;
kernel loop8 = (K24 - K8)/2; kernel fixed = K8 - loop8.

Run from /root/repo: python tools/stage_probe_r5.py
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

import bench
from ikpso_tpu.models import library
from ikpso_tpu.models.library import batched_problem
from ikpso_tpu.ops import fk as fk_ops
from ikpso_tpu.ops.fitness import FitnessConfig
from ikpso_tpu.ops.pallas_fitness import _pack_meta, _pack_swarm
from ikpso_tpu.pso.config import PSOConfig
from ikpso_tpu.pso.fused import fused_solve_raw
from ikpso_tpu.pso.polish_soa import anchor_positions_flat
from ikpso_tpu.utils.profiling import measure

S = 1 << 20
P = 128
I = 8
T0 = time.time()


def log(msg):
    print(f"[probeR5 +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def rec(**kw):
    print(json.dumps(kw), flush=True)
    with open("bench_records/r5_bisect.jsonl", "a") as fh:
        fh.write(json.dumps({"session": "r5-bisect", **kw}) + "\n")


spec, problem = library.arm_7dof()

# --- Stage A: full-pipeline peels via bench's own solve path -------
walls = {}
for name, kw in (
    ("full", dict(retries=4, polish=4, retry_bucket_decay=4)),
    ("no_retries", dict(retries=0, polish=4)),
    ("base", dict(retries=0, polish=0)),
):
    log(f"pipeline {name}: {kw}")
    out = bench._target_p50_under_1mm(
        spec, problem, jax.random.key(0),
        num_particles=P, iterations=I, impl="fused", s=S,
        inertia_mode="canonical", swarms_per_tile=128, **kw,
    )
    walls[name] = out["wall_s"] * 1e3
    rec(stage=f"pipe_{name}", wall_ms=walls[name],
        frac_under_1mm=out["frac_under_1mm"],
        p50_err_mm=out["p50_err_mm"], p90_err_mm=out["p90_err_mm"])

rec(stage="derived_retries4", wall_ms=walls["full"] - walls["no_retries"])
rec(stage="derived_polish4", wall_ms=walls["no_retries"] - walls["base"])

# --- Stage B: bare kernel I / 3I slope (shipped const_mode) --------
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
limits = jnp.stack([lo, hi])

meta = _pack_meta(spec, fit, None, False)
anchor_angles = fk_ops.pose_to_angles(spec, batched.pose)
swarm = _pack_swarm(spec, batched, anchor_angles,
                    anchor_positions_flat(spec, batched), False)
seeds = jax.random.bits(key_s, (S, 2), dtype=jnp.uint32).astype(jnp.int32)
meta, swarm, seeds = jax.device_put((meta, swarm, seeds))
jax.block_until_ready(seeds)

kw_raw = {}
for iters in (I, 3 * I):
    cfg = PSOConfig(iterations=iters, inertia_mode="canonical",
                    inertia=0.5, inertia_end=0.2)

    @jax.jit
    def run(meta, swarm, seeds, cfg=cfg):
        return fused_solve_raw(spec, cfg, fit, meta, swarm, limits, seeds,
                               P, 0, swarms_per_tile=128)

    log(f"bare kernel I={iters} (Mosaic compile if cold)")
    _, w = measure(
        run, meta, swarm, seeds, warmup=1, iters=5,
        vary=lambda i, a: (a[0], a[1], a[2] + np.int32(i + 1)),
    )
    kw_raw[iters] = w * 1e3
    rec(stage=f"kernel_I{iters}", wall_ms=kw_raw[iters])

loop8 = (kw_raw[3 * I] - kw_raw[I]) / 2.0
fixed = kw_raw[I] - loop8
rec(stage="kernel_loop8", wall_ms=loop8)
rec(stage="kernel_fixed", wall_ms=fixed)
rec(stage="derived_pack_post_dispatch", wall_ms=walls["base"] - kw_raw[I])
log("done")
