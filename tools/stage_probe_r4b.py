"""Round-4 probe B: attribute the megakernel's non-loop (fixed) share.

Times the bare fused kernel (no pack/post/polish/retries) at I=8 and
I=24 for swarms_per_tile 128 (shipping) and 64 (double the grid
steps), with device-side input variation (probe A's numpy seeds vary
hook shipped 8 MB H2D per timed call and polluted the standalone
kernel walls; the I/3I slope cancelled it, so only the slope was
used). The sw=64-vs-128 fixed-share difference isolates the
per-grid-step overhead: per-swarm work (init fitness, extraction) is
identical per swarm at both packings, while grid-step count doubles.

Run from /root/repo: python tools/stage_probe_r4b.py
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
from ikpso_tpu.pso.fused import fused_solve_raw
from ikpso_tpu.pso.polish_soa import anchor_positions_flat
from ikpso_tpu.utils.profiling import measure

S = 1 << 20
P = 128
I = 8
T0 = time.time()


def log(msg):
    print(f"[probeB +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def rec(**kw):
    print(json.dumps(kw), flush=True)
    with open("bench_records/r4_bisect.jsonl", "a") as fh:
        fh.write(json.dumps({"session": "r4-bisectB", **kw}) + "\n")


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
limits = jnp.stack([lo, hi])

meta = _pack_meta(spec, fit, None, False)
anchor_angles = fk_ops.pose_to_angles(spec, batched.pose)
swarm = _pack_swarm(spec, batched, anchor_angles,
                    anchor_positions_flat(spec, batched), False)
seeds = jax.random.bits(key_s, (S, 2), dtype=jnp.uint32).astype(jnp.int32)
meta, swarm, seeds = jax.device_put((meta, swarm, seeds))
jax.block_until_ready(seeds)


def kernel_fn(iters, sw):
    import dataclasses

    cfg = PSOConfig(iterations=iters, inertia_mode="canonical",
                    inertia=0.5, inertia_end=0.2)

    @jax.jit
    def run(meta, swarm, seeds):
        return fused_solve_raw(spec, cfg, fit, meta, swarm, limits, seeds,
                               P, 0, swarms_per_tile=sw)

    return run


results = {}
for sw in (128, 64):
    for iters in (I, 3 * I):
        log(f"kernel sw={sw} I={iters} (Mosaic compile if cold)")
        f = kernel_fn(iters, sw)
        # Device-side vary: fold the index into seeds ON DEVICE (a
        # (S,2) int32 add — no host transfer in the timed loop).
        _, w = measure(
            f, meta, swarm, seeds, warmup=1, iters=5,
            vary=lambda i, a: (a[0], a[1], a[2] + np.int32(i + 1)),
        )
        results[(sw, iters)] = w
        rec(stage=f"kernelB_sw{sw}_I{iters}", wall_ms=w * 1e3)
    loop = (results[(sw, 3 * I)] - results[(sw, I)]) / 2.0
    fixed = results[(sw, I)] - loop
    rec(stage=f"kernelB_sw{sw}_loop8", wall_ms=loop * 1e3)
    rec(stage=f"kernelB_sw{sw}_fixed", wall_ms=fixed * 1e3)

# grid-step overhead: sw64 runs 2x the grid steps of sw128 on
# identical per-swarm work, so (fixed64 - fixed128) = 8192 extra
# steps' worth of per-step overhead.
f128 = results[(128, I)] - (results[(128, 3 * I)] - results[(128, I)]) / 2
f64 = results[(64, I)] - (results[(64, 3 * I)] - results[(64, I)]) / 2
rec(stage="kernelB_grid_step_overhead_8192steps", wall_ms=(f64 - f128) * 1e3)
log("done")
