"""Round-4 probe C: A/B the hoisted-constant kernel (VERDICT r3 #4).

Probe B attributed ~80 ms of the S=1M wall to per-grid-step
constant-tile materialization: the clamp-bound and per-swarm-constant
broadcast tiles are rebuilt from SMEM scalars every grid step
(~2,000 vector stores/step at d=7, sw=128). The fix under test
(pso/fused.py ``const_mode``): clamp bounds arrive as a
constant-index VMEM input (DMA'd once), and per-swarm constants are
built by one-hot lane-select from a VMEM swarm block (~4 vector ops
per constant instead of sw_count scalar fills).

Within ONE session (tunnel session state swings absolute walls by
tens of percent — docs/PERFORMANCE.md round 4), times the bare fused
kernel at I=8 for const_mode="scalar" (the r3 construction) vs
"auto" (hoisted), and asserts the two modes' outputs are BITWISE
identical on the full S=1M batch (same seeds => same PRNG stream;
the const path consumes no draws).

Run from /root/repo: python tools/stage_probe_r4c.py
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
    print(f"[probeC +{time.time() - T0:7.1f}s] {msg}", file=sys.stderr,
          flush=True)


def rec(**kw):
    print(json.dumps(kw), flush=True)
    with open("bench_records/r4_bisect.jsonl", "a") as fh:
        fh.write(json.dumps({"session": "r4-bisectC", **kw}) + "\n")


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

cfg = PSOConfig(iterations=I, inertia_mode="canonical",
                inertia=0.5, inertia_end=0.2)


def kernel_fn(mode):
    @jax.jit
    def run(meta, swarm, seeds):
        return fused_solve_raw(spec, cfg, fit, meta, swarm, limits, seeds,
                               P, 0, swarms_per_tile=128, const_mode=mode)

    return run


fns = {}
outs = {}
for mode in ("auto", "scalar"):
    log(f"compile+run const_mode={mode} (Mosaic compile if cold)")
    fns[mode] = kernel_fn(mode)
    outs[mode] = jax.block_until_ready(fns[mode](meta, swarm, seeds))
    log(f"const_mode={mode} first run done")

gb_a, gv_a = map(np.asarray, outs["auto"])
gb_s, gv_s = map(np.asarray, outs["scalar"])
bit_gb = bool((gb_a.view(np.int32) == gb_s.view(np.int32)).all())
bit_gv = bool((gv_a.view(np.int32) == gv_s.view(np.int32)).all())
rec(stage="constAB_bitwise_equal", gbest=bit_gb, gval=bit_gv)
assert bit_gb and bit_gv, "const_mode paths diverged!"

for mode in ("scalar", "auto"):
    _, w = measure(
        fns[mode], meta, swarm, seeds, warmup=1, iters=5,
        vary=lambda i, a: (a[0], a[1], a[2] + np.int32(i + 1)),
    )
    rec(stage=f"kernelC_{mode}_I{I}", wall_ms=w * 1e3)
log("done")
