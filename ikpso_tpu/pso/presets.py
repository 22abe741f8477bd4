"""Measured per-model frontier configs (shared by bench.py and the CLI).

Each preset is the best-measured fused-megakernel recipe on a v5e —
the throughput frontier that holds a 100% (or best-achievable)
under-1mm tail; provenance and sweep data in docs/PERFORMANCE.md and
out/bench_sweep*.jsonl. The shared recipe shape: a short
basin-finding PSO stage (canonical inertia decaying 0.5 -> 0.2),
an SoA Levenberg-Marquardt polish finishing each swarm's gbest, and
top-k retry rounds erasing the failure tail (optionally with a
diverse retry init for wrong-basin failures).

These are deliberately OPT-IN (``bench.py`` defaults; ``--preset`` on
the CLI): the package-level ``PSOConfig`` defaults stay at reference
parity (randomized inertia, warm init — the configuration the
reference's published convergence numbers use).
"""

from __future__ import annotations

import dataclasses
from typing import Optional


@dataclasses.dataclass(frozen=True)
class FusedPreset:
    """One model's measured frontier recipe for the fused megakernel."""

    particles: int
    swarms_per_tile: int
    iterations: int
    rekick_interval: int
    polish: int
    retries: int
    retry_init_mode: Optional[str] = None
    # PSO budget for the retry rounds only (None = same as the base):
    # only the failed bucket pays, so a much deeper retry is cheap —
    # the wrong-basin tail-closing tool (pso/restarts.py).
    retry_iterations: Optional[int] = None
    # Worst-N bucket per retry round (None = bench default
    # max(1024, S/16)). Models with a HIGH single-shot failure rate
    # (the 45-DOF humanoid: ~25-40% before retries) need rounds x
    # bucket to cover the whole failure set, not just a tail.
    retry_bucket: Optional[int] = None
    # Retry rounds as a W-step warm target WALK instead of an
    # independent restart (pso/restarts.py
    # wrap_solver_with_target_walk) — the reference's own per-frame
    # protocol applied to the failed bucket; for basins that resist
    # cold restarts. None/0 = ordinary retries.
    retry_walk: Optional[int] = None
    # Curved-path variation for walk retries (pso/restarts.py
    # wrap_solver_with_target_walk jitter): each round's intermediate
    # waypoints get a random offset scaled by this fraction of the
    # start-to-target span (annealed to zero at both endpoints), so
    # round k walks a different curve than round k-1. 0 = straight
    # (deterministic) walk paths.
    retry_walk_jitter: float = 0.0
    # Shrink the retry bucket K-fold per round (pso/restarts.py
    # bucket_decay): rounds after the first chase a geometrically-
    # shrinking residue, so matched buckets save most of the retry
    # wall (r4: headline 2.07M -> 2.37M solves/s @ 100.00%). ONLY for
    # models whose pre-retry failure rate is low (a round's bucket
    # must still cover the residue it faces): high-failure models
    # (humanoid ~25-40%, 6-DOF orientation ~17-25%, dual-arm's
    # coverage-exact 4th round) keep constant buckets.
    retry_bucket_decay: int = 1
    rekick_scale: float = 0.5
    rekick_threshold: float = 1e-6
    # The frontier recipes were all measured with the canonical
    # explore-then-exploit inertia schedule.
    inertia: float = 0.5
    inertia_end: float = 0.2
    # Benchmark batch: bigger batches amortize the per-dispatch
    # overhead (~27 ms over the tunnel), but the LM polish's unrolled
    # per-DOF intermediates scale with S x DOF^2 — 30-DOF chains OOM
    # the 16 GB HBM at S=262144 (measured 22.25G), so deep chains cap
    # the batch at 65536. The 7-DOF headline fits S=1048576 (its HBM
    # frontier: 1.5M programs need 24.3G); the batch-scaling shape was
    # measured in r2 (262144: 877.9k -> 1048576: 990.9k solves/s, all
    # @ 100.00% <1mm, bench_records/r2_sweep.jsonl r2c-batch —
    # HISTORICAL walls; the r3/r4 kernel is ~2.8x faster but the
    # frontier shape holds, re-probed r3: S=1.5M fits post-row-FK yet
    # S=1M stays optimal). Current headline: BENCH_r04.json.
    swarms: int = 262_144


FUSED_PRESETS = {
    # HEADLINE: 2,814,702 solves/s @ 100.00% <1mm — the official r4
    # driver capture (BENCH_r04.json; 372.5 ms for the S=1M batch on
    # the hoisted-constant kernel with 4x bucket decay). With retries
    # in place 8 PSO iterations find the basin, 4 LM steps finish, and
    # 4 shrinking-bucket retry rounds erase the tail; the re-kick is
    # dead weight at this depth. Tile
    # packing: at the S=1M batch frontier 128 swarms per tile beats
    # 256 on BOTH axes — throughput (997.4k vs 990.8k,
    # bench_records/r3_sweep.jsonl r3-tile128) and cold-compile wall
    # (the 256-tall tile's Mosaic compile alone runs >15 min over the
    # tunnel vs ~1 min at 128 — the mechanism behind round 2's
    # official-capture timeout, VERDICT r2 weak #1). The r2 tile sweep
    # that picked 256 measured at S=262144 (sw=64: 851.5k, sw=128:
    # 811-837k, sw=256: 877.2k, r2_sweep.jsonl r2-tile); the batch
    # frontier moved the optimum back.
    # Retry schedule (r5-retryAB, same-session ladder at S=1M): first
    # bucket S/32 (bench default for decaying big batches) + decay 8
    # -> [32768, 4096, 1024, 1024]; 370.7 -> 350.0 ms with bitwise-
    # identical accuracy vs the r4 S/16+decay-4 schedule (18 residual
    # failures either way; 3 rounds costs 48 failures for no win).
    "arm_7dof": FusedPreset(128, 128, 8, 0, 4, 4, swarms=1_048_576,
                            retry_bucket_decay=8),
    # 1.144M @ 100.00% at the S=1M batch frontier (r2c-batch; 935.9k
    # at S=262144; sw/tile 256 reads slightly worse here, 1.120M —
    # planar keeps 128). Planar's residual tail is warm-retry-resistant
    # (8 it + warm retries plateaus at 99.98%) but uniform-init retries
    # close it — its failures are wrong-basin, not premature
    # convergence.
    "planar_3dof": FusedPreset(128, 128, 8, 0, 4, 2, "uniform",
                               swarms=1_048_576, retry_bucket_decay=4),
    # 260.1k @ 100.00% (r2_sweep.jsonl): the exactly-determined
    # position+orientation task leaves wrong-basin failures that only
    # DIVERSE retries fix (92.1% with warm retries,
    # out/bench_retryinit.jsonl). 20 uniform-init retry rounds at a
    # DEEP 80-iteration budget close the tail completely; fewer rounds
    # trade tail for speed (14 rounds: 99.99% @ 333.4k, 10 rounds:
    # 99.94% @ 382.2k). Walk retries measured r5 and REJECTED for this
    # row (88.37%, r5_sweep.jsonl r5-6dof-orient-walk8x6): walks
    # interpolate positions with orientation held fixed, so they
    # cannot re-explore the joint basin structure. (Position-ONLY
    # 6-DOF walks DO win: 100.00% @ 399.0k — but that is not this
    # row's task.)
    "arm_6dof": FusedPreset(128, 128, 40, 20, 4, 20, "uniform",
                            retry_iterations=80),
    # 103.8k @ 100.00% (out/bench_sweep28.jsonl; sw/tile 2: 87.9k,
    # sw/tile 4: 97.3k): 14-DOF needs the big
    # P=1024 swarm for basin capture; hybrid-init retries close the
    # two-arm wrong-basin tail (3 rounds leave 99.99% at 8 it; the
    # 4th closes it).
    "dual_arm_14dof": FusedPreset(1024, 8, 8, 4, 4, 4, "hybrid"),
    # Single-shot far targets are not this model's protocol (the
    # reference re-solves per frame; see harness.experiment) — deep
    # budget kept for kernel-rate evidence.
    "reference_arm": FusedPreset(256, 4, 100, 0, 0, 0),
    # 45-DOF 5-effector tree: the hardest single-shot basin in the zoo
    # (two 3-child branch points; random in-limit target sets are
    # mutually-coupled five-point constraints; the LM polish sticks in
    # limit/singularity traps from wrong basins). r4 frontier: retry
    # rounds re-solve the failed bucket via 8-step warm TARGET WALKS
    # (retry_walk — the reference's own per-frame protocol on the
    # failed bucket), the strongest retry primitive measured on this
    # model: 99.99% <1mm at 734 solves/s (S=16384; 4 rounds x 4-step
    # walks trade tail for speed: 99.89% @ 2,017/s; r3's best
    # cold-restart recipe, 8 hybrid rounds x 120 it, left 99.81%) —
    # bench_records/r4_sweep.jsonl r4-humanoid-walkretry*. The
    # retry bucket stays S/2-scale CONSTANT (decay 1): the pre-retry
    # failure rate is ~25-40%, so rounds x bucket must cover the
    # whole failure set, not a shrinking residue. r5 ladder
    # (bench_records/r5_sweep.jsonl): 6 rounds x 4-step walks with
    # --retry-walk-jitter 0.25 hold 99.98% at 1,412/s (curved paths
    # close the shallow-walk plateau: 99.95% straight -> 99.98% at
    # identical wall) — the mid-frontier between the 2,030/s @ 99.88%
    # speed point and this preset's 99.99% @ 738.8/s; jitter HURTS
    # the deep 8-step walks (99.92%), so the preset stays straight.
    "humanoid_45dof": FusedPreset(512, 8, 60, 0, 6, 6,
                                  retry_iterations=60,
                                  retry_bucket=8192, retry_walk=8,
                                  swarms=16_384),
    # 252.5k @ 100% at 30 DOF (sw/tile 16, out/bench_sweep28.jsonl); 100%
    # holds at every depth measured (160.9k @ 60 DOF, 113.2k @ 90 DOF,
    # out/bench_sweep20.jsonl). 4 it is the floor: 2 it measures the
    # same wall (polish + retries + dispatch dominate). Deep chains
    # cap the batch at 65536 (see `swarms`). snake:<links> shares the
    # recipe.
    "snake_30dof": FusedPreset(256, 16, 4, 2, 4, 2, swarms=65_536,
                               retry_bucket_decay=4),
}


def fused_preset(model: str) -> Optional[FusedPreset]:
    """Preset for a model-zoo name (``snake:<links>`` shares snake_30dof)."""
    if model.startswith("snake:"):
        model = "snake_30dof"
    return FUSED_PRESETS.get(model)
