"""Fully-fused PSO solve: the ENTIRE solver in one Pallas TPU kernel.

The reference's per-frame solve crosses the host/device boundary >= 3x
per PSO iteration (thrust reduction + scalar memcpy + synchronize,
reference kernel.cu:307-323; SURVEY.md §3.3). The jnp/`lax.scan` path
(ikpso_tpu.pso.solver) already removes all host syncs, but still
round-trips the swarm state ``(S, P, D)`` and fresh uniform draws
through HBM every iteration.

This module removes HBM from the loop entirely. One ``pallas_call``
grid step owns one or more complete swarms (``swarms_per_tile`` packs
several small swarms into each 8x128 register tile, amortizing the
elementwise work — see docs/PERFORMANCE.md):

  * state (positions, velocities, local bests) lives in VMEM for the
    whole solve — per swarm at P=1024, D=21 that is 3 x 86 KB, far
    under the ~16 MB/core budget;
  * warm-start init happens in-kernel from the packed per-swarm
    constants (no ``(S, P, D)`` inputs at all);
  * RNG is the TPU core's native PRNG (`pltpu.prng_random_bits`),
    seeded per swarm — the curand-per-particle equivalent
    (reference utility_kernels.cuh:21-47) without any state arrays;
  * the gbest "reduction" is a masked min over the resident tile —
    thrust::min_element reborn as a register reduction;
  * only the final result leaves the chip: gbest angles + fitness
    (one 128-lane row per swarm).

HBM traffic for an entire solve is O(S * (swarm consts + 128)) — the
kernel is compute-bound on the VPU by construction. Iterations and
particle count are trace-time constants (XLA model: shapes static per
jit; SURVEY.md §7 "static shapes").
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ikpso_tpu.models.chain import ChainSpec, IKProblem, Obstacles
from ikpso_tpu.ops import fk as fk_ops
from ikpso_tpu.ops.fitness import FitnessConfig
from ikpso_tpu.ops.pallas_fitness import (
    LANES,
    _pack_meta,
    _pack_swarm,
    fk_fitness_tile,
)
from ikpso_tpu.pso.config import PSOConfig
from ikpso_tpu.pso.solver import SolveResult

_INV_2_24 = np.float32(1.0 / (1 << 24))
_BIG_I32 = np.int32(2**31 - 1)


def _seg_rows_reduce(x, seg, op):
    """Segmented reduce-broadcast over aligned axis-0 blocks of ``seg`` rows.

    After the call, every row holds ``op``-reduction of its block —
    the reduction AND the broadcast in one pass, with no scalar
    extraction. Classic power-of-two ring-allreduce on the sublane
    axis: at each step, rows combine with the row ``s`` positions back
    *within their block* (cyclic), realized as two global
    ``pltpu.roll``s + a block-parity select (rows whose in-block index
    is < s must wrap to the block's tail, which the backward roll
    provides; values that crossed a block boundary are discarded by
    the select). ``seg`` must be a power of two and divide
    ``x.shape[0]``; blocks are aligned at multiples of ``seg``.
    """
    if seg == 1:
        return x
    nrows = x.shape[0]
    rid = jax.lax.broadcasted_iota(jnp.int32, x.shape, 0) % seg
    s = 1
    while s < seg:
        fwd = pltpu.roll(x, shift=s, axis=0)
        back = pltpu.roll(x, shift=(s - seg) % nrows, axis=0)
        x = op(x, jnp.where(rid >= s, fwd, back))
        s *= 2
    return x


def _uniform(shape):
    """U[0, 1) from the core PRNG: top 24 bits of each draw.

    ``prng_random_bits`` yields int32 on TPU — the shift MUST be
    logical, not arithmetic, or sign extension warps the distribution
    to [-0.5, 0.5) (found the hard way: PSO still "works" with that,
    it just converges ~30x worse).
    """
    bits = pltpu.prng_random_bits(shape)
    return jax.lax.shift_right_logical(bits, 8).astype(jnp.float32) * _INV_2_24


def _build_solver_kernel(
    spec: ChainSpec,
    pso: PSOConfig,
    fit: FitnessConfig,
    num_obstacles: int,
    rows: int,
    debug_uniforms: bool = False,
    use_orientation: bool = False,
    swarms_per_tile: int = 1,
    gbest_mode: str = "auto",
    vector_consts: bool = False,
    swarm_k: int = 0,
    hoist_bounds: bool = True,
):
    """Kernel: one grid step = ``swarms_per_tile`` complete PSO solves.

    Array layout: angles/velocities/lbest are ``(D * R, LANES)`` with
    DOF d occupying rows ``[d*R, (d+1)*R)`` and, within that block,
    swarm band j occupying sublane rows ``[j*rows, (j+1)*rows)``
    (``R = swarms_per_tile * rows``) — every per-DOF quantity is a
    native VPU tile shared by all packed swarms.

    Packing matters because small swarms converge *better* per
    evaluation (P=256 @ 30 iters beats P=1024 @ 20 with 2.7x fewer
    evals on the 7-DOF target set): the elementwise work (RNG, FK,
    velocity update — the dominant cost) is amortized over the packed
    swarms, while only the per-band masked reductions stay per-swarm.
    """
    d = spec.dof
    sw_count = swarms_per_tile
    R = sw_count * rows  # total sublane rows per DOF block
    use_distance = float(np.asarray(fit.distance_weight)) != 0.0
    randomized = pso.inertia_mode == "randomized"
    lay_anchor = 12  # MetaLayout.OFF_ANCHOR
    tile = (R, LANES)
    band = (rows, LANES)
    w = np.float32(pso.inertia)
    c1 = np.float32(pso.cognitive)
    c2 = np.float32(pso.social)
    vscale = np.float32(pso.init_velocity_scale)
    INF = np.float32(np.inf)

    def kernel(meta_ref, swarm_ref, bounds_ref, seed_ref, *rest):
        if debug_uniforms:
            u_ref, out_ref = rest
        else:
            (out_ref,) = rest
            u_ref = None
        pltpu.prng_seed(seed_ref[0, 0, 0], seed_ref[0, 0, 1])

        def meta(i):
            return meta_ref[0, i]

        # Per-swarm constants as per-band broadcast tiles (memoized;
        # loop-invariant, so Mosaic hoists them out of the PSO loop).
        _const_cache = {}

        if vector_consts:
            # Vectorized construction (rows == 1, so band j IS sublane
            # j): the swarm block arrives in VMEM as (sw_count, k);
            # constant i's per-band tile is column i broadcast along
            # lanes. One masked lane-reduction + one lane broadcast
            # (~4 vector ops) replaces sw_count scalar fills + a
            # concatenate (~sw_count vector stores) PER CONSTANT PER
            # GRID STEP — the r4 probe-B bisection measured this
            # constant-tile materialization at ~80 ms of the S=1M
            # batch; the r5 on-TPU A/B measured the hoist (this path +
            # hoist_bounds) at -48.3 ms on the bare I=8 S=1M kernel
            # with bitwise-identical outputs (bench_records/
            # r4_bisect.jsonl r4-bisectC). The one-hot sum has exactly
            # one nonzero term, so the result is bit-identical to the
            # scalar-fill path — EXCEPT for a constant that is exactly
            # -0.0, which the sum canonicalizes to +0.0 (-0.0 + 0.0 =
            # +0.0 round-to-nearest). Every downstream use is a
            # difference that gets squared, so VALUES never differ;
            # only bitwise A/Bs (test_fused_const_mode_paths_bit_
            # identical, tools/stage_probe_r4c.py) could flag inputs
            # containing -0.0 constants (e.g. from atan2).
            swarm_tile = swarm_ref[0]  # (sw_count, k) f32
            lane_k = jax.lax.broadcasted_iota(
                jnp.int32, (sw_count, swarm_k), 1
            )

            def sw(i):
                if i not in _const_cache:
                    col = jnp.sum(
                        jnp.where(lane_k == i, swarm_tile, 0.0),
                        axis=1,
                        keepdims=True,
                    )
                    _const_cache[i] = jnp.broadcast_to(col, tile)
                return _const_cache[i]
        else:
            def sw_scalar(j, i):
                return swarm_ref[0, j, i]

            def sw(i):
                if i not in _const_cache:
                    if sw_count == 1:
                        _const_cache[i] = sw_scalar(0, i)
                    else:
                        _const_cache[i] = jnp.concatenate(
                            [jnp.full(band, sw_scalar(j, i))
                             for j in range(sw_count)],
                            axis=0,
                        )
                return _const_cache[i]

        def fitness_of(x):
            return fk_fitness_tile(
                spec,
                lambda dd: x[dd * R:(dd + 1) * R],
                meta,
                sw,
                tile,
                num_obstacles=num_obstacles,
                use_distance_term=use_distance,
                gizmo_size=fit.gizmo_size,
                use_orientation=use_orientation,
                collision_shape=fit.collision_shape,
                trig_impl=fit.trig_impl,
            )

        # Joint-limit clamp bounds, (D*R, LANES) broadcast rows —
        # DMA'd once as a constant-index VMEM input (the block index
        # never changes, so the pipeline fetches it for grid step 0
        # only) instead of being rebuilt from SMEM scalars every grid
        # step (2*d*R vector stores/step, part of the ~80 ms r4
        # probe-B fixed share; docs/PERFORMANCE.md "Round 4").
        # ``hoist_bounds=False`` keeps the SMEM-scalar rebuild for the
        # within-session A/B (const_mode="scalar").
        if hoist_bounds:
            lo = bounds_ref[0]
            hi = bounds_ref[1]
        else:
            lo = jnp.concatenate(
                [jnp.full(tile, bounds_ref[0, dd]) for dd in range(d)], axis=0
            )
            hi = jnp.concatenate(
                [jnp.full(tile, bounds_ref[1, dd]) for dd in range(d)], axis=0
            )

        rekick_n = pso.rekick_interval
        # Debug-slot layout: init draws first (position draw at slot 0
        # when init_mode != "warm", then the velocity draw), iteration
        # draws follow in blocks of draws_per_iter.
        n_init_draws = 1 if pso.init_mode == "warm" else 2
        if debug_uniforms:
            draws_per_iter = (3 if randomized else 2) + (1 if rekick_n else 0)

            def draw(slot):
                return u_ref[0, slot]
        else:
            def draw(_slot):
                return _uniform((d * R, LANES))

        # Band id + in-band particle ids for the per-swarm masked
        # argmin (thrust::min_element's first-minimum semantics).
        row_id = jax.lax.broadcasted_iota(jnp.int32, tile, 0)
        pid = (row_id % rows) * LANES + jax.lax.broadcasted_iota(jnp.int32, tile, 1)
        band_of = row_id // rows
        band_masks = [band_of == j for j in range(sw_count)]

        # Init (reference initParticlesKernel, kernel.cu:223-266 /
        # SURVEY.md §2.3). "warm": every particle AT its swarm's anchor
        # pose; diversity from uniform velocities. "uniform"
        # (iteration-1 parity): positions U(lo, hi) over the joint
        # range, clamped to ±2π (matches pso/solver.py::init_swarm).
        # "hybrid": particle 0 of each swarm warm, the rest uniform —
        # anchored basin coverage for single-shot far targets.
        anchor0 = jnp.concatenate(
            [jnp.broadcast_to(sw(lay_anchor + dd), tile) for dd in range(d)], axis=0
        )
        if pso.init_mode == "warm":
            x0 = anchor0
        else:
            two_pi = np.float32(2.0 * np.pi)
            lo_c = jnp.maximum(lo, -two_pi)
            hi_c = jnp.minimum(hi, two_pi)
            x0 = lo_c + draw(0) * (hi_c - lo_c)
            if pso.init_mode == "hybrid":
                pid_d = jnp.concatenate([pid] * d, axis=0)
                x0 = jnp.where(pid_d == 0, anchor0, x0)

        v0 = (draw(n_init_draws - 1) * 2.0 - 1.0) * vscale
        lbest_val0 = fitness_of(x0)

        def gbest_tiles(lbest, lbest_val):
            """Per-band broadcast tiles of each swarm's global best.

            Scalar-reduction path: the winner mask selects exactly one
            particle per band; per-band masked scalar reductions on
            the VPU. The hot loop uses ``gbest_broadcast`` (segmented
            roll trees, bitwise-identical results) instead; this path
            remains for the final extraction — which needs the scalar
            band minima anyway — and as the ``gbest_mode="scalar"``
            oracle. Two other alternatives were measured and rejected: a fused
            (d, R, LANES) multi-axis reduction crashes Mosaic's layout
            assignment (layout.h rank check on the (d,1,1)
            intermediate), and routing the segmented sum+broadcast
            through 0/1-matrix MXU matmuls gives zero speedup while
            destroying convergence (the in-kernel f32 matmul rounds
            through reduced-precision passes, mm-scale noise on the
            social attractor).
            """
            ms = []
            masks = []
            for j in range(sw_count):
                bm = band_masks[j]
                m_j = jnp.min(jnp.where(bm, lbest_val, INF))
                win_j = jnp.min(
                    jnp.where(bm & (lbest_val == m_j), pid, _BIG_I32)
                )
                masks.append((bm & (pid == win_j)).astype(jnp.float32))
                ms.append(m_j)
            gb = jnp.concatenate(
                [
                    jnp.concatenate(
                        [
                            jnp.full(
                                band,
                                jnp.sum(lbest[dd * R:(dd + 1) * R] * masks[j]),
                            )
                            for j in range(sw_count)
                        ],
                        axis=0,
                    )
                    if sw_count > 1
                    else jnp.full(
                        tile, jnp.sum(lbest[dd * R:(dd + 1) * R] * masks[0])
                    )
                    for dd in range(d)
                ],
                axis=0,
            )
            return ms, gb

        # Hot-loop gbest: segmented roll-tree reduce-broadcast — no
        # scalar reductions at all. Bands partition the tile into
        # aligned `rows`-row blocks, so the per-band min / winner-pid /
        # coordinate-sum all reduce-broadcast in log2(rows) roll steps
        # after a single cross-lane reduction each. Exactly equal
        # (bitwise) to the scalar path: min/one-hot-sum are exact.
        use_rolls = gbest_mode != "scalar" and rows & (rows - 1) == 0

        def gbest_broadcast(lbest, lbest_val):
            mcol = jnp.min(lbest_val, axis=1, keepdims=True)
            m = _seg_rows_reduce(
                jnp.broadcast_to(mcol, tile), rows, jnp.minimum
            )
            pm = jnp.where(lbest_val == m, pid, _BIG_I32)
            wcol = jnp.min(pm, axis=1, keepdims=True)
            win = _seg_rows_reduce(
                jnp.broadcast_to(wcol, tile), rows, jnp.minimum
            )
            maskf = (pid == win).astype(jnp.float32)
            maskd = jnp.concatenate([maskf] * d, axis=0)
            scol = jnp.sum(lbest * maskd, axis=1, keepdims=True)
            return _seg_rows_reduce(
                jnp.broadcast_to(scol, (d * R, LANES)), rows, jnp.add
            )

        interval = max(1, pso.gbest_interval)
        if pso.iterations % interval:
            raise ValueError(
                f"iterations={pso.iterations} must be a multiple of "
                f"gbest_interval={interval}"
            )
        # With the re-kick enabled, the outer loop's unroll unit grows
        # from `gbest_interval` to `rekick_interval` iterations so that
        # kicks land at STATIC positions (block starts): the kernel
        # then takes only one extra RNG draw per kick block, not one
        # per iteration.
        if rekick_n:
            if rekick_n % interval or pso.iterations % rekick_n:
                raise ValueError(
                    f"rekick_interval={rekick_n} must be a multiple of "
                    f"gbest_interval={interval} and divide "
                    f"iterations={pso.iterations}"
                )
            block = rekick_n
        else:
            block = interval

        def body(blk, carry):
            x, v, lbest, lbest_val = carry
            if rekick_n:
                # Periodic velocity re-kick (PSOConfig.rekick_interval):
                # overwrite the inertia memory with a fresh init-style
                # draw at every block start except iteration 0. The
                # debug slot is the kick iteration's last draw slot.
                it0 = blk * block
                if debug_uniforms:
                    u_k = draw(
                        n_init_draws + it0 * draws_per_iter + draws_per_iter - 1
                    )
                else:
                    u_k = draw(None)
                if pso.rekick_threshold >= 0.0:
                    # Selective kick: per-band gbest value tile; only
                    # bands still above the threshold restart.
                    if use_rolls:
                        mcol = jnp.min(lbest_val, axis=1, keepdims=True)
                        m = _seg_rows_reduce(
                            jnp.broadcast_to(mcol, tile), rows, jnp.minimum
                        )
                    else:
                        m = jnp.concatenate(
                            [
                                jnp.full(
                                    band,
                                    jnp.min(
                                        jnp.where(band_masks[j], lbest_val, INF)
                                    ),
                                )
                                for j in range(sw_count)
                            ],
                            axis=0,
                        )
                    pred = (it0 > 0) & (
                        m > np.float32(pso.rekick_threshold)
                    )
                    pred = jnp.concatenate([pred] * d, axis=0)
                else:
                    pred = it0 > 0
                v = jnp.where(
                    pred, (u_k * 2.0 - 1.0) * np.float32(pso.rekick_scale), v
                )
            gb = None
            for sub in range(block):  # static unroll
                it = blk * block + sub
                if sub % interval == 0:
                    # One gbest extraction serves `interval` sub-steps
                    # (the social attractor lags <= interval-1 steps).
                    if use_rolls:
                        gb = gbest_broadcast(lbest, lbest_val)
                    else:
                        _, gb = gbest_tiles(lbest, lbest_val)
                if debug_uniforms:
                    base = n_init_draws + it * draws_per_iter
                    u_c = draw(base)
                    u_s = draw(base + 1)
                    u_w = draw(base + 2) if randomized else None
                else:
                    u_c = draw(None)
                    u_s = draw(None)
                    u_w = draw(None) if randomized else None
                w_t = pso.inertia_at(it) if pso.inertia_end >= 0.0 else w
                if randomized:
                    v = w_t * u_w * v + c1 * u_c * (lbest - x) + c2 * u_s * (gb - x)
                else:
                    v = w_t * v + c1 * u_c * (lbest - x) + c2 * u_s * (gb - x)
                # Integrate + per-axis joint-limit clamp (kernel.cu:168-187).
                x = jnp.clip(x + v, lo, hi)
                f = fitness_of(x)
                better = f < lbest_val
                lbest_val = jnp.where(better, f, lbest_val)
                bmask = jnp.concatenate([better] * d, axis=0)
                lbest = jnp.where(bmask, x, lbest)
            return x, v, lbest, lbest_val

        outer = pso.iterations // block
        if debug_uniforms:
            # Static unroll so the debug-uniform slots index statically.
            carry = (x0, v0, x0, lbest_val0)
            for it_outer in range(outer):
                carry = body(it_outer, carry)
            x, v, lbest, lbest_val = carry
        else:
            x, v, lbest, lbest_val = jax.lax.fori_loop(
                0, outer, body, (x0, v0, x0, lbest_val0)
            )

        # Result rows per swarm: the flattened [gbest angles..., gbest
        # value] vector packed into ceil((D+1)/LANES) rows of LANES
        # lanes each (one row when D < 128 — deeper chains get more
        # rows instead of a dof cap).
        rows_out = (d + 1 + LANES - 1) // LANES
        if use_rolls and rows_out == 1:
            # Vectorized extraction: the scalar path below issues
            # d x sw_count sequential full-slab masked reductions —
            # measured ~300 ms of the S=1M headline batch (~36 us per
            # grid step, r3 stage bisection), dwarfing the 8-iteration
            # PSO loop itself. Instead: take the roll-tree broadcast
            # tiles (every band row already holds its swarm's gbest
            # coordinate / band min), one-hot-mask lane dd into the
            # dd-th coordinate slab, and fold the d slabs with a
            # log2(d) slab tree — a transpose of (d, swarms) realized
            # as full-tile adds of exact one-nonzero terms, so the
            # result is bit-identical to the scalar path.
            gb_bc = gbest_broadcast(lbest, lbest_val)  # (d*R, LANES)
            mcol = jnp.min(lbest_val, axis=1, keepdims=True)
            m_bc = _seg_rows_reduce(
                jnp.broadcast_to(mcol, tile), rows, jnp.minimum
            )  # (R, LANES): band min everywhere
            lane_f = jax.lax.broadcasted_iota(jnp.int32, (d * R, LANES), 1)
            row_f = jax.lax.broadcasted_iota(jnp.int32, (d * R, LANES), 0)
            acc = jnp.where(lane_f == row_f // R, gb_bc, 0.0)
            n = d
            while n > 1:
                h = n // 2
                folded = acc[: h * R] + acc[h * R : 2 * h * R]
                if n & 1:
                    acc = jnp.concatenate(
                        [folded, acc[2 * h * R : (2 * h + 1) * R]], axis=0
                    )
                else:
                    acc = folded
                n = h + (n & 1)
            lane_r = jax.lax.broadcasted_iota(jnp.int32, (R, LANES), 1)
            packed = jnp.where(lane_r == d, m_bc, acc)  # (R, LANES)
            if rows == 1:
                out_ref[0] = packed
            else:
                out_ref[0] = jnp.concatenate(
                    [packed[j * rows : j * rows + 1] for j in range(sw_count)],
                    axis=0,
                )
        else:
            gvals, gb = gbest_tiles(lbest, lbest_val)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1)
            out_rows = []
            for j in range(sw_count):
                for r in range(rows_out):
                    lo_d = r * LANES
                    hi_d = min(d, (r + 1) * LANES)
                    if lo_d <= d < (r + 1) * LANES:
                        acc = jnp.where(lane == d - lo_d, gvals[j], 0.0)
                    else:
                        acc = jnp.zeros((1, LANES), jnp.float32)
                    for dd in range(lo_d, hi_d):
                        acc = jnp.where(
                            lane == dd - lo_d, gb[dd * R + j * rows, 0], acc
                        )
                    out_rows.append(acc)
            out_ref[0] = jnp.concatenate(out_rows, axis=0)

    return kernel


def fused_solve_raw(
    spec: ChainSpec,
    pso: PSOConfig,
    fit: FitnessConfig,
    meta: jnp.ndarray,
    swarm: jnp.ndarray,
    limits: jnp.ndarray,
    seeds: jnp.ndarray,
    num_particles: int,
    num_obstacles: int,
    interpret: bool = False,
    uniforms: Optional[jnp.ndarray] = None,
    use_orientation: bool = False,
    swarms_per_tile: int = 1,
    gbest_mode: str = "auto",
    const_mode: str = "auto",
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the full-solve kernel. Returns (gbest (S, D), gbest_val (S,)).

    ``uniforms`` (testing only): ``(S/SW, n_draws, D*R, LANES)`` — inject
    the random stream instead of the on-core PRNG, so the kernel's
    trajectory can be replayed bit-for-bit by a jnp reference.

    ``const_mode``: ``"auto"`` (default) feeds the loop-invariant
    clamp-bound tiles as a constant-index VMEM input and, when
    ``rows == 1``, builds the per-swarm constant tiles by one-hot
    lane-select from a VMEM swarm block; ``"scalar"`` forces the r3
    SMEM-scalar construction (bit-identical results — A/B oracle).
    """
    if num_particles % LANES:
        raise ValueError(f"num_particles must be a multiple of {LANES}")
    sw_count = swarms_per_tile
    rows = num_particles // LANES
    total_rows = sw_count * rows
    if total_rows < 8:
        raise ValueError(
            f"swarms_per_tile * (num_particles/128) must be >= 8 sublanes; "
            f"got {sw_count} * {rows}"
        )
    s = swarm.shape[0]
    if s % sw_count:
        raise ValueError(f"swarm count {s} not divisible by swarms_per_tile={sw_count}")
    grid_n = s // sw_count
    d = spec.dof
    k = swarm.shape[-1]
    # Vectorized per-swarm-constant construction needs band == sublane
    # (rows == 1) and a sublane-aligned swarm count per tile;
    # const_mode="scalar" forces the r3 SMEM-scalar kernel (A/B
    # oracle / fallback).
    hoist = const_mode != "scalar"
    if const_mode == "auto" and hoist:
        # The hoisted clamp-bound input adds a (2, D*R, LANES) VMEM
        # block on TOP of the resident state; deep-chain tiles that
        # fit under scalar mode can OOM scoped VMEM with it (measured
        # r5: the 90-DOF snake preset tile = 13.3 MB state + 2.95 MB
        # bounds -> Mosaic "17.54M > 16M" stack OOM, while 129/150-DOF
        # at state+bounds <= 13.5 MB compile and run fine;
        # bench_records/r5_sweep.jsonl r5-snake90). Demote to the
        # scalar bounds rebuild when the combined estimate exceeds the
        # same empirical ~14 MB budget make_fused_solver gates on.
        state_est = 9 * d * total_rows * LANES * 4
        bounds_bytes = 2 * d * total_rows * LANES * 4
        if state_est + bounds_bytes > 14 * 2**20:
            hoist = False
    vector_consts = (
        hoist and sw_count > 1 and rows == 1 and sw_count % 8 == 0
    )
    kernel = _build_solver_kernel(
        spec, pso, fit, num_obstacles, rows,
        debug_uniforms=uniforms is not None, use_orientation=use_orientation,
        swarms_per_tile=sw_count, gbest_mode=gbest_mode,
        vector_consts=vector_consts, swarm_k=k, hoist_bounds=hoist,
    )

    n = spec.num_nodes
    rows_out = (d + 1 + LANES - 1) // LANES
    flops_pp = ((n - 1) * 140 + d * 12) * (pso.iterations + 1)
    if hoist:
        # Clamp-bound broadcast tiles, precomputed once: (2, D*R,
        # LANES) with DOF dd's rows at [dd*R, (dd+1)*R) — lo/hi on the
        # leading dim so the kernel's split is an index, not a
        # sublane-offset slice.
        bounds = jnp.stack([
            jnp.broadcast_to(
                jnp.asarray(limits[b], jnp.float32).reshape(d, 1, 1),
                (d, total_rows, LANES),
            ).reshape(d * total_rows, LANES)
            for b in range(2)
        ])
        bounds_spec = pl.BlockSpec(
            (2, d * total_rows, LANES), lambda i: (0, 0, 0),
            memory_space=pltpu.VMEM,
        )
    else:
        bounds = limits
        bounds_spec = pl.BlockSpec(
            (2, d), lambda i: (0, 0), memory_space=pltpu.SMEM
        )
    in_specs = [
        pl.BlockSpec((1, meta.shape[-1]), lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(
            (1, sw_count, k), lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM if vector_consts else pltpu.SMEM,
        ),
        bounds_spec,
        # (G, 1, 2) so the trailing block dims equal the array dims
        # (TPU block-shape divisibility rule).
        pl.BlockSpec((1, 1, 2), lambda i: (i, 0, 0), memory_space=pltpu.SMEM),
    ]
    args = [
        meta,
        swarm.reshape(grid_n, sw_count, k),
        bounds,
        seeds[::sw_count][:, None, :],
    ]
    if uniforms is not None:
        nd = uniforms.shape[1]
        in_specs.append(
            pl.BlockSpec(
                (1, nd, d * total_rows, LANES),
                lambda i: (i, 0, 0, 0),
                memory_space=pltpu.VMEM,
            )
        )
        args.append(uniforms)
    # Under shard_map (ikpso_tpu.parallel.sharded impl="fused") the
    # output varies over whatever mesh axes the inputs vary over; the
    # vma must be declared explicitly on pallas_call out_shapes.
    vma = frozenset()
    for a in args:
        vma |= frozenset(getattr(jax.typeof(a), "vma", ()) or ())
    out = pl.pallas_call(
        kernel,
        grid=(grid_n,),
        in_specs=in_specs,
        # Trailing block dims must equal the array dims.
        out_specs=pl.BlockSpec(
            (1, sw_count * rows_out, LANES),
            lambda i: (i, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct(
            (grid_n, sw_count * rows_out, LANES), jnp.float32, vma=vma
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops_pp * s * num_particles,
            bytes_accessed=s * (k + LANES) * 4,
            transcendentals=2 * d * s * num_particles * (pso.iterations + 1),
        ),
        # Swarms are independent: declare the grid axis parallel so
        # Mosaic can split grid steps across the chip's TensorCores.
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel",),
        ),
        interpret=interpret,
    )(*args)
    out = out.reshape(s, rows_out * LANES)
    return out[:, :d], out[:, d]


def make_fused_solver(
    spec: ChainSpec,
    pso: PSOConfig = PSOConfig(),
    fit: FitnessConfig = FitnessConfig(),
    obstacles: Optional[Obstacles] = None,
    num_particles: int = 1024,
    interpret: bool = False,
    swarms_per_tile: int = 1,
):
    """A jitted ``(problem, key) -> SolveResult`` running the megakernel.

    Drop-in for :func:`ikpso_tpu.pso.solver.make_solver` minus the
    per-iteration ``trace`` (the scan-based solver remains the
    convergence-analysis tool; ``trace`` here has one entry: the final
    gbest fitness).
    """
    # Deep chains (dof > 127) pack the gbest result into multiple
    # 128-lane rows per swarm — no dof cap. The binding limit is the
    # VMEM working set of the resident state (x, v, lbest, plus the
    # clamp-bound and gbest scratch tiles): warn-by-raise when the
    # configuration clearly cannot fit, with the fix in the message.
    # Factor 9 is empirical: a 129-DOF x (32,128)-tile config measured
    # 17.47 MB of scoped VMEM (~8.3 state-array equivalents — x/v/lbest
    # plus clamp bounds, gbest scratch and Mosaic stack headroom).
    state_bytes = 9 * spec.dof * swarms_per_tile * (num_particles // 128) * 128 * 4
    if state_bytes > 14 * 2**20:
        raise ValueError(
            f"fused megakernel tile too large: dof={spec.dof} x "
            f"swarms_per_tile={swarms_per_tile} x particles="
            f"{num_particles} needs ~{state_bytes / 2**20:.0f} MB of "
            f"VMEM-resident state (~14 MB budget) — shrink "
            f"swarms_per_tile or num_particles, or use impl='jnp'"
        )
    num_obstacles = 0 if obstacles is None else obstacles.count
    if num_obstacles and fit.collision_backend == "gjk":
        raise NotImplementedError(
            "collision_backend='gjk' is jnp-path only: a 50-round "
            "support-point loop per (node x link x obstacle) pair is "
            "anti-TPU-native, so the fused megakernel fuses only the "
            "closed-form backend ('sat'; exact for both collision "
            "shapes). Use impl='jnp' for GJK, or collision_backend="
            "'sat' here."
        )
    use_orientation_w = float(np.asarray(fit.orientation_weight)) != 0.0
    limits = jnp.stack(
        [spec.min_rotation[1:].reshape(-1), spec.max_rotation[1:].reshape(-1)]
    )

    @jax.jit
    def _solve(problem: IKProblem, key: jnp.ndarray) -> SolveResult:
        # Pack and post-error run through the SoA row FK (swarms on
        # the lane axis): the tensor FK's (S, N, 3)/(S, 3, 3)
        # intermediates pad ~40x under TPU tiling and cost ~145 ms of
        # HBM traffic per S=1M batch (r3 stage bisection — ~20% of
        # the headline wall for math worth a few ms).
        from ikpso_tpu.pso.polish_soa import (
            anchor_positions_flat,
            true_effector_error_rows,
        )

        use_orientation = use_orientation_w and problem.target_rot is not None
        meta = _pack_meta(spec, fit, obstacles, use_orientation)
        anchor_angles = fk_ops.pose_to_angles(spec, problem.pose)
        swarm = _pack_swarm(spec, problem, anchor_angles,
                            anchor_positions_flat(spec, problem),
                            use_orientation)
        s = swarm.shape[0]
        seeds = jax.random.bits(key, (s, 2), dtype=jnp.uint32).astype(jnp.int32)
        gbest, gbest_val = fused_solve_raw(
            spec, pso, fit, meta, swarm, limits, seeds,
            num_particles, num_obstacles, interpret=interpret,
            use_orientation=use_orientation, swarms_per_tile=swarms_per_tile,
        )
        solved_pose = fk_ops.angles_to_pose(spec, problem.pose[..., 0, :], gbest)
        err = true_effector_error_rows(spec, problem, gbest)
        return SolveResult(
            angles=gbest,
            fitness=gbest_val,
            pose=solved_pose,
            effector_error=err,
            trace=gbest_val[None],
        )

    return _solve
