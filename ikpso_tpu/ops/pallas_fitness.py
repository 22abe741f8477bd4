"""Fused FK+fitness Pallas TPU kernel.

This is the hot op: the reference spends its time in
``calculateDistance`` — a per-particle FK rollout plus cost
accumulation, ~250k evaluations per frame (SURVEY.md §3.4-§3.5). The
naive jnp path materializes per-particle rotation stacks
``(S, P, N, 3, 3)`` in HBM between fused ops; this kernel keeps the
whole transform chain in VMEM registers and writes back only the
``(S, P)`` fitness — HBM traffic drops from O(S*P*N*9) to
O(S*P*D) read + O(S*P) write.

Layout: particles ride the TPU lane axis. The kernel consumes angles
in "DP" form ``(S, D, P)`` viewed as ``(S, D, P/128, 128)``; each grid
step processes one swarm x one particle tile of ``(8, 128) = 1024``
particles, with every per-node quantity an ``(8, 128)`` vector
register. The FK tree walk is unrolled at trace time (static parent
indices), so the generated kernel is straight-line VPU code: ~9 fused
multiply-adds per 3x3 compose, sin/cos on the angle rows, and the
cost reductions.

Per-swarm constants (root rotation, origin, anchors, targets) are
packed into one small vector; per-chain constants (term weights,
lengths, effector weights) into another (SMEM) — the TPU equivalent of
the reference's ``NodeCUDA*`` constant chain in managed memory.

Box-obstacle rejection (SAT, reference kernel.cu:104-136) is fused
into the same kernel when obstacles are present: each obstacle's
center/half/rotation is packed per-chain, and every node gizmo + link
box is tested with the 15-axis separating-axis theorem on (8, 128)
vectors.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ikpso_tpu.models.chain import ChainSpec, IKProblem, Obstacles
from ikpso_tpu.ops import fk as fk_ops
from ikpso_tpu.ops.fitness import COLLISION_PENALTY, FitnessConfig
from ikpso_tpu.ops.rotations import euler_xyz_to_matrix

LANES = 128
SUBLANES = 8
TILE_P = LANES * SUBLANES  # particles per grid step


# Polynomial sincos: the roofline microbenchmarks (utils/roofline.py)
# measure a stock sin at ~63 op-equivalents on this v5e, making trig
# ~65% of the FK kernel's speed-of-light time. The minimax-fit odd/even
# polynomials below (range-reduced to [-pi, pi]) cost ~30 ops per
# angle for BOTH sin and cos. Error over [-4pi, 4pi]: 3.1e-7 (sin) /
# 3.6e-8 (cos) is the polynomial FIT error in exact arithmetic; the
# f32 end-to-end max error is 1.2e-6 / 5.3e-7, dominated by the
# one-step range reduction's round-off — micrometre scale at this
# reach, so accuracy is unchanged (validated vs the jnp path in tests
# and the float64 native oracle).
_INV_2PI = np.float32(1.0 / (2.0 * np.pi))
_2PI = np.float32(2.0 * np.pi)
_SIN_C = tuple(np.float32(v) for v in (
    9.9999970703e-01, -1.6666577215e-01, 8.3325581177e-03,
    -1.9812575520e-04, 2.7040512127e-06, -2.0534244526e-08,
))
_COS_C = tuple(np.float32(v) for v in (
    9.9999999228e-01, -4.9999991772e-01, 4.1666524360e-02,
    -1.3887970390e-03, 2.4773423752e-05, -2.7113368761e-07,
    1.7369116668e-09,
))


def _sincos(x, trig_impl: str = "poly"):
    """(sin x, cos x) — polynomial by default, stock lowering optionally."""
    if trig_impl == "exact":
        return jnp.sin(x), jnp.cos(x)
    r = x - jnp.round(x * _INV_2PI) * _2PI
    r2 = r * r
    s = _SIN_C[-1]
    for coef in _SIN_C[-2::-1]:
        s = s * r2 + coef
    c = _COS_C[-1]
    for coef in _COS_C[-2::-1]:
        c = c * r2 + coef
    return s * r, c


def _rot_xyz(ax, ay, az, trig_impl: str = "poly"):
    """Rx@Ry@Rz on elementwise tiles -> 9 tile-shaped entries."""
    sx, cx = _sincos(ax, trig_impl)
    sy, cy = _sincos(ay, trig_impl)
    sz, cz = _sincos(az, trig_impl)
    return (
        cy * cz, -cy * sz, sy,
        cx * sz + sx * sy * cz, cx * cz - sx * sy * sz, -sx * cy,
        sx * sz - cx * sy * cz, sx * cz + cx * sy * sz, cx * cy,
    )


def _mat_mul(a, b):
    """3x3 compose of two 9-tuples of tiles (row-major)."""
    return (
        a[0] * b[0] + a[1] * b[3] + a[2] * b[6],
        a[0] * b[1] + a[1] * b[4] + a[2] * b[7],
        a[0] * b[2] + a[1] * b[5] + a[2] * b[8],
        a[3] * b[0] + a[4] * b[3] + a[5] * b[6],
        a[3] * b[1] + a[4] * b[4] + a[5] * b[7],
        a[3] * b[2] + a[4] * b[5] + a[5] * b[8],
        a[6] * b[0] + a[7] * b[3] + a[8] * b[6],
        a[6] * b[1] + a[7] * b[4] + a[8] * b[7],
        a[6] * b[2] + a[7] * b[5] + a[8] * b[8],
    )


def _sat_obb(px, py, pz, rot, half, oc, oh, orot):
    """SAT intersect: per-particle box (center p, rotation ``rot``
    9-tuple of tiles, half extents ``half`` 3-tuple of scalars) vs one
    static box (center ``oc``, half ``oh``, rotation ``orot`` — scalars).

    Returns a boolean tile. Mirrors ops.collision.obb_obb_intersect
    with A = the particle box, B = the obstacle.
    """
    eps = 1e-6
    # C = Ra^T Rb  (Ra rows are tiles, Rb is scalar 3x3)
    c = [None] * 9
    for i in range(3):
        for j in range(3):
            # column i of Ra dot column j of Rb
            c[i * 3 + j] = (
                rot[i] * orot[0][j] + rot[3 + i] * orot[1][j] + rot[6 + i] * orot[2][j]
            )
    # T = Ra^T (ob - pa)
    dx, dy, dz = oc[0] - px, oc[1] - py, oc[2] - pz
    t = (
        rot[0] * dx + rot[3] * dy + rot[6] * dz,
        rot[1] * dx + rot[4] * dy + rot[7] * dz,
        rot[2] * dx + rot[5] * dy + rot[8] * dz,
    )
    ac = [jnp.abs(v) + eps for v in c]
    a = half
    b = oh
    sep = jnp.zeros_like(px, dtype=bool)
    for i in range(3):
        rb = b[0] * ac[i * 3] + b[1] * ac[i * 3 + 1] + b[2] * ac[i * 3 + 2]
        sep |= jnp.abs(t[i]) > a[i] + rb
    for j in range(3):
        ra = a[0] * ac[j] + a[1] * ac[3 + j] + a[2] * ac[6 + j]
        proj = t[0] * c[j] + t[1] * c[3 + j] + t[2] * c[6 + j]
        sep |= jnp.abs(proj) > ra + b[j]
    for i in range(3):
        i1, i2 = (i + 1) % 3, (i + 2) % 3
        for j in range(3):
            j1, j2 = (j + 1) % 3, (j + 2) % 3
            ra = a[i1] * ac[i2 * 3 + j] + a[i2] * ac[i1 * 3 + j]
            rb = b[j1] * ac[i * 3 + j2] + b[j2] * ac[i * 3 + j1]
            lhs = jnp.abs(t[i2] * c[i1 * 3 + j] - t[i1] * c[i2 * 3 + j])
            sep |= lhs > ra + rb
    return ~sep


def _point_obb_dist2(px, py, pz, oc, oh, orot):
    """Exact squared point->OBB distance on tiles (sphere-vs-box core).

    Mirrors ops.collision.point_obb_dist2: clamp the point, in the box
    frame, to the box. ``oc``/``oh`` scalar 3-tuples, ``orot`` scalar
    3x3 (rows r, cols c); q_i = column i of R dotted with (p - c).
    """
    dx, dy, dz = px - oc[0], py - oc[1], pz - oc[2]
    d2 = None
    for i in range(3):
        qi = orot[0][i] * dx + orot[1][i] * dy + orot[2][i] * dz
        di = jnp.maximum(jnp.abs(qi) - oh[i], 0.0)
        d2 = di * di if d2 is None else d2 + di * di
    return d2


def _seg_obb_dist2(p0, p1, oc, oh, orot, iterations=24):
    """Exact squared segment->OBB distance on tiles (capsule-vs-box core).

    Mirrors ops.collision.segment_obb_dist2: branch-free bisection on
    the convex distance's monotone derivative, statically unrolled —
    every lane runs the same straight-line VPU code.
    """
    q0 = []
    q1 = []
    for i in range(3):
        q0.append(
            orot[0][i] * (p0[0] - oc[0])
            + orot[1][i] * (p0[1] - oc[1])
            + orot[2][i] * (p0[2] - oc[2])
        )
        q1.append(
            orot[0][i] * (p1[0] - oc[0])
            + orot[1][i] * (p1[1] - oc[1])
            + orot[2][i] * (p1[2] - oc[2])
        )
    b = [q1[i] - q0[i] for i in range(3)]

    def g(t):
        acc = None
        for i in range(3):
            qi = q0[i] + t * b[i]
            si = jnp.sign(qi) * jnp.maximum(jnp.abs(qi) - oh[i], 0.0)
            acc = si * b[i] if acc is None else acc + si * b[i]
        return acc

    lo = jnp.zeros_like(p0[0])
    hi = jnp.ones_like(p0[0])
    for _ in range(iterations):
        tm = 0.5 * (lo + hi)
        pred = g(tm) > 0
        hi = jnp.where(pred, tm, hi)
        lo = jnp.where(pred, lo, tm)
    t = 0.5 * (lo + hi)
    d2 = None
    for i in range(3):
        qi = q0[i] + t * b[i]
        di = jnp.maximum(jnp.abs(qi) - oh[i], 0.0)
        d2 = di * di if d2 is None else d2 + di * di
    return d2


class MetaLayout:
    """Offsets into the packed per-chain (meta) and per-swarm vectors.

    meta:  [aw, dw, len_1..len_{N-1}, w_e.., (center3 half3 rot9) x C]
    swarm: [root R (9), origin (3), anchor angles (D), targets (3E),
            anchor positions (3(N-1))]
    """

    def __init__(self, spec: ChainSpec, num_obstacles: int,
                 use_orientation: bool = False):
        d = spec.dof
        e_count = len(spec.effector_idx)
        num_joints = spec.num_nodes - 1
        self.OFF_LEN = 2
        self.OFF_EW = 2 + num_joints
        self.OFF_OBS = self.OFF_EW + e_count
        # Orientation weight rides at the END of meta so the offsets
        # above stay stable whether or not it is present.
        self.OFF_OW = self.OFF_OBS + 15 * num_obstacles
        self.meta_size = self.OFF_OW + (1 if use_orientation else 0)
        self.OFF_ROOT = 0
        self.OFF_ORIGIN = 9
        self.OFF_ANCHOR = 12
        self.OFF_TGT = 12 + d
        self.OFF_APOS = 12 + d + 3 * e_count
        # Optional per-effector target rotation matrices (9E), appended.
        self.OFF_TROT = self.OFF_APOS + 3 * num_joints
        self.swarm_size = self.OFF_TROT + (9 * e_count if use_orientation else 0)


def fk_fitness_tile(
    spec: ChainSpec,
    get_x,
    meta,
    sw,
    tile_shape,
    *,
    num_obstacles: int,
    use_distance_term: bool,
    gizmo_size: float,
    use_orientation: bool = False,
    collision_shape: str = "box",
    trig_impl: str = "poly",
):
    """FK rollout + cost for one particle tile (shared kernel body).

    ``get_x(d)`` returns the tile of angles for DOF ``d``; ``meta(i)`` /
    ``sw(i)`` read scalars from the packed per-chain / per-swarm
    constant vectors (layout: :class:`MetaLayout`). Used by both the
    standalone fitness kernel and the fused full-solve kernel
    (ikpso_tpu.pso.fused).
    """
    n = spec.num_nodes
    num_joints = n - 1
    eff_set = {e: i for i, e in enumerate(spec.effector_idx)}
    lay = MetaLayout(spec, num_obstacles, use_orientation)

    aw = meta(0)
    dw = meta(1)
    root_r = tuple(sw(lay.OFF_ROOT + i) for i in range(9))
    root_p = tuple(sw(lay.OFF_ORIGIN + i) for i in range(3))

    rot_diff = jnp.zeros(tile_shape, jnp.float32)
    pos_diff = jnp.zeros(tile_shape, jnp.float32)
    cost = jnp.zeros(tile_shape, jnp.float32)
    hit = jnp.zeros(tile_shape, jnp.bool_)

    if num_obstacles:
        obstacles = []
        for o in range(num_obstacles):
            base = lay.OFF_OBS + o * 15
            oc = tuple(meta(base + i) for i in range(3))
            oh = tuple(meta(base + 3 + i) for i in range(3))
            orot = tuple(
                tuple(meta(base + 6 + r * 3 + cc) for cc in range(3))
                for r in range(3)
            )
            obstacles.append((oc, oh, orot))
        gz = gizmo_size * 0.5
        node_half = (gz, gz, gz)

    # World rotation/position per node; parents precede children.
    rots = {0: root_r}
    poss = {0: root_p}
    for k in range(1, n):
        d0 = 3 * (k - 1)
        ax = get_x(d0)
        ay = get_x(d0 + 1)
        az = get_x(d0 + 2)
        local = _rot_xyz(ax, ay, az, trig_impl)
        parent = spec.parent[k]
        pr = rots[parent]
        rk = _mat_mul(pr, local)
        length = meta(lay.OFF_LEN + (k - 1))
        pp = poss[parent]
        pk = (
            pp[0] + length * rk[0],
            pp[1] + length * rk[3],
            pp[2] + length * rk[6],
        )
        rots[k] = rk
        poss[k] = pk

        # Angular locality (reference kernel.cu:78-84).
        da = ax - sw(lay.OFF_ANCHOR + d0)
        db = ay - sw(lay.OFF_ANCHOR + d0 + 1)
        dc = az - sw(lay.OFF_ANCHOR + d0 + 2)
        rot_diff += da * da + db * db + dc * dc

        if use_distance_term:
            ox = pk[0] - sw(lay.OFF_APOS + d0)
            oy = pk[1] - sw(lay.OFF_APOS + d0 + 1)
            oz = pk[2] - sw(lay.OFF_APOS + d0 + 2)
            pos_diff += ox * ox + oy * oy + oz * oz

        if num_obstacles:
            if collision_shape == "capsule":
                # Node sphere + parent->node link capsule vs every
                # obstacle: exact closed-form point/segment OBB
                # distances (ops.collision capsule shape).
                node_r2 = np.float32((gizmo_size * 0.5) ** 2)
                link_r2 = np.float32((gizmo_size * 0.125) ** 2)
                for oc, oh, orot in obstacles:
                    hit |= (
                        _point_obb_dist2(pk[0], pk[1], pk[2], oc, oh, orot)
                        <= node_r2
                    )
                    hit |= _seg_obb_dist2(pp, pk, oc, oh, orot) <= link_r2
            else:
                # Node gizmo cube + link box vs every obstacle
                # (reference kernel.cu:104-136).
                mid = (
                    (pk[0] + pp[0]) * 0.5,
                    (pk[1] + pp[1]) * 0.5,
                    (pk[2] + pp[2]) * 0.5,
                )
                link_half = (
                    # length is a traced scalar; fine inside the tuple
                    length * 0.5,
                    gizmo_size * 0.25 * 0.5,
                    gizmo_size * 0.25 * 0.5,
                )
                for oc, oh, orot in obstacles:
                    hit |= _sat_obb(pk[0], pk[1], pk[2], rk, node_half, oc, oh, orot)
                    hit |= _sat_obb(mid[0], mid[1], mid[2], rk, link_half, oc, oh, orot)

        if k in eff_set:
            e = eff_set[k]
            w = meta(lay.OFF_EW + e)
            tx = sw(lay.OFF_TGT + 3 * e)
            ty = sw(lay.OFF_TGT + 3 * e + 1)
            tz = sw(lay.OFF_TGT + 3 * e + 2)
            ex = pk[0] - tx
            ey = pk[1] - ty
            ez = pk[2] - tz
            cost += w * (ex * ex + ey * ey + ez * ez)

            if use_orientation:
                # Squared Frobenius distance between the effector's
                # world rotation and its target rotation (matches
                # ops.fitness orientation term).
                ow = meta(lay.OFF_OW)
                fro = jnp.zeros(tile_shape, jnp.float32)
                for i in range(9):
                    dr = rk[i] - sw(lay.OFF_TROT + 9 * e + i)
                    fro += dr * dr
                cost += ow * w * fro

    total = cost + (aw / num_joints) * rot_diff
    if use_distance_term:
        total = total + (dw / num_joints) * pos_diff
    if num_obstacles:
        total = jnp.where(hit, COLLISION_PENALTY, total)
    return total


def _build_kernel(spec: ChainSpec, num_obstacles: int, use_distance_term: bool,
                  gizmo_size: float, use_orientation: bool = False,
                  collision_shape: str = "box", trig_impl: str = "poly"):
    """Trace-time specialization of the kernel body for one topology."""

    def kernel(meta_ref, swarm_ref, x_ref, out_ref):
        out_ref[0] = fk_fitness_tile(
            spec,
            lambda d: x_ref[0, d],
            lambda i: meta_ref[0, i],
            lambda i: swarm_ref[0, 0, i],
            (SUBLANES, LANES),
            num_obstacles=num_obstacles,
            use_distance_term=use_distance_term,
            gizmo_size=gizmo_size,
            use_orientation=use_orientation,
            collision_shape=collision_shape,
            trig_impl=trig_impl,
        )

    return kernel


def _pack_meta(
    spec: ChainSpec,
    fit: FitnessConfig,
    obstacles: Optional[Obstacles],
    use_orientation: bool = False,
) -> jnp.ndarray:
    parts = [
        jnp.stack([jnp.float32(fit.angle_weight), jnp.float32(fit.distance_weight)]),
        spec.length[1:],
        spec.effector_weight[np.array(spec.effector_idx)],
    ]
    if obstacles is not None and obstacles.count > 0:
        per = jnp.concatenate(
            [
                obstacles.center,
                obstacles.half_extent,
                obstacles.rot.reshape(-1, 9),
            ],
            axis=-1,
        )  # (C, 15)
        parts.append(per.reshape(-1))
    if use_orientation:
        parts.append(jnp.asarray([fit.orientation_weight], jnp.float32))
    return jnp.concatenate(parts).astype(jnp.float32)[None, :]  # (1, M)


def _pack_swarm(
    spec: ChainSpec, problem: IKProblem, anchor_angles, anchor_positions,
    use_orientation: bool = False,
) -> jnp.ndarray:
    """(S, K) per-swarm constant vector (see kernel layout comment).

    ``anchor_positions`` may be the tensor ``(S, N, 3)`` FK or the
    already-flat ``(S, 3*(N-1))`` non-root block
    (pso.polish_soa.anchor_positions_flat — the padding-free path).
    """
    root_r = euler_xyz_to_matrix(problem.pose[..., 0, :])  # (S, 3, 3)
    s = root_r.shape[0]
    ap = (
        anchor_positions[:, 1:].reshape(s, -1)
        if anchor_positions.ndim == 3
        else anchor_positions
    )
    parts = [
        root_r.reshape(s, 9),
        jnp.broadcast_to(problem.origin, (s, 3)),
        anchor_angles,
        problem.targets.reshape(s, -1),
        ap,
    ]
    if use_orientation:
        if problem.target_rot is None:
            raise ValueError("use_orientation requires problem.target_rot")
        parts.append(euler_xyz_to_matrix(problem.target_rot).reshape(s, -1))
    return jnp.concatenate(parts, axis=-1).astype(jnp.float32)


def fused_fitness(
    spec: ChainSpec,
    x_dp: jnp.ndarray,
    meta: jnp.ndarray,
    swarm: jnp.ndarray,
    *,
    num_obstacles: int = 0,
    use_distance_term: bool = False,
    gizmo_size: float = 0.2,
    use_orientation: bool = False,
    collision_shape: str = "box",
    trig_impl: str = "poly",
    interpret: bool = False,
) -> jnp.ndarray:
    """Run the kernel. ``x_dp``: (S, D, P) angles; returns (S, P)."""
    s, d, p = x_dp.shape
    if p % TILE_P:
        raise ValueError(f"P={p} must be a multiple of {TILE_P} for the fused kernel")
    tiles = p // TILE_P
    x4 = x_dp.reshape(s, d, p // LANES, LANES)
    kernel = _build_kernel(spec, num_obstacles, use_distance_term, gizmo_size,
                           use_orientation, collision_shape, trig_impl)

    m = meta.shape[-1]
    k = swarm.shape[-1]
    # (S, 1, K): per-swarm SMEM blocks must have trailing dims equal to
    # the array's (TPU block-shape divisibility rule).
    swarm3 = swarm[:, None, :]
    n = spec.num_nodes
    # ~FLOPs per particle: N-1 composes (45 mul + 36 add) + trig + cost.
    flops_pp = (n - 1) * 140 + spec.dof * 10
    out = pl.pallas_call(
        kernel,
        grid=(s, tiles),
        in_specs=[
            pl.BlockSpec((1, m), lambda i, j: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, k), lambda i, j: (i, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (1, d, SUBLANES, LANES),
                lambda i, j: (i, 0, j, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, SUBLANES, LANES), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((s, p // LANES, LANES), jnp.float32),
        cost_estimate=pl.CostEstimate(
            flops=flops_pp * s * p,
            bytes_accessed=x_dp.size * 4 + s * p * 4,
            transcendentals=2 * spec.dof * s * p,
        ),
        interpret=interpret,
    )(meta, swarm3, x4)
    return out.reshape(s, p)


def make_pallas_fitness(
    spec: ChainSpec,
    problem: IKProblem,
    fit: FitnessConfig = FitnessConfig(),
    obstacles: Optional[Obstacles] = None,
    interpret: bool = False,
):
    """Build a solver-compatible fitness_fn backed by the fused kernel.

    The returned callable takes ``x`` of shape (S, P, D) — the solver's
    native layout — transposes to lane-major (S, D, P), and invokes the
    kernel. Distance-term anchors and per-swarm constants are packed
    once at closure build (hoisted out of the PSO loop, like the jnp
    path).
    """
    num_obstacles = 0 if obstacles is None else obstacles.count
    if num_obstacles and fit.collision_backend == "gjk":
        raise NotImplementedError(
            "collision_backend='gjk' is jnp-path only: a 50-round "
            "support-point loop per (node x link x obstacle) pair is "
            "anti-TPU-native, so the Pallas kernels fuse only the "
            "closed-form backend ('sat'; exact for both collision "
            "shapes). Use impl='jnp' for GJK, or collision_backend="
            "'sat' here."
        )
    anchor_angles = fk_ops.pose_to_angles(spec, problem.pose)
    anchor_positions = fk_ops.fk_points(spec, problem.pose, problem.origin)
    # Both optional terms are compile-time choices, like everything
    # else in the config.
    use_distance = float(np.asarray(fit.distance_weight)) != 0.0
    use_orientation = (
        problem.target_rot is not None
        and float(np.asarray(fit.orientation_weight)) != 0.0
    )
    meta = _pack_meta(spec, fit, obstacles, use_orientation)
    swarm = _pack_swarm(spec, problem, anchor_angles, anchor_positions,
                        use_orientation)

    def fitness_fn(x: jnp.ndarray) -> jnp.ndarray:
        x_dp = jnp.swapaxes(x, -1, -2)  # (S, D, P)
        return fused_fitness(
            spec,
            x_dp,
            meta,
            swarm,
            num_obstacles=num_obstacles,
            use_distance_term=use_distance,
            gizmo_size=fit.gizmo_size,
            use_orientation=use_orientation,
            collision_shape=fit.collision_shape,
            trig_impl=fit.trig_impl,
            interpret=interpret,
        )

    return fitness_fn
