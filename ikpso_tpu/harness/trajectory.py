"""Trajectory sweeps: thousands of waypoints as batched swarms.

BASELINE config 5: "10k waypoints solved as independent swarms across
a multi-host pod slice". Waypoints are chunked into fixed-size batches
(static shapes per jit trace), each batch is one batched solve, and
progress checkpoints to npz so a preempted sweep resumes at the last
finished batch (SURVEY.md §5 checkpoint/resume plan).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ikpso_tpu.models.chain import ChainSpec, IKProblem, Obstacles
from ikpso_tpu.models.library import batched_problem
from ikpso_tpu.ops.fitness import FitnessConfig
from ikpso_tpu.pso.config import PSOConfig
from ikpso_tpu.pso.solver import make_solver
from ikpso_tpu.utils import checkpoint as ckpt


@dataclasses.dataclass
class SweepResult:
    angles: np.ndarray  # (W, D)
    errors: np.ndarray  # (W,)
    solves_per_second: float


def solve_waypoints(
    spec: ChainSpec,
    problem: IKProblem,
    waypoints: np.ndarray,
    key: jnp.ndarray,
    *,
    pso: PSOConfig = PSOConfig(),
    fit: FitnessConfig = FitnessConfig(),
    obstacles: Optional[Obstacles] = None,
    num_particles: int = 1024,
    batch_size: int = 256,
    checkpoint_path: Optional[str] = None,
    mesh=None,
    impl: str = "jnp",
    retries: int = 0,
    retry_err_threshold: float = 1e-3,
    polish: int = 0,
) -> SweepResult:
    """Solve every waypoint (W, E, 3) as an independent swarm.

    With ``mesh`` given, each batch is solved via the sharded path
    (swarm axis across devices); otherwise single-device batched.
    Each waypoint warm-starts from ``problem.pose`` — independent
    solves, retryable by construction. ``retries`` wraps the solver in
    the jitted top-k retry (re-solve the worst eighth of each batch up
    to N rounds — production tail hardening, pso/restarts.py).
    ``polish`` adds K LM steps on each waypoint's gbest through the
    differentiable FK (pso/polish.py; accept-if-better per waypoint).
    """
    waypoints = np.asarray(waypoints, np.float32)
    w = waypoints.shape[0]
    dof = spec.dof

    state = ckpt.load(checkpoint_path) if checkpoint_path else None
    if state is None or state.angles.shape != (w, dof):
        state = ckpt.fresh_state(w, dof, key)

    if mesh is None:
        if impl == "fused":
            from ikpso_tpu.pso.fused import make_fused_solver

            solver = make_fused_solver(
                spec, pso=pso, fit=fit, obstacles=obstacles,
                num_particles=num_particles,
            )
        else:
            solver = make_solver(
                spec, pso=pso, fit=fit, obstacles=obstacles,
                num_particles=num_particles,
            )
    else:
        from ikpso_tpu.parallel.sharded import make_sharded_solver

        solver = make_sharded_solver(
            spec,
            mesh,
            pso=pso,
            fit=fit,
            obstacles=obstacles,
            num_particles=num_particles,
        )

    if polish:
        from ikpso_tpu.pso.polish import wrap_with_polish

        solver = wrap_with_polish(solver, spec, steps=polish)

    if retries:
        from ikpso_tpu.pso.restarts import make_topk_retry_solver

        solver = make_topk_retry_solver(
            solver,
            bucket=max(1, batch_size // 8),
            err_threshold=retry_err_threshold,
            rounds=retries,
        )

    run_key = state.key
    start = time.perf_counter()
    solved = 0
    cursor = state.cursor
    while cursor < w:
        end = min(cursor + batch_size, w)
        chunk = waypoints[cursor:end]
        # Pad the tail chunk to the static batch size.
        pad = batch_size - chunk.shape[0]
        if pad:
            chunk = np.concatenate([chunk, np.repeat(chunk[-1:], pad, axis=0)])
        batch = batched_problem(problem, jnp.asarray(chunk))
        run_key, sub = jax.random.split(run_key)
        res = solver(batch, sub)
        from ikpso_tpu.utils.guards import check_solve_result

        check_solve_result(res, context=f"waypoints {cursor}:{end}")
        n = end - cursor
        state.angles[cursor:end] = np.asarray(res.angles)[:n]
        state.errors[cursor:end] = np.asarray(res.effector_error)[:n]
        solved += n
        cursor = end
        state = dataclasses.replace(
            state,
            cursor=cursor,
            key_data=np.asarray(jax.random.key_data(run_key)),
        )
        if checkpoint_path:
            ckpt.save(checkpoint_path, state)
    wall = time.perf_counter() - start

    return SweepResult(
        angles=state.angles,
        errors=state.errors,
        solves_per_second=solved / wall if wall > 0 and solved else 0.0,
    )
