"""Retry failed solves: the guaranteed fix for premature convergence.

Small packed swarms hit the best throughput/accuracy frontier
(docs/PERFORMANCE.md) but leave a ~1-2% tail of prematurely-converged
swarms — stuck local minima, not precision limits (the solved p90 is
0.0001 mm). Because every solve is stateless and independent, the
cheapest rescue is a *fresh independent sample*: re-solve only the
failed swarms with a new RNG key and keep the better result per swarm.
With a per-solve failure rate p, k retry rounds leave a p^(k+1) tail
(1.6% -> ~0.03% after one round) for ~p extra compute.

TPU shape discipline: the failed subset's size is data-dependent, so
failures are gathered into a FIXED-size bucket (padded by repeating
the first failed index) — one extra compiled program per bucket size
rather than one per failure count. Gather/scatter runs on host via
numpy between the two jitted solves; the solves themselves stay
device-resident.

The reference has no equivalent (its only retry is the human pressing
R again, Main.cpp:412-418); this is the production hardening layer on
top of the same PSO.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ikpso_tpu.models.chain import IKProblem
from ikpso_tpu.pso.solver import SolveResult

Solver = Callable[[IKProblem, jnp.ndarray], SolveResult]


def _gather_problem(problem: IKProblem, idx: np.ndarray) -> IKProblem:
    return jax.tree.map(lambda x: jnp.asarray(np.asarray(x)[idx]), problem)


def _scatter_better(
    base: SolveResult, retry: SolveResult, idx: np.ndarray, take: np.ndarray
) -> SolveResult:
    """Write retry results back into base where ``take`` (over the
    bucket) marks an improvement. Duplicated padding indices are safe:
    only true failure slots can improve, and np writes of identical
    best-rows are idempotent."""
    sel = idx[take]
    if sel.size == 0:
        return base

    def merge(b, r):
        b = np.asarray(b).copy()
        b[sel] = np.asarray(r)[take]
        return jnp.asarray(b)

    return SolveResult(
        angles=merge(base.angles, retry.angles),
        fitness=merge(base.fitness, retry.fitness),
        pose=merge(base.pose, retry.pose),
        effector_error=merge(base.effector_error, retry.effector_error),
        trace=base.trace,
    )


def solve_with_retries(
    solver: Solver,
    problem: IKProblem,
    key: jnp.ndarray,
    *,
    err_threshold: float = 1e-3,
    max_rounds: int = 1,
    bucket: int = 1024,
    retry_solver: Optional[Solver] = None,
) -> SolveResult:
    """Base solve + up to ``max_rounds`` retry rounds on failed swarms.

    Args:
      solver: the batched base solver (e.g. ``make_fused_solver(...)``).
      err_threshold: true-effector-error bound defining failure
        (1e-3 units = 1 mm at metre scale, matching BASELINE's <1mm).
      bucket: fixed retry batch size — failures are gathered into
        ``ceil(n/bucket)`` padded chunks, each one jitted program.
      retry_solver: optional distinct solver for retries (e.g. more
        iterations or a bigger swarm for the hard cases); defaults to
        ``solver``.
    """
    res = solver(problem, key)
    retry_solver = retry_solver or solver
    bucket = max(1, min(bucket, int(problem.batch_shape()[0])))
    for _ in range(max_rounds):
        err = np.asarray(res.effector_error)
        failed = np.flatnonzero(err > err_threshold)
        if failed.size == 0:
            break
        for start in range(0, failed.size, bucket):
            chunk = failed[start:start + bucket]
            idx = np.full((bucket,), chunk[0], dtype=np.int64)
            idx[: chunk.size] = chunk
            key, sub = jax.random.split(key)
            retry = retry_solver(_gather_problem(problem, idx), sub)
            take = np.asarray(retry.effector_error) < np.asarray(
                res.effector_error
            )[idx]
            # Padding duplicates the first failed index; keep only the
            # first occurrence so duplicate writes cannot race.
            first = np.zeros((bucket,), bool)
            first[np.unique(idx, return_index=True)[1]] = True
            res = _scatter_better(res, retry, idx, take & first)
    return res


def make_retry_solver(solver: Solver, **retry_kwargs) -> Solver:
    """Wrap a batched solver with :func:`solve_with_retries`."""

    def _solve(problem: IKProblem, key: jnp.ndarray) -> SolveResult:
        return solve_with_retries(solver, problem, key, **retry_kwargs)

    return _solve
