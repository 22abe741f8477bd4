"""Tracing / profiling: timers, FLOP estimates, jax.profiler hooks.

The reference's only instrumentation is printf of per-run error and
frames-to-converge (reference Main.cpp:195,201; SURVEY.md §5). Here:
wall-clock timers that block on device completion, analytic FLOP
counts for the FK+fitness pipeline (kernel-throughput reporting per
BASELINE.json), and a jax.profiler trace context for TPU timelines.
"""

from __future__ import annotations

import contextlib
import time
from typing import Optional

import jax

from ikpso_tpu.models.chain import ChainSpec
from ikpso_tpu.pso.config import PSOConfig


class Timer:
    """Wall-clock timer that waits for device completion on exit."""

    def __init__(self, sync=None):
        self._sync = sync
        self.elapsed_s: Optional[float] = None

    def __enter__(self):
        self._start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync is not None:
            jax.block_until_ready(self._sync)
        self.elapsed_s = time.perf_counter() - self._start

    def sync_on(self, value):
        """Register a value to block on before stopping the clock."""
        self._sync = value
        return value


def solve_flops(
    spec: ChainSpec, num_particles: int, num_swarms: int, pso: PSOConfig
) -> int:
    """DEPRECATED hand estimate — use utils.flops.fused_solve_count.

    Kept only for back-compat; the counted-op model walks the real
    kernel jaxprs and is what bench.py reports (VERDICT r1 weak #5:
    this estimate's constants were uncalibrated and produced three
    mutually-inconsistent GFLOP/s numbers in round 1).
    """
    from ikpso_tpu.ops.fitness import FitnessConfig
    from ikpso_tpu.utils.flops import fused_solve_count

    return int(
        fused_solve_count(
            spec, pso, FitnessConfig(angle_weight=0.0),
            num_particles=num_particles, num_swarms=num_swarms,
        ).flops
    )


@contextlib.contextmanager
def trace(logdir: Optional[str]):
    """jax.profiler trace context (no-op when logdir is None)."""
    if logdir is None:
        yield
        return
    with jax.profiler.trace(logdir):
        yield


def measure(fn, *args, warmup: int = 1, iters: int = 5, vary=None):
    """Median wall time for a jitted callable; returns (result, seconds).

    Median, not min: the tunnel transport completes repeat dispatches
    of IDENTICAL arguments near-instantly (observed sub-ms walls for
    300 ms programs — served from a transport cache, not the device),
    and best-of-N latches onto exactly those corrupt samples; with
    enough repeats even the median is poisoned. ``vary(i, args) ->
    args`` produces distinct per-iteration inputs (e.g. fold the
    index into the RNG key) so no dispatch repeats — the reliable
    fix; the median then only has to absorb scheduler jitter.
    """
    import statistics

    import numpy as np

    def _sync(res):
        # block_until_ready alone is NOT sufficient over the tunnel
        # transport: for some programs it returns at enqueue time
        # (observed: flat ~0.1 ms "walls" for 100 ms kernels in
        # utils/roofline development). A host fetch of one element
        # provably waits for execution. Cross-checked on the headline
        # solver: fetch-timed and block-timed walls agree to ~1%.
        res = jax.block_until_ready(res)
        leaf = jax.tree.leaves(res)[0]
        if hasattr(leaf, "ravel") and getattr(leaf, "size", 0):
            np.asarray(leaf.ravel()[0:1])
        return res

    result = None
    for i in range(max(warmup, 1)):
        # Warmup indices sit above the timed range (vary hooks may
        # feed the index to jax.random.fold_in, which rejects
        # negative values).
        a = vary(max(iters, 1) + i, args) if vary else args
        result = _sync(fn(*a))
    samples = []
    for i in range(max(iters, 1)):
        a = vary(i, args) if vary else args
        t0 = time.perf_counter()
        result = _sync(fn(*a))
        samples.append(time.perf_counter() - t0)
    return result, statistics.median(samples)
