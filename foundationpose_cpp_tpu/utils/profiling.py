"""Stage timing + tracing: the reference's MESSURE_DURATION macros, TPU-aware.

The reference wraps every pipeline stage in MESSURE_DURATION_AND_CHECK_STATE
(foundationpose_utils.hpp:86-93) logging microseconds per call through glog.
Under XLA the pipeline is one compiled program, so stage timing means either
(a) host timing of whole dispatches with an explicit device sync -- this
module -- or (b) jax.profiler traces for op-level attribution (trace()).

Device-sync note: jax.block_until_ready is a no-op under some remote-device
transports (the axon dev tunnel), so `sync` forces a 1-element readback,
which is transport-proof.
"""

from __future__ import annotations

import contextlib
import logging
import time
from collections import defaultdict

import jax
import numpy as np

logger = logging.getLogger("foundationpose_cpp_tpu")


def sync(tree) -> None:
    """Barrier that survives transports with broken block_until_ready."""
    leaves = [x for x in jax.tree.leaves(tree) if hasattr(x, "dtype")]
    if leaves:
        np.asarray(jax.device_get(leaves[-1].ravel()[-1:]))


class StageTimer:
    """Accumulating per-stage wall-clock timer (FPSCounter + duration macros).

    >>> timer = StageTimer()
    >>> with timer.stage("refine", sync_tree=out):
    ...     out = program(...)
    >>> timer.report()
    """

    def __init__(self) -> None:
        self.totals: dict[str, float] = defaultdict(float)
        self.counts: dict[str, int] = defaultdict(int)

    @contextlib.contextmanager
    def stage(self, name: str, sync_result: bool = True):
        t0 = time.perf_counter()
        holder = {}
        try:
            yield holder
        finally:
            if sync_result and "result" in holder:
                sync(holder["result"])
            dt = time.perf_counter() - t0
            self.totals[name] += dt
            self.counts[name] += 1
            logger.info("[%s] %.2f ms", name, dt * 1e3)

    def mean_ms(self, name: str) -> float:
        return self.totals[name] / max(self.counts[name], 1) * 1e3

    def report(self) -> str:
        lines = [
            f"{name}: {self.mean_ms(name):8.2f} ms avg over {self.counts[name]}"
            for name in sorted(self.totals)
        ]
        text = "\n".join(lines)
        logger.info("stage timing:\n%s", text)
        return text


class FPSCounter:
    """Rolling throughput counter (simple_tests fps_counter.h equivalent)."""

    def __init__(self) -> None:
        self._t0: float | None = None
        self._frames = 0

    def start(self) -> None:
        self._t0 = time.perf_counter()
        self._frames = 0

    def count(self, n: int = 1) -> None:
        if self._t0 is None:
            self.start()
        self._frames += n

    @property
    def fps(self) -> float:
        if self._t0 is None or self._frames == 0:
            return 0.0
        return self._frames / (time.perf_counter() - self._t0)


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/fp_tpu_trace"):
    """jax.profiler trace for op-level attribution (view with TensorBoard
    or Perfetto); the TPU-native stand-in for nvtx/nsys."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
