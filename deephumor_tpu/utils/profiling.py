"""Tracing / profiling harness.

The reference has no profiling story beyond wall-clock epoch prints
(SURVEY.md §5, trainer.py:148-149). This provides:

- :func:`trace`: context manager around ``jax.profiler`` producing a
  TensorBoard-viewable trace,
- :class:`Timer`: wall-clock section timing with device synchronization
  (a host transfer — remote platforms may return from
  ``block_until_ready`` before execution finishes),
- :func:`benchmark`: compile-then-measure helper returning stats.
"""

import contextlib
import time

import numpy as np

import jax

__all__ = ["trace", "Timer", "benchmark", "sync"]


def sync(tree):
    """Forces completion of every array in ``tree`` (host fetch of one
    element per leaf — robust on remote backends)."""
    for leaf in jax.tree_util.tree_leaves(tree):
        if hasattr(leaf, "addressable_shards"):
            np.asarray(jax.device_get(leaf.ravel()[:1]))
    return tree


@contextlib.contextmanager
def trace(log_dir="/tmp/jax-trace"):
    """Captures a jax.profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


class _SectionResult:
    """Mutable handle a timed block assigns its output to."""

    __slots__ = ("result",)

    def __init__(self):
        self.result = None


class Timer:
    """Accumulating section timer with device sync."""

    def __init__(self):
        self.sections = {}

    @contextlib.contextmanager
    def section(self, name):
        """Times a block; assign the block's output to the yielded
        handle so the exit path can sync it::

            with timer.section("step") as s:
                s.result = step(x)

        Without the assignment only dispatch time is measured (JAX is
        async — on remote platforms dispatch is a flat ~25 ms regardless
        of device work, see benchmarks/attn_microbench.py).
        """
        holder = _SectionResult()
        t0 = time.perf_counter()
        yield holder
        if holder.result is not None:
            sync(holder.result)
        self.sections.setdefault(name, []).append(
            time.perf_counter() - t0
        )

    def summary(self):
        return {
            name: {
                "total_s": float(np.sum(ts)),
                "mean_s": float(np.mean(ts)),
                "count": len(ts),
            }
            for name, ts in self.sections.items()
        }


def benchmark(fn, *args, iters=5, warmup=1):
    """Times ``fn(*args)`` with warmup; returns dict of timing stats."""
    for _ in range(warmup):
        sync(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        sync(fn(*args))
        times.append(time.perf_counter() - t0)
    return {
        "mean_s": float(np.mean(times)),
        "p50_s": float(np.median(times)),
        "min_s": float(np.min(times)),
        "iters": iters,
    }
