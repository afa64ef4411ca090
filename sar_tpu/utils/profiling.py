"""Profiling & timing utilities.

The reference has no tracing/profiling beyond tqdm (SURVEY.md §5). Here:
- `trace(dir)` — jax.profiler trace capture context (view in TensorBoard /
  Perfetto)
- `Timer` / `benchmark_fn` — wall-clock harness that forces completion with a
  device->host transfer (block_until_ready alone can be a no-op through
  remote-execution tunnels)
- `rtfx` — audio-seconds-per-second from a timed transcription run
"""

from __future__ import annotations

import contextlib
import time

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/jax-trace"):
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def force(x):
    """Force completion of a computation (device->host transfer of one leaf)."""
    leaves = jax.tree.leaves(x)
    if leaves:
        np.asarray(leaves[0])
    return x


class Timer:
    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0


def benchmark_fn(fn, *args, iters: int = 3, warmup: int = 1) -> dict:
    """Time fn(*args) with compile warmup; returns {mean_s, per_iter_s, ...}."""
    for _ in range(warmup):
        force(fn(*args))
    with Timer() as t:
        for _ in range(iters):
            out = fn(*args)
        force(out)
    return {"total_s": t.elapsed, "per_iter_s": t.elapsed / iters,
            "iters": iters}


def rtfx(fn, *args, audio_seconds: float, iters: int = 3) -> float:
    """Real-time factor: processed audio seconds per wall-clock second."""
    stats = benchmark_fn(fn, *args, iters=iters)
    return audio_seconds / stats["per_iter_s"]
