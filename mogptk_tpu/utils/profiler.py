"""Tracing and memory profiling.

The reference has no in-library tracing; its out-of-tree harness uses
torch.cuda timing/memory counters (tests/scalability.py:107-118) and a
gc-walking CUDA tensor census (tests/gpu_profile.py:37-114). The TPU-native
equivalents are jax.profiler traces (viewable in TensorBoard/Perfetto) and
the device memory stats the runtime exposes.
"""
import time
from contextlib import contextmanager

import jax


@contextmanager
def trace(log_dir="/tmp/mogptk_tpu_trace"):
    """Capture a jax.profiler trace around a block.

    Example:
        >>> with mogptk_tpu.utils.trace('/tmp/trace'):
        ...     model.train(iters=100)
    View with TensorBoard or ui.perfetto.dev.
    """
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()


def device_memory_stats(device=None):
    """Per-device live memory statistics (bytes). Returns a dict, or {} when
    the backend does not expose memory stats (e.g. CPU)."""
    if device is None:
        # respect use_cpu()/use_gpu() like the rest of the package
        from ..gpr.config import config as _cfg
        device = _cfg.device
    try:
        return dict(device.memory_stats() or {})
    except Exception:
        return {}


def print_device_memory():
    """Print live/peak memory per device — the analog of the reference's
    MemTracker census (tests/gpu_profile.py:37-114)."""
    for i, dev in enumerate(jax.devices()):
        stats = device_memory_stats(dev)
        if not stats:
            print("%d %s: no memory stats available" % (i, dev.device_kind))
            continue
        in_use = stats.get("bytes_in_use", 0)
        peak = stats.get("peak_bytes_in_use", 0)
        limit = stats.get("bytes_limit", 0)
        print("%d %s: in_use=%.2fGB peak=%.2fGB limit=%.2fGB"
              % (i, dev.device_kind, in_use / 2**30, peak / 2**30, limit / 2**30))


class Timer:
    """Wall-clock timer that synchronizes the device before reading, the
    equivalent of the reference's perf_counter+cuda.synchronize pattern
    (tests/scalability.py:107-118).

    The sync is a HOST FETCH, not block_until_ready(): on this image's
    tunneled TPU backend block_until_ready returns without waiting (see
    CLAUDE.md / benchmarks/_timing.py), which would make the timer measure
    dispatch instead of execution."""

    def __init__(self):
        self.start = None
        self.elapsed = 0.0

    @staticmethod
    def _sync():
        import numpy as _np
        float(_np.asarray(jax.device_put(0.0) + 0))

    def __enter__(self):
        self._sync()
        self.start = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self._sync()
        self.elapsed = time.perf_counter() - self.start
        return False
