"""Trustworthy on-device timing through the tunneled (axon) TPU backend.

Facts about this backend, established empirically (see git history of
benchmarks/microprobe.py):
- `block_until_ready()` returns without waiting for device execution;
  only a host fetch (np.asarray / float) blocks.
- Per-call round-trip noise is large (seconds) and non-monotone: timing
  two separately compiled executables and subtracting gives garbage
  (negative slopes observed).

Method used here: ONE executable with a dynamic `fori_loop` trip count.
The same compiled program runs T_lo and T_hi iterations of a chained op;
per-op time = (t(T_hi) − t(T_lo)) / (T_hi − T_lo). T_hi is auto-scaled so
the device time dominates the round-trip noise. Identical executable ⇒
identical dispatch path ⇒ the subtraction cancels overhead for real.
"""
import time

import numpy as np


def device_ms(body, x0, target_sec=15.0, t_lo=4, reps=3, max_t=20000,
              max_exec_sec=None):
    """Per-iteration device milliseconds of `body` (x -> x, chained).

    body must make iteration i+1 depend on iteration i's FULL output, and
    keep values bounded (renormalize or perturb-by-epsilon patterns).

    max_exec_sec caps any SINGLE executable's estimated run time: the
    tunneled TPU worker dies (not errors — dies) when one execution runs
    past roughly 100 s, so slow per-step bodies must bound the chain
    length even at the cost of slope resolution.
    """
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run(x, T):
        r = jax.lax.fori_loop(0, T, lambda i, v: body(v), x)
        leaves = jax.tree_util.tree_leaves(r)
        return sum(jnp.sum(l.ravel()[:8].astype(jnp.float32)) for l in leaves)

    def fetch(T):
        t0 = time.perf_counter()
        v = float(np.asarray(run(x0, T)))
        if not np.isfinite(v):
            raise RuntimeError("timing chain produced non-finite value")
        return time.perf_counter() - t0

    fetch(t_lo)  # compile + warm
    # calibrate T_hi so device time ~ target_sec; the rough first estimate
    # guards the calibration run itself against the executable deadline
    est0 = max(fetch(t_lo) / t_lo, 1e-5)
    if max_exec_sec is not None and est0 * t_lo * 4 > max_exec_sec:
        est = est0
    else:
        est = max(fetch(t_lo * 4) / (t_lo * 4), 1e-5)
    t_hi = int(min(max(target_sec / est, t_lo * 8), max_t))
    if max_exec_sec is not None:
        t_hi = max(min(t_hi, int(max_exec_sec / est)), t_lo + 1)
    lo = min(fetch(t_lo) for _ in range(reps))
    hi = min(fetch(t_hi) for _ in range(reps))
    return (hi - lo) / (t_hi - t_lo) * 1e3
