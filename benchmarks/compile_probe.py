"""Where does the N=16k training-step compile time go? (ROADMAP #4)

Remote (axon) TPU compilation of the full step has been observed at 10-45
minutes. This probe times `.lower()` (tracing+StableHLO) and `.compile()`
(XLA backend) separately for the step's pieces, each against a FRESH
compilation cache directory, so the pieces can be ranked:

  gram_fwd      - fused Pallas Gram forward only
  chol          - MXU-blocked Cholesky only (16 S-panel kernel shapes)
  loss          - LML forward (gram + chol + solves)
  step_probe    - jit(value_and_grad) with Hutchinson probe gradients
  step_exact    - jit(value_and_grad) with the closed-form K^-1 backward

Usage: python benchmarks/compile_probe.py [n_per_channel] (TPU)
Prints one JSON line per piece.
"""
import os
import sys
import json
import time
import tempfile

import numpy as np



def timed_compile(label, fn, *args):
    import jax
    t0 = time.perf_counter()
    lowered = jax.jit(fn).lower(*args)
    t_lower = time.perf_counter() - t0
    t0 = time.perf_counter()
    lowered.compile()
    t_compile = time.perf_counter() - t0
    row = {"piece": label, "lower_s": round(t_lower, 2),
           "compile_s": round(t_compile, 2)}
    print(json.dumps(row), flush=True)
    return row


def main():
    n_per = int(sys.argv[1]) if len(sys.argv) > 1 else 4096
    import jax
    # fresh cache: we want true compile costs, not cache hits
    jax.config.update("jax_compilation_cache_dir", tempfile.mkdtemp())
    import jax.numpy as jnp
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky

    gpr.use_pallas(True)
    bench.N_PER_CHANNEL = n_per
    xs, ys = bench.make_data()

    model = bench._build_model(xs, ys, trace_probes=16)
    n = model.X.shape[0]

    # piece: fused Gram forward
    counts = model._channel_counts
    K_fn = lambda X: model.kernel.K_sorted(X, counts)
    timed_compile("gram_fwd", K_fn, model.X)

    # piece: blocked Cholesky alone (input shape only; no data dependence)
    K0 = jnp.eye(n, dtype=jnp.float32)
    timed_compile("chol", lambda K: blocked_cholesky(K, 1024), K0)

    # piece: loss forward
    loss_fn = model.make_loss_fn()
    train, fixed = model._split_raws()
    timed_compile("loss", loss_fn, train, fixed)

    # piece: full value_and_grad (probe gradients)
    timed_compile("step_probe", lambda t, f: jax.value_and_grad(loss_fn)(t, f),
                  train, fixed)

    # piece: full value_and_grad (closed-form exact gradients)
    model2 = bench._build_model(xs, ys, trace_probes=None)
    loss2 = model2.make_loss_fn()
    train2, fixed2 = model2._split_raws()
    timed_compile("step_exact", lambda t, f: jax.value_and_grad(loss2)(t, f),
                  train2, fixed2)


if __name__ == "__main__":
    main()
