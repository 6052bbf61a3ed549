"""Decompose the headline exact-GP step on TPU: Gram forward, Cholesky
variants, triangular solves, loss forward, full training step — all via the
dynamic-trip-count timer (benchmarks/_timing.py).

Run:  python benchmarks/step_decomp.py
"""
import os
import sys
import json

import numpy as np



def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    import optax
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    from _timing import device_ms

    gpr.use_pallas(True)   # current defaults: block engines + blocked linalg

    xs, ys = bench.make_data()
    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.MultiOutputSpectralMixtureKernel(bench.Q, output_dims=bench.CHANNELS)
    rng = np.random.RandomState(1)
    kernel.mean.assign(0.05 + 0.3 * rng.rand(bench.CHANNELS, bench.Q, 1))
    kernel.variance.assign(0.2 + 0.3 * rng.rand(bench.CHANNELS, bench.Q, 1))
    model = gpr.Exact(kernel, X, Y, variance=0.1, trace_probes=16)

    loss_fn = model.make_loss_fn()
    train0, fixed = model._split_raws()
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(train0)

    out = {}

    def probe(body, x0, label, target=10.0):
        t = device_ms(body, x0, target_sec=target)
        out[label + "_ms"] = round(t, 2)
        print(f"{label:24s}: {t:9.2f} ms", flush=True)

    # full training step — chains itself
    def step(carry):
        params, opt_state = carry
        value, grads = jax.value_and_grad(loss_fn)(params, fixed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state)
    probe(step, (train0, opt_state0), "full_step", target=20.0)

    # loss forward only (chain a tiny perturbation through the first leaf)
    def loss_fwd(carry):
        params = list(carry)
        v = loss_fn(params, fixed)
        params[0] = params[0] + 1e-30 * v
        return tuple(params)
    probe(loss_fwd, tuple(train0), "loss_fwd", target=15.0)

    # deterministic (closed-form-gradient) forward: exercises the legacy
    # _Kff diag-add + cholesky chain rather than the fused probe path
    model_d = gpr.Exact(kernel, X, Y, variance=0.1, trace_probes=None)
    loss_fn_d = model_d.make_loss_fn()
    traind, fixedd = model_d._split_raws()
    def loss_fwd_exact(carry):
        params = list(carry)
        v = loss_fn_d(params, fixedd)
        params[0] = params[0] + 1e-30 * v
        return tuple(params)
    probe(loss_fwd_exact, tuple(traind), "loss_fwd_exact", target=15.0)

    # Gram assembly forward only
    nX = model.X
    def gram_fwd(c):
        with model.bind(model._merge_raws(train0, fixed)):
            Kff = model._Kff(add_jitter=True)
        return c + 1e-20 * Kff[0, 0]
    probe(gram_fwd, jnp.float32(0.0), "gram_fwd", target=10.0)

    # raw sorted-layout Gram (no noise/jitter diagonal update) — the gap to
    # gram_fwd is the diagonal-add scatter + K_diag pass
    counts = model._channel_counts
    def gram_raw(c):
        with model.bind(model._merge_raws(train0, fixed)):
            Kff = model.kernel.K_sorted(model.X, counts)
        return c + 1e-20 * Kff[0, 0]
    probe(gram_raw, jnp.float32(0.0), "gram_raw_sorted", target=10.0)

    # Cholesky variants on the actual Gram
    with model.bind(model._merge_raws(train0, fixed)):
        Kff = jax.jit(lambda: model._Kff(add_jitter=True))()
    def chol_xla(Kv):
        with jax.default_matmul_precision("highest"):
            L = jnp.linalg.cholesky(Kv)
        return Kv + 1e-20 * jnp.abs(L)
    probe(lambda Kv: Kv + 1e-20 * jnp.abs(blocked_cholesky(Kv, 1024)),
          Kff, "chol_blocked_high", target=15.0)

    # the forward's batched 17-RHS cho_solve at the step's actual shapes.
    # L must ride the carry: a closed-over (N, N) constant is serialized
    # into the remote-compile request, which 413s past ~1 GB on this image.
    L = blocked_cholesky(Kff, 1024)
    from mogptk_tpu.ops.linalg import cholesky_solve
    B0 = jax.random.normal(jax.random.PRNGKey(1), (Kff.shape[0], 17), jnp.float32)
    def chs(carry):
        Lv, Bv = carry
        Yv = cholesky_solve(Lv, Bv)
        return Lv, Yv / jnp.maximum(jnp.max(jnp.abs(Yv)), 1e-30)
    probe(chs, (L, B0), "cho_solve_17rhs", target=8.0)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
