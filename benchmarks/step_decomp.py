"""Decompose the headline exact-GP step on TPU: Gram forward, Cholesky
variants, triangular solves, loss forward, full training step — all via the
dynamic-trip-count timer (benchmarks/_timing.py).

Run:  python benchmarks/step_decomp.py
"""
import os
import sys
import json

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    import optax
    import bench
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    from benchmarks._timing import device_ms

    gpr.use_pallas(True)
    gpr.use_blocked_cholesky(False)   # decompose against the round-1 step

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

    # Gram assembly forward only
    nX = model.X
    def gram_fwd(c):
        with model.bind(model._merge_raws(train0, fixed)):
            Kff = model._Kff(add_jitter=True)
        return c + 1e-20 * Kff[0, 0]
    probe(gram_fwd, jnp.float32(0.0), "gram_fwd", target=10.0)

    # Cholesky variants on the actual Gram
    with model.bind(model._merge_raws(train0, fixed)):
        Kff = jax.jit(lambda: model._Kff(add_jitter=True))()
    def chol_xla(Kv):
        with jax.default_matmul_precision("highest"):
            L = jnp.linalg.cholesky(Kv)
        return Kv + 1e-20 * jnp.abs(L)
    probe(chol_xla, Kff, "chol_xla", target=15.0)
    for prec in ["high", "default"]:
        probe(lambda Kv, p=prec: Kv + 1e-20 * jnp.abs(
            blocked_cholesky(Kv, 1024, update_precision=p)),
            Kff, f"chol_blocked_{prec}", target=15.0)

    # triangular solves at the step's actual shapes (highest scope)
    L = jnp.linalg.cholesky(Kff)
    for r in [1, 17]:
        B0 = jax.random.normal(jax.random.PRNGKey(1), (Kff.shape[0], r), jnp.float32)
        def tri(Bv):
            with jax.default_matmul_precision("highest"):
                Yv = jsl.solve_triangular(L, Bv, lower=True)
            return Yv / jnp.maximum(jnp.max(jnp.abs(Yv)), 1e-30)
        probe(tri, B0, f"trisolve_{r}rhs", target=10.0)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
