"""XLA's triangular-solve expander cost vs RHS width at N=16k.

exact_fwd_decomp localized a ~54 ms cost to the deterministic forward's
1-RHS cho_solve while the 17-RHS solve measures ~6 ms — this sweep maps
solve time against RHS width (and padded variants) to pick the routing fix.

Run:  python benchmarks/cho_solve_width.py
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
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr
    from _timing import device_ms

    gpr.use_pallas(True)
    xs, ys = bench.make_data()
    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.MultiOutputSpectralMixtureKernel(bench.Q, output_dims=bench.CHANNELS)
    rng = np.random.RandomState(1)
    kernel.mean.assign(0.05 + 0.3 * rng.rand(bench.CHANNELS, bench.Q, 1))
    kernel.variance.assign(0.2 + 0.3 * rng.rand(bench.CHANNELS, bench.Q, 1))
    model = gpr.Exact(kernel, X, Y, variance=0.1, trace_probes=None)
    train0, fixed = model._split_raws()
    with model.bind(model._merge_raws(train0, fixed)):
        Kff = jax.jit(lambda: model._Kff(add_jitter=True))()
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    L = blocked_cholesky(Kff, 1024)
    del Kff

    out = {}

    def probe(body, x0, label, target=8.0):
        t = device_ms(body, x0, target_sec=target, max_exec_sec=60.0)
        out[label] = round(t, 2)
        print(f"{label:24s}: {t:9.2f} ms", flush=True)

    n = L.shape[0]
    for R in (1, 2, 8, 17, 64):
        B0 = jax.random.normal(jax.random.PRNGKey(1), (n, R), jnp.float32)

        def chs(carry):
            Lv, Bv = carry
            Yv = jsl.cho_solve((Lv, True), Bv)
            return Lv, Yv / jnp.maximum(jnp.max(jnp.abs(Yv)), 1e-30)
        probe(chs, (L, B0), "cho_solve_rhs%d" % R)

    # padded variant: 1 logical RHS zero-padded to 16 columns, slice col 0
    B1 = jax.random.normal(jax.random.PRNGKey(1), (n, 1), jnp.float32)

    def chs_pad(carry):
        Lv, Bv = carry
        Bp = jnp.concatenate([Bv, jnp.zeros((n, 15), Bv.dtype)], axis=1)
        Yv = jsl.cho_solve((Lv, True), Bp)[:, :1]
        return Lv, Yv / jnp.maximum(jnp.max(jnp.abs(Yv)), 1e-30)
    probe(chs_pad, (L, B1), "cho_solve_rhs1_pad16")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
