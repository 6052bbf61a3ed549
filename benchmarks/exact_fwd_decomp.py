"""Decompose the DETERMINISTIC (closed-form-gradient) exact forward at the
headline N=16k config: cumulative stages of the legacy `_Kff` -> cholesky ->
cho_solve -> LML chain, each timed with the chained-executable slope
(benchmarks/_timing.py), plus the same stages under the model's ambient
sensitive-precision scope — isolating where loss_fwd_exact's time goes
beyond the sum of its parts (step_decomp measured 109 ms vs ~69 ms of
components at N=16k).

Run:  python benchmarks/exact_fwd_decomp.py
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
    from mogptk_tpu.ops.linalg import lml_quadform_logdet, cholesky
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
    out = {}

    def probe(body, x0, label, target=12.0):
        t = device_ms(body, x0, target_sec=target, max_exec_sec=60.0)
        out[label + "_ms"] = round(t, 2)
        print(f"{label:28s}: {t:9.2f} ms", flush=True)

    def chain(carry, v):
        params = list(carry)
        params[0] = params[0] + 1e-30 * v
        return tuple(params)

    # stage 1: gram only (the model's real _Kff incl. diag-add + barrier)
    def s1(carry):
        with model.bind(model._merge_raws(list(carry), fixed)):
            Kff = model._Kff(add_jitter=True)
        return chain(carry, Kff[0, 0])
    probe(s1, tuple(train0), "s1_gram")

    # stage 2: + cholesky through the model's routed wrapper
    def s2(carry):
        with model.bind(model._merge_raws(list(carry), fixed)):
            Kff = model._Kff(add_jitter=True)
            L = cholesky(Kff)
        return chain(carry, jnp.log(L[0, 0]))
    probe(s2, tuple(train0), "s2_gram_chol", target=15.0)

    # stage 3: + cho_solve(1 rhs) + reductions == lml_quadform_logdet
    def s3(carry):
        with model.bind(model._merge_raws(list(carry), fixed)):
            Kff = model._Kff(add_jitter=True)
            y = model._residual_y()
            val = lml_quadform_logdet(Kff, y)
        return chain(carry, val)
    probe(s3, tuple(train0), "s3_lml", target=15.0)

    # stage 4: the model's actual forward (adds priors/constants + whatever
    # scope make_loss_fn wraps)
    loss_fn = model.make_loss_fn()
    def s4(carry):
        v = loss_fn(list(carry), fixed)
        return chain(carry, v)
    probe(s4, tuple(train0), "s4_loss_fn", target=15.0)

    # the same lml under an ambient "highest" scope — whether the sensitive
    # scope is what separates s3 from s4
    def s3h(carry):
        with jax.default_matmul_precision("highest"):
            with model.bind(model._merge_raws(list(carry), fixed)):
                Kff = model._Kff(add_jitter=True)
                y = model._residual_y()
                val = lml_quadform_logdet(Kff, y)
        return chain(carry, val)
    probe(s3h, tuple(train0), "s3_lml_ambient_highest", target=15.0)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
