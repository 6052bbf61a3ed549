"""Cumulative backward decomposition of the Titsias ELBO (TPU).

Each stage's surrogate loss consumes its result with a FULL reduction (the
earlier per-piece probes consumed single elements and XLA dead-code-
eliminated most of the work). The increment between consecutive stages is
that stage's forward+backward cost inside the step.

  s1_gram      sum(Kuf * R)                        - gram fwd+bwd
  s2_whiten    + sum(v * R),  v = Luu^-1 Kuf       - + Kuu chol + trisolve
  s3_q         + sum over L = chol(Q/s2 + I)       - + MxN GEMM + 2nd chol
  s4_elbo      the full collapsed ELBO
"""
import os
import sys
import json

import numpy as np



def main():
    import jax
    import jax.numpy as jnp
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.ops.linalg import solve_triangular
    from _timing import device_ms

    gpr.use_compilation_cache()
    gpr.use_pallas(True)
    gpr.use_jitter_ladder(3)

    xs, ys = bench.make_data()
    model = bench._build_model(xs, ys, None, inference="svgp", M=1024)
    kern = model.kernel
    X = model.X
    out = {}

    def probe(body, x0, label, target=8.0):
        t = device_ms(body, x0, target_sec=target)
        out[label + "_ms"] = round(t, 3)
        print(f"{label:12s}: {t:9.3f} ms", flush=True)

    M = model.Z().shape[0]
    R = jnp.asarray(np.random.RandomState(0).randn(M, X.shape[0]),
                    dtype=X.dtype)
    sigma2 = float(model.likelihood.scale() ** 2)
    y = model._residual_y()

    def stage_loss(z, stage):
        with gpr.input_gradients():
            Kuf = kern.K(z, X)
            Kuu = kern.K(z)
        if stage == 1:
            return jnp.sum(Kuf * R)
        Luu = model._cholesky(Kuu, add_jitter=True)
        v = solve_triangular(Luu, Kuf)
        if stage == 2:
            return jnp.sum(v * R)
        Q = v @ v.T
        L = model._cholesky(Q / sigma2 + jnp.eye(M, dtype=X.dtype))
        if stage == 3:
            return jnp.sum(L * L) + jnp.sum(jnp.log(jnp.diagonal(L)))
        c = solve_triangular(L, v @ y) / sigma2
        p = -jnp.sum(jnp.log(jnp.diagonal(L)))
        p = p - 0.5 * jnp.sum(y * y) / sigma2
        p = p + 0.5 * jnp.sum(c * c)
        p = p - 0.5 * (jnp.sum(kern.K_diag(X)) - jnp.trace(Q)) / sigma2
        return p

    Z0 = model.Z()
    for stage in [1, 2, 3, 4]:
        def body(z, stage=stage):
            g = jax.grad(lambda zz: stage_loss(zz, stage))(z)
            return z + 1e-12 * g
        probe(body, Z0, "s%d" % stage)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
