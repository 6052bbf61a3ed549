"""Close the SVGP backward gap: 8.6 ms (hand-built ELBO, Z-grad, ambient
precision) vs 17.6 ms (model step). Variants isolate the cause (TPU):

  s4_plain        hand ELBO, grad wrt Z, ambient precision     (baseline 8.6)
  s4_sensitive    + wrapped in sensitive_matmul_scope('highest')
  s4_allgrads     + cotangents for kernel params and sigma too
  model_zonly     model loss_fn, every param but Z stopped
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
    from mogptk_tpu.gpr.config import sensitive_matmul_scope
    from mogptk_tpu.ops.linalg import solve_triangular
    from _timing import device_ms

    gpr.use_compilation_cache()
    gpr.use_pallas(True)
    gpr.use_jitter_ladder(3)

    xs, ys = bench.make_data()
    model = bench._build_model(xs, ys, None, inference="svgp", M=1024)
    kern = model.kernel
    X = model.X
    y = model._residual_y()
    M = model.Z().shape[0]
    sigma2 = float(model.likelihood.scale() ** 2)
    out = {}

    def probe(body, x0, label, target=8.0):
        t = device_ms(body, x0, target_sec=target)
        out[label + "_ms"] = round(t, 3)
        print(f"{label:14s}: {t:9.3f} ms", flush=True)

    def hand_elbo(z):
        with gpr.input_gradients():
            Kuf = kern.K(z, X)
            Kuu = kern.K(z)
        Luu = model._cholesky(Kuu, add_jitter=True)
        v = solve_triangular(Luu, Kuf)
        Q = v @ v.T
        L = model._cholesky(Q / sigma2 + jnp.eye(M, dtype=X.dtype))
        c = solve_triangular(L, v @ y) / sigma2
        p = -jnp.sum(jnp.log(jnp.diagonal(L)))
        p = p - 0.5 * jnp.sum(y * y) / sigma2
        p = p + 0.5 * jnp.sum(c * c)
        p = p - 0.5 * (jnp.sum(kern.K_diag(X)) - jnp.trace(Q)) / sigma2
        return p

    Z0 = model.Z()

    def s4_plain(z):
        g = jax.grad(hand_elbo)(z)
        return z + 1e-12 * g
    probe(s4_plain, Z0, "s4_plain")

    def s4_sens(z):
        def f(zz):
            with sensitive_matmul_scope():
                return hand_elbo(zz)
        g = jax.grad(f)(z)
        return z + 1e-12 * g
    probe(s4_sens, Z0, "s4_sensitive")

    # model loss with everything except Z stopped
    loss_fn = model.make_loss_fn()
    train0, fixed = model._split_raws()
    z_shape = model.Z._raw.shape

    def model_zonly(params):
        def f(ps):
            ps = [p if p.shape == z_shape else jax.lax.stop_gradient(p)
                  for p in ps]
            return loss_fn(ps, fixed)
        v, g = jax.value_and_grad(f)(params)
        return jax.tree_util.tree_map(lambda p, gg: p + 1e-12 * gg, params, g)
    probe(model_zonly, train0, "model_zonly")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
