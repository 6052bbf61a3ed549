"""Isolate the SVGP backward's Kuf-gram cost (TPU).

After the input-gradients fix the sparse models build Kuf on the jnp path
(the Pallas gram's VJP drops Z cotangents). This probe times the (M=1024,
N=16k) MOSM cross-gram forward+backward three ways:

  jnp_zgrad     - jnp path, cotangents for Z AND params   (current route)
  jnp_params    - jnp path, param cotangents only (Z stopped)
  pallas_params - Pallas gram, param cotangents only (pre-fix route)

plus the elbo backward split: value_and_grad of the full ELBO vs one with
stop_gradient(Z) — the difference is what Z-differentiability costs.
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
    from _timing import device_ms

    gpr.use_compilation_cache()
    gpr.use_pallas(True)
    gpr.use_jitter_ladder(3)

    xs, ys = bench.make_data()
    model = bench._build_model(xs, ys, None, inference="svgp", M=1024)
    kern = model.kernel
    X = model.X
    Z0 = model.Z()
    out = {}

    def probe(body, x0, label, target=8.0):
        t = device_ms(body, x0, target_sec=target)
        out[label + "_ms"] = round(t, 3)
        print(f"{label:14s}: {t:9.3f} ms", flush=True)

    R = jnp.asarray(np.random.RandomState(0).randn(Z0.shape[0], X.shape[0]),
                    dtype=Z0.dtype)

    def gram_loss(z, use_pallas_path):
        if use_pallas_path:
            K = kern.K(z, X)
        else:
            with gpr.input_gradients():
                K = kern.K(z, X)
        return jnp.sum(K * R)

    def jnp_zgrad(z):
        g = jax.grad(lambda zz: gram_loss(zz, False))(z)
        return z + 1e-12 * g

    def jnp_params(z):
        v, g = jax.value_and_grad(
            lambda w: gram_loss(jax.lax.stop_gradient(z), False)
            + 0.0 * jnp.sum(w))(jnp.zeros(()))
        return z + 1e-30 * v.astype(z.dtype)

    def pallas_params(z):
        v = gram_loss(jax.lax.stop_gradient(z), True)
        g = jax.grad(lambda zz: gram_loss(zz, True))(z)  # zero cotangents
        return z + 1e-30 * v.astype(z.dtype) + 1e-12 * g

    probe(jnp_zgrad, Z0, "jnp_zgrad")
    probe(pallas_params, Z0, "pallas_params")

    # full ELBO backward with vs without Z gradients
    loss_fn = model.make_loss_fn()
    train0, fixed = model._split_raws()
    z_shape = model.Z._raw.shape

    def step_full(params):
        v, g = jax.value_and_grad(loss_fn)(params, fixed)
        return jax.tree_util.tree_map(lambda p, gg: p + 1e-12 * gg, params, g)
    probe(step_full, train0, "elbo_grad_all")

    def step_noz(params):
        params = [jax.lax.stop_gradient(p) if p.shape == z_shape else p
                  for p in params]
        v, g = jax.value_and_grad(loss_fn)(params, fixed)
        return jax.tree_util.tree_map(lambda p, gg: p + 1e-12 * gg, params, g)
    probe(step_noz, train0, "elbo_grad_noz")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
