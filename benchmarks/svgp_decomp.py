"""Decompose the SVGP (Titsias M=1024, N=16k) training step on TPU.

bench.py's secondary metric sits near 77 ELBO steps/s (~13 ms/step). This
probe breaks the step into its pieces with the dynamic-trip-count timer so
the next optimization target is measured, not guessed:

  full_step     - jitted ELBO value_and_grad + Adam update
  elbo_fwd      - collapsed ELBO forward only
  kuf_gram      - Kuf (M, N) Gram via the differentiable jnp path (the
                  trained-Z route after the input-gradients fix)
  kuu_chol      - Kuu Cholesky + whitening solve v = Luu^-1 Kuf
  q_gemm        - Q = v v^T (M,N)x(N,M) GEMM under the sensitive scope

Run: python benchmarks/svgp_decomp.py   (TPU)
"""
import os
import sys
import json

import numpy as np



def main():
    import jax
    import jax.numpy as jnp
    import optax
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.ops.linalg import solve_triangular
    from _timing import device_ms

    gpr.use_compilation_cache()
    gpr.use_pallas(True)
    gpr.use_jitter_ladder(3)

    xs, ys = bench.make_data()
    model = bench._build_model(xs, ys, None, inference="svgp", M=1024)

    out = {}

    def probe(body, x0, label, target=8.0):
        t = device_ms(body, x0, target_sec=target)
        out[label + "_ms"] = round(t, 3)
        print(f"{label:12s}: {t:9.3f} ms", flush=True)

    loss_fn = model.make_loss_fn()
    train0, fixed = model._split_raws()
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(train0)

    def step(carry):
        params, opt_state = carry
        value, grads = jax.value_and_grad(loss_fn)(params, fixed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state)
    probe(step, (train0, opt_state0), "full_step", target=12.0)

    def elbo_fwd(params):
        v = loss_fn(params, fixed)
        return jax.tree_util.tree_map(
            lambda p: p + 1e-30 * v.astype(p.dtype), params)
    probe(elbo_fwd, train0, "elbo_fwd", target=8.0)

    # pieces at the step's actual shapes
    Z = model.Z()
    X = model.X
    kern = model.kernel

    def kuf(z):
        with gpr.input_gradients():
            Kuf = kern.K(z, X)
        return z + 1e-30 * Kuf[0, :1]
    probe(kuf, Z, "kuf_gram", target=8.0)

    with gpr.input_gradients():
        Kuf0 = kern.K(Z, X)
        Kuu0 = kern.K(Z)

    def kuu_chol(Kc):
        Kuu, Kuf = Kc
        L = model._cholesky(Kuu, add_jitter=True)
        v = solve_triangular(L, Kuf)
        return (Kuu + 1e-30 * v[0, 0], Kuf)
    probe(kuu_chol, (Kuu0, Kuf0), "kuu_chol", target=8.0)

    L0 = model._cholesky(Kuu0, add_jitter=True)
    v0 = solve_triangular(L0, Kuf0)

    def q_gemm(v):
        from mogptk_tpu.gpr.config import sensitive_matmul_scope
        with sensitive_matmul_scope():
            Q = v @ v.T
        return v + 1e-30 * Q[0, :1]
    probe(q_gemm, v0, "q_gemm", target=8.0)

    # ---- backward-side cells (the step's 6+ ms beyond the forward) ----

    # Kuf gram fwd+VJP wrt Z (the in-kernel x-cotangent route; the custom
    # backward computes the param cotangents in the same kernel, so this is
    # the gram's full cost inside value_and_grad)
    def kuf_vjp_z(z):
        def f(z_):
            with gpr.input_gradients():
                return jnp.sum(kern.K(z_, X))
        return z + 1e-12 * jax.grad(f)(z)
    probe(kuf_vjp_z, Z, "kuf_vjp_z", target=8.0)

    # whitening chain fwd+VJP: chol(Kuu) + Luu^-1 Kuf, grads to both inputs
    def whiten_vjp(carry):
        Kuu, Kuf = carry

        def f(a, b):
            L = model._cholesky(a, add_jitter=True)
            v = solve_triangular(L, b)
            return jnp.sum(v * v)
        g = jax.grad(f, argnums=(0, 1))(Kuu, Kuf)
        return (Kuu + 1e-12 * g[0], Kuf + 1e-12 * g[1])
    probe(whiten_vjp, (Kuu0, Kuf0), "whiten_vjp", target=8.0)

    # full step with Z's gradient stopped: the Z-cotangent increment.
    # train is a LIST of raw leaves; Z's raw is the only (M, ...) 2-D one
    M = Z.shape[0]

    def step_zstop(carry):
        params, opt_state = carry

        def loss_z(p, f_):
            p = [jax.lax.stop_gradient(leaf)
                 if (leaf.ndim == 2 and leaf.shape[0] == M) else leaf
                 for leaf in p]
            return loss_fn(p, f_)
        value, grads = jax.value_and_grad(loss_z)(params, fixed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state)
    probe(step_zstop, (train0, opt_state0), "step_zstop", target=12.0)

    # optimizer alone (single-leaf Adam)
    g0 = jax.tree_util.tree_map(jnp.ones_like, train0)

    def opt_only(carry):
        params, opt_state = carry
        updates, opt_state = optimizer.update(g0, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state)
    probe(opt_only, (train0, opt_state0), "opt_only", target=4.0)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
