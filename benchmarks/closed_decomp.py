"""Decompose the deterministic (closed-form-gradient) exact step at N=16k.

BENCH exact_grad sits at ~201 ms/step (VERDICT r4 #4 target: <=200). Cells
(one subprocess each, hot_decomp-style):

  full      - jitted loss value_and_grad + Adam (the bench step)
  fwd       - loss forward only (factor + solve + logdet)
  kinv512   - spd_inverse_from_factor at the factorization's B=512 panels,
              panel inverses supplied (the production backward route)
  kinv1024  - same at B=1024, inverses recomputed (the pre-01d19bf route)
  dk        - the dense cotangent assembly dK = (g/2)(aa^T - Kinv): one
              N^2 elementwise pass producing a fresh (N,N) array

Run:  python benchmarks/closed_decomp.py CELL
"""
import json
import os
import sys

import numpy as np


def main():
    cell = sys.argv[1] if len(sys.argv) > 1 else "full"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import optax
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr
    from _timing import device_ms

    gpr.use_pallas(True)
    if os.environ.get("PALLAS_SYRK"):
        gpr.config.pallas_syrk = os.environ["PALLAS_SYRK"] == "1"
    out = {}

    def probe(body, x0, label, target=10.0):
        t = device_ms(body, x0, target_sec=target, max_exec_sec=60.0)
        out[label + "_ms"] = round(t, 2)
        print(f"{label:10s}: {t:9.2f} ms", flush=True)

    if cell in ("full", "fwd"):
        xs, ys = bench.make_data()
        model = bench._build_model(xs, ys, trace_probes=None)
        loss_fn = model.make_loss_fn()
        train0, fixed = model._split_raws()
        if cell == "full":
            optimizer = optax.adam(1e-3)

            def step(carry):
                params, opt_state = carry
                value, grads = jax.value_and_grad(loss_fn)(params, fixed)
                updates, opt_state = optimizer.update(grads, opt_state, params)
                return optax.apply_updates(params, updates), opt_state
            probe(step, (train0, optimizer.init(train0)), "full", target=20.0)
        else:
            def fwd(params):
                v = loss_fn(params, fixed)
                return jax.tree_util.tree_map(
                    lambda p: p + 1e-30 * v.astype(p.dtype), params)
            probe(fwd, train0, "fwd", target=15.0)

    elif cell in ("kinv512", "kinv1024", "dk", "triinv512", "syrk512",
                  "wtwone"):
        from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
        from mogptk_tpu.ops.blocked_trisolve import (spd_inverse_from_factor,
                                                     blocked_tri_inverse)
        N = 16384
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (N, N), dtype=jnp.float32) / (N ** 0.5)
        K = A @ A.T + 10.0 * jnp.eye(N, dtype=jnp.float32)
        shift = jnp.full((N,), 0.1, jnp.float32)
        L, invs = blocked_cholesky(K, block_size=512, diag_shift=shift,
                                   return_panel_invs=True, zero_upper=False)
        if cell == "triinv512":
            def body(Lv):
                W = blocked_tri_inverse(Lv, block_size=512, invs=invs)
                return Lv + 1e-25 * W
            probe(body, L, "triinv512", target=10.0)
        elif cell in ("syrk512", "wtwone"):
            W0 = blocked_tri_inverse(L, block_size=512, invs=invs)
            if cell == "wtwone":
                def body(Wv):
                    Kinv = jax.lax.dot_general(Wv, Wv, (((0,), (0,)),
                                                        ((), ())),
                                               precision="high")
                    return Wv + 1e-25 * Kinv
            else:
                from mogptk_tpu.ops import blocked_trisolve as bt

                def body(Wv):
                    # the syrk+mirror tail of spd_inverse_from_factor
                    n_, Bs = Wv.shape[0], 512
                    nbl = n_ // Bs
                    cols = []
                    for jb in range(nbl):
                        rows = ([jnp.zeros((jb * Bs, Bs), Wv.dtype)]
                                if jb else [])
                        for ib in range(jb, nbl):
                            r0 = ib * Bs
                            blk = jax.lax.dot_general(
                                Wv[r0:, r0:r0 + Bs],
                                Wv[r0:, jb * Bs:(jb + 1) * Bs],
                                (((0,), (0,)), ((), ())), precision="high")
                            rows.append(blk)
                        cols.append(jnp.concatenate(rows, axis=0))
                    Kl = jnp.concatenate(cols, axis=1)
                    rb = jax.lax.broadcasted_iota(jnp.int32, (n_, n_), 0) // Bs
                    cb = jax.lax.broadcasted_iota(jnp.int32, (n_, n_), 1) // Bs
                    strict = rb > cb
                    Kinv = (jnp.where(strict, Kl, jnp.zeros((), Wv.dtype)).T
                            + jnp.where(rb >= cb, Kl,
                                        jnp.zeros((), Wv.dtype)))
                    return Wv + 1e-25 * Kinv
            probe(body, W0, cell, target=10.0)
        elif cell == "kinv512":
            def body(Lv):
                Kinv = spd_inverse_from_factor(Lv, block_size=512, invs=invs)
                return Lv + 1e-25 * Kinv
            probe(body, L, "kinv512", target=10.0)
        elif cell == "kinv1024":
            def body(Lv):
                Kinv = spd_inverse_from_factor(Lv, block_size=1024)
                return Lv + 1e-25 * Kinv
            probe(body, L, "kinv1024", target=10.0)
        else:
            Kinv = spd_inverse_from_factor(L, block_size=512, invs=invs)
            alpha = jax.random.normal(jax.random.PRNGKey(1), (N, 1),
                                      dtype=jnp.float32)

            def body(carry):
                Kv, a = carry
                dK = 0.5 * (a * a[:, 0][None, :] - Kv)
                return Kv + 1e-25 * dK, a
            probe(body, (Kinv, alpha), "dk", target=10.0)
    else:
        raise SystemExit("unknown cell %r" % cell)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
