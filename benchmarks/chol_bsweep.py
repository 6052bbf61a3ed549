"""Time the HEAD blocked_cholesky factor (with panel inverses) at N=16k for
one block size. One invocation per subprocess (tunneled-worker rule).

Run:  python benchmarks/chol_bsweep.py [block_size] [n] [shift]
shift: none (default) | vec — factor with an (n,) vector diag_shift, the
form the fused LML uses (the noise diagonal rides the factorization).
"""
import os
import sys
import json



def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    shift_mode = sys.argv[3] if len(sys.argv) > 3 else "none"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    from _timing import device_ms

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (N, 256), dtype=jnp.float32)
    K = A @ A.T + N * jnp.eye(N, dtype=jnp.float32)
    shift = (jnp.full((N,), 0.1, jnp.float32)
             if shift_mode in ("vec", "gemm", "gram") else None)

    if shift_mode == "gemm":
        # K produced by a GEMM INSIDE the loop (dead-temp producer): is the
        # in-place aliasing/copy behavior producer-dependent?
        def factor(Av):
            Kv = Av @ Av.T + N * jnp.eye(N, dtype=jnp.float32)
            L, invs = blocked_cholesky(Kv, block_size=B, diag_shift=shift,
                                       return_panel_invs=True)
            return Av + 1e-20 * jnp.abs(L[:, :1])
        x0 = A
    elif shift_mode in ("gram", "gramcopy", "gramnoinplace"):
        # K produced by the real Pallas gram engine inside the loop — the
        # fused LML's exact producer context
        from _bench_mod import bench
        import mogptk_tpu.gpr as gpr
        from mogptk_tpu.ops import linalg as lg
        gpr.use_pallas(True)
        xs, ys = bench.make_data()
        model = bench._build_model(xs, ys, trace_probes=16)
        train0, fixedr = model._split_raws()
        from mogptk_tpu.gpr.iterative import _fused_kernel_params
        with model.bind(model._merge_raws(train0, fixedr)):
            params = _fused_kernel_params(model.kernel)
            _, x = model.kernel._split(model.X)
        family, counts, _, _ = model._fused_static()

        def factor(carry):
            ps = list(carry)
            Kv = lg._sorted_gram(family, x, counts, tuple(ps))
            if shift_mode == "gramcopy":
                # rematerialize the gram through one elementwise pass: does
                # a non-custom-call producer restore the in-place aliasing?
                Kv = Kv * jnp.float32(1.0 + 1e-12)
            L, invs = blocked_cholesky(Kv, block_size=B, diag_shift=shift,
                                       return_panel_invs=True,
                                       inplace=shift_mode != "gramnoinplace")
            ps[0] = ps[0] + 1e-30 * L[0, 0]
            return tuple(ps)
        x0 = tuple(params)
    else:
        def factor(Kv):
            L, invs = blocked_cholesky(Kv, block_size=B, diag_shift=shift,
                                       return_panel_invs=True)
            # feed the factor back so the loop can't be hoisted; keep SPD
            return Kv + 1e-20 * jnp.abs(L[:, :1])
        x0 = K

    ms = device_ms(factor, x0, target_sec=8.0, max_exec_sec=60)
    print(json.dumps({"n": N, "block": B, "shift": shift_mode,
                      "factor_ms": round(ms, 2)}))


if __name__ == "__main__":
    main()
