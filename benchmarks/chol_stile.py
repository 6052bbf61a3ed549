"""Sweep the S-panel kernel's (row tile, k chunk) on the real chip.

The S accumulation's HBM traffic is dominated by the (B, TK) diagonal-block
operand, re-fetched once per row tile: bytes ~ (m/T)*r0*B*4 per column
(~11 GB total at N=16k with T=256 — ~13 ms of the measured 47.4 ms factor
against a ~32 ms GEMM+TRSM+panel floor). Larger T divides that traffic;
this sweep measures the full blocked factorization per (T, TK) and prints
one JSON line so the default (gpr/config.blocked_cholesky_s_tile) is a
measured choice.

Run:  python benchmarks/chol_stile.py
"""
import sys
import json



def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    from _timing import device_ms

    N, B = 16384, 1024
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (N, N), dtype=jnp.float32) / (N ** 0.5)
    K = A @ A.T + 10.0 * jnp.eye(N, dtype=jnp.float32)
    Lref = None
    out = {}
    import os
    configs = [(256, 512), (512, 512), (512, 256), (1024, 256), (1024, 512)]
    if os.environ.get("STILE_ONE"):
        # single default-tile run: factor time + residual sanity check
        configs = [(512, 512)]
    elif os.environ.get("STILE_DEEP"):
        # deeper K chunks: fewer grid steps, less accumulator VMEM traffic
        configs = [(512, 512), (512, 1024), (256, 1024)]
    for T, TK in configs:
        label = "T%d_TK%d" % (T, TK)
        try:
            L = blocked_cholesky(K, B, s_tile=(T, TK))
            resid = float(jnp.max(jnp.abs(L @ L.T - K)) / jnp.max(jnp.abs(K)))
            if Lref is None:
                Lref = L
            t = device_ms(lambda Kv, T=T, TK=TK: Kv + 1e-20 * jnp.abs(
                blocked_cholesky(Kv, B, s_tile=(T, TK))), K, target_sec=10.0)
            out[label] = {"ms": round(t, 2), "resid": resid}
            print("%s: %.2f ms (resid %.2e)" % (label, t, resid), flush=True)
        except Exception as e:
            out[label] = {"error": repr(e)[:200]}
            print("%s: FAILED %r" % (label, e), flush=True)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
