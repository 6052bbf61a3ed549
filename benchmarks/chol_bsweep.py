"""Time the HEAD blocked_cholesky factor (with panel inverses) at N=16k for
one block size. One invocation per subprocess (tunneled-worker rule).

Run:  python benchmarks/chol_bsweep.py [block_size] [n]
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 1024
    N = int(sys.argv[2]) if len(sys.argv) > 2 else 16384
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    from benchmarks._timing import device_ms

    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (N, 256), dtype=jnp.float32)
    K = A @ A.T + N * jnp.eye(N, dtype=jnp.float32)

    def factor(Kv):
        L, invs = blocked_cholesky(Kv, block_size=B, return_panel_invs=True)
        # feed the factor back so the loop can't be hoisted; keep SPD
        return Kv + 1e-20 * jnp.abs(L[:, :1])

    ms = device_ms(factor, K, target_sec=8.0, max_exec_sec=60)
    print(json.dumps({"n": N, "block": B, "factor_ms": round(ms, 2)}))


if __name__ == "__main__":
    main()
