"""TPU probe: blocked_cholesky + fused_cho_solve under one jit at N=4096.

This is the exact shape that failed Mosaic lowering in round 3 (BENCH_r03:
"Failed to prove that a tile index in dimension 0 is divisible by the
tiling (8)"). Run on the real TPU after ANY edit to ops/pallas_solve.py.
"""
import os
import sys
import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")


def main(n=4096, r=17):
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    from mogptk_tpu.ops.pallas_solve import fused_cho_solve

    rng = np.random.RandomState(0)
    A = rng.randn(n, 256).astype(np.float32)
    K = jnp.asarray(A @ A.T) + n * jnp.eye(n, dtype=jnp.float32)
    B = jnp.asarray(rng.randn(n, r).astype(np.float32))

    @jax.jit
    def go(K, B):
        L, invs = blocked_cholesky(K, return_panel_invs=True)
        return fused_cho_solve(L, invs, B)

    X = np.asarray(go(K, B))
    resid = np.abs(np.asarray(K) @ X - np.asarray(B)).max()
    rel = resid / np.abs(np.asarray(B)).max()
    print("fused_cho_solve n=%d r=%d max|KX-B|=%.3e rel=%.3e" % (n, r, resid, rel))
    assert np.isfinite(X).all() and rel < 1e-3, "probe FAILED"
    print("probe OK")


if __name__ == "__main__":
    main(*(int(a) for a in sys.argv[1:]))
