"""Decompose blocked_cholesky's 58 ms (update='high', N=16k): how much is
the trailing GEMM bulk vs the 16 sequential panel factorizations vs the
TRSM-via-inverse GEMMs vs concat/HBM traffic.

Run:  python benchmarks/chol_decomp.py
"""
import sys
import json

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mogptk_tpu.ops.blocked_cholesky import (blocked_cholesky,
                                                 _panel_factor, _tri_inverse)
    from _timing import device_ms

    N, B = 16384, 1024
    nb = N // B
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (N, N), dtype=jnp.float32) / (N ** 0.5)
    K = A @ A.T + 10.0 * jnp.eye(N, dtype=jnp.float32)
    out = {}

    def probe(body, x0, label, target=10.0):
        t = device_ms(body, x0, target_sec=target)
        out[label + "_ms"] = round(t, 2)
        print(f"{label:28s}: {t:9.2f} ms", flush=True)

    # (a) full blocked chol, high updates
    probe(lambda Kv: Kv + 1e-20 * jnp.abs(
        blocked_cholesky(Kv, B, update_precision="high")), K, "blocked_high")

    # (b) 16 sequential panel factorizations (recursive _panel_factor)
    Kp = K[:B, :B]
    def panels(Pv):
        with jax.default_matmul_precision("highest"):
            for _ in range(nb):
                L = _panel_factor(Pv, "high", "highest")
                Pv = Pv + 1e-20 * jnp.abs(L)
        return Pv
    probe(panels, Kp, "panels_16x1024_recursive")

    # (b2) the same via plain XLA chol panels
    def panels_xla(Pv):
        with jax.default_matmul_precision("highest"):
            for _ in range(nb):
                L = jnp.linalg.cholesky(Pv)
                Pv = Pv + 1e-20 * jnp.abs(L)
        return Pv
    probe(panels_xla, Kp, "panels_16x1024_xla")

    # (b3) a single 256 leaf chol, 64x sequential (what recursion bottoms at)
    Kleaf = K[:256, :256]
    def leaves(Pv):
        with jax.default_matmul_precision("highest"):
            for _ in range(16):
                L = jnp.linalg.cholesky(Pv)
                Pv = Pv + 1e-20 * jnp.abs(L)
        return Pv
    probe(leaves, Kleaf, "leaves_16x256_xla")

    # (c) 16 tri-inverses + TRSM GEMMs at the real shapes
    Lp = jnp.linalg.cholesky(Kp)
    def trsm(Sv):
        with jax.default_matmul_precision("highest"):
            for j in range(nb - 1):
                inv = _tri_inverse(Lp)
                m = N - (j + 1) * B
                r = jax.lax.dot_general(Sv[:m], inv, (((1,), (1,)), ((), ())),
                                        precision="highest")
                Sv = Sv.at[:m].set(r)
        return Sv
    probe(trsm, jax.random.normal(key, (N - B, B), jnp.float32), "trsm_gemms")

    # (d) the accumulation GEMM bulk alone at 'high'
    L = jnp.linalg.cholesky(K)
    def gemms(Lv):
        acc = None
        for j in range(1, nb):
            r0 = j * B
            Lleft = Lv[r0:, :r0]
            S = jax.lax.dot_general(Lleft, Lleft[:B], (((1,), (1,)), ((), ())),
                                    precision="high")
            acc = S[0, 0] if acc is None else acc + S[0, 0]
        return Lv + 1e-20 * acc
    probe(gemms, L, "update_gemms_high", target=15.0)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
