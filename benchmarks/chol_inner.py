"""Isolate the blocked factorization's inner costs on the real chip:

  - s_only:      the 15 streamed S-panel Pallas GEMMs (the N^3/3 bulk)
  - writes_only: the 15 aliased panel-write + upper-zero kernels
  - tri_invs:    16 sequential 1024-panel triangular inversions
  - panels:      16 sequential recursive 1024-panel factorizations

The headline factor measures ~44 ms in place against a ~21 ms bf16x3 MXU
bound for the S GEMMs; this pins down whether the gap is S-kernel MXU
efficiency or the sequential panel/TRSM/write chain.

Run:  python benchmarks/chol_inner.py
"""
import sys
import json



def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mogptk_tpu.ops.blocked_cholesky import (
        _s_panel_pallas, _panel_write, _upper_zero, _panel_factor,
        _tri_inverse)
    from _timing import device_ms

    N, B = 16384, 1024
    nb = N // B
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (N, N), dtype=jnp.float32) / (N ** 0.5)
    K = A @ A.T + 10.0 * jnp.eye(N, dtype=jnp.float32)
    L0 = jnp.linalg.cholesky(K)
    out = {}

    def probe(body, x0, label, target=10.0):
        t = device_ms(body, x0, target_sec=target)
        out[label + "_ms"] = round(t, 2)
        print(f"{label:16s}: {t:9.2f} ms", flush=True)

    def s_only(Lv):
        acc = jnp.float32(0.0)
        for j in range(1, nb):
            S = _s_panel_pallas(Lv, Lv, j, B, 512, 512)
            acc = acc + S[0, 0]
        return Lv + 1e-20 * acc

    probe(s_only, L0, "s_only", target=15.0)

    Sfull = jax.random.normal(key, (N, B), jnp.float32)
    inv0 = _tri_inverse(L0[:B, :B])

    def writes_only(Lv):
        for j in range(nb):
            m = N - j * B
            L_ = _panel_write(Lv, Sfull[:m], inv0, L0[:B, :B], j, B, 512)
            if j < nb - 1:
                L_ = _upper_zero(L_, j, B, 512)
            Lv = L_
        return Lv

    probe(writes_only, L0, "writes_only")

    def tri_invs(Pv):
        with jax.default_matmul_precision("highest"):
            for _ in range(nb):
                inv = _tri_inverse(Pv)
                Pv = Pv + 1e-20 * jnp.abs(inv)
        return Pv
    probe(tri_invs, L0[:B, :B], "tri_invs")

    def panels(Pv):
        with jax.default_matmul_precision("highest"):
            for _ in range(nb):
                L = _panel_factor(Pv, "high", "highest")
                Pv = Pv + 1e-20 * jnp.abs(L)
        return Pv
    probe(panels, K[:B, :B], "panels")

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
