"""Micro-probe the TPU: GEMM TFLOP/s per matmul precision, XLA Cholesky
time, triangular-solve throughput.

Timing method: on this image the TPU is tunneled (axon) and
`block_until_ready()` does NOT block on device execution — only a host
fetch does. Naive per-call timing measured 764 PFLOP/s on a 197 TFLOP/s
chip. Every measurement here runs T chained iterations inside ONE jitted
fori_loop, fetches a dependent scalar to the host, and reports the slope
(t(T_hi) - t(T_lo)) / (T_hi - T_lo), which cancels dispatch + fetch +
round-trip overhead exactly.

Run:  python benchmarks/microprobe.py [N]
"""
import sys
import time
import json

import numpy as np

T_LO, T_HI = 1, 9


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    print("backend:", jax.default_backend(), jax.devices()[0].device_kind, flush=True)
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (N, N), dtype=jnp.float32) / (N ** 0.5)
    K = A @ A.T + 10.0 * jnp.eye(N, dtype=jnp.float32)

    out = {"n": N}

    def slope_time(f, x, label, flops=None):
        runs = {}
        for T in (T_LO, T_HI):
            @jax.jit
            def run(x, T=T):
                r = jax.lax.fori_loop(0, T, lambda i, v: f(v), x)
                leaf = jax.tree_util.tree_leaves(r)[0]
                return jnp.sum(leaf.ravel()[:8])
            runs[T] = run
            np.asarray(run(x))  # compile + warm
        ts = {}
        for T in (T_LO, T_HI):
            reps = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(runs[T](x))
                reps.append(time.perf_counter() - t0)
            ts[T] = min(reps)
        t = (ts[T_HI] - ts[T_LO]) / (T_HI - T_LO)
        out[label + "_ms"] = round(t * 1e3, 3)
        msg = f"{label:28s}: {t*1e3:9.3f} ms"
        if flops:
            out[label + "_tflops"] = round(flops / t / 1e12, 1)
            msg += f"  {flops/t/1e12:8.1f} TFLOP/s"
        print(msg, flush=True)
        return t

    for prec in ["default", "high", "highest"]:
        def g(x, p=prec):
            y = jax.lax.dot(x, x, precision=p)
            return y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)
        slope_time(g, A, f"gemm_{prec}", flops=2 * N**3)

    Ab = A.astype(jnp.bfloat16)
    def gb(x):
        y = jax.lax.dot(x, x, preferred_element_type=jnp.float32)
        return (y / jnp.maximum(jnp.max(jnp.abs(y)), 1e-30)).astype(jnp.bfloat16)
    slope_time(gb, Ab, "gemm_bf16", flops=2 * N**3)

    def ch(Kv):
        L = jnp.linalg.cholesky(Kv)
        return Kv + 1e-20 * jnp.abs(L)
    slope_time(ch, K, "chol", flops=N**3 / 3)

    def ch_hi(Kv):
        with jax.default_matmul_precision("highest"):
            L = jnp.linalg.cholesky(Kv)
        return Kv + 1e-20 * jnp.abs(L)
    slope_time(ch_hi, K, "chol_highest", flops=N**3 / 3)

    L = jnp.linalg.cholesky(K)
    B0 = jax.random.normal(key, (N, 128), dtype=jnp.float32)
    for prec in ["default", "highest"]:
        def ts_(B, p=prec):
            with jax.default_matmul_precision(p):
                Y = jsl.solve_triangular(L, B, lower=True)
            return Y / jnp.maximum(jnp.max(jnp.abs(Y)), 1e-30)
        slope_time(ts_, B0, f"trisolve_128rhs_{prec}", flops=N * N * 128)

    for Bp in [256, 512]:
        Kp = K[:Bp, :Bp] + jnp.eye(Bp)
        slope_time(lambda x: x + 1e-20 * jnp.abs(jnp.linalg.cholesky(x)),
                   Kp, f"chol_panel{Bp}", flops=Bp**3 / 3)
        Lp = jnp.linalg.cholesky(Kp)
        R0 = jax.random.normal(key, (Bp, N), dtype=jnp.float32)
        for prec in ["high", "highest"]:
            def tp(R, p=prec):
                with jax.default_matmul_precision(p):
                    Y = jsl.solve_triangular(Lp, R, lower=True)
                return Y / jnp.maximum(jnp.max(jnp.abs(Y)), 1e-30)
            slope_time(tp, R0, f"trisolve_panel{Bp}_{prec}", flops=Bp * Bp * N)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
