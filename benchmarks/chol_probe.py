"""TPU probe: blocked_cholesky vs XLA's expander at N=16k — speed at each
update precision (dynamic-trip-count timing, see _timing.py) and accuracy
(logdet + max elementwise diff vs XLA's factor).

Run:  python benchmarks/chol_probe.py [N]
"""
import sys
import json

import numpy as np


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    from _timing import device_ms

    N = int(sys.argv[1]) if len(sys.argv) > 1 else 16384
    print("backend:", jax.default_backend(), flush=True)
    key = jax.random.PRNGKey(0)
    A = jax.random.normal(key, (N, N), dtype=jnp.float32) / (N ** 0.5)
    K = A @ A.T + 10.0 * jnp.eye(N, dtype=jnp.float32)

    out = {"n": N}

    def probe(chol_fn, label):
        def body(Kv):
            L = chol_fn(Kv)
            return Kv + 1e-20 * jnp.abs(L)
        t = device_ms(body, K, target_sec=12.0)
        out[label + "_ms"] = round(t, 2)
        print(f"{label:32s}: {t:9.2f} ms   ({N**3/3/(t/1e3)/1e12:6.1f} TFLOP/s)",
              flush=True)

    probe(jnp.linalg.cholesky, "xla_chol")
    for prec, B in [("high", 1024), ("high", 2048), ("default", 1024),
                    ("default", 2048), ("highest", 1024)]:
        probe(lambda Kv, p=prec, b=B: blocked_cholesky(
            Kv, block_size=b, update_precision=p), f"blocked_{prec}_B{B}")

    @jax.jit
    def stats(Kv):
        Lx = jnp.linalg.cholesky(Kv)
        res = {"logdet_xla": jnp.sum(jnp.log(jnp.diagonal(Lx)))}
        for prec in ["high", "default"]:
            Lb = blocked_cholesky(Kv, block_size=1024, update_precision=prec)
            res["logdet_blk_" + prec] = jnp.sum(jnp.log(jnp.diagonal(Lb)))
            res["maxdiff_" + prec] = jnp.max(jnp.abs(Lb - Lx))
        return res
    out.update({k: round(float(v), 6) for k, v in stats(K).items()})
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
