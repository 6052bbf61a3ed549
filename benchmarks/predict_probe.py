"""Serving-path probe: posterior mean+variance latency of the N=16k exact
model over an S-point grid, blocked linalg vs XLA expanders.

One-shot warm-call timing (best of 3, includes the client round trip —
an upper bound on device latency): the chained-loop timing method OOMs the
compiler for this graph, and the XLA-expander variant OOMs outright
(solve_triangular with thousands of RHS keeps N² loop buffers — the same
pathology ops/linalg._lml_bwd works around), which is itself the headline
result: without the blocked TRSM routing this serving shape does not fit
on the chip at all.

Run:  python benchmarks/predict_probe.py [S]
"""
import os
import sys
import json
import time

import numpy as np



def _grid(S, channels):
    rng = np.random.RandomState(2)
    parts = []
    for j in range(channels):
        g = np.sort(rng.uniform(0, 100, S // channels)).reshape(-1, 1)
        parts.append(np.column_stack([np.full(len(g), j), g]))
    return np.concatenate(parts, axis=0)


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8192
    gpr.use_pallas(True)
    xs, ys = bench.make_data()
    model = bench._build_model(xs, ys, trace_probes=16)
    Xs = jnp.asarray(_grid(S, bench.CHANNELS), jnp.float32)

    out = {"n": 16384, "s": int(Xs.shape[0])}
    for label, flag in [("blocked", None), ("xla", False)]:
        gpr.use_blocked_cholesky(flag)
        jax.clear_caches()
        model._jit_cache.clear()
        try:
            mu, var = model.predict_f(Xs)
            float(np.asarray(mu[0, 0]))  # force compile+run
            best = 1e9
            for _ in range(3):
                t0 = time.perf_counter()
                mu, var = model.predict_f(Xs)
                v = float(np.asarray(mu[0, 0])) + float(np.asarray(var[0, 0]))
                best = min(best, time.perf_counter() - t0)
            assert np.isfinite(v)
            out[f"predict_{label}_ms"] = round(best * 1e3, 1)
            print(f"predict mean+var S={out['s']} ({label:7s}): "
                  f"{best*1e3:9.1f} ms (incl. round trip)", flush=True)
        except Exception as e:
            msg = str(e)
            short = "OOM" if "Ran out of memory" in msg else msg[:120]
            out[f"predict_{label}_ms"] = None
            out[f"predict_{label}_error"] = short
            print(f"predict mean+var S={out['s']} ({label:7s}): FAILED ({short})",
                  flush=True)
    gpr.use_blocked_cholesky(None)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
