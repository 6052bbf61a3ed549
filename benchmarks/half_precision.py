"""Measure use_half_precision (bf16 params/Gram, f32 solves) end-to-end.

ROADMAP #2: the semantics shipped in round 1-2 (ops/linalg._solve_dtype
upcasts bf16 Grams to f32 inside every factorization/solve; the block
engines compute tiles in the config dtype). This script measures what the
bf16 Gram actually buys and costs on the real chip at the headline config:

  - steps/sec for the N=16k MOSM probe-gradient training step, f32 vs bf16
  - LML at the init point, f32 vs bf16 (accuracy cost of the bf16 tile math)

Run on the TPU (no JAX_PLATFORMS override); prints one JSON line.
"""
import os
import sys
import json

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import bench
    import mogptk_tpu.gpr as gpr

    gpr.use_pallas(True)
    xs, ys = bench.make_data()
    out = {}

    for name, dtype in [("f32", jnp.float32), ("bf16", jnp.bfloat16)]:
        gpr.config.dtype = dtype
        try:
            model = bench._build_model(xs, ys, trace_probes=16)
            out["lml_%s" % name] = float(model.log_marginal_likelihood())
            out["steps_per_sec_%s" % name] = round(
                bench.time_training_steps(model, target_sec=15.0), 3)
        finally:
            gpr.config.dtype = None

    out["lml_rel_diff"] = abs(out["lml_bf16"] - out["lml_f32"]) / abs(out["lml_f32"])
    out["speedup_bf16"] = round(
        out["steps_per_sec_bf16"] / out["steps_per_sec_f32"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
