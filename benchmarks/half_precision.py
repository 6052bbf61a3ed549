"""Measure the Gram-storage modes (f32 / bf16 / compensated bf16x2) end-to-end.

ROADMAP #2: the semantics shipped in round 1-2 (ops/linalg._solve_dtype
upcasts bf16 Grams to f32 inside every factorization/solve; the block
engines compute tiles in f32 and cast only the HBM write). Round 3 added
use_half_precision(compensated=True): the Gram is held as a two-term bf16
split (ops/linalg.split_bf16) whose reconstruction carries ~17 explicit
mantissa bits. This script measures what each storage mode buys and costs
on the real chip at the headline config:

  - steps/sec for the N=16k MOSM probe-gradient training step
  - LML at the init point (accuracy cost of the storage format)

Expected outcome (and the reason compensated mode is opt-in, not default):
bf16x2 costs 4 bytes/entry — the same as f32 with fewer mantissa bits —
and the in-place blocked Cholesky already factorizes a dead-temp f32 Gram
at 4 bytes/entry peak with zero accuracy loss. Plain bf16 (2 bytes/entry)
remains the only mode that actually shrinks persistent Gram storage, at a
documented LML shift; compensated mode removes the shift for persistent-
Gram pipelines that can afford f32-equal bytes.

Run on the TPU (no JAX_PLATFORMS override); prints one JSON line.
"""
import os
import sys
import json



def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr

    gpr.use_pallas(True)
    xs, ys = bench.make_data()
    out = {}

    for name, dtype, storage in [("f32", jnp.float32, None),
                                 ("bf16", jnp.bfloat16, None),
                                 ("bf16x2", jnp.float32, "bf16x2")]:
        gpr.config.dtype = dtype
        gpr.config.gram_storage = storage
        gpr.config.bump()
        try:
            model = bench._build_model(xs, ys, trace_probes=16)
            out["lml_%s" % name] = float(model.log_marginal_likelihood())
            out["steps_per_sec_%s" % name] = round(
                bench.time_training_steps(model, target_sec=15.0), 3)
        finally:
            gpr.config.dtype = None
            gpr.config.gram_storage = None
            gpr.config.bump()

    for name in ("bf16", "bf16x2"):
        out["lml_rel_diff_%s" % name] = (
            abs(out["lml_%s" % name] - out["lml_f32"]) / abs(out["lml_f32"]))
        out["speedup_%s" % name] = round(
            out["steps_per_sec_%s" % name] / out["steps_per_sec_f32"], 3)
    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
