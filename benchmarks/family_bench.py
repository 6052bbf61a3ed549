"""Per-family Gram-engine timing: fused forward + the production
probe-gradient training step, one family per invocation.

bench.py's headline measures MOSM only; the uMOSM/CSM/CONV/MOHSM/LMC fused
engines (ops/block_families.py) had canary *correctness* cells but no
timing, so a regression in any non-MOSM family would ship silently
(VERDICT r4 weak #7). This probe runs at N=4,096 (2 channels x 2,048 —
small enough that one subprocess per family stays cheap, large enough that
the Gram engine dominates the Cholesky) and reports:

- gram_fwd_ms:   the fused channel-sorted Gram evaluation (K_sorted)
- probe_step_ms: the full fused probe-LML training step (Gram + blocked
                 in-place Cholesky + solves + low-rank VJP + Adam)

Run:  python benchmarks/family_bench.py <mosm|umosm|csm|conv|mohsm|lmc_sm>
Prints one JSON line {"family", "n", "gram_fwd_ms", "probe_step_ms"}.
"""
import json
import sys

import numpy as np

CHANNELS = 2
N_PER = 2048


def main():
    family = sys.argv[1] if len(sys.argv) > 1 else "mosm"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import optax
    import mogptk_tpu.gpr as gpr
    from _timing import device_ms
    import tpu_canary

    gpr.use_pallas(True)
    N, X, Y = tpu_canary._data(CHANNELS, N_PER)
    # MOHSM's exact reference formula goes non-PSD at this density (known
    # parity defect, models/mohsm.py): the timed engine is identical under
    # psd_safe (a parameter-side tanh saturation), so time that regime
    kernel = tpu_canary._family_kernel(family, np.random.RandomState(1),
                                       channels=CHANNELS,
                                       mohsm_psd_safe=(family == "mohsm"))
    model = gpr.Exact(kernel, X, Y, variance=0.1, trace_probes=16)
    assert model._fused_static() is not None, (
        "fused probe-LML gate did not engage for %s" % family)
    counts = model._channel_counts

    # -- fused Gram forward ---------------------------------------------------
    train, fixed = model._split_raws()
    raws = model._merge_raws(train, fixed)

    has_sorted = counts is not None and hasattr(model.kernel, "K_sorted")

    def gram_body(carry):
        x, acc = carry
        with model.bind(raws):
            K = (model.kernel.K_sorted(x, counts) if has_sorted
                 else model.kernel.K(x))
        # iteration-dependent input so the loop body cannot be hoisted
        return x + 1e-30 * K[0, 0], acc + K[0, 1]

    gram_ms = device_ms(gram_body, (model.X, jnp.float32(0.0)),
                        target_sec=5.0)

    # -- full probe-gradient training step ------------------------------------
    loss_flat, flatten, _ = model.make_flat_loss_fn()
    train0 = flatten(train)
    # the timing chain runs O(1000) real Adam steps; MOHSM's fragile PSD
    # region needs a step size that cannot walk the params out of it
    # (identical op count either way — lr does not change the timing)
    optimizer = optax.adam(1e-6 if family == "mohsm" else 1e-3)

    def step_body(carry):
        params, opt_state = carry
        value, grads = jax.value_and_grad(loss_flat)(params, fixed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    step_ms = device_ms(step_body, (train0, optimizer.init(train0)),
                        target_sec=5.0)

    print(json.dumps({"family": family, "n": int(sum(N)),
                      "gram_fwd_ms": round(gram_ms, 3),
                      "probe_step_ms": round(step_ms, 3)}))


if __name__ == "__main__":
    main()
