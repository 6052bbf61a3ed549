"""Honest per-step timing of the headline exact-GP training step.

On this image the TPU is tunneled and `block_until_ready()` does not block
on device execution — only host fetches do. This script times T training
steps chained inside ONE jitted lax.scan, fetches the final loss, and
reports the slope (t(T_hi)-t(T_lo))/(T_hi-T_lo): pure on-device step time,
with dispatch/round-trip/fetch overhead cancelled.

Usage: python benchmarks/step_slope.py [--exact-grad] [--no-pallas] [--n-per N]
"""
import os
import sys
import time
import json

import numpy as np


T_LO, T_HI = 2, 12


def main():
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import optax
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr

    if "--no-pallas" in sys.argv:
        gpr.use_pallas(False)
    else:
        gpr.use_pallas(True)
    exact_grad = "--exact-grad" in sys.argv

    if "--n-per" in sys.argv:
        bench.N_PER_CHANNEL = int(sys.argv[sys.argv.index("--n-per") + 1])
    xs, ys = bench.make_data()
    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.MultiOutputSpectralMixtureKernel(bench.Q, output_dims=bench.CHANNELS)
    rng = np.random.RandomState(1)
    kernel.mean.assign(0.05 + 0.3 * rng.rand(bench.CHANNELS, bench.Q, 1))
    kernel.variance.assign(0.2 + 0.3 * rng.rand(bench.CHANNELS, bench.Q, 1))
    model = gpr.Exact(kernel, X, Y, variance=0.1,
                      trace_probes=None if exact_grad else 16)

    loss_fn = model.make_loss_fn()
    train0, fixed = model._split_raws()
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(train0)

    def step(carry, _):
        params, opt_state = carry
        value, grads = jax.value_and_grad(loss_fn)(params, fixed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), value

    runs = {}
    for T in (T_LO, T_HI):
        @jax.jit
        def run(params, opt_state, T=T):
            (params, _), values = jax.lax.scan(step, (params, opt_state),
                                               None, length=T)
            return values[-1]
        t0 = time.perf_counter()
        v = float(np.asarray(run(train0, opt_state0)))
        print(f"T={T}: compile+first run {time.perf_counter()-t0:.1f}s, "
              f"loss={v:.4f}", flush=True)
        runs[T] = run

    ts = {}
    for T in (T_LO, T_HI):
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(runs[T](train0, opt_state0)))
            reps.append(time.perf_counter() - t0)
        ts[T] = min(reps)
        print(f"T={T}: best of 3 = {ts[T]:.3f}s", flush=True)

    per_step = (ts[T_HI] - ts[T_LO]) / (T_HI - T_LO)
    print(json.dumps({
        "per_step_ms": round(per_step * 1e3, 2),
        "steps_per_sec": round(1.0 / per_step, 3),
        "exact_grad": exact_grad,
        "pallas": "--no-pallas" not in sys.argv,
        "t_lo_s": round(ts[T_LO], 3), "t_hi_s": round(ts[T_HI], 3),
    }), flush=True)


if __name__ == "__main__":
    main()
