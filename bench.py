"""Benchmark: exact-GP LML+gradient steps/sec, MOSM kernel, N=16k multi-channel.

This is the north-star config from BASELINE.md: 4 channels x 4096 points,
MultiOutputSpectralMixtureKernel(Q=2), exact inference. One full training
step = Gram assembly + Cholesky + LML + backward pass + Adam update, all in
one jitted XLA program on the TPU (float32).

vs_baseline is measured against the reference implementation
(GAMES-UChile/mogptk, PyTorch CPU float64) running the same configuration;
the baseline measurement is cached in BENCH_BASELINE_CACHE.json because a
single reference step takes minutes at this size.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
import os
import sys
import json
import time
import numpy as np

N_PER_CHANNEL = 4096
CHANNELS = 4
Q = 2
WARMUP = 2
MEASURE_STEPS = 10
CACHE_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)), "BENCH_BASELINE_CACHE.json")


def make_data():
    rng = np.random.RandomState(0)
    xs, ys = [], []
    for j in range(CHANNELS):
        x = np.sort(rng.uniform(0.0, 100.0, N_PER_CHANNEL)).reshape(-1, 1)
        y = (np.sin(0.5 * x[:, 0] + j) + 0.4 * np.cos(2.1 * x[:, 0]) +
             0.1 * rng.randn(N_PER_CHANNEL)).reshape(-1, 1)
        xs.append(x)
        ys.append(y)
    return xs, ys


def bench_ours(xs, ys):
    import jax
    # persist compiled programs: remote TPU compilation of the full training
    # step takes minutes; the cache makes repeat runs start instantly
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    import jax.numpy as jnp
    import optax
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import mogptk_tpu.gpr as gpr
    if not os.environ.get("BENCH_NO_PALLAS"):
        # the fused Pallas Gram kernel is slightly faster end-to-end and
        # verified on hardware; set BENCH_NO_PALLAS=1 for the pure-XLA path
        gpr.use_pallas(True)

    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.MultiOutputSpectralMixtureKernel(Q, output_dims=CHANNELS)
    rng = np.random.RandomState(1)
    kernel.mean.assign(0.05 + 0.3 * rng.rand(CHANNELS, Q, 1))
    kernel.variance.assign(0.2 + 0.3 * rng.rand(CHANNELS, Q, 1))
    # Hutchinson probe-trace gradients (unbiased, BBMM-style): the backward
    # becomes two 16-column triangular solves instead of an N x N inverse
    model = gpr.Exact(kernel, X, Y, variance=0.1,
                      trace_probes=None if os.environ.get("BENCH_EXACT_GRAD") else 16)

    loss_fn = model.make_loss_fn()
    train0, fixed = model._split_raws()
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(train0)

    @jax.jit
    def step(params, opt_state):
        value, grads = jax.value_and_grad(loss_fn)(params, fixed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    params, opt_state = train0, opt_state0
    for _ in range(WARMUP):
        params, opt_state, value = step(params, opt_state)
    value.block_until_ready()

    start = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        params, opt_state, value = step(params, opt_state)
    value.block_until_ready()
    elapsed = time.perf_counter() - start
    if not np.isfinite(float(value)):
        raise RuntimeError("benchmark loss is not finite: %r" % (float(value),))
    return MEASURE_STEPS / elapsed, float(value)


def bench_reference(xs, ys, max_steps=2):
    """Time the reference implementation (torch CPU f64) on the same config."""
    if os.path.exists(CACHE_FILE):
        with open(CACHE_FILE) as f:
            cache = json.load(f)
        if (cache.get("n_per_channel") == N_PER_CHANNEL
                and cache.get("channels") == CHANNELS and cache.get("q") == Q):
            return cache["steps_per_sec"]

    sys.path.insert(0, "/root/reference")
    import torch
    import mogptk.gpr as refgpr

    N, X, Y = refgpr.merge_data(
        [torch.tensor(x, dtype=torch.float64) for x in xs],
        [torch.tensor(y, dtype=torch.float64) for y in ys])
    kernel = refgpr.MultiOutputSpectralMixtureKernel(Q, output_dims=CHANNELS)
    rng = np.random.RandomState(1)
    kernel.mean.assign(torch.tensor(0.05 + 0.3 * rng.rand(CHANNELS, Q, 1)))
    kernel.variance.assign(torch.tensor(0.2 + 0.3 * rng.rand(CHANNELS, Q, 1)))
    model = refgpr.Exact(kernel, X, Y, variance=0.1)
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)

    # warmup one step
    model.loss()
    optimizer.step()

    start = time.perf_counter()
    steps = 0
    while steps < max_steps and (time.perf_counter() - start) < 600.0:
        model.loss()
        optimizer.step()
        steps += 1
    elapsed = time.perf_counter() - start
    steps_per_sec = steps / elapsed

    with open(CACHE_FILE, "w") as f:
        json.dump({"n_per_channel": N_PER_CHANNEL, "channels": CHANNELS, "q": Q,
                   "steps_per_sec": steps_per_sec, "steps_measured": steps,
                   "elapsed_sec": elapsed}, f)
    return steps_per_sec


def bench_svgp(xs, ys, M=1024):
    """Secondary metric from BASELINE.md: SVGP ELBO steps/sec at M inducing
    points (Titsias collapsed bound) on the same N=16k data."""
    import jax
    import optax
    import mogptk_tpu.gpr as gpr

    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.MultiOutputSpectralMixtureKernel(Q, output_dims=CHANNELS)
    rng = np.random.RandomState(1)
    kernel.mean.assign(0.05 + 0.3 * rng.rand(CHANNELS, Q, 1))
    kernel.variance.assign(0.2 + 0.3 * rng.rand(CHANNELS, Q, 1))
    model = gpr.Titsias(kernel, X, Y, Z=M // CHANNELS, Z_init="random", variance=0.1)

    loss_fn = model.make_loss_fn()
    train0, fixed = model._split_raws()
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(train0)

    @jax.jit
    def step(params, opt_state):
        value, grads = jax.value_and_grad(loss_fn)(params, fixed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    params, opt_state = train0, opt_state0
    for _ in range(WARMUP):
        params, opt_state, value = step(params, opt_state)
    value.block_until_ready()
    start = time.perf_counter()
    for _ in range(MEASURE_STEPS):
        params, opt_state, value = step(params, opt_state)
    value.block_until_ready()
    elapsed = time.perf_counter() - start
    return MEASURE_STEPS / elapsed


def main():
    xs, ys = make_data()

    ours, final_loss = bench_ours(xs, ys)

    try:
        svgp = bench_svgp(xs, ys)
    except Exception as e:
        print("svgp bench failed: %r" % (e,), file=sys.stderr)
        svgp = None

    if os.environ.get("BENCH_SKIP_BASELINE"):
        ref = None
        if os.path.exists(CACHE_FILE):
            with open(CACHE_FILE) as f:
                ref = json.load(f).get("steps_per_sec")
    else:
        try:
            ref = bench_reference(xs, ys)
        except Exception as e:
            print("baseline measurement failed: %r" % (e,), file=sys.stderr)
            ref = None

    result = {
        "metric": "exact GP LML+grad steps/sec (MOSM Q=%d, %d channels x %d points, f32 TPU)"
                  % (Q, CHANNELS, N_PER_CHANNEL),
        "value": round(ours, 4),
        "unit": "steps/sec",
        "vs_baseline": round(ours / ref, 2) if ref else None,
        "svgp_elbo_steps_per_sec_M1024": round(svgp, 4) if svgp else None,
    }
    print(json.dumps(result))


if __name__ == "__main__":
    main()
