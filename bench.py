"""Benchmark: exact-GP LML+gradient steps/sec, MOSM kernel, N=16k multi-channel.

This is the north-star config from BASELINE.md: 4 channels x 4096 points,
MultiOutputSpectralMixtureKernel(Q=2), exact inference. One full training
step = Gram assembly + Cholesky + LML + backward pass + Adam update, all in
one jitted XLA program on the TPU (float32).

Timing method: this image's tunneled TPU does NOT block on
block_until_ready(), and separately compiled executables see seconds of
round-trip noise. Each measurement therefore runs T chained training steps
inside ONE executable (dynamic fori_loop trip count), fetches the final
loss to the host (which does block), and reports the slope
(t(T_hi)−t(T_lo))/(T_hi−T_lo) — pure on-device step time.

The headline number uses Hutchinson probe-trace gradients (unbiased,
BBMM-style; tests/test_linalg.py asserts unbiasedness); the JSON also
reports the deterministic closed-form-gradient number
(exact_grad_steps_per_sec) so the comparison with the reference's exact
gradients is apples-to-apples.

vs_baseline is measured against the reference implementation
(GAMES-UChile/mogptk, PyTorch CPU float64) running the same configuration;
the baseline measurement is cached in BENCH_BASELINE_CACHE.json because a
single reference step takes minutes at this size.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline", ...}.
"""
import os
import sys
import json
import time
import numpy as np

N_PER_CHANNEL = 4096
CHANNELS = 4
Q = 2
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


def _build_model(xs, ys, trace_probes, inference="exact", M=1024):
    import mogptk_tpu.gpr as gpr
    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.MultiOutputSpectralMixtureKernel(Q, output_dims=CHANNELS)
    rng = np.random.RandomState(1)
    kernel.mean.assign(0.05 + 0.3 * rng.rand(CHANNELS, Q, 1))
    kernel.variance.assign(0.2 + 0.3 * rng.rand(CHANNELS, Q, 1))
    if inference == "exact":
        return gpr.Exact(kernel, X, Y, variance=0.1, trace_probes=trace_probes)
    return gpr.Titsias(kernel, X, Y, Z=M // CHANNELS, Z_init="random", variance=0.1)


def time_training_steps(model, target_sec=20.0, t_lo=3, reps=3, max_t=600):
    """Honest steps/sec: dynamic-trip-count chained steps, host-fetch timed."""
    import jax
    import jax.numpy as jnp
    import optax

    # single-leaf parameter vector: one fused Adam-update kernel per step
    # instead of ~n_params micro-dispatches (cf. gpr/training.py)
    loss_flat, flatten, _ = model.make_flat_loss_fn()
    train_list, fixed = model._split_raws()
    train0 = flatten(train_list)
    loss_fn = loss_flat
    optimizer = optax.adam(1e-3)
    opt_state0 = optimizer.init(train0)
    from mogptk_tpu.gpr.config import config as _cfg
    value0 = jnp.zeros((), _cfg.dtype)

    @jax.jit
    def run(params, opt_state, T):
        def body(i, carry):
            params, opt_state, _ = carry
            value, grads = jax.value_and_grad(loss_fn)(params, fixed)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state, value.astype(value0.dtype))
        return jax.lax.fori_loop(0, T, body, (params, opt_state, value0))[2]

    def fetch(T):
        t0 = time.perf_counter()
        v = float(np.asarray(run(train0, opt_state0, T)))
        if not np.isfinite(v):
            raise RuntimeError("benchmark loss is not finite: %r" % (v,))
        return time.perf_counter() - t0

    fetch(t_lo)  # compile + warm
    est = max(fetch(t_lo * 2) / (t_lo * 2), 1e-4)
    t_hi = int(min(max(target_sec / est, t_lo * 6), max_t))
    lo = min(fetch(t_lo) for _ in range(reps))
    hi = min(fetch(t_hi) for _ in range(reps))
    per_step = (hi - lo) / (t_hi - t_lo)
    return 1.0 / per_step


def _guard(errors, key, fn, *args, **kwargs):
    """Fail-soft engine wrapper: a broken kernel must cost one metric (null
    + first error line in the JSON's "errors" map), never the whole bench
    line (round 3 shipped zero numbers because one Mosaic failure aborted
    the process before the JSON printed)."""
    try:
        return fn(*args, **kwargs)
    except Exception as e:
        import traceback
        traceback.print_exc()
        first = str(e).strip().splitlines()
        errors[key] = "%s: %s" % (type(e).__name__, first[0] if first else "")
        return None


def bench_ours(xs, ys, errors):
    import jax
    # persist compiled programs: remote TPU compilation of the full training
    # step takes minutes; the cache makes repeat runs start instantly
    jax.config.update("jax_compilation_cache_dir",
                      os.environ.get("JAX_COMPILATION_CACHE_DIR", "/tmp/jax_cache"))
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    import mogptk_tpu.gpr as gpr
    if not os.environ.get("BENCH_NO_PALLAS"):
        # the fused Pallas Gram kernel is faster end-to-end and verified on
        # hardware; set BENCH_NO_PALLAS=1 for the pure-XLA path
        gpr.use_pallas(True)
    # the MXU-blocked Cholesky auto-enables on TPU at this size
    # (ops/blocked_cholesky.py); BENCH_XLA_CHOL=1 forces XLA's expander
    if os.environ.get("BENCH_XLA_CHOL"):
        gpr.use_blocked_cholesky(False)

    # headline: Hutchinson probe-trace gradients (the backward becomes two
    # 17-column triangular solves batched into the forward cho_solve)
    probe_sps = _guard(errors, "headline",
                       lambda: time_training_steps(_build_model(xs, ys, trace_probes=16)))
    # deterministic closed-form-gradient number (apples-to-apples with the
    # torch baseline's exact gradients)
    exact_sps = None
    if not os.environ.get("BENCH_SKIP_EXACT_GRAD"):
        exact_sps = _guard(errors, "exact_grad",
                           lambda: time_training_steps(_build_model(xs, ys, trace_probes=None),
                                                       target_sec=25.0))
    return probe_sps, exact_sps


def bench_svgp(xs, ys, M=1024):
    """Secondary metric from BASELINE.md: SVGP ELBO steps/sec at M inducing
    points (Titsias collapsed bound) on the same N=16k data.

    The slope timing trains for up to a few hundred steps; f32 Titsias with
    free inducing points can degrade Kuu conditioning along the way (the
    failure mode documented in CLAUDE.md), so the bench enables the jitter
    ladder — the production setting for this configuration. Each rung adds
    two diagonal reductions on the happy path; the cost is in the number."""
    import mogptk_tpu.gpr as gpr
    old = gpr.config.jitter_ladder
    try:
        gpr.use_jitter_ladder(3)
        return time_training_steps(
            _build_model(xs, ys, None, inference="svgp", M=M),
            target_sec=10.0, max_t=200)
    finally:
        gpr.config.jitter_ladder = old
        gpr.config.bump()


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


def bench_reference_svgp(xs, ys, M=1024, max_steps=3):
    """Time the reference SVGP (Titsias collapsed bound, torch CPU f64) at
    M total inducing points on the same data — the BASELINE.md secondary
    metric. Cached alongside the exact baseline (a step takes ~minutes)."""
    cache = {}
    if os.path.exists(CACHE_FILE):
        with open(CACHE_FILE) as f:
            cache = json.load(f)
        if (cache.get("n_per_channel") == N_PER_CHANNEL
                and cache.get("channels") == CHANNELS and cache.get("q") == Q
                and cache.get("svgp_m") == M
                and "svgp_steps_per_sec" in cache):
            return cache["svgp_steps_per_sec"]

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
    model = refgpr.Titsias(kernel, X, Y, Z=M // CHANNELS, Z_init="random",
                           variance=0.1)
    optimizer = torch.optim.Adam(model.parameters(), lr=1e-3)

    model.loss()
    optimizer.step()  # warmup

    start = time.perf_counter()
    steps = 0
    while steps < max_steps and (time.perf_counter() - start) < 600.0:
        model.loss()
        optimizer.step()
        steps += 1
    steps_per_sec = steps / (time.perf_counter() - start)

    cache.update({"n_per_channel": N_PER_CHANNEL, "channels": CHANNELS, "q": Q,
                  "svgp_m": M, "svgp_steps_per_sec": steps_per_sec,
                  "svgp_steps_measured": steps})
    with open(CACHE_FILE, "w") as f:
        json.dump(cache, f)
    return steps_per_sec


def bench_bignum(n_total=65536, timeout_sec=2400):
    """The beyond-reference scale point: one iterative exact-GP step at
    N=65,536 (the f32 Gram alone would be 17 GB — impossible to materialize
    on this chip). Runs benchmarks/bignum_exact.py in a SUBPROCESS: the
    tunneled TPU worker does not survive many large distinct programs in one
    process (CLAUDE.md), and this keeps a failure from taking down the main
    bench. Returns sec/step or None."""
    import subprocess
    try:
        out = subprocess.run(
            [sys.executable, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                          "benchmarks", "bignum_exact.py"),
             str(n_total)],
            capture_output=True, text=True, timeout=timeout_sec)
        for line in out.stdout.splitlines():
            line = line.strip()
            if line.startswith("{"):
                return json.loads(line).get("value")
    except Exception as e:
        print("bignum bench failed: %r" % (e,), file=sys.stderr)
    return None


FAMILIES = ("mosm", "umosm", "csm", "conv", "mohsm", "lmc_sm")


def bench_families(timeout_sec=600):
    """Per-family fused-engine timing (gram fwd + probe step at N=4,096),
    one subprocess per family (benchmarks/family_bench.py) so a regression
    in one engine costs one entry, not the bench. Returns {family: {...}}."""
    import subprocess
    out = {}
    script = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "benchmarks", "family_bench.py")
    for family in FAMILIES:
        try:
            r = subprocess.run([sys.executable, script, family],
                               capture_output=True, text=True,
                               timeout=timeout_sec)
            for line in r.stdout.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    d = json.loads(line)
                    out[family] = {"gram_fwd_ms": d["gram_fwd_ms"],
                                   "probe_step_ms": d["probe_step_ms"]}
                    break
            else:
                tail = (r.stderr or "").strip().splitlines()
                out[family] = {"error": tail[-1] if tail else
                               "no JSON (rc=%d)" % r.returncode}
        except Exception as e:
            out[family] = {"error": "%s: %s" % (type(e).__name__, e)}
    return out


def main():
    xs, ys = make_data()
    errors = {}

    # per-family engine timings run FIRST (subprocesses must claim the chip
    # before this process initializes JAX — two concurrent clients deadlock)
    families = None
    if not os.environ.get("BENCH_SKIP_FAMILIES"):
        families = _guard(errors, "families", bench_families)

    # bignum runs FIRST: its subprocess must claim the chip while this
    # process has not yet initialized JAX (two concurrent clients deadlock)
    bignum = None
    if not os.environ.get("BENCH_SKIP_BIGN"):
        bignum = _guard(errors, "iterative_N65536", bench_bignum)

    probe_sps, exact_sps = bench_ours(xs, ys, errors)

    svgp = _guard(errors, "svgp", bench_svgp, xs, ys)

    if os.environ.get("BENCH_SKIP_BASELINE"):
        ref = ref_svgp = None
        if os.path.exists(CACHE_FILE):
            with open(CACHE_FILE) as f:
                cache = json.load(f)
            ref = cache.get("steps_per_sec")
            ref_svgp = cache.get("svgp_steps_per_sec")
    else:
        ref = _guard(errors, "baseline", bench_reference, xs, ys)
        ref_svgp = _guard(errors, "svgp_baseline", bench_reference_svgp, xs, ys)

    result = {
        "metric": "exact GP LML+grad steps/sec (MOSM Q=%d, %d channels x %d points, f32 TPU)"
                  % (Q, CHANNELS, N_PER_CHANNEL),
        "value": round(probe_sps, 4) if probe_sps else None,
        "unit": "steps/sec",
        "vs_baseline": round(probe_sps / ref, 2) if (probe_sps and ref) else None,
        "exact_grad_steps_per_sec": round(exact_sps, 4) if exact_sps else None,
        "exact_grad_vs_baseline": round(exact_sps / ref, 2) if (exact_sps and ref) else None,
        "svgp_elbo_steps_per_sec_M1024": round(svgp, 4) if svgp else None,
        "svgp_vs_baseline": round(svgp / ref_svgp, 2) if (svgp and ref_svgp) else None,
        "iterative_exact_N65536_sec_per_step": bignum,
        "families_N4096": families,
    }
    if errors:
        result["errors"] = errors
    print(json.dumps(result))


if __name__ == "__main__":
    main()
