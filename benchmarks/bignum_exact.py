"""Exact GP training far past the Cholesky memory wall.

At N=65,536 the f32 Gram matrix alone is 17 GB — it cannot exist on a 16 GB
chip, so Cholesky-based exact inference (the reference's only exact path) is
impossible at this size on any single accelerator of this class. The
iterative engine (gpr.ExactIterative: fused Pallas Gram matvec + batched CG
+ SLQ + low-rank-cotangent VJP) needs only O(N·R) memory.

Usage: python benchmarks/bignum_exact.py [N_total]
Prints one JSON line with the measured LML+grad step time.
"""
import sys
import json
import time
import numpy as np


def main():
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    channels = 4
    q = 2
    n_per = n_total // channels

    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import optax
    import os
    import mogptk_tpu.gpr as gpr
    gpr.use_pallas(True)

    rng = np.random.RandomState(0)
    xs, ys = [], []
    for j in range(channels):
        x = np.sort(rng.uniform(0.0, 100.0, n_per)).reshape(-1, 1)
        y = (np.sin(0.5 * x[:, 0] + j) + 0.1 * rng.randn(n_per)).reshape(-1, 1)
        xs.append(x)
        ys.append(y)
    N, X, Y = gpr.merge_data(xs, ys)

    kernel = gpr.MultiOutputSpectralMixtureKernel(q, output_dims=channels)
    kernel.mean.assign(0.05 + 0.3 * rng.rand(channels, q, 1))
    kernel.variance.assign(0.2 + 0.3 * rng.rand(channels, q, 1))
    # preconditioning matters for accuracy here: at this N the plain CG is
    # under-converged within the 50-iteration budget (the loss shifts by ~10%)
    precond = int(sys.argv[2]) if len(sys.argv) > 2 else 64
    model = gpr.ExactIterative(kernel, X, Y, variance=0.1,
                               max_cg_iters=50, cg_tol=1e-4,
                               num_probes=16, lanczos_iters=24,
                               precond_rank=precond)

    loss_fn = model.make_loss_fn()
    train0, fixed = model._split_raws()
    optimizer = optax.adam(1e-3)
    opt_state = optimizer.init(train0)

    @jax.jit
    def step(params, opt_state):
        value, grads = jax.value_and_grad(loss_fn)(params, fixed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    # honest timing on the tunneled TPU: block_until_ready does not block —
    # fetch the loss to the host and difference two chained-step counts
    # (see benchmarks/_timing.py for the method)
    params = train0
    t0 = time.perf_counter()
    params, opt_state, value = step(params, opt_state)
    v0 = float(np.asarray(value))
    compile_s = time.perf_counter() - t0

    def run_k(k):
        p, o = train0, optimizer.init(train0)
        t0 = time.perf_counter()
        v = None
        for _ in range(k):
            p, o, v = step(p, o)
        float(np.asarray(v))
        return time.perf_counter() - t0

    t1 = run_k(1)
    t4 = run_k(4)
    per_step = (t4 - t1) / 3.0

    print(json.dumps({
        "metric": "iterative exact GP LML+grad step (MOSM Q=%d, N=%d, no Gram materialization)" % (q, n_total),
        "value": round(per_step, 3),
        "unit": "sec/step",
        "compile_sec": round(compile_s, 1),
        "loss": round(float(value), 2),
        "note": "f32 Gram at this N would be %.1f GB — beyond single-chip HBM" % (n_total**2 * 4 / 2**30),
    }))


if __name__ == "__main__":
    main()
