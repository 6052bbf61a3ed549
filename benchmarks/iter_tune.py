"""Joint preconditioner-rank / CG-iteration tuning at large N (ROADMAP #3).

At a fixed wall-clock budget the iterative engine trades CG iterations
against preconditioner rank (the pivoted-Cholesky preconditioner costs
O(N·R²) once per step but cuts the CG iteration count). This sweep measures,
for the N=65k headline iterative config, the (rank, iters) grid's

  - per-step time (chained-executable slope, benchmarks/_timing.py method),
  - LML error vs a tight reference solve (rank 128, 400 iters, tol 1e-10),

and prints one JSON line per cell plus a `best` line: the cheapest cell
within 0.5% LML error of the reference.

Usage: python benchmarks/iter_tune.py [N_total] (TPU; ~10 min)
"""
import os
import sys
import json
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(gpr, xs, ys, rank, iters, probes=16, lanczos=24):
    import jax.numpy as jnp
    N, X, Y = gpr.merge_data(xs, ys)
    rng = np.random.RandomState(1)
    channels, q = len(xs), 2
    kernel = gpr.MultiOutputSpectralMixtureKernel(q, output_dims=channels)
    kernel.mean.assign(0.05 + 0.3 * rng.rand(channels, q, 1))
    kernel.variance.assign(0.2 + 0.3 * rng.rand(channels, q, 1))
    return gpr.ExactIterative(kernel, X, Y, variance=0.1,
                              max_cg_iters=iters, cg_tol=1e-10,
                              num_probes=probes, lanczos_iters=lanczos,
                              precond_rank=rank)


def main():
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import mogptk_tpu.gpr as gpr
    from benchmarks._timing import device_ms
    gpr.use_pallas(True)

    channels = 4
    n_per = n_total // channels
    rng = np.random.RandomState(0)
    xs, ys = [], []
    for j in range(channels):
        x = np.sort(rng.uniform(0.0, 100.0, n_per)).reshape(-1, 1)
        y = (np.sin(0.5 * x[:, 0] + j) + 0.1 * rng.randn(n_per)).reshape(-1, 1)
        xs.append(x)
        ys.append(y)

    # reference LML: heavily converged solve (slow; one evaluation)
    ref_model = build(gpr, xs, ys, rank=128, iters=400)
    lml_ref = float(ref_model.log_marginal_likelihood())
    print(json.dumps({"ref_lml": lml_ref}), flush=True)

    results = []
    for rank in [0, 16, 32, 64]:
        for iters in [15, 25, 40]:
            model = build(gpr, xs, ys, rank=rank, iters=iters)
            lml = float(model.log_marginal_likelihood())
            err = abs(lml - lml_ref) / abs(lml_ref)

            loss_fn = model.make_loss_fn()
            train0, fixed = model._split_raws()

            def body(params):
                value, grads = jax.value_and_grad(loss_fn)(params, fixed)
                # chain: nudge params by a tiny multiple of the gradient so
                # iteration i+1 depends on i without drifting
                import jax.numpy as jnp
                return jax.tree_util.tree_map(
                    lambda p, g: p + 1e-12 * g, params, grads)

            ms = device_ms(body, train0, target_sec=8.0, t_lo=2, reps=2,
                           max_t=100)
            row = {"rank": rank, "iters": iters, "lml": round(lml, 3),
                   "rel_err": round(err, 6), "step_ms": round(ms, 1)}
            results.append(row)
            print(json.dumps(row), flush=True)

    ok = [r for r in results if r["rel_err"] < 5e-3]
    best = min(ok, key=lambda r: r["step_ms"]) if ok else None
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
