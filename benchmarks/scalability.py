"""Scalability harness: runtime/memory scaling sweeps.

Reproduces the reference's scaling study (tests/scalability.py:177-273,
conclusions in mogptk/documentation.md:113-127): time and peak memory versus
iterations, data points N, input dims D, output dims M (with N·M fixed), and
mixture components Q, for exact inference with white/SM/MO-white/MOSM
kernels.

Usage:
    python benchmarks/scalability.py [--sweep iters|N|D|M|Q|all] [--plot out.png]
"""
import argparse
import json
import sys
import time
import os

import numpy as np



def make_model(kind, n, D=1, M=1, Q=2):
    import jax.numpy as jnp
    import mogptk_tpu.gpr as gpr

    rng = np.random.RandomState(0)
    if kind in ("white", "sm"):
        X = np.sort(rng.uniform(0, 10, (n, D)), axis=0)
        y = np.sin(X.sum(axis=1, keepdims=True)) + 0.1 * rng.randn(n, 1)
        kernel = gpr.WhiteKernel(input_dims=D) if kind == "white" else gpr.SpectralMixtureKernel(Q=Q, input_dims=D)
        return gpr.Exact(kernel, X, y, variance=0.1)
    else:
        n_per = max(1, n // M)
        xs = [np.sort(rng.uniform(0, 10, (n_per, D)), axis=0) for _ in range(M)]
        ys = [np.sin(x.sum(axis=1, keepdims=True)) + 0.1 * rng.randn(n_per, 1) for x in xs]
        N, X, Y = gpr.merge_data(xs, ys)
        if kind == "mowhite":
            kernel = gpr.IndependentMultiOutputKernel(
                [gpr.WhiteKernel(input_dims=D) for _ in range(M)], output_dims=M)
        else:
            kernel = gpr.MultiOutputSpectralMixtureKernel(Q, output_dims=M, input_dims=D)
        return gpr.Exact(kernel, X, Y, variance=0.1)


def time_training(model, iters=10):
    import jax
    import optax
    from mogptk_tpu.utils import device_memory_stats

    loss_fn = model.make_loss_fn()
    train, fixed = model._split_raws()
    opt = optax.adam(1e-3)
    state = opt.init(train)

    @jax.jit
    def step(params, state):
        v, g = jax.value_and_grad(loss_fn)(params, fixed)
        u, state = opt.update(g, state, params)
        return optax.apply_updates(params, u), state, v

    params, st, v = step(train, state)  # warmup/compile
    v.block_until_ready()
    start = time.perf_counter()
    for _ in range(iters):
        params, st, v = step(params, st)
    v.block_until_ready()
    elapsed = time.perf_counter() - start
    mem = device_memory_stats().get("peak_bytes_in_use", 0)
    return elapsed / iters, mem


def run_sweeps(which="all"):
    results = {}
    if which in ("iters", "all"):
        # time vs iterations: expect linear time, constant memory
        model = make_model("mosm", 800, M=2)
        rows = []
        for iters in [5, 10, 20, 40]:
            t, mem = time_training(model, iters)
            rows.append({"iters": iters, "sec_per_step": t, "peak_bytes": mem})
        results["iters"] = rows
    if which in ("N", "all"):
        rows = []
        for n in [25, 50, 100, 200, 400, 800, 1600]:
            model = make_model("mosm", n, M=2)
            t, mem = time_training(model, 5)
            rows.append({"N": n, "sec_per_step": t, "peak_bytes": mem})
        results["N"] = rows
    if which in ("D", "all"):
        rows = []
        for D in [1, 2, 4, 8, 16, 32, 64]:
            model = make_model("sm", 400, D=D)
            t, mem = time_training(model, 5)
            rows.append({"D": D, "sec_per_step": t, "peak_bytes": mem})
        results["D"] = rows
    if which in ("M", "all"):
        rows = []
        for M in [1, 2, 4, 8, 16]:
            model = make_model("mosm", 1600, M=M)   # N·M fixed at 1600
            t, mem = time_training(model, 5)
            rows.append({"M": M, "sec_per_step": t, "peak_bytes": mem})
        results["M"] = rows
    if which in ("Q", "all"):
        rows = []
        for Q in [1, 2, 4, 8, 16, 32]:
            model = make_model("sm", 400, Q=Q)
            t, mem = time_training(model, 5)
            rows.append({"Q": Q, "sec_per_step": t, "peak_bytes": mem})
        results["Q"] = rows
    return results


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--sweep", default="all", choices=["iters", "N", "D", "M", "Q", "all"])
    parser.add_argument("--plot", default=None)
    parser.add_argument("--json", default=None)
    args = parser.parse_args()

    results = run_sweeps(args.sweep)
    print(json.dumps(results, indent=2))
    if args.json:
        with open(args.json, "w") as f:
            json.dump(results, f, indent=2)

    if args.plot:
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt
        keys = list(results.keys())
        fig, axes = plt.subplots(1, len(keys), figsize=(5 * len(keys), 4), squeeze=False)
        for i, key in enumerate(keys):
            rows = results[key]
            xkey = [k for k in rows[0] if k not in ("sec_per_step", "peak_bytes")][0]
            xs = [r[xkey] for r in rows]
            axes[0, i].plot(xs, [r["sec_per_step"] for r in rows], "o-k")
            axes[0, i].set_xlabel(xkey)
            axes[0, i].set_ylabel("sec/step")
            axes[0, i].set_title("time vs %s" % xkey)
        fig.savefig(args.plot, dpi=100, bbox_inches="tight")
        print("saved plot to", args.plot)


if __name__ == "__main__":
    main()
