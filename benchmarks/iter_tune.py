"""Joint preconditioner-rank / CG-iteration tuning at large N (ROADMAP #3).

At a fixed wall-clock budget the iterative engine trades CG iterations
against preconditioner rank (the pivoted-Cholesky preconditioner costs
O(N·R²) once per step but cuts the CG iteration count). This sweep
measures, for the N=65k headline iterative config, each (rank, iters)
cell's per-step time (chained-executable slope, benchmarks/_timing.py
method) and LML error vs a tight reference solve (rank 64, 250 iters).

ROUND-5 CAVEAT on "tight reference": the REF cell is a 250-iteration
CG-coefficient estimate — it measures the per-step estimator's
converged-budget VALUE, not the true LML (in f32 the CG-coefficient
quadrature is biased at long chains; ROADMAP #3 round-5 correction). For
accuracy-vs-truth use the VSDENSE cell (CELL -3: dense-exact LML and the
evaluation-grade readout side by side, feasible to N=16,384) and the
READOUT cell's cross-seed/cross-rank consistency at larger N.

The tunneled TPU worker does not survive many large recompiled programs in
one process (observed: crashes after 2-3 N=65k graphs), so the driver runs
EVERY cell in its own subprocess; the persistent compilation cache keeps
repeat compiles cheap. Usage:

  python benchmarks/iter_tune.py [N_total]              # full sweep driver
  python benchmarks/iter_tune.py [N_total] CELL r it    # one cell (internal)

Prints one JSON line per cell plus a `best` line: the cheapest cell within
0.5% LML error of the reference.
"""
import os
import sys
import json
import subprocess
import numpy as np


REF_FILE = "/tmp/iter_tune_ref.json"


def build(gpr, xs, ys, rank, iters, probes=16, lanczos=24):
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


def make_data(n_total):
    channels = 4
    n_per = n_total // channels
    rng = np.random.RandomState(0)
    xs, ys = [], []
    for j in range(channels):
        x = np.sort(rng.uniform(0.0, 100.0, n_per)).reshape(-1, 1)
        y = (np.sin(0.5 * x[:, 0] + j) + 0.1 * rng.randn(n_per)).reshape(-1, 1)
        xs.append(x)
        ys.append(y)
    return xs, ys


def run_cell(n_total, rank, iters, ref_only=False):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import mogptk_tpu.gpr as gpr
    from _timing import device_ms
    gpr.use_pallas(True)
    xs, ys = make_data(n_total)

    if ref_only:
        ref = build(gpr, xs, ys, rank=64, iters=250)
        print(json.dumps({"ref_lml": float(ref.log_marginal_likelihood())}),
              flush=True)
        return

    if rank == -2:      # DENSE ground-truth cell (blocked exact path)
        it = build(gpr, xs, ys, rank=64, iters=15)
        model = gpr.Exact(it.kernel, it.X, it.y, variance=0.1)
        print(json.dumps(
            {"cell": "dense", "n": int(it.X.shape[0]),
             "dense_lml": float(model.log_marginal_likelihood())}),
            flush=True)
        return

    if rank == -3:      # VSDENSE: dense truth AND the readout, one cell
        r_rank = int(os.environ.get("READOUT_RANK", "256"))
        r_seeds = int(os.environ.get("READOUT_SEEDS", "1"))
        it = build(gpr, xs, ys, rank=64, iters=iters)
        dense_model = gpr.Exact(it.kernel, it.X, it.y, variance=0.1)
        dense = float(dense_model.log_marginal_likelihood())
        read = float(it.log_marginal_likelihood_readout(
            num_probes=16, lanczos_iters=64, precond_rank=r_rank,
            seeds=r_seeds))
        print(json.dumps(
            {"cell": "vsdense", "n": int(it.X.shape[0]), "rank": r_rank,
             "seeds": r_seeds, "dense_lml": round(dense, 3),
             "readout_lml": round(read, 3),
             "rel_err": round(abs(read - dense) / abs(dense), 6)}),
            flush=True)
        return

    if rank == -1:      # READOUT cell (VERDICT r4 #5)
        # production training config (rank 64 @ 15 iters, the 2.8 s step):
        # its per-step LML estimate is budget-limited, but BIC/AIC/
        # log_marginal_likelihood() go through the evaluation-grade readout
        # — measure both against the tight reference. probes=16 keeps ONE
        # readout executable under the tunneled worker's ~100 s kill; the
        # `seeds` knob averages independent probe streams across separate
        # executables (statistical error ∝ 1/sqrt(seeds·probes)), and
        # READOUT_RANK raises the pivoted-Cholesky preconditioner rank,
        # which crushes ‖log(P⁻¹K)‖_F (both the SLQ variance AND its bias).
        r_rank = int(os.environ.get("READOUT_RANK", "64"))
        r_seeds = int(os.environ.get("READOUT_SEEDS", "1"))
        with open(REF_FILE) as f:
            lml_ref = json.load(f)["ref_lml"]
        model = build(gpr, xs, ys, rank=64, iters=iters)
        # the tunneled worker dies after ~3 big distinct graphs in one
        # process at N=65k (CLAUDE.md); the readout itself is three —
        # skip the training-budget graph unless asked
        lml_train = (lml_ref if os.environ.get("READOUT_SKIP_TRAIN")
                     else float(model.log_marginal_likelihood()))
        lml_read = float(model.log_marginal_likelihood_readout(
            num_probes=16, lanczos_iters=64, precond_rank=r_rank,
            seeds=r_seeds))
        print(json.dumps({
            "cell": "readout", "iters": iters, "rank": r_rank,
            "seeds": r_seeds,
            "train_budget_rel_err":
                round(abs(lml_train - lml_ref) / abs(lml_ref), 6),
            "readout_rel_err":
                round(abs(lml_read - lml_ref) / abs(lml_ref), 6),
            "lml_ref": round(lml_ref, 3), "lml_readout": round(lml_read, 3),
        }), flush=True)
        return

    with open(REF_FILE) as f:
        lml_ref = json.load(f)["ref_lml"]
    model = build(gpr, xs, ys, rank=rank, iters=iters)
    lml = float(model.log_marginal_likelihood())
    err = abs(lml - lml_ref) / abs(lml_ref)

    loss_fn = model.make_loss_fn()
    train0, fixed = model._split_raws()

    def body(params):
        value, grads = jax.value_and_grad(loss_fn)(params, fixed)
        return jax.tree_util.tree_map(lambda p, g: p + 1e-12 * g,
                                      params, grads)

    ms = device_ms(body, train0, target_sec=8.0, t_lo=2, reps=2, max_t=30,
                   max_exec_sec=60.0)
    print(json.dumps({"rank": rank, "iters": iters, "lml": round(lml, 3),
                      "rel_err": round(err, 6), "step_ms": round(ms, 1)}),
          flush=True)


def main():
    n_total = int(sys.argv[1]) if len(sys.argv) > 1 else 65536
    if len(sys.argv) > 2 and sys.argv[2] == "CELL":
        if sys.argv[3] == "REF":
            run_cell(n_total, 0, 0, ref_only=True)
        else:
            run_cell(n_total, int(sys.argv[3]), int(sys.argv[4]))
        return

    me = os.path.abspath(__file__)

    def spawn(args):
        p = subprocess.run([sys.executable, me, str(n_total), "CELL"] + args,
                           capture_output=True, text=True, timeout=3600)
        rows = [json.loads(l) for l in p.stdout.splitlines()
                if l.startswith("{")]
        if not rows:
            print(json.dumps({"cell": args,
                              "error": p.stderr.strip()[-200:]}), flush=True)
            return None
        print(json.dumps(rows[-1]), flush=True)
        return rows[-1]

    ref = spawn(["REF"])
    if ref is None:
        return
    with open(REF_FILE, "w") as f:
        json.dump(ref, f)

    # each cell is a fresh ~20-min remote compile of the full 65k graph, so
    # the grid is the 4 most informative cells (rank-0/15-iter already
    # measured: 2832 ms/step at 148% LML error — unpreconditioned CG is
    # hopeless at this N within any sane budget)
    results = []
    for rank, iters in [(0, 40), (16, 15), (16, 40), (64, 15)]:
        row = spawn([str(rank), str(iters)])
        if row is not None and "step_ms" in row:
            results.append(row)

    ok = [r for r in results if r["rel_err"] < 5e-3]
    best = min(ok, key=lambda r: r["step_ms"]) if ok else None
    print(json.dumps({"best": best}), flush=True)


if __name__ == "__main__":
    main()
