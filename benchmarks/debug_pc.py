"""Pinpoint the TPU-only iterative-LML breakage (round 5).

Computes, on ONE backend per invocation, every piece the iterative LML
value depends on, at the iter_tune data/config, and dumps them to npz:

  python benchmarks/debug_pc.py tpu /tmp/pc_tpu.npz [N]
  python benchmarks/debug_pc.py cpu /tmp/pc_cpu.npz [N]
  python benchmarks/debug_pc.py cmp /tmp/pc_cpu.npz /tmp/pc_tpu.npz

Pieces: pivoted-Cholesky factor L_pc, logdetP, a fixed M_inv application,
a fixed P-probe sample, the CG solution for [y Z Zl], the final LML value.
"""
import json
import sys

import numpy as np


def compute(out_path, n_total):
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    import jax.numpy as jnp
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.gpr import iterative as it
    import iter_tune

    gpr.use_pallas(True)
    xs, ys = iter_tune.make_data(n_total)
    model = iter_tune.build(gpr, xs, ys, rank=64, iters=15)

    c = model.X[:, 0].astype(jnp.int32)
    x = model.X[:, 1:]
    y = model._residual_y()
    params = model._kernel_params()
    static = model._static()
    noise = model._noise_diag()

    M_inv, sample, logdetP = it._make_preconditioner(
        static, x, c, noise, params, full=True)
    # deterministic probes for cross-backend comparison
    n = x.shape[0]
    rng = np.random.RandomState(0)
    V = jnp.asarray(rng.randn(n, 4).astype(np.float32))
    MV = M_inv(V)
    S = sample(jax.random.PRNGKey(3), 4)

    lml = float(model.log_marginal_likelihood())

    # recover the pivoted factor itself
    from mogptk_tpu.ops.iterative import pivoted_cholesky
    from mogptk_tpu.ops.fused import resolve_family
    _, dense, diag = resolve_family(static[0])
    sd = jnp.float32

    def K_row(i):
        xi = jax.lax.dynamic_slice(x, (i, 0), (1, x.shape[1]))
        ci = jax.lax.dynamic_slice(c, (i,), (1,))
        return dense(ci, xi, c, x, params)[0, :].astype(sd)

    Lpc = pivoted_cholesky(diag(c, x, params).astype(sd), K_row, n, 64)

    np.savez(out_path, Lpc=np.asarray(Lpc), MV=np.asarray(MV),
             S=np.asarray(S), logdetP=float(logdetP), lml=lml,
             noise=np.asarray(noise))
    print(json.dumps({"backend": jax.default_backend(), "n": int(n),
                      "lml": lml, "logdetP": float(logdetP),
                      "Lpc_absmax": float(np.abs(np.asarray(Lpc)).max()),
                      "MV_absmax": float(np.abs(np.asarray(MV)).max())}),
          flush=True)


def compare(a_path, b_path):
    a, b = np.load(a_path), np.load(b_path)
    for k in ("Lpc", "MV", "S"):
        da, db = a[k], b[k]
        denom = np.abs(da).max() + 1e-30
        print("%s: absmax %.4g vs %.4g, rel-maxdiff %.4g"
              % (k, np.abs(da).max(), np.abs(db).max(),
                 np.abs(da - db).max() / denom), flush=True)
    print("logdetP: %.6g vs %.6g" % (a["logdetP"], b["logdetP"]))
    print("lml:     %.6g vs %.6g" % (a["lml"], b["lml"]))


def main():
    mode = sys.argv[1]
    if mode == "cmp":
        compare(sys.argv[2], sys.argv[3])
        return
    out = sys.argv[2]
    n_total = int(sys.argv[3]) if len(sys.argv) > 3 else 4096
    if mode == "cpu":
        import jax
        jax.config.update("jax_platforms", "cpu")
    compute(out, n_total)


if __name__ == "__main__":
    main()
