"""Bisect the N=65k readout worker crash: run ONE readout piece per
process.

  python benchmarks/readout_bisect.py factor|solve|logdet [N] [rank]
"""
import json
import sys

import numpy as np


def main():
    piece = sys.argv[1]
    n_total = int(sys.argv[2]) if len(sys.argv) > 2 else 65536
    rank = int(sys.argv[3]) if len(sys.argv) > 3 else 256
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.gpr import iterative as it
    import iter_tune

    gpr.use_pallas(True)
    xs, ys = iter_tune.make_data(n_total)
    model = iter_tune.build(gpr, xs, ys, rank=64, iters=15)
    base = model._static()
    static = (base[0], base[1], 250, 1e-10, 16, 64, model.seed, base[7],
              rank, base[9], base[10])
    c = model.X[:, 0].astype(jnp.int32)
    x = model.X[:, 1:]
    y = model._residual_y()
    params = model._kernel_params()
    noise = model._noise_diag()
    n = x.shape[0]

    L, sigma2 = jax.jit(lambda: it._pivoted_factor(
        static, x, c, noise, params))()
    L = np.asarray(L)
    print(json.dumps({"piece": "factor", "absmax": float(np.abs(L).max())}),
          flush=True)
    if piece == "factor":
        return
    L = jnp.asarray(L)

    if piece == "solve":
        def solve():
            matvec = it._make_matvec(static, x, c, noise, params, hp=True)
            from mogptk_tpu.ops.iterative import cg_solve, woodbury_m_inv
            M_inv, _ = woodbury_m_inv(L, sigma2)
            yc = y.astype(jnp.float32).reshape(n, -1)
            alpha, res = cg_solve(matvec, yc, max_iters=250, tol=1e-10,
                                  M_inv=M_inv)
            return -0.5 * jnp.sum(yc * alpha), res
        q, res = jax.jit(solve)()
        print(json.dumps({"piece": "solve", "quad": float(q),
                          "res": float(res[0])}), flush=True)
        return

    if piece == "logdet":
        from mogptk_tpu.ops.iterative import preconditioned_slq_logdet

        def logdet():
            matvec = it._make_matvec(static, x, c, noise, params, hp=True)
            return preconditioned_slq_logdet(
                matvec, L, sigma2, n, num_probes=16, lanczos_iters=64,
                key=jax.random.PRNGKey(1), dtype=jnp.float32)
        v = jax.jit(logdet)()
        print(json.dumps({"piece": "logdet", "logdet": float(v)}),
              flush=True)
        return


if __name__ == "__main__":
    main()
