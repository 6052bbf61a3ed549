"""Cumulative-stage timing of the fused probe-LML forward at N=16k.

step_decomp measured loss_fwd at ~58 ms while gram (1.0) + factor (39.8) +
fused solve (2.7) sum to ~44 — this pins the remaining ~14 ms to a stage.
One stage per subprocess (tunneled-worker rule):

    python benchmarks/fused_fwd_decomp.py gram      # sorted Gram only
    python benchmarks/fused_fwd_decomp.py chol      # + factor w/ diag shift
    python benchmarks/fused_fwd_decomp.py solve     # + [y probes] cho_solve
    python benchmarks/fused_fwd_decomp.py full      # + logdet/quadform (the
                                                    # whole _lml_chol_fused_fwd)
    python benchmarks/fused_fwd_decomp.py loss      # model.make_loss_fn fwd
"""
import os
import sys
import json



def main():
    stage = sys.argv[1] if len(sys.argv) > 1 else "full"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.ops import linalg as lg
    from _timing import device_ms

    gpr.use_pallas(True)
    blk = int(os.environ.get("FUSED_DECOMP_BLOCK", "0"))
    if blk:
        gpr.use_blocked_cholesky(True, block_size=blk)
    xs, ys = bench.make_data()
    model = bench._build_model(xs, ys, trace_probes=16)
    train0, fixed = model._split_raws()
    from mogptk_tpu.gpr.iterative import _fused_kernel_params
    with model.bind(model._merge_raws(train0, fixed)):
        params = _fused_kernel_params(model.kernel)
        diag = model._noise_diag(add_jitter=True)
        y = model._residual_y()
        _, x = model.kernel._split(model.X)
    static = model._fused_static()
    assert static is not None
    family, counts, num_probes, seed = static
    n = x.shape[0]

    def stage_body(ps):
        # parity with _lml_chol_fused_fwd: band-lower gram when blocked runs
        from mogptk_tpu.gpr.config import blocked_cholesky_enabled, config
        lower_ok = blocked_cholesky_enabled(x.shape[0], 2, config.dtype)
        K = lg._sorted_gram(family, x, counts, ps, lower_only=lower_ok)
        if stage == "gram":
            return K[0, 0]
        sd = lg._solve_dtype(K.dtype)
        L, invs = lg.cholesky(K, diag_shift=diag.astype(sd),
                              return_panel_invs=True)
        if stage == "chol":
            return L[0, 0]
        yc = y.astype(sd)
        Z = jax.random.rademacher(jax.random.PRNGKey(seed), (n, num_probes),
                                  dtype=L.dtype)
        AU = lg.cholesky_solve(L, jnp.concatenate([yc, Z], axis=1), invs=invs)
        if stage == "solve":
            return AU[0, 0]
        alpha = AU[:, :1]
        return (-jnp.sum(jnp.log(jnp.diagonal(L)))
                - 0.5 * jnp.sum(yc * alpha))

    if stage == "loss":
        loss_fn = model.make_loss_fn()

        def body(carry):
            ps = list(carry)
            v = loss_fn(ps, fixed)
            ps[0] = ps[0] + 1e-30 * v
            return tuple(ps)
        x0 = tuple(train0)
    else:
        def body(carry):
            ps = list(carry)
            v = stage_body(tuple(ps))
            ps[0] = ps[0] + 1e-30 * v
            return tuple(ps)
        x0 = tuple(params)

    ms = device_ms(body, x0, target_sec=10.0, max_exec_sec=60)
    print(json.dumps({"stage": stage, "ms": round(ms, 2)}))


if __name__ == "__main__":
    main()
