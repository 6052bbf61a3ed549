"""Per-component timings of the headline step's hot pieces.

One CELL per subprocess (pass the cell name as argv[1]): the tunneled TPU
worker dies after a few large distinct programs in one process, so sweeps
must not share a client (cf. benchmarks/iter_tune.py).

Cells:
  bwd      — the production probe backward `_lml_chol_fused_bwd` at the
             headline shapes (low-rank Gram VJP + diag/y cotangents).
  solvei   — the forward's 17-RHS cho_solve WITH reused panel inverses
             (the path the fused step actually takes; step_decomp.py's
             cho_solve_17rhs measures the no-reuse fallback).
  writes   — the 16 aliased panel-write + upper-zero kernels.
  panelinv — 16 sequential 1024-panel factor+inverse chains
             (_panel_factor_inv: recursive factor + composed inverse).

Run:  python benchmarks/hot_decomp.py <cell>
"""
import sys
import json



def headline_model():
    import numpy as np
    from _bench_mod import bench
    import mogptk_tpu.gpr as gpr
    gpr.use_pallas(True)
    xs, ys = bench.make_data()
    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.MultiOutputSpectralMixtureKernel(bench.Q,
                                                  output_dims=bench.CHANNELS)
    rng = np.random.RandomState(1)
    kernel.mean.assign(0.05 + 0.3 * rng.rand(bench.CHANNELS, bench.Q, 1))
    kernel.variance.assign(0.2 + 0.3 * rng.rand(bench.CHANNELS, bench.Q, 1))
    return gpr.Exact(kernel, X, Y, variance=0.1, trace_probes=16)


def main():
    cell = sys.argv[1]
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    from _timing import device_ms
    out = {}

    def probe(body, x0, label, target=10.0):
        t = device_ms(body, x0, target_sec=target)
        out[label + "_ms"] = round(t, 2)
        print(f"{label:16s}: {t:9.2f} ms", flush=True)

    if cell in ("bwd", "solvei"):
        model = headline_model()
        train0, fixed = model._split_raws()
        from mogptk_tpu.gpr.iterative import _fused_kernel_params
        with model.bind(model._merge_raws(train0, fixed)):
            params = _fused_kernel_params(model.kernel)
            diag = model._noise_diag(add_jitter=True)
            y = model._residual_y()
            _, x = model.kernel._split(model.X)
        static = model._fused_static()
        assert static is not None
        n = x.shape[0]
        R = int(model.trace_probes)
        key = jax.random.PRNGKey(0)

        if cell == "bwd":
            from mogptk_tpu.ops.linalg import _lml_chol_fused_bwd
            alpha = jax.random.normal(key, (n, 1), jnp.float32)
            U = jax.random.normal(jax.random.PRNGKey(1), (n, R), jnp.float32)
            Z = jax.random.rademacher(jax.random.PRNGKey(2), (n, R),
                                      dtype=jnp.float32)

            def bwd(carry):
                ps, al = carry
                res = (x, diag, y, ps, al, U, Z)
                _, _, _, dparams = _lml_chol_fused_bwd(static, res,
                                                       jnp.float32(1.0))
                ps = tuple(p + 1e-30 * dp for p, dp in zip(ps, dparams))
                return ps, al
            probe(bwd, (tuple(params), alpha), "bwd", target=12.0)

        else:
            from mogptk_tpu.ops.linalg import cholesky_solve, _sorted_gram
            from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
            K = jax.jit(lambda ps: _sorted_gram(static[0], x, static[1],
                                                ps))(params)
            L, invs = jax.jit(lambda K: blocked_cholesky(
                K, diag_shift=diag, return_panel_invs=True))(K)
            B0 = jax.random.normal(key, (n, R + 1), jnp.float32)

            def chs(carry):
                Lv, ivs, Bv = carry
                Yv = cholesky_solve(Lv, Bv, invs=list(ivs))
                return Lv, ivs, Yv / jnp.maximum(jnp.max(jnp.abs(Yv)), 1e-30)
            probe(chs, (L, tuple(invs), B0), "solvei", target=8.0)

    elif cell in ("writes", "panelinv", "panelinv_high"):
        from mogptk_tpu.ops.blocked_cholesky import (
            _panel_write, _upper_zero, _panel_factor_inv, _tri_inverse)
        N, B = 16384, 1024
        nb = N // B
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (N, N), dtype=jnp.float32) / (N ** 0.5)
        K = A @ A.T + 10.0 * jnp.eye(N, dtype=jnp.float32)
        L0 = jnp.linalg.cholesky(K)

        if cell == "writes":
            Sfull = jax.random.normal(key, (N, B), jnp.float32)
            inv0 = _tri_inverse(L0[:B, :B])

            def writes(Lv):
                for j in range(nb):
                    m = N - j * B
                    L_ = _panel_write(Lv, Sfull[:m], inv0, L0[:B, :B],
                                      j, B, 512)
                    if j < nb - 1:
                        L_ = _upper_zero(L_, j, B, 512)
                    Lv = L_
                return Lv
            probe(writes, L0, "writes", target=8.0)

        else:
            prec = "high" if cell == "panelinv_high" else "highest"

            def panelinv(Pv):
                with jax.default_matmul_precision(prec):
                    for _ in range(nb):
                        Lp, inv = _panel_factor_inv(Pv, "high", prec)
                        Pv = Pv + 1e-20 * jnp.abs(Lp) + 1e-20 * jnp.abs(inv)
                return Pv
            probe(panelinv, K[:B, :B], cell, target=8.0)

    elif cell.startswith("vjp"):
        # low-rank Gram-VJP variants at the headline block shapes: is the
        # 12 ms backward kernel-bound or glue-bound (stats vjp + 10 calls'
        # scalar stacking)?  vjp1b = ONE diagonal-block kernel (x10 ≈ the
        # kernel-bound total), vjpT<k> = full VJP with BWD_TILE=k.
        import numpy as np
        import mogptk_tpu.ops.block_mosm as bm
        model = headline_model()
        train0, fixed = model._split_raws()
        from mogptk_tpu.gpr.iterative import _fused_kernel_params
        with model.bind(model._merge_raws(train0, fixed)):
            params = _fused_kernel_params(model.kernel)
            _, x = model.kernel._split(model.X)
        counts = model._channel_counts
        n = x.shape[0]
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (n, 17), jnp.float32)
        Bm = jax.random.normal(jax.random.PRNGKey(1), (n, 17), jnp.float32)
        twopi = model.kernel.twopi

        if cell == "vjp1b":
            import functools as ft
            from jax.experimental import pallas as pl
            from jax.experimental.pallas import tpu as pltpu
            O, Q = params[0].shape
            D = params[1].shape[-1]
            st3, st2 = bm.mosm_pair_stats(*params, twopi)
            st3f = st3.reshape(O, O, Q * D, 3)[0, 0]
            st20 = st2[0, 0]
            T = bm.BWD_TILE
            n_outs = 3 * Q * D + 2 * Q
            ni = counts[0]
            xi, ai, bi = x[:ni], A[:ni], Bm[:ni]
            scalar_spec = pl.BlockSpec((1, 1), lambda i_, j_: (0, 0))

            def one_block(carry):
                xi_, ai_, bi_, acc = carry
                # iteration-dependent input: without it XLA hoists the whole
                # (loop-invariant) pallas_call out of the timing loop
                ai_ = ai_ + 1e-30 * acc
                douts = pl.pallas_call(
                    ft.partial(bm._lowrank_bwd_kernel, Q=Q, D=D,
                               phase_inside=True, sym=False),
                    out_shape=tuple(jax.ShapeDtypeStruct((1, 1), jnp.float32)
                                    for _ in range(n_outs)),
                    grid=(ni // T, ni // T),
                    in_specs=[
                        pl.BlockSpec((T, D), lambda i_, j_: (i_, 0)),
                        pl.BlockSpec((T, D), lambda i_, j_: (j_, 0)),
                        bm._smem_spec(st3f.shape),
                        bm._smem_spec(st20.shape),
                        pl.BlockSpec((T, 17), lambda i_, j_: (i_, 0)),
                        pl.BlockSpec((T, 17), lambda i_, j_: (i_, 0)),
                        pl.BlockSpec((T, 17), lambda i_, j_: (j_, 0)),
                        pl.BlockSpec((T, 17), lambda i_, j_: (j_, 0)),
                    ],
                    out_specs=tuple(scalar_spec for _ in range(n_outs)),
                    compiler_params=pltpu.CompilerParams(
                        vmem_limit_bytes=100 * 1024 * 1024),
                )(xi_, xi_, st3f, st20, ai_, bi_, ai_, bi_)
                return xi_, ai_, bi_, acc + douts[0][0, 0]
            probe(one_block, (xi, ai, bi, jnp.float32(0.0)), "vjp1b",
                  target=8.0)

        else:
            bm.BWD_TILE = int(cell[4:])

            def vjp_full(carry):
                ps, acc = carry
                d = bm.mosm_lowrank_vjp_sorted(x, counts, ps, twopi, A, Bm)
                ps = tuple(p + 1e-30 * dp for p, dp in zip(ps, d))
                return ps, acc
            probe(vjp_full, (tuple(params), jnp.float32(0.0)),
                  "vjpT%d" % bm.BWD_TILE, target=10.0)

    elif cell.startswith("chol"):
        # Attribution by ablation: the SAME in-place N=16k factorization with
        # one piece stubbed to a no-op (results are numerically wrong but the
        # remaining pieces' work is unchanged, so the time DELTA vs cholfull
        # is that piece's cost inside the real schedule).
        # ops/__init__ re-exports the function under the module's name, so a
        # plain `import ... as bc` would bind the FUNCTION; take the module
        import mogptk_tpu.ops.blocked_cholesky  # noqa: F401
        bc = sys.modules["mogptk_tpu.ops.blocked_cholesky"]
        N, B = 16384, 1024
        key = jax.random.PRNGKey(0)
        A = jax.random.normal(key, (N, N), dtype=jnp.float32) / (N ** 0.5)
        K = A @ A.T + 10.0 * jnp.eye(N, dtype=jnp.float32)
        if cell == "cholnowrite":
            # drop the aliased column-write kernels (both pipelines' forms)
            bc._panel_write = lambda L, S, invT, Ljj, j, B_, T: L
            bc._col_strip_write = lambda L, S, invT, Ljj, j, B_: L
            bc._upper_zero = lambda L, j, B_, T: L
        elif cell == "cholnopanel":
            # decaying outputs keep the chained values bounded
            bc._panel_factor_inv = lambda S, u, p: (
                jnp.tril(S) * 1e-3,
                jnp.eye(S.shape[0], dtype=S.dtype) * 1e-3)
        elif cell == "cholnosdiag":
            # replace the streamed S-panel accumulation (the N³/3 bulk)
            # with a raw slice of K
            bc._s_panel_pallas = (
                lambda K_, L, j, B_, T=512, TK=512:
                jax.lax.dynamic_slice(
                    K_, (j * B_, j * B_), (K_.shape[0] - j * B_, B_)))
        elif cell in ("cholprod", "cholprodbase"):
            # the PRODUCTION LML-forward configuration (ops/linalg._chol_lml):
            # B=512, vector diag shift, zero_upper=False, panel invs returned
            # — cholprod engages the fused below-TRSM pipeline, cholprodbase
            # is the same call with it off (the A/B the kill switch exists
            # for; `cholfull` keeps measuring the default user-facing call)
            fused = cell == "cholprod"
            shift = jnp.full((N,), 0.1, jnp.float32)

            def chol_prod(Kv):
                L, invs = bc.blocked_cholesky(
                    Kv, block_size=512, diag_shift=shift,
                    return_panel_invs=True, zero_upper=False,
                    fused_trsm=fused)
                return Kv + 1e-25 * jnp.nan_to_num(L)
            probe(chol_prod, K, cell, target=10.0)
            print(json.dumps(out), flush=True)
            return
        elif cell != "cholfull":
            raise SystemExit("unknown cell %r" % cell)

        def chol(Kv):
            L = bc.blocked_cholesky(Kv, diag_shift=0.1)
            # stubbed variants can produce non-PSD panels -> NaN factors;
            # keep the timing chain finite (NaN arithmetic is full-speed)
            return Kv + 1e-25 * jnp.nan_to_num(L)
        probe(chol, K, cell, target=10.0)

    else:
        raise SystemExit("unknown cell %r" % cell)

    print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
