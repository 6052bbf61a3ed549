"""Isolate _col_strip_write (the aliased TRSM+write+strip-zero kernel): 16
back-to-back column writes at the N=16k headline shapes, no S kernels or
panel chains in the schedule. Attribution companion to hot_decomp's
ablation cells (cholfull/-nopanel/-nosdiag put writes+glue at ~14 ms of the
41 ms factor vs a ~6 ms HBM+TRSM floor).

Run:  python benchmarks/write_probe.py [variant]
variant: colstrip (default) — the production kernel
"""
import os
import sys
import json



def main():
    variant = sys.argv[1] if len(sys.argv) > 1 else "colstrip"
    import jax
    jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    import jax.numpy as jnp
    # ops/__init__ re-exports the FUNCTION under the module's name; take
    # the module itself (cf. hot_decomp.py)
    import mogptk_tpu.ops.blocked_cholesky  # noqa: F401
    bc = sys.modules["mogptk_tpu.ops.blocked_cholesky"]
    from _timing import device_ms

    N, B = 16384, 1024
    nb = N // B
    key = jax.random.PRNGKey(0)
    L0 = jax.random.normal(key, (N, N), jnp.float32) * 1e-3
    Sfull = jax.random.normal(key, (N, B), jnp.float32) * 1e-3
    invT = jnp.eye(B, dtype=jnp.float32)
    Ljj = jnp.tril(jax.random.normal(key, (B, B), jnp.float32)) * 1e-3

    if variant == "colstrip":
        def body(Lv):
            for j in range(nb):
                m = N - j * B
                Lv = bc._col_strip_write(Lv, Sfull[:m], invT, Ljj, j, B)
            return Lv * 1.0000001
    elif variant == "colstrip_any":
        # A/B: the aliased-but-never-read L input in ANY memory space —
        # no (B, B) dead DMA per grid step (the blocked form streams in
        # 4 MB per step it never reads, ~1 GB per factorization)
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def csw_any(L, S, invT, Ljj, j, Bs):
            npad = L.shape[0]
            r0 = j * Bs
            tiles_col = (npad - r0) // Bs
            tiles_strip = npad // Bs - (j + 1)

            def idx(i, j=j, tc=tiles_col):
                col_step = i < tc
                return (jnp.where(col_step, j + i, j),
                        jnp.where(col_step, j, i - tc + j + 1))

            vmem = 4 * Bs * Bs * (2 + 2 + 2 + 2)
            return pl.pallas_call(
                functools.partial(_csw_any_kernel, tiles_col=tiles_col),
                out_shape=jax.ShapeDtypeStruct(L.shape, L.dtype),
                grid=(tiles_col + tiles_strip,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((Bs, Bs),
                                 lambda i, tc=tiles_col: (jnp.minimum(i, tc - 1), 0)),
                    pl.BlockSpec((Bs, Bs), lambda i: (0, 0)),
                    pl.BlockSpec((Bs, Bs), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((Bs, Bs), idx),
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem + (vmem >> 2)),
            )(L, S, invT, Ljj)

        def _csw_any_kernel(l_any, s_ref, invt_ref, ljj_ref, l_ref, *,
                            tiles_col):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                l_ref[:, :] = ljj_ref[:, :]

            @pl.when((0 < i) & (i < tiles_col))
            def _():
                s = s_ref[:, :]
                v = invt_ref[:, :]
                sh = s.astype(jnp.bfloat16)
                sl = (s - sh.astype(jnp.float32)).astype(jnp.bfloat16)
                vh = v.astype(jnp.bfloat16)
                vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
                dot = functools.partial(
                    jax.lax.dot_general,
                    dimension_numbers=(((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                    precision=jax.lax.Precision.DEFAULT)
                l_ref[:, :] = dot(sh, vh) + dot(sh, vl) + dot(sl, vh)

            @pl.when(i >= tiles_col)
            def _():
                l_ref[:, :] = jnp.zeros_like(l_ref[:, :])

        def body(Lv):
            for j in range(nb):
                m = N - j * B
                Lv = csw_any(Lv, Sfull[:m], invT, Ljj, j, B)
            return Lv * 1.0000001
    elif variant in ("colonly", "nos", "onepass"):
        # bisect the production kernel: colonly drops the strip-zero grid
        # steps; nos drops the TRSM GEMM and S reads (write/stream floor);
        # onepass uses a single bf16 pass (isolates the x3 multi-pass cost)
        import functools
        from jax.experimental import pallas as pl
        from jax.experimental.pallas import tpu as pltpu

        def _kern(l_any, s_ref, invt_ref, ljj_ref, l_ref, *, tiles_col):
            i = pl.program_id(0)

            @pl.when(i == 0)
            def _():
                l_ref[:, :] = ljj_ref[:, :]

            @pl.when(0 < i)
            def _():
                if variant == "nos":
                    l_ref[:, :] = ljj_ref[:, :]
                else:
                    s = s_ref[:, :]
                    v = invt_ref[:, :]
                    dot = functools.partial(
                        jax.lax.dot_general,
                        dimension_numbers=(((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                        precision=jax.lax.Precision.DEFAULT)
                    if variant == "onepass":
                        l_ref[:, :] = dot(s.astype(jnp.bfloat16),
                                          v.astype(jnp.bfloat16))
                    else:
                        sh = s.astype(jnp.bfloat16)
                        sl = (s - sh.astype(jnp.float32)).astype(jnp.bfloat16)
                        vh = v.astype(jnp.bfloat16)
                        vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
                        l_ref[:, :] = dot(sh, vh) + dot(sh, vl) + dot(sl, vh)

        def colw(L, S, invT_, Ljj_, j, Bs):
            npad = L.shape[0]
            r0 = j * Bs
            tiles_col = (npad - r0) // Bs
            vmem = 4 * Bs * Bs * (2 + 2 + 2 + 2)
            return pl.pallas_call(
                functools.partial(_kern, tiles_col=tiles_col),
                out_shape=jax.ShapeDtypeStruct(L.shape, L.dtype),
                grid=(tiles_col,),
                in_specs=[
                    pl.BlockSpec(memory_space=pltpu.ANY),
                    pl.BlockSpec((Bs, Bs), lambda i: (i, 0)),
                    pl.BlockSpec((Bs, Bs), lambda i: (0, 0)),
                    pl.BlockSpec((Bs, Bs), lambda i: (0, 0)),
                ],
                out_specs=pl.BlockSpec((Bs, Bs),
                                       lambda i, j=j, rT=r0 // Bs: (rT + i, j)),
                input_output_aliases={0: 0},
                compiler_params=pltpu.CompilerParams(
                    vmem_limit_bytes=vmem + (vmem >> 2)),
            )(L, S, invT_, Ljj_)

        def body(Lv):
            for j in range(nb):
                m = N - j * B
                Lv = colw(Lv, Sfull[:m], invT, Ljj, j, B)
            return Lv * 1.0000001
    elif variant == "striponly":
        # the 15 per-row strip-zero launches alone (_upper_zero): what the
        # strip half of _col_strip_write's grid costs as separate streams
        def body(Lv):
            for j in range(nb - 1):
                Lv = bc._upper_zero(Lv, j, B, 512)
            return Lv * 1.0000001
    else:
        raise SystemExit("unknown variant %r" % variant)

    ms = device_ms(body, L0, target_sec=8.0, max_exec_sec=60)
    print(json.dumps({"variant": variant, "n": N, "block": B,
                      "ms": round(ms, 2)}))


if __name__ == "__main__":
    main()
