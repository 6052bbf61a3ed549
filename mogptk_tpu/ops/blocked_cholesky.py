"""Left-looking blocked Cholesky tuned for the TPU MXU.

XLA:TPU's built-in Cholesky factorizes N=16k f32 in ~74 ms (~20 TFLOP/s at
N³/3) on a v5e whose default-precision f32 GEMM sustains ~165 TFLOP/s — the
expander's small internal blocks leave the MXU idle. This implementation
moves ~all of the N³/3 FLOPs into one large GEMM per block column
(`S = K_panel − L_below @ L_topᵀ`) whose precision is independently
configurable, while the cancellation-sensitive B×B diagonal factorization
runs at "highest" (full-f32 multi-pass) precision; the sub-diagonal panel
TRSM (a GEMM against the explicit panel inverse) runs at "high" — no
cancellation there — escalating to "highest" only when update_precision
asks for it.

The block-column loop is a Python unroll: every GEMM/solve has a static
shape, the trace stays small (N/B ≤ ~32 iterations), and XLA schedules each
trailing GEMM as a single MXU-saturating dot. FLOPs are exactly the
left-looking N³/3 — no masked full-width updates, no wasted symmetric half.

Semantics match `jnp.linalg.cholesky`: lower factor; rows of NaN where the
matrix is not positive definite (callers' NaN-based jitter ladders keep
working). Differentiable through the standard chol/solve/dot VJPs.

Capability reference: torch.linalg.cholesky as used by the reference at
mogptk/gpr/model.py:246; this file exists because the TPU expander leaves a
~3× gap on large N (measured in benchmarks/microprobe.py).
"""
import functools
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _s_panel_kernel(k_ref, lrow_ref, ljrow_ref, s_ref, acc_ref, *, n_k):
    """S tile = K tile − Σ_k L[rows, k-chunk] @ L[j-rows, k-chunk]ᵀ.

    Reads the growing L factor DIRECTLY from HBM through block specs — no
    materialized left-slice copies (XLA's dot can't consume a slice view,
    which cost ~10 ms of pure copies per factorization at N=16k). The
    accumulation is manual bf16x3 (the "high" recipe: hi/lo split, three
    bf16 MXU passes with f32 accumulation) — measured within 5% of XLA's
    "high" GEMM rate at these shapes."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        # K tiles may arrive bf16 (use_half_precision Grams): the upcast
        # happens here in VMEM, never as an f32 HBM copy
        acc_ref[:, :] = k_ref[:, :].astype(jnp.float32)

    a = lrow_ref[:, :].astype(jnp.float32)
    b = ljrow_ref[:, :].astype(jnp.float32)
    # _bf16x3_terms pins DEFAULT per-dot: the operands are already bf16,
    # so one MXU pass per term is exact — and the ambient "highest" scope
    # this runs under inside jittered_cholesky would otherwise make Mosaic
    # reject the bf16 lhs ("Bad lhs type": no multi-pass on sub-f32 inputs)
    acc = acc_ref[:, :]
    for t in _bf16x3_terms(a, b, ((1,), (1,))):
        acc -= t
    acc_ref[:, :] = acc

    @pl.when(k == n_k - 1)
    def _():
        s_ref[:, :] = acc_ref[:, :]


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4, 5))
def _s_panel_pallas(K, L, j, B, T=256, TK=512):
    """The left-looking accumulation S = K[r0:, r0:r0+B] − Lleft·Lleft[:B]ᵀ
    for block column j as one streamed Pallas GEMM over K-chunks.

    custom_vjp: pallas_call has no transpose rule, so reverse-mode through
    the factorization (e.g. Titsias/SVGP differentiating through
    cholesky(Kuu) at M ≥ the blocked threshold) would otherwise crash at
    trace time; the backward is the hand-written bilinear-map VJP."""
    return _s_panel_impl(K, L, j, B, T, TK)


def _s_panel_impl(K, L, j, B, T, TK):
    npad = K.shape[0]
    r0 = j * B
    m = npad - r0
    n_k = r0 // TK
    grid = (m // T, n_k)
    # HBM traffic is dominated by the (B, TK) diagonal-block reads, which
    # re-fetch for EVERY row tile: bytes ≈ (m/T)·r0·B·4 per column — ~11 GB
    # (~13 ms) at N=16k with T=256. Larger T divides that traffic down; the
    # VMEM cost (double-buffered blocks + the f32 accumulator) exceeds the
    # 16 MB default scoped limit, so the kernel states its own budget.
    vmem = 4 * (2 * T * B      # K tile, double-buffered
                + 2 * T * TK   # L row chunk
                + 2 * B * TK   # L diagonal-block chunk
                + 2 * T * B    # out
                + T * B)       # accumulator scratch
    return pl.pallas_call(
        functools.partial(_s_panel_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((m, B), jnp.float32),
        grid=grid,
        in_specs=[
            # K tile of the target panel (block units: rows T, cols B)
            pl.BlockSpec((T, B), lambda i, k, j=j, rT=r0 // T: (rT + i, j)),
            # L rows of the current tile over k-chunk (block units: T × TK)
            pl.BlockSpec((T, TK), lambda i, k, rT=r0 // T: (rT + i, k)),
            # L rows of the diagonal block over k-chunk (B × TK)
            pl.BlockSpec((B, TK), lambda i, k, j=j: (j, k)),
        ],
        out_specs=pl.BlockSpec((T, B), lambda i, k: (i, 0)),
        scratch_shapes=[pltpu.VMEM((T, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(32 * 1024 * 1024, vmem + (vmem >> 2))),
        interpret=jax.default_backend() == "cpu",
    )(K, L, L)


def _s_panel_fwd(K, L, j, B, T, TK):
    return _s_panel_impl(K, L, j, B, T, TK), (K, L)


def _s_panel_bwd(j, B, T, TK, res, g):
    # S = K[r0:r0+m, r0:r0+B] − A Cᵀ with A = L[r0:r0+m, :r0],
    # C = L[r0:r0+B, :r0]: dK places g on the panel, dL gets −g·C on A's
    # rows and −gᵀ·A on C's rows. bf16x3 matches the forward.
    K, L = res
    r0 = j * B
    m = K.shape[0] - r0
    dK = jnp.zeros(K.shape, K.dtype)
    dK = jax.lax.dynamic_update_slice(dK, g.astype(K.dtype), (r0, r0))
    A = L[r0:r0 + m, :r0].astype(jnp.float32)
    C = L[r0:r0 + B, :r0].astype(jnp.float32)
    gf = g.astype(jnp.float32)
    dL = jnp.zeros(L.shape, L.dtype)
    dA = -jnp.matmul(gf, C, precision="high")
    dC = -jnp.matmul(gf.T, A, precision="high")
    dL = dL.at[r0:r0 + m, :r0].add(dA.astype(L.dtype))
    dL = dL.at[r0:r0 + B, :r0].add(dC.astype(L.dtype))
    return dK, dL


_s_panel_pallas.defvjp(_s_panel_fwd, _s_panel_bwd)


def _dot_t(a, b, precision):
    """a @ b.T at the given matmul precision."""
    return jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                               precision=precision)


def _panel_write_kernel(l_in_ref, s_ref, invt_ref, ljj_ref, l_ref, *,
                        tiles_diag):
    """Write one finished block column of L IN PLACE (aliased output):
    tiles inside the diagonal block copy Ljj; tiles below it compute the
    TRSM-via-inverse GEMM  S_tile @ L_jj⁻ᵀ  as manual bf16x3 (matching the
    S-panel kernel's "high" recipe). The aliased-but-unread l_in_ref is what
    makes the update in place — the rest of L is never copied (the
    dynamic_update_slice form cost one full-buffer copy per block column,
    ~16 GB of HBM traffic at N=16k)."""
    i = pl.program_id(0)

    @pl.when(i < tiles_diag)
    def _():
        l_ref[:, :] = ljj_ref[:, :]

    @pl.when(i >= tiles_diag)
    def _():
        l_ref[:, :] = _bf16x3(s_ref[:, :], invt_ref[:, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _panel_write(L, S, invT, Ljj, j, B, T):
    """L with block column j finalized: the (B, B) diagonal block set to
    Ljj and the rows below set to S[B:] @ invT — written in place through
    an aliased Pallas call (no full-buffer copy). custom_vjp because
    pallas_call has no transpose rule (cf. _s_panel_pallas)."""
    return _panel_write_impl(L, S, invT, Ljj, j, B, T)


def _panel_write_impl(L, S, invT, Ljj, j, B, T):
    npad = L.shape[0]
    r0 = j * B
    m = npad - r0
    tiles_diag = B // T
    grid = (m // T,)
    return pl.pallas_call(
        functools.partial(_panel_write_kernel, tiles_diag=tiles_diag),
        out_shape=jax.ShapeDtypeStruct(L.shape, L.dtype),
        grid=grid,
        in_specs=[
            # the aliased L itself — never read in-kernel; block-mapped to
            # the same tiles the kernel writes. NOTE: do NOT move this to
            # ANY memory space: unlike _col_strip_write (whose ANY-aliased
            # operand is chain-stable, measured), an ANY-aliased input here
            # produced non-finite factors under fori_loop chaining on TPU
            # (benchmarks/chol_bsweep.py gramnoinplace probe, round 4) —
            # this path aliases onto a fusible jnp.zeros seed, and the
            # blocked spec is what keeps XLA's copy/alias analysis honest.
            pl.BlockSpec((T, B), lambda i, rT=r0 // T, j=j: (rT + i, j)),
            # S tile (rows of the panel accumulation, diagonal rows first)
            pl.BlockSpec((T, B), lambda i: (i, 0)),
            # the explicit B×B panel inverse transposed (L_jj⁻ᵀ)
            pl.BlockSpec((B, B), lambda i: (0, 0)),
            # Ljj rows for the diagonal tiles (index clamped for i beyond)
            pl.BlockSpec((T, B),
                         lambda i, td=tiles_diag: (jnp.minimum(i, td - 1), 0)),
        ],
        out_specs=pl.BlockSpec((T, B), lambda i, rT=r0 // T, j=j: (rT + i, j)),
        input_output_aliases={0: 0},
        # four double-buffered row-varying (T, B) blocks + the constant
        # (B, B) panel inverse: ~18 MB at T=512 — state the budget instead
        # of shrinking the tile (the 16 MB default crashed the full step)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=4 * (8 * T * B + 2 * B * B) + (4 << 20)),
        interpret=jax.default_backend() == "cpu",
    )(L, S, invT, Ljj)


def _panel_write_fwd(L, S, invT, Ljj, j, B, T):
    return _panel_write_impl(L, S, invT, Ljj, j, B, T), (S, invT)


def _panel_write_bwd(j, B, T, res, g):
    S, invT = res
    r0 = j * B
    npad = g.shape[0]
    # the written region's cotangent flows to (Ljj, S, invT); the rest to L
    g_col = g[r0:, r0:r0 + B].astype(jnp.float32)
    dLjj = g_col[:B].astype(S.dtype)
    g_below = g_col[B:]
    Sb = S[B:].astype(jnp.float32)
    dS = jnp.zeros(S.shape, S.dtype)
    dS = jax.lax.dynamic_update_slice(
        dS, jnp.matmul(g_below, invT.T.astype(jnp.float32),
                       precision="high").astype(S.dtype), (B, 0))
    dinvT = jnp.matmul(Sb.T, g_below, precision="high").astype(invT.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    written = (rows >= r0) & (cols >= r0) & (cols < r0 + B)
    dL = jnp.where(written, jnp.zeros((), g.dtype), g)
    return dL, dS, dinvT, dLjj


_panel_write.defvjp(_panel_write_fwd, _panel_write_bwd)


def _col_strip_kernel(l_in_ref, s_ref, invt_ref, ljj_ref, l_ref, *,
                      tiles_col):
    """One finished block column of L PLUS its upper strip, one launch.
    Grid steps < tiles_col walk the column (block 0 copies Ljj, the rest
    compute the TRSM-via-inverse GEMM, bf16x3); steps ≥ tiles_col zero the
    (B, B) blocks of row strip j right of the diagonal (the in-place
    buffer still holds K there; L's contract zeroes it). Uses B×B blocks
    (T == B), halving the grid and doubling the GEMM row count vs the
    split _panel_write + _upper_zero pipeline."""
    i = pl.program_id(0)

    @pl.when(i == 0)
    def _():
        l_ref[:, :] = ljj_ref[:, :]

    @pl.when((0 < i) & (i < tiles_col))
    def _():
        l_ref[:, :] = _bf16x3(s_ref[:, :], invt_ref[:, :])

    @pl.when(i >= tiles_col)
    def _():
        l_ref[:, :] = jnp.zeros_like(l_ref[:, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _col_strip_write(L, S, invT, Ljj, j, B):
    """L with block column j finalized AND row strip j's strict upper
    zeroed, in ONE aliased Pallas call (cf. _panel_write + _upper_zero,
    which pay two launches per block column). Requires npad % B == 0 and
    uses (B, B) blocks. custom_vjp: no transpose rule for pallas_call."""
    return _col_strip_write_impl(L, S, invT, Ljj, j, B)


def _col_strip_write_impl(L, S, invT, Ljj, j, B):
    npad = L.shape[0]
    r0 = j * B
    tiles_col = (npad - r0) // B          # column blocks (diag + below)
    tiles_strip = npad // B - (j + 1)     # strip blocks right of diagonal
    grid = (tiles_col + tiles_strip,)

    def idx(i, j=j, tc=tiles_col):
        # column blocks walk down column j; strip blocks walk row j
        col_step = i < tc
        return (jnp.where(col_step, j + i, j),
                jnp.where(col_step, j, i - tc + j + 1))

    vmem = 4 * B * B * (2 + 2 + 2 + 2)       # four double-buffered blocks
    return pl.pallas_call(
        functools.partial(_col_strip_kernel, tiles_col=tiles_col),
        out_shape=jax.ShapeDtypeStruct(L.shape, L.dtype),
        grid=grid,
        in_specs=[
            # the aliased L, never read in-kernel: ANY memory space so the
            # operand stays in HBM — a blocked spec would stream in one
            # dead 4 MB block per grid step (~1 GB per factorization,
            # measured 0.9 ms of the 9.6 ms isolated write chain)
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((B, B),
                         lambda i, tc=tiles_col: (jnp.minimum(i, tc - 1), 0)),
            pl.BlockSpec((B, B), lambda i: (0, 0)),
            pl.BlockSpec((B, B), lambda i: (0, 0)),
        ],
        out_specs=pl.BlockSpec((B, B), idx),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem + (vmem >> 2)),
        interpret=jax.default_backend() == "cpu",
    )(L, S, invT, Ljj)


def _col_strip_write_fwd(L, S, invT, Ljj, j, B):
    return _col_strip_write_impl(L, S, invT, Ljj, j, B), (S, invT)


def _col_strip_write_bwd(j, B, res, g):
    S, invT = res
    r0 = j * B
    # cotangents: the column below the diagonal flows to (S, invT), the
    # diagonal block to Ljj, the zeroed strip to nothing; the rest to L
    g_col = g[r0:, r0:r0 + B].astype(jnp.float32)
    dLjj = g_col[:B].astype(S.dtype)
    g_below = g_col[B:]
    Sb = S[B:].astype(jnp.float32)
    dS = jnp.zeros(S.shape, S.dtype)
    dS = jax.lax.dynamic_update_slice(
        dS, jnp.matmul(g_below, invT.T.astype(jnp.float32),
                       precision="high").astype(S.dtype), (B, 0))
    dinvT = jnp.matmul(Sb.T, g_below, precision="high").astype(invT.dtype)
    rows = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    written = (((rows >= r0) & (cols >= r0) & (cols < r0 + B))
               | ((rows >= r0) & (rows < r0 + B) & (cols >= r0 + B)))
    dL = jnp.where(written, jnp.zeros((), g.dtype), g)
    return dL, dS, dinvT, dLjj


_col_strip_write.defvjp(_col_strip_write_fwd, _col_strip_write_bwd)


# -- fused below-TRSM column pipeline (VERDICT r4 #1) ------------------------
# The production write path (S-panel kernel -> HBM S -> aliased TRSM-write
# kernel) pays one full (m, B) HBM round trip for S and runs the TRSM GEMMs
# in a standalone kernel measured ~2x above its MXU+HBM floor (write_probe:
# 8.0 ms for the column GEMM+writes alone at N=16k/B=1024). This pipeline
# restructures one block column as:
#   1. _s_diag_pallas: the (B, B) diagonal S block only (k-chunk stream)
#   2. XLA panel factor+inverse (unchanged)
#   3. _below_trsm_pallas: rows below the diagonal — accumulates
#      S_tile = K_tile − A Cᵀ in VMEM and applies "@ invT" as the LAST
#      k-step's epilogue, writing the finished L column tile directly:
#      S_below never exists in HBM and the TRSM rides the streamed GEMM
#   4. _col_commit: aliased pure-DMA copy of [Ljj; below] into L
# No kernel both reads the L buffer and aliases it (the round-3 fused
# attempt made XLA insert full-buffer defensive copies); the commit kernel
# reads only the standalone column. These run ONLY inside the custom-VJP
# LML forwards (ops/linalg), which never differentiate through the
# factorization — the kernels have no transpose rules.


def _bf16x3_terms(a, b, dims):
    """The "high" recipe's three DEFAULT-precision MXU passes (hi·hi,
    hi·lo, lo·hi) as separate terms, so every caller keeps its exact
    accumulation order (the streamed kernels subtract term-by-term into
    their VMEM accumulator). Pinned DEFAULT per-dot: an ambient "highest"
    scope would make Mosaic reject the bf16 lhs. Single source of the
    split — the S-panel/S-diag/below-TRSM kernels, the aliased write
    epilogue (_bf16x3), and blocked_trisolve's syrk all consume it."""
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(jax.lax.dot_general,
                            dimension_numbers=(dims, ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
    return dot(ah, bh), dot(ah, bl), dot(al, bh)


def _bf16x3(a, b):
    """a @ b with both operands split hi/lo bf16, three MXU passes — the
    same "high"-equivalent recipe as the S-panel kernel."""
    t1, t2, t3 = _bf16x3_terms(a, b, ((1,), (0,)))
    return t1 + t2 + t3


def _s_diag_kernel(k_ref, ljrow_ref, ljrow2_ref, s_ref, acc_ref, *, n_k):
    """S_jj = K_jj − C Cᵀ accumulated over k chunks (C = L[j-rows, :r0])."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        acc_ref[:, :] = k_ref[:, :].astype(jnp.float32)

    a = ljrow_ref[:, :].astype(jnp.float32)
    b = ljrow2_ref[:, :].astype(jnp.float32)
    acc = acc_ref[:, :]
    for t in _bf16x3_terms(a, b, ((1,), (1,))):
        acc -= t
    acc_ref[:, :] = acc

    @pl.when(k == n_k - 1)
    def _():
        s_ref[:, :] = acc_ref[:, :]


def _s_diag_pallas(K, L, j, B, TK):
    """The (B, B) diagonal block of column j's left-looking accumulation."""
    n_k = (j * B) // TK
    vmem = 4 * (2 * B * B + 4 * B * TK + B * B + B * B)
    return pl.pallas_call(
        functools.partial(_s_diag_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((B, B), jnp.float32),
        grid=(n_k,),
        in_specs=[
            pl.BlockSpec((B, B), lambda k, j=j: (j, j)),
            pl.BlockSpec((B, TK), lambda k, j=j: (j, k)),
            pl.BlockSpec((B, TK), lambda k, j=j: (j, k)),
        ],
        out_specs=pl.BlockSpec((B, B), lambda k: (0, 0)),
        scratch_shapes=[pltpu.VMEM((B, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(32 * 1024 * 1024, vmem + (vmem >> 2))),
        interpret=jax.default_backend() == "cpu",
    )(K, L, L)


def _below_trsm_kernel(k_ref, lrow_ref, ljrow_ref, invt_ref, out_ref,
                       acc_ref, *, n_k):
    """One row tile of the finished column below the diagonal:
    out = (K_tile − A Cᵀ) @ invT, with the accumulation streamed over
    k chunks and the TRSM applied as the last chunk's epilogue in VMEM."""
    k = pl.program_id(1)

    @pl.when(k == 0)
    def _():
        acc_ref[:, :] = k_ref[:, :].astype(jnp.float32)

    a = lrow_ref[:, :].astype(jnp.float32)
    b = ljrow_ref[:, :].astype(jnp.float32)
    acc = acc_ref[:, :]
    for t in _bf16x3_terms(a, b, ((1,), (1,))):
        acc -= t
    acc_ref[:, :] = acc

    @pl.when(k == n_k - 1)
    def _():
        out_ref[:, :] = _bf16x3(acc_ref[:, :], invt_ref[:, :])


def _below_trsm_pallas(K, L, invT, j, B, T, TK):
    """Finished column-j rows below the diagonal, (m − B, B), in one
    streamed kernel (see the pipeline comment above)."""
    npad = K.shape[0]
    r0 = j * B
    mb = npad - r0 - B
    n_k = r0 // TK
    grid = (mb // T, n_k)
    rb0 = (r0 + B) // T
    vmem = 4 * (2 * T * B + 2 * T * TK + 2 * B * TK + B * B
                + 2 * T * B + T * B)
    return pl.pallas_call(
        functools.partial(_below_trsm_kernel, n_k=n_k),
        out_shape=jax.ShapeDtypeStruct((mb, B), jnp.float32),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, B), lambda i, k, j=j, rb0=rb0: (rb0 + i, j)),
            pl.BlockSpec((T, TK), lambda i, k, rb0=rb0: (rb0 + i, k)),
            pl.BlockSpec((B, TK), lambda i, k, j=j: (j, k)),
            pl.BlockSpec((B, B), lambda i, k: (0, 0)),
        ],
        out_specs=pl.BlockSpec((T, B), lambda i, k: (i, 0)),
        scratch_shapes=[pltpu.VMEM((T, B), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(32 * 1024 * 1024, vmem + (vmem >> 2))),
        interpret=jax.default_backend() == "cpu",
    )(K, L, L, invT)


def _commit_kernel(l_in_ref, below_ref, ljj_ref, l_ref, *, tiles_diag):
    i = pl.program_id(0)

    @pl.when(i < tiles_diag)
    def _():
        l_ref[:, :] = ljj_ref[:, :]

    @pl.when(i >= tiles_diag)
    def _():
        l_ref[:, :] = below_ref[:, :]


def _col_commit(L, below, Ljj, j, B, T):
    """Write the finished column [Ljj; below] into L in place — a pure-DMA
    aliased copy (no GEMMs, no reads of L). Mirrors _panel_write's aliasing
    structure (blocked aliased input, NOT ANY-space — see the note there)."""
    npad = L.shape[0]
    r0 = j * B
    m = npad - r0
    tiles_diag = B // T
    grid = (m // T,)
    return pl.pallas_call(
        functools.partial(_commit_kernel, tiles_diag=tiles_diag),
        out_shape=jax.ShapeDtypeStruct(L.shape, L.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, B), lambda i, rT=r0 // T, j=j: (rT + i, j)),
            pl.BlockSpec((T, B),
                         lambda i, td=tiles_diag: (jnp.maximum(i - td, 0), 0)),
            pl.BlockSpec((T, B),
                         lambda i, td=tiles_diag: (jnp.minimum(i, td - 1), 0)),
        ],
        out_specs=pl.BlockSpec((T, B), lambda i, rT=r0 // T, j=j: (rT + i, j)),
        input_output_aliases={0: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=4 * (8 * T * B) + (4 << 20)),
        interpret=jax.default_backend() == "cpu",
    )(L, below, Ljj)


def _zero_kernel(l_in_ref, l_ref):
    l_ref[:, :] = jnp.zeros_like(l_ref[:, :])


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def _upper_zero(L, j, B, T):
    """Zero row block j's strict-upper strip (rows jB:(j+1)B, cols (j+1)B:)
    in place. Only used by the in-place factorization, where L's buffer IS
    the Gram's: the factorization never READS the upper triangle, but L's
    contract says it is zero."""
    return _upper_zero_impl(L, j, B, T)


def _upper_zero_impl(L, j, B, T):
    npad = L.shape[0]
    c0 = (j + 1) * B
    w = npad - c0
    return pl.pallas_call(
        _zero_kernel,
        out_shape=jax.ShapeDtypeStruct(L.shape, L.dtype),
        grid=(w // T,),
        in_specs=[pl.BlockSpec((B, T), lambda i, j=j, cT=c0 // T: (j, cT + i))],
        out_specs=pl.BlockSpec((B, T), lambda i, j=j, cT=c0 // T: (j, cT + i)),
        input_output_aliases={0: 0},
        interpret=jax.default_backend() == "cpu",
    )(L)


def _upper_zero_fwd(L, j, B, T):
    return _upper_zero_impl(L, j, B, T), None


def _upper_zero_bwd(j, B, T, res, g):
    rows = jax.lax.broadcasted_iota(jnp.int32, g.shape, 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, g.shape, 1)
    strip = ((rows >= j * B) & (rows < (j + 1) * B) & (cols >= (j + 1) * B))
    return (jnp.where(strip, jnp.zeros((), g.dtype), g),)


_upper_zero.defvjp(_upper_zero_fwd, _upper_zero_bwd)


def _panel_factor(S, update_precision, panel_precision):
    """Factor a B×B diagonal block. XLA's expander is slow on 1024² blocks
    (~1.5 ms each, ~25 ms of pure panel time at N=16k); recurse with
    quarter-width blocks down to a 256² leaf where the expander is cheap."""
    B = S.shape[0]
    if B <= 256:
        return jnp.linalg.cholesky(S)
    return blocked_cholesky(S, block_size=max(B // 4, 256),
                            update_precision=update_precision,
                            panel_precision=panel_precision)


def _compose_tri_inverse(L, invs, Bs):
    """Inverse of a block-lower-triangular factor from its diagonal
    sub-block inverses: X_ii = invs[i] and row block i of the strict lower
    part is −invs[i] · (L[iBs:(i+1)Bs, :iBs] @ X[:iBs, :iBs]) — one small
    GEMM pair per row block instead of a sequential B-wide triangular
    solve. With the sub-inverses free from the recursive panel
    factorization this cuts the 16 per-column 1024-panel inversions from
    ~4.5 ms to ~1 ms at N=16k."""
    nb = len(invs)
    zero = jnp.zeros((), L.dtype)
    done = invs[0]                      # X[:iBs, :iBs], grown per row block
    for i in range(1, nb):
        r0 = i * Bs
        strict = -invs[i] @ (L[r0:r0 + Bs, :r0] @ done)
        done = jnp.concatenate(
            [jnp.concatenate([done, jnp.broadcast_to(zero, (r0, Bs))], axis=1),
             jnp.concatenate([strict, invs[i]], axis=1)], axis=0)
    return done


def _panel_factor_inv(S, update_precision, panel_precision):
    """(Ljj, Ljj⁻¹) for a B×B diagonal block: the recursive factorization
    already derives every quarter-width diagonal sub-inverse for its own
    TRSM, so the full panel inverse is a 3-GEMM composition rather than a
    fresh sequential solve (cf. _compose_tri_inverse)."""
    B = S.shape[0]
    if B <= 256:
        L = jnp.linalg.cholesky(S)
        return L, _tri_inverse(L)
    Bs = max(B // 4, 256)
    L, invs = blocked_cholesky(S, block_size=Bs,
                               update_precision=update_precision,
                               panel_precision=panel_precision,
                               return_panel_invs=True)
    if invs is None:                    # padded sub-factorization (B % Bs)
        return L, _tri_inverse(L)
    return L, _compose_tri_inverse(L, invs, Bs)


def _tri_inverse(Ljj):
    """Explicit inverse of a small lower-triangular block (runs under the
    panel-precision scope). Lets the sub-diagonal panel solve be a single
    MXU GEMM instead of XLA's sequential triangular-solve expander."""
    B = Ljj.shape[0]
    return jsl.solve_triangular(Ljj, jnp.eye(B, dtype=Ljj.dtype), lower=True)


def effective_block(n, block_size):
    """The panel width blocked_cholesky will actually use for an n×n matrix:
    the configured block, clamped to n — with an alignment rescue: padding
    disables the in-place factorization (4 B/entry peak) AND the
    panel-inverse reuse in cholesky_solve, so when the configured block does
    not divide n, prefer the largest 512-multiple block that does (e.g.
    n=7680: B 1024 → 512). N not a multiple of 512 still pads — documented
    in blocked_cholesky's docstring. Shared with ops/linalg so callers that
    pre-shape data to the factorization's read set (the band-lower sorted
    Gram) stay coherent with the factorization."""
    B = int(min(block_size, n))
    if n % B and B % 512 == 0:
        for cand in range(B, 511, -512):
            if n % cand == 0:
                return cand
    return B


def blocked_cholesky(K, block_size=1024, update_precision="high",
                     panel_precision="highest", diag_shift=None,
                     s_tile=None, return_panel_invs=False, inplace=True,
                     zero_upper=True, fused_trsm=False):
    """Lower-Cholesky factor of a symmetric PSD matrix, blocked for the MXU.

    Args:
        K: (n, n) symmetric positive-definite matrix. f32/f64 factorize in
            their own dtype; bf16/f16 Grams (use_half_precision) are
            CONSUMED directly — tiles upcast to f32 inside VMEM and the
            factor comes out f32, so the f32 copy of a half-precision Gram
            never exists in HBM.
        block_size: panel width B. The trailing GEMM at block column j has
            shape (n−jB, jB)×(jB, B); 1024 keeps the MXU saturated at n≥8k.
        update_precision: matmul precision for the big accumulation GEMM
            (the N³/3 bulk). "high" (bf16x3) is ~2.7× the speed of
            "highest" and keeps ~f32-quality accumulation; "default"
            (single bf16 pass) is fastest but drops ~5 decimal digits.
        panel_precision: precision scope for the B×B factorization and the
            panel triangular solve — the cancellation-sensitive steps.
        diag_shift: optional traced scalar OR (n,) vector added to K's
            diagonal — applied at each diagonal panel IN THE FACTOR dtype,
            exactly equivalent to factoring K + diag(diag_shift). This is
            how jitter reaches a bf16 Gram (1e-8·diag added in bf16 would
            round away entirely), and how the GP noise diagonal rides the
            factorization without an N² HBM pass over the Gram.

    Returns:
        (n, n) lower-triangular L with K = L @ L.T (upper half zero), in
        f32 for sub-f32 input, else K's dtype. With return_panel_invs=True,
        returns (L, invs): the B×B lower diagonal-panel inverses in solve
        order (the TRSM derives them anyway), for blocked_trisolve/
        blocked_cho_solve reuse — or (L, None) when n needed padding.

    zero_upper=False (with the in-place Pallas path) skips the strict-upper
    strip zeroing: the returned L's upper triangle holds K leftovers —
    UNDEFINED under L's usual contract. Only for callers that provably
    never read it (ops/linalg's fused LML forward: fused_cho_solve +
    diagonal). Elsewhere keep the default.

    Alignment: the in-place factorization (4 bytes/entry peak instead of 8)
    and the panel-inverse reuse need n % B == 0 in f32. When the configured
    block does not divide n, the largest 512-multiple block that does is
    used instead; an n that is no multiple of 512 at all (e.g. 10,000) pads
    to the next block multiple and keeps the 8 B/entry peak — round such
    sizes to a multiple of 512 where peak memory matters.
    """
    n = K.shape[-1]
    if K.ndim != 2:
        raise ValueError("blocked_cholesky expects a 2-D matrix; got shape %r"
                         % (K.shape,))
    ldtype = (jnp.float32 if K.dtype in (jnp.bfloat16, jnp.float16)
              else K.dtype)
    B = effective_block(n, block_size)
    nb = -(-n // B)
    npad = nb * B
    if npad != n:
        # pad with an identity tail: factorization of the padded matrix has
        # the original L in its leading block and 1s on the padded diagonal
        K = jnp.pad(K, ((0, npad - n), (0, npad - n)))
        K = K.at[jnp.arange(n, npad), jnp.arange(n, npad)].set(1.0)

    # L lives in ONE buffer updated in place (dynamic_update_slice); the
    # accumulation GEMM reads static slices of it. Measured 6 ms faster at
    # N=16k than rebuilding the left factor by concatenation each block
    # column (fewer copies for XLA to schedule), identical results.
    # When the shapes align and the update precision is "high", the
    # accumulation runs as a streamed Pallas GEMM that reads L in place
    # (no slice copies at all; manual bf16x3 passes).
    pallas_update = (ldtype == jnp.float32 and update_precision == "high"
                     and B % 512 == 0 and npad % 512 == 0)
    if s_tile is None:
        from ..gpr.config import config as _cfg
        s_tile = getattr(_cfg, "blocked_cholesky_s_tile", (512, 256))
    # row tiles must divide every panel height (multiples of B) and k-chunks
    # every finished-column width (multiples of B); a non-divisor (e.g. 384
    # with B=1024) would silently truncate the Pallas grids (m // T) and
    # misalign the r0 // T index maps — round DOWN to the nearest divisor
    def _tile_divisor(t):
        t = max(8, min(int(t), B))
        while B % t:
            t -= 1
        return t
    s_tile = (_tile_divisor(s_tile[0]), _tile_divisor(s_tile[1]))
    # in-place factorization: L's buffer IS K's (every write goes through
    # aliased Pallas calls, so XLA can assign them one buffer when K is a
    # dead temp — exactly the LML path, where the Gram engine's output has
    # no other consumer). Peak HBM drops from 8 bytes/entry (Gram + factor)
    # to 4, raising the max single-chip exact-Cholesky N by ~40% with NO
    # accuracy change — strictly dominating the bf16-Gram mode's 6 B/entry
    # (which shifts the LML; ROADMAP #2). When K has other uses (jitter
    # ladders retrying the factorization, user-held arrays), XLA inserts a
    # copy: still correct, just no peak win.
    pallas_inplace = (inplace and pallas_update and npad == n
                      and K.dtype == jnp.float32)
    shift = None if diag_shift is None else jnp.asarray(diag_shift, ldtype)
    if shift is not None and shift.ndim == 1:
        if shift.shape[0] != n:
            raise ValueError("vector diag_shift must have shape (n,); got %r"
                             % (shift.shape,))
        if npad != n:
            shift = jnp.pad(shift, (0, npad - n))   # padded diagonal stays 1
    L = K if pallas_inplace else jnp.zeros(K.shape, ldtype)
    # collect the B×B lower panel inverses the TRSM already derives: a
    # downstream blocked_cho_solve can then skip its own panel_inverses
    # pass (16 sequential "highest" triangular inversions, ~4.5 ms at
    # N=16k — most of the measured 5.8 ms 17-RHS cho_solve). Only exact
    # when nothing was padded; callers get None otherwise.
    invs = [] if (return_panel_invs and npad == n) else None
    use_fused_trsm = (fused_trsm and pallas_update
                      and update_precision == "high")
    for j in range(nb):
        r0 = j * B
        if j > 0 and use_fused_trsm:
            # fused below-TRSM pipeline (see the block comment above the
            # kernels): diagonal S block -> panel factor+inverse -> below
            # rows with "@ invT" fused into the streamed accumulation ->
            # pure-DMA aliased commit. S_below never exists in HBM.
            Kbuf = L if pallas_inplace else K
            Sjj = _s_diag_pallas(Kbuf, L, j, B, s_tile[1])
            if shift is not None:
                sj = shift[r0:r0 + B, None] if shift.ndim == 1 else shift
                Sjj = Sjj + sj * jnp.eye(B, dtype=ldtype)
            with jax.default_matmul_precision(panel_precision):
                need_inv = j < nb - 1 or invs is not None or return_panel_invs
                if need_inv:
                    Ljj, inv = _panel_factor_inv(Sjj, update_precision,
                                                 panel_precision)
                else:
                    Ljj = _panel_factor(Sjj, update_precision,
                                        panel_precision)
                    inv = None
            if invs is not None:
                invs.append(inv)
            if j < nb - 1:
                below = _below_trsm_pallas(Kbuf, L, inv.T, j, B,
                                           s_tile[0], s_tile[1])
            else:
                below = Ljj     # no rows below: dead operand for the spec
            L = _col_commit(L, below, Ljj, j, B, min(512, B))
            if pallas_inplace and zero_upper and j < nb - 1:
                L = _upper_zero(L, j, B, 512)
            continue
        if j > 0 and pallas_update:
            # in place, unwritten regions of L still hold K: the S kernel
            # reads the not-yet-finalized panel (rows ≥ r0 of column j) and
            # the finalized left columns from the same buffer
            S = _s_panel_pallas(L if pallas_inplace else K, L, j, B,
                                s_tile[0], s_tile[1])
        elif j > 0:
            Kj = K[r0:, r0:r0 + B].astype(ldtype)   # (npad − jB, B)
            # S = K_panel − L[jB:, :jB] @ L[jB:(j+1)B, :jB]ᵀ — one MXU GEMM
            Lleft = L[r0:, :r0]
            S = Kj - _dot_t(Lleft, Lleft[:B], update_precision)
        else:
            S = K[r0:, r0:r0 + B].astype(ldtype)
        Sjj = S[:B]
        if shift is not None:
            sj = shift[r0:r0 + B, None] if shift.ndim == 1 else shift
            Sjj = Sjj + sj * jnp.eye(B, dtype=ldtype)
        with jax.default_matmul_precision(panel_precision):
            # the panel inverse rides along at ~3-GEMM cost (composed from
            # the recursion's sub-inverses) — needed for the TRSM anyway on
            # every column but the last, and returned for solve reuse
            need_inv = j < nb - 1 or invs is not None or return_panel_invs
            if need_inv:
                Ljj, inv = _panel_factor_inv(Sjj, update_precision,
                                             panel_precision)
            else:
                Ljj = _panel_factor(Sjj, update_precision, panel_precision)
                inv = None
            if pallas_update:
                # finalize the block column IN PLACE: the aliased Pallas
                # write computes the TRSM-via-inverse GEMM per tile (manual
                # bf16x3 — the same "high" recipe as the XLA path below)
                # and copies Ljj, touching ONLY the column — the
                # concatenate + dynamic_update_slice form re-copied the
                # whole 1 GB L buffer every block column (~16 GB of HBM
                # traffic at N=16k, the bulk of the measured 12 ms
                # copy/scheduling overhead above the GEMM+TRSM+panel floor)
                if invs is not None:
                    invs.append(inv)
                invT = inv.T if j < nb - 1 else jnp.eye(B, dtype=ldtype)
                if pallas_inplace and zero_upper:
                    # the buffer's upper strip still holds K values that
                    # the factorization never reads; one launch writes the
                    # column AND zeroes the strip (L's contract)
                    L = _col_strip_write(L, S, invT, Ljj, j, B)
                else:
                    # zero_upper=False (in place): column-only write — the
                    # strict upper keeps K leftovers; callers asserted they
                    # never read it (the fused LML forward: solve + diag)
                    L = _panel_write(L, S, invT, Ljj, j, B, min(512, B))
                continue
            if j < nb - 1:
                # X · Ljjᵀ = S_below  ⇔  X = S_below · Ljj⁻ᵀ — one GEMM
                # against the explicit B×B triangular inverse (MAGMA-style
                # TRSM-via-inverse; the B×B blocks are jittered Gram
                # diagonals, well within inverse-stability territory).
                # "high" (bf16x3) suffices: no cancellation — S is already
                # accumulated — and it halves the N²B/2 TRSM FLOPs' cost
                # (measured 8.8 ms → ~4.4 ms of the N=16k factorization).
                # An explicit update_precision="highest" escalates this GEMM
                # too (the full-accuracy debugging mode must mean it).
                trsm_prec = ("highest" if update_precision == "highest"
                             else "high")
                below = _dot_t(S[B:], inv, trsm_prec)
                colj = jnp.concatenate([Ljj, below], axis=0)
            else:
                colj = Ljj
            if invs is not None:
                invs.append(inv)
        L = jax.lax.dynamic_update_slice(L, colj, (r0, r0))
    L = L[:n, :n]
    return (L, invs) if return_panel_invs else L
