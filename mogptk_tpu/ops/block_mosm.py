"""Channel-block MOSM Gram engine: scalar pair statistics per block.

`merge_data` (gpr/util.py) lays out multi-output training data sorted by
channel, so the N×N Gram is an O×O grid of channel blocks — and within one
block every cross-statistic of the MOSM algebra (the Gaussian product
var_nm/mean_nm, the θ/φ offsets, and the whole magnitude factor α) is a
SCALAR. The generic kernel (ops/pallas_mosm.py) cannot assume sorted
channels and pays per-point one-hot gathers plus (TN,TM)-shaped pair
algebra — measured 30 ms forward / ~40 ms backward at N=16k on a v5e. This
engine computes the pair statistics ONCE at O² cost in plain (autodiff'd)
XLA, then runs per-block Pallas kernels whose tile math is just the
τ-dependent chain: one fused multiply-add pair per input dim, one exp, one
cos. The backward kernel is hand-derived (no in-kernel jax.vjp): per-tile
(T,T)→scalar reductions accumulate into (1,1) outputs across the
sequentially-executed grid.

Symmetry is exploited: only diagonal and upper blocks run kernels; lower
blocks are transposes, and autodiff folds g_jiᵀ into the upper block's
cotangent for free.

Reference math: mogptk/gpr/multioutput.py:103-117 (MOSM cross-spectral
density); behavior parity with gpr/multioutput._mosm_K is asserted in
tests/test_block_mosm.py.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_pi = np.pi

TILE = 512
# backward tile: 256 measured 9.58 ms vs 512's 10.38 for the full N=16k
# low-rank VJP (benchmarks/hot_decomp.py vjpT cells, round 4)
BWD_TILE = 256


def _interpret():
    """Pallas only compiles on TPU; on CPU (use_pallas(True) forced, or unit
    tests) run the kernels in interpreter mode."""
    import jax as _jax
    return _jax.default_backend() == "cpu"


def _compute_dtype(dtype):
    """In-tile compute dtype: sub-f32 Grams (use_half_precision) store bf16
    in HBM — half the traffic for the downstream factorization — but the
    τ-chain/exp/cos math runs in f32. bf16's 8-bit mantissa loses the cosine
    phase entirely at τ·μ ≳ 30 (0.4% relative τ error ≈ π of phase), and the
    VPU is f32-native anyway, so bf16 tile math would cost accuracy and buy
    no compute."""
    return jnp.float32 if dtype in (jnp.bfloat16, jnp.float16) else dtype


def mosm_pair_stats(w, mu, var, theta, phi, twopi):
    """Differentiable (O,O)-pair statistics of the MOSM spectral product.

    Returns:
        st3: (O, O, Q, D, 3) — [var_nm, mean_nm, θ_i−θ_j] per input dim.
        st2: (O, O, Q, 2)    — [α (full magnitude), φ_i−φ_j].
    """
    v1, v2 = var[:, None], var[None, :]          # (O,O,Q,D)
    m1, m2 = mu[:, None], mu[None, :]
    inv = 1.0 / (v1 + v2)
    mean_nm = inv * (v1 * m2 + v2 * m1)
    var_nm = 2.0 * v1 * inv * v2
    mag = jnp.sum((m1 - m2) ** 2 * inv, axis=-1)  # (O,O,Q)
    alpha = ((w[:, None] * w[None, :]) * jnp.exp(-_pi ** 2 * mag)
             * twopi * jnp.sqrt(jnp.prod(var_nm, axis=-1)))
    dth = theta[:, None] - theta[None, :]
    dph = phi[:, None] - phi[None, :]
    st3 = jnp.stack([var_nm, mean_nm, dth], axis=-1)
    st2 = jnp.stack([alpha, dph], axis=-1)
    return st3, st2


def _tau_chain(x1_ref, x2_ref, st3_ref, q, D, keep_tds=False):
    """Recompute the τ-dependent chain for component q from SMEM scalars."""
    e_acc = None
    a_acc = None
    tds = []
    for d in range(D):
        V = st3_ref[q * D + d, 0]
        M = st3_ref[q * D + d, 1]
        dt = st3_ref[q * D + d, 2]
        td = (x1_ref[:, d][:, None] - x2_ref[:, d][None, :]) + dt
        if keep_tds:
            tds.append(td)
        e = td * td * V
        a_ = td * M
        e_acc = e if e_acc is None else e_acc + e
        a_acc = a_ if a_acc is None else a_acc + a_
    return e_acc, a_acc, tds


def _tile_from_stats(x1_ref, x2_ref, st3_ref, st2_ref, Q, D, phase_inside):
    """The (T,T) Gram tile from SMEM scalar stats — the whole per-tile cost
    is the τ chain plus one exp and one cos per component."""
    K = None
    for q in range(Q):
        e_acc, a_acc, _ = _tau_chain(x1_ref, x2_ref, st3_ref, q, D)
        alpha = st2_ref[q, 0]
        dp = st2_ref[q, 1]
        ang = (2.0 * _pi * (a_acc + dp) if phase_inside
               else 2.0 * _pi * a_acc + dp)
        Kq = alpha * jnp.exp(-0.5 * e_acc) * jnp.cos(ang)
        K = Kq if K is None else K + Kq
    return K


def _fwd_kernel(x1_ref, x2_ref, st3_ref, st2_ref, out_ref, *, Q, D,
                phase_inside):
    out_ref[:, :] = _tile_from_stats(x1_ref, x2_ref, st3_ref, st2_ref,
                                     Q, D, phase_inside).astype(out_ref.dtype)


def _bwd_scalars(x1_ref, x2_ref, st3_ref, st2_ref, g, Q, D, phase_inside):
    """Hand-derived cotangents of the scalar pair statistics for one tile.

    Returns 3·Q·D scalars [dV, dM, dθ-offset per (q,d)] then 2·Q scalars
    [dα, dφ-offset per q]: the forward chain recomputed, each cotangent
    reduced (T,T)→scalar. Callers accumulate across the (sequential) grid.
    """
    outs = [None] * (3 * Q * D + 2 * Q)
    for q in range(Q):
        e_acc, a_acc, tds = _tau_chain(x1_ref, x2_ref, st3_ref, q, D,
                                       keep_tds=True)
        alpha = st2_ref[q, 0]
        dp = st2_ref[q, 1]
        ang = (2.0 * _pi * (a_acc + dp) if phase_inside
               else 2.0 * _pi * a_acc + dp)
        E = jnp.exp(-0.5 * e_acc)
        C = jnp.cos(ang)
        S = jnp.sin(ang)
        gE = g * E
        P = alpha * gE
        dang = -P * S                       # cotangent of ang
        de = -0.5 * P * C                   # cotangent of e_acc
        da = 2.0 * _pi * dang               # cotangent of a_acc
        outs[3 * Q * D + 2 * q] = jnp.sum(gE * C)
        outs[3 * Q * D + 2 * q + 1] = (jnp.sum(dang)
                                       * (2.0 * _pi if phase_inside else 1.0))
        for d in range(D):
            V = st3_ref[q * D + d, 0]
            M = st3_ref[q * D + d, 1]
            td = tds[d]
            base = 3 * (q * D + d)
            outs[base + 0] = jnp.sum(de * td * td)
            outs[base + 1] = jnp.sum(da * td)
            outs[base + 2] = jnp.sum(de * (2.0 * V) * td + da * M)
    return outs


def _bwd_kernel(x1_ref, x2_ref, st3_ref, st2_ref, g_ref, *dout_refs, Q, D,
                phase_inside):
    """Cotangents from a materialized cotangent tile g (padded rows of g are
    zero, so padding contributes nothing)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        for dref in dout_refs:
            dref[...] = jnp.zeros_like(dref)

    vals = _bwd_scalars(x1_ref, x2_ref, st3_ref, st2_ref, g_ref[:, :],
                        Q, D, phase_inside)
    for dref, v in zip(dout_refs, vals):
        dref[...] += v


def _lowrank_bwd_kernel(x1_ref, x2_ref, st3_ref, st2_ref, a1_ref, b1_ref,
                        a2_ref, b2_ref, *dout_refs, Q, D, phase_inside, sym):
    """Cotangents for a LOW-RANK dK formed in VMEM (never materialized):
    g = A_i B_jᵀ for the (i,j) block, plus B_i A_jᵀ when the block also
    appears transposed at (j,i) (sym=True, off-diagonal pairs)."""
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        for dref in dout_refs:
            dref[...] = jnp.zeros_like(dref)

    g = jax.lax.dot_general(a1_ref[:, :], b2_ref[:, :],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=a1_ref.dtype)
    if sym:
        g = g + jax.lax.dot_general(b1_ref[:, :], a2_ref[:, :],
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=a1_ref.dtype)
    vals = _bwd_scalars(x1_ref, x2_ref, st3_ref, st2_ref, g,
                        Q, D, phase_inside)
    for dref, v in zip(dout_refs, vals):
        dref[...] += v


class _PairRow:
    """Trace-time view of one pair's row of a flattened (O², k·w) SMEM stats
    ref: view[(r, c)] == ref[pair, r*w + c]. Lets `_bwd_scalars`/`_tau_chain`
    read per-pair scalars from the BATCHED all-pairs layout through the same
    2-D indexing they use on a per-pair (k, w) ref."""

    def __init__(self, ref, pair, w):
        self._ref, self._pair, self._w = ref, pair, w

    def __getitem__(self, idx):
        r, c = idx
        return self._ref[self._pair, r * self._w + c]


def _lowrank_bwd_batched_kernel(idx_ref, x1_ref, x2_ref, st3_ref, st2_ref,
                                a1_ref, b1_ref, a2_ref, b2_ref, out_ref, *,
                                Q, D, phase_inside):
    """ALL channel pairs' low-rank cotangents in ONE grid: step s processes
    tile (idx[s,0], idx[s,1]) of pair idx[s,2] (tiles grouped by pair, so
    the (1, n_outs) output row accumulates in VMEM and writes back once per
    pair). idx[s,3]=1 marks a pair's first tile (zero-init). Off-diagonal
    TILES fold their transposed appearance in via the second dot; diagonal
    tiles (idx[s,0]==idx[s,1]) mask it out."""
    s = pl.program_id(0)
    pair = idx_ref[2, s]

    @pl.when(idx_ref[3, s] == 1)
    def _():
        out_ref[...] = jnp.zeros_like(out_ref)

    g = jax.lax.dot_general(a1_ref[:, :], b2_ref[:, :],
                            (((1,), (1,)), ((), ())),
                            preferred_element_type=a1_ref.dtype)
    gt = jax.lax.dot_general(b1_ref[:, :], a2_ref[:, :],
                             (((1,), (1,)), ((), ())),
                             preferred_element_type=a1_ref.dtype)
    g = g + jnp.where(idx_ref[0, s] != idx_ref[1, s],
                      jnp.ones((), g.dtype), jnp.zeros((), g.dtype)) * gt
    vals = _bwd_scalars(x1_ref, x2_ref, _PairRow(st3_ref, pair, 3),
                        _PairRow(st2_ref, pair, 2), g, Q, D, phase_inside)
    row = jnp.concatenate([v.reshape(1, 1, 1) for v in vals], axis=2)
    out_ref[...] += row.astype(out_ref.dtype)


def _matvec_diag_kernel(x1_ref, x2_ref, st3_ref, st2_ref, v_ref, out_ref, *,
                        Q, D, phase_inside):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    K_tile = _tile_from_stats(x1_ref, x2_ref, st3_ref, st2_ref,
                              Q, D, phase_inside)
    out_ref[:, :] += jnp.dot(K_tile, v_ref[:, :],
                             preferred_element_type=out_ref.dtype)


def _matvec_offdiag_kernel(x1_ref, x2_ref, st3_ref, st2_ref, vi_ref, vj_ref,
                           outi_ref, outjp_ref, *, Q, D, phase_inside):
    """One tile evaluation serves BOTH directions of a symmetric off-
    diagonal pair: out_i accumulates K@V_j across the (consecutive) j-grid;
    the Kᵀ@V_i contribution is written to a per-(i,j)-tile partial slot
    (summed outside) because its output tile would otherwise be revisited
    non-consecutively. The partial is stored TRANSPOSED, (R, TILE): with R
    minor the TPU would lane-pad small R to 128 (the CLAUDE.md layout rule
    — up to 128× HBM blowup for the R=1 predict solve)."""
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        outi_ref[:, :] = jnp.zeros_like(outi_ref)

    K_tile = _tile_from_stats(x1_ref, x2_ref, st3_ref, st2_ref,
                              Q, D, phase_inside)
    outi_ref[:, :] += jnp.dot(K_tile, vj_ref[:, :],
                              preferred_element_type=outi_ref.dtype)
    outjp_ref[0, :, :] = jax.lax.dot_general(
        vi_ref[:, :], K_tile, (((0,), (0,)), ((), ())),
        preferred_element_type=outi_ref.dtype)


def _pad_rows(a, mult):
    rem = (-a.shape[0]) % mult
    if rem:
        a = jnp.pad(a, ((0, rem), (0, 0)))
    return a


def _smem_spec(shape):
    return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                        memory_space=pltpu.SMEM)


def _gram_block_impl(xi, xj, st3f, st2, phase_inside):
    QD, _ = st3f.shape
    Q = st2.shape[0]
    D = QD // Q
    dtype = st3f.dtype                 # output (HBM) dtype — bf16 stays bf16
    cdtype = _compute_dtype(dtype)     # in-tile math dtype
    ni, nj = xi.shape[0], xj.shape[0]
    x1p = _pad_rows(xi.astype(cdtype), TILE)
    x2p = _pad_rows(xj.astype(cdtype), TILE)
    Np, Mp = x1p.shape[0], x2p.shape[0]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, Q=Q, D=D, phase_inside=phase_inside),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), dtype),
        grid=(Np // TILE, Mp // TILE),
        in_specs=[
            pl.BlockSpec((TILE, D), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, D), lambda i, j: (j, 0)),
            _smem_spec(st3f.shape),
            _smem_spec(st2.shape),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=_interpret(),
    )(x1p, x2p, st3f.astype(cdtype), st2.astype(cdtype))
    return out[:ni, :nj]


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def _gram_block(xi, xj, st3f, st2, phase_inside):
    """One (n_i, n_j) channel block from scalar pair stats (st3f is the
    (Q·D, 3) flattened form); differentiable w.r.t. the stats (training
    inputs are constant → zero cotangents, as in ops/pallas_mosm.py)."""
    return _gram_block_impl(xi, xj, st3f, st2, phase_inside)


def _gram_block_fwd(xi, xj, st3f, st2, phase_inside):
    return _gram_block_impl(xi, xj, st3f, st2, phase_inside), (xi, xj, st3f, st2)


def _gram_block_bwd(phase_inside, res, g):
    xi, xj, st3f, st2 = res
    QD = st3f.shape[0]
    Q = st2.shape[0]
    D = QD // Q
    dtype = _compute_dtype(st3f.dtype)
    T = BWD_TILE
    x1p = _pad_rows(xi.astype(dtype), T)
    x2p = _pad_rows(xj.astype(dtype), T)
    gp = _pad_rows(_pad_rows(g.astype(dtype), T).T, T).T
    Np, Mp = x1p.shape[0], x2p.shape[0]
    n_outs = 3 * QD + 2 * Q
    scalar_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0))
    douts = pl.pallas_call(
        functools.partial(_bwd_kernel, Q=Q, D=D, phase_inside=phase_inside),
        out_shape=tuple(jax.ShapeDtypeStruct((1, 1), dtype)
                        for _ in range(n_outs)),
        grid=(Np // T, Mp // T),
        in_specs=[
            pl.BlockSpec((T, D), lambda i, j: (i, 0)),
            pl.BlockSpec((T, D), lambda i, j: (j, 0)),
            _smem_spec(st3f.shape),
            _smem_spec(st2.shape),
            pl.BlockSpec((T, T), lambda i, j: (i, j)),
        ],
        out_specs=tuple(scalar_spec for _ in range(n_outs)),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
    )(x1p, x2p, st3f.astype(dtype), st2.astype(dtype), gp)
    dst3f = jnp.stack([d[0, 0] for d in douts[:3 * QD]]).reshape(QD, 3)
    dst2 = jnp.stack([d[0, 0] for d in douts[3 * QD:]]).reshape(Q, 2)
    return (jnp.zeros_like(xi), jnp.zeros_like(xj),
            dst3f.astype(st3f.dtype), dst2.astype(st2.dtype))


_gram_block.defvjp(_gram_block_fwd, _gram_block_bwd)


def _gram_lower_kernel(idx_ref, x1_ref, x2_ref, st3_ref, st2_ref, out_ref, *,
                       Q, D, phase_inside):
    s = pl.program_id(0)
    pair = idx_ref[2, s]
    out_ref[:, :] = _tile_from_stats(
        x1_ref, x2_ref, _PairRow(st3_ref, pair, 3),
        _PairRow(st2_ref, pair, 2), Q, D, phase_inside).astype(out_ref.dtype)


def mosm_gram_sorted_lower(x, counts, w, mu, var, theta, phi, twopi,
                           phase_inside=True, band=1024):
    """(N, N) Gram buffer with ONLY the tiles the blocked Cholesky reads
    written: the tile-lower triangle plus the strict-upper tiles inside each
    `band`-aligned diagonal panel (the factorization's Sjj blocks). Tiles
    strictly above the band are NEVER WRITTEN — their memory is undefined.

    Callers must guarantee the consumer never reads the unwritten region:
    ops/linalg._lml_chol_fused_fwd uses this ONLY when the MXU-blocked
    factorization will run with panel width dividing `band` evenly into N
    (the XLA expander SYMMETRIZES and would read the garbage — measured NaN
    contamination). The in-place factorization overwrites the strict-upper
    strips with zeros, so the returned L is fully defined.

    One pallas launch over a prefetched (row_tile, col_tile, pair) list —
    at 4 equal channels this does ~53% of the full launch's τ-chain work
    and none of the 10-block + transpose + concatenate assembly traffic
    (which traced at ~13.5 ms of the N=16k fused forward in round 4).

    Returns None when not applicable (counts/N not TILE-aligned, or band
    not a TILE multiple); callers fall back to mosm_gram_sorted.
    NOT differentiable — call only inside custom-VJP forwards."""
    counts = tuple(int(n) for n in counts)
    O, Q = w.shape
    D = mu.shape[-1]
    n = int(sum(counts))
    if (any(c % TILE for c in counts) or n % TILE or band % TILE
            or x.shape[0] != n):
        return None
    st3, st2 = mosm_pair_stats(w, mu, var, theta, phi, twopi)
    dtype = st3.dtype
    cdtype = _compute_dtype(dtype)
    st3s = st3.reshape(O, O, Q * D, 3).reshape(O * O, 3 * Q * D).astype(cdtype)
    st2s = st2.reshape(O * O, 2 * Q).astype(cdtype)

    tpc = n // TILE
    ch = np.repeat(np.arange(O), [c // TILE for c in counts])
    bandT = band // TILE
    rows = [(ti, tj, int(ch[ti]) * O + int(ch[tj]))
            for ti in range(tpc) for tj in range(tpc)
            if ti >= tj or ti // bandT == tj // bandT]
    idx = jnp.asarray(np.array(rows, np.int32).T)   # (3, S)

    xs = x.astype(cdtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(idx.shape[1],),
        in_specs=[
            pl.BlockSpec((TILE, D), lambda s, ix: (ix[0, s], 0)),
            pl.BlockSpec((TILE, D), lambda s, ix: (ix[1, s], 0)),
            pl.BlockSpec(st3s.shape, lambda s, ix: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(st2s.shape, lambda s, ix: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda s, ix: (ix[0, s], ix[1, s])),
    )
    return pl.pallas_call(
        functools.partial(_gram_lower_kernel, Q=Q, D=D,
                          phase_inside=phase_inside),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, n), dtype),
        interpret=_interpret(),
    )(idx, xs, xs, st3s, st2s)


def mosm_gram_sorted(x, counts, w, mu, var, theta, phi, twopi,
                     phase_inside=True):
    """Full (N, N) MOSM Gram for channel-sorted x with static per-channel
    `counts`. Upper blocks run kernels; lower blocks are transposes (the
    VJP folds both cotangents into one backward kernel per block pair)."""
    counts = tuple(int(n) for n in counts)
    O, Q = w.shape
    D = mu.shape[-1]
    if len(counts) != O:
        raise ValueError("counts must have one entry per output dim")
    st3, st2 = mosm_pair_stats(w, mu, var, theta, phi, twopi)
    st3f = st3.reshape(O, O, Q * D, 3)
    xs, _ = _split_counts(x, counts)

    blocks = {}
    for i in range(O):
        for j in range(i, O):
            if counts[i] == 0 or counts[j] == 0:
                blocks[(i, j)] = jnp.zeros((counts[i], counts[j]), st3.dtype)
            else:
                blocks[(i, j)] = _gram_block(xs[i], xs[j], st3f[i, j],
                                             st2[i, j], phase_inside)
    rows = []
    for i in range(O):
        row = [blocks[(j, i)].T if j < i else blocks[(i, j)]
               for j in range(O)]
        rows.append(jnp.concatenate(row, axis=1) if O > 1 else row[0])
    return jnp.concatenate(rows, axis=0) if O > 1 else rows[0]


def _split_counts(x, counts):
    offs = np.concatenate([[0], np.cumsum(counts)]).astype(int)
    return [x[offs[i]:offs[i + 1]] for i in range(len(counts))], offs


def mosm_matvec_sorted(x, counts, w, mu, var, theta, phi, twopi, V,
                       phase_inside=True):
    """K @ V for channel-sorted x without materializing K: VMEM tiles from
    scalar pair stats, one tile evaluation per symmetric block pair (the
    off-diagonal kernel produces both K@V_j and Kᵀ@V_i contributions)."""
    counts = tuple(int(n) for n in counts)
    O, Q = w.shape
    D = mu.shape[-1]
    st3, st2 = mosm_pair_stats(w, mu, var, theta, phi, twopi)
    # matvecs feed CG/Lanczos: run and return in the solve dtype (f32 for
    # sub-f32 configs, mirroring ops/linalg._solve_dtype)
    dtype = _compute_dtype(st3.dtype)
    st3f = st3.reshape(O, O, Q * D, 3).astype(dtype)
    st2 = st2.astype(dtype)
    R = V.shape[1]
    xs, offs = _split_counts(x, counts)
    vs, _ = _split_counts(V, counts)

    outs = [jnp.zeros((counts[i], R), dtype) for i in range(O)]
    for i in range(O):
        if counts[i] == 0:
            continue
        xi = _pad_rows(xs[i].astype(dtype), TILE)
        vi = _pad_rows(vs[i].astype(dtype), TILE)
        ni = xi.shape[0]
        # diagonal block
        out = pl.pallas_call(
            functools.partial(_matvec_diag_kernel, Q=Q, D=D,
                              phase_inside=phase_inside),
            out_shape=jax.ShapeDtypeStruct((ni, R), dtype),
            grid=(ni // TILE, ni // TILE),
            in_specs=[
                pl.BlockSpec((TILE, D), lambda i_, j_: (i_, 0)),
                pl.BlockSpec((TILE, D), lambda i_, j_: (j_, 0)),
                _smem_spec(st3f.shape[2:]),
                _smem_spec(st2.shape[2:]),
                pl.BlockSpec((TILE, R), lambda i_, j_: (j_, 0)),
            ],
            out_specs=pl.BlockSpec((TILE, R), lambda i_, j_: (i_, 0)),
            interpret=_interpret(),
        )(xi, xi, st3f[i, i], st2[i, i], vi)
        outs[i] = outs[i] + out[:counts[i]]
        for j in range(i + 1, O):
            if counts[j] == 0:
                continue
            xj = _pad_rows(xs[j].astype(dtype), TILE)
            vj = _pad_rows(vs[j].astype(dtype), TILE)
            nj = xj.shape[0]
            gi, gj = ni // TILE, nj // TILE
            oi, ojp = pl.pallas_call(
                functools.partial(_matvec_offdiag_kernel, Q=Q, D=D,
                                  phase_inside=phase_inside),
                out_shape=(jax.ShapeDtypeStruct((ni, R), dtype),
                           jax.ShapeDtypeStruct((gi, R, nj), dtype)),
                grid=(gi, gj),
                in_specs=[
                    pl.BlockSpec((TILE, D), lambda i_, j_: (i_, 0)),
                    pl.BlockSpec((TILE, D), lambda i_, j_: (j_, 0)),
                    _smem_spec(st3f.shape[2:]),
                    _smem_spec(st2.shape[2:]),
                    pl.BlockSpec((TILE, R), lambda i_, j_: (i_, 0)),
                    pl.BlockSpec((TILE, R), lambda i_, j_: (j_, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((TILE, R), lambda i_, j_: (i_, 0)),
                    pl.BlockSpec((1, R, TILE), lambda i_, j_: (i_, 0, j_)),
                ),
                interpret=_interpret(),
            )(xi, xj, st3f[i, j], st2[i, j], vi, vj)
            outs[i] = outs[i] + oi[:counts[i]]
            outs[j] = outs[j] + jnp.sum(ojp, axis=0).T[:counts[j]]
    return jnp.concatenate(outs, axis=0) if O > 1 else outs[0]


def _batched_pair_layout(xs, As, Bs_, counts, dtype, T, O):
    """Padded concatenated operands + tile list for the single-call batched
    low-rank VJP (shared with ops/block_families.py).

    Returns (xp, ap, bp, idx, mask) — idx is the (4, S) int32 tile list
    [row tile; col tile; pair id i·O+j; first-tile-of-pair flag], grouped by
    pair so each pair's (1, 1, n_outs) output row accumulates in VMEM and
    writes back once; mask is the (O², 1) present-upper-pair bool used to
    zero never-written output rows. None when all channels are empty.
    TRANSPOSED so S rides the SMEM lane dim: a (S, 4) prefetch array would
    lane-pad each row to 128 (4.2 MB > the 1 MB SMEM at N=65k shapes)."""
    pres = [i for i in range(O) if counts[i] > 0]
    if not pres:
        return None
    xp, ap, bp = [], [], []
    start, ntiles = {}, {}
    for i in pres:
        xi = _pad_rows(xs[i].astype(dtype), T)
        start[i] = sum(ntiles.values())
        ntiles[i] = xi.shape[0] // T
        xp.append(xi)
        ap.append(_pad_rows(As[i].astype(dtype), T))
        bp.append(_pad_rows(Bs_[i].astype(dtype), T))
    cat = (lambda l: l[0] if len(l) == 1 else jnp.concatenate(l, axis=0))
    idx = []
    mask = np.zeros((O * O, 1), np.bool_)
    for a_i, i in enumerate(pres):
        for j in pres[a_i:]:
            mask[i * O + j] = True
            first = 1
            for ti in range(start[i], start[i] + ntiles[i]):
                tj0 = ti if j == i else start[j]
                for tj in range(tj0, start[j] + ntiles[j]):
                    idx.append((ti, tj, i * O + j, first))
                    first = 0
    return (cat(xp), cat(ap), cat(bp),
            jnp.asarray(np.asarray(idx, np.int32).T), jnp.asarray(mask))


def mosm_lowrank_vjp_sorted(x, counts, params, twopi, A, B,
                            phase_inside=True):
    """Parameter cotangents for dK = A Bᵀ without materializing dK, for
    channel-sorted x: per-block scalar-stat cotangents (hand-derived
    kernel), chained through mosm_pair_stats by XLA autodiff.

    ALL O(O+1)/2 channel pairs run as ONE pallas_call over a prefetched
    tile list (upper-triangle tiles only, grouped by pair): the per-pair
    launch + 10-scalar stacking + at[].add glue of a call-per-pair layout
    measured ~3× the kernels' own time at the headline shapes. A tile at
    (ti, tj), ti<tj, also serves its transpose through the second dot
    (g = A_i B_jᵀ + B_i A_jᵀ), masked off on diagonal tiles."""
    counts = tuple(int(n) for n in counts)
    w = params[0]
    O, Q = w.shape
    D = params[1].shape[-1]
    dtype = _compute_dtype(w.dtype)
    R = A.shape[1]

    def stats_fn(params):
        st3, st2 = mosm_pair_stats(*params, twopi)
        return st3.reshape(O, O, Q * D, 3), st2

    (st3f, st2), vjp_stats = jax.vjp(stats_fn, tuple(params))
    T = BWD_TILE
    n_outs = 3 * Q * D + 2 * Q
    xs, _ = _split_counts(x, counts)
    As, _ = _split_counts(A, counts)
    Bs_, _ = _split_counts(B, counts)

    layout = _batched_pair_layout(xs, As, Bs_, counts, dtype, T, O)
    if layout is None:
        (dparams,) = vjp_stats((jnp.zeros_like(st3f), jnp.zeros_like(st2)))
        return dparams
    xp, ap, bp, idx, mask = layout

    st3s = st3f.reshape(O * O, 3 * Q * D).astype(dtype)
    st2s = st2.reshape(O * O, 2 * Q).astype(dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(idx.shape[1],),
        in_specs=[
            pl.BlockSpec((T, D), lambda s, ix: (ix[0, s], 0)),
            pl.BlockSpec((T, D), lambda s, ix: (ix[1, s], 0)),
            pl.BlockSpec(st3s.shape, lambda s, ix: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec(st2s.shape, lambda s, ix: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, R), lambda s, ix: (ix[0, s], 0)),
            pl.BlockSpec((T, R), lambda s, ix: (ix[0, s], 0)),
            pl.BlockSpec((T, R), lambda s, ix: (ix[1, s], 0)),
            pl.BlockSpec((T, R), lambda s, ix: (ix[1, s], 0)),
        ],
        # 3-D so the block's LAST TWO dims equal the array's (the TPU
        # lowering requires (8,128)-divisible or dim-equal trailing dims;
        # a (1, n_outs) block of a (O², n_outs) array violates the row rule)
        out_specs=pl.BlockSpec((1, 1, n_outs), lambda s, ix: (ix[2, s], 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_lowrank_bwd_batched_kernel, Q=Q, D=D,
                          phase_inside=phase_inside),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((O * O, 1, n_outs), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(idx, xp, xp, st3s, st2s, ap, bp, ap, bp)
    out = out[:, 0, :]
    douts = jnp.where(mask, out, jnp.zeros((), out.dtype))
    dst3f = douts[:, :3 * Q * D].reshape(O, O, Q * D, 3).astype(st3f.dtype)
    dst2 = douts[:, 3 * Q * D:].reshape(O, O, Q, 2).astype(st2.dtype)
    (dparams,) = vjp_stats((dst3f, dst2))
    return dparams


def sorted_channel_counts(X, output_dims):
    """Static per-channel counts if X (concrete, channel-ID first column) is
    sorted by channel; None otherwise. Host-side helper for model setup."""
    try:
        c = np.asarray(X[:, 0]).astype(np.int64)
    except Exception:
        return None
    if c.ndim != 1 or c.size == 0:
        return None
    if np.any(np.diff(c) < 0) or c.min() < 0 or c.max() >= output_dims:
        return None
    return tuple(int(v) for v in np.bincount(c, minlength=output_dims))
