"""Channel-block Gram engines for the non-MOSM fused families.

Same design as ops/block_mosm.py — channel-sorted data makes every
cross-channel statistic a SCALAR per (O,O) block, so the Pallas tiles carry
only the τ-dependent chain — generalized over a family registry:

    pack(params)  -> (O, O, S) differentiable scalar pack (plain XLA)
    tile(x1t, x2t, svals) -> (TN, TM)  from the S per-block scalars

Unlike block_mosm's hand-derived backward, the backward kernels here run
`jax.vjp` over the SCALAR pack values inside the kernel — scalar primals
produce only (T,T)→scalar reductions, which Mosaic compiles (verified on
hardware; it is the small-VECTOR pair algebra whose transposes Mosaic
rejects). One machine therefore serves every family: materialize, matvec
(symmetric-pair), and low-rank VJP.

Families: "umosm" (reference mogptk/gpr/multioutput.py:212-293), "csm"
(:397-454), "conv" (:504-553), "mohsm" (:295-395), "lmc_sm" (LMC over plain
SpectralKernels, :456-502 composed with gpr/singleoutput.py:520-561).
MOSM/MOSM-Q keep their specialized module (ops/block_mosm.py). Parity with
the jnp formulations is asserted in tests/test_block_families.py.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .block_mosm import (_pad_rows, _interpret, _split_counts, _compute_dtype,
                         _batched_pair_layout)

_pi = np.pi

TILE = 512
BWD_TILE = 512


# -- family registry ----------------------------------------------------------

def _umosm_spec(statics):
    """uMOSM: MOSM with Q=1, trained tril cross weight, phase outside 2π.
    params = (W (O,O), mu (O,D), var (O,D), theta (O,D), phi (O,))."""
    (twopi,) = statics

    def pack(params):
        W, mu, var, theta, phi = params
        # accept either (O,D) or the Q=1-lifted (O,1,D) forms the fused
        # engine passes (iterative._fused_kernel_params)
        O = W.shape[0]
        mu = mu.reshape(O, -1)
        var = var.reshape(O, -1)
        theta = theta.reshape(O, -1)
        phi = phi.reshape(O)
        D = mu.shape[1]
        v1, v2 = var[:, None], var[None, :]           # (O,O,D)
        m1, m2 = mu[:, None], mu[None, :]
        inv = 1.0 / (v1 + v2)
        mean_nm = inv * (v1 * m2 + v2 * m1)
        var_nm = 2.0 * v1 * inv * v2
        mag = jnp.sum((m1 - m2) ** 2 * inv, axis=-1)  # (O,O)
        Wt = jnp.tril(W)
        cross = Wt @ Wt.T                             # (O,O)
        alpha = (cross * jnp.exp(-_pi ** 2 * mag)
                 * twopi * jnp.sqrt(jnp.prod(var_nm, axis=-1)))
        dth = theta[:, None] - theta[None, :]
        dph = phi[:, None, None] - phi[None, :, None]  # (O,O,1)
        # order: [V_d, M_d, dt_d]*D + [alpha, dp]
        return jnp.concatenate(
            [jnp.stack([var_nm, mean_nm, dth], axis=-1).reshape(*mag.shape, 3 * D),
             alpha[..., None], dph], axis=-1)

    def tile(x1t, x2t, svals, D=None):
        D = (len(svals) - 2) // 3
        e_acc = None
        a_acc = None
        for d in range(D):
            V, M, dt = svals[3 * d], svals[3 * d + 1], svals[3 * d + 2]
            td = (x1t[:, d][:, None] - x2t[:, d][None, :]) + dt
            e = td * td * V
            a_ = td * M
            e_acc = e if e_acc is None else e_acc + e
            a_acc = a_ if a_acc is None else a_acc + a_
        alpha, dp = svals[-2], svals[-1]
        return alpha * jnp.exp(-0.5 * e_acc) * jnp.cos(2.0 * _pi * a_acc + dp)

    return pack, tile


def _csm_spec(statics):
    """CSM: shared spectral envelope, per-(channel,component) amplitude and
    shift. params = (amp (O,R), mu (1,D), var (1,D), shift (O,R))."""
    Rq, D = statics

    def pack(params):
        amp, mu, var, shift = params
        O = amp.shape[0]
        amp_oo = jnp.sqrt(amp[:, None] * amp[None, :])        # (O,O,R)
        s_oo = shift[:, None] - shift[None, :]                # (O,O,R)
        shared = jnp.broadcast_to(
            jnp.concatenate([var[0], mu[0]]), (O, O, 2 * D))  # [v_d..., mu_d...]
        # order: [v_d]*D + [mu_d]*D + [amp_r]*R + [s_r]*R
        return jnp.concatenate([shared, amp_oo, s_oo], axis=-1)

    def tile(x1t, x2t, svals, D=D, Rq=Rq):
        e_acc = None
        a_acc = None
        for d in range(D):
            taud = x1t[:, d][:, None] - x2t[:, d][None, :]
            e = taud * taud * svals[d]
            a_ = taud * svals[D + d]
            e_acc = e if e_acc is None else e_acc + e
            a_acc = a_ if a_acc is None else a_acc + a_
        expo = jnp.exp(-0.5 * e_acc)
        K = None
        for r in range(Rq):
            amp_r = svals[2 * D + r]
            s_r = svals[2 * D + Rq + r]
            Kr = amp_r * expo * jnp.cos(2.0 * _pi * (a_acc + s_r))
            K = Kr if K is None else K + Kr
        return K

    return pack, tile


def _conv_spec(statics):
    """CONV (Gaussian convolution process). params = (w (O,1), var (O,D),
    base (1,D)). Per block: inverse pooled variances and the magnitude are
    scalars."""
    (D,) = statics

    def pack(params):
        w, var, base = params
        vd = var[:, None] + var[None, :] + base[0]            # (O,O,D)
        mag = (w[:, 0][:, None] * w[:, 0][None, :]
               * jnp.sqrt(jnp.prod(base) / jnp.prod(vd, axis=-1)))  # (O,O)
        # order: [1/vd_d]*D + [mag]
        return jnp.concatenate([1.0 / vd, mag[..., None]], axis=-1)

    def tile(x1t, x2t, svals, D=D):
        e_acc = None
        for d in range(D):
            taud = x1t[:, d][:, None] - x2t[:, d][None, :]
            e = taud * taud * svals[d]
            e_acc = e if e_acc is None else e_acc + e
        return svals[-1] * jnp.exp(-0.5 * e_acc)

    return pack, tile


def _mohsm_spec(statics):
    """MOHSM (nonstationary harmonizable): MOSM Q=1 with phase outside 2π,
    times the envelope (√l_ij)^D · exp(−½‖(x+x')/2 − center‖²·l_ij), where
    l_ij = 2l_i²l_j²/(l_i²+l_j²) is a pair scalar and the envelope's mean-
    position chain runs in-tile. params is the MOHSM._fused_params() tuple;
    every leaf is reshape-normalized so both the flat (O,)/(O,D) and the
    MOSM-lifted (O,1)/(O,1,D) layouts work."""
    twopi, D = statics

    def pack(params):
        w, mu, var, theta, phi, ls, center = params
        O = w.shape[0]
        w = w.reshape(O)
        mu = mu.reshape(O, -1)
        var = var.reshape(O, -1)
        theta = theta.reshape(O, -1)
        phi = phi.reshape(O)
        ls = ls.reshape(O)
        center = center.reshape(-1)
        v1, v2 = var[:, None], var[None, :]
        m1, m2 = mu[:, None], mu[None, :]
        inv = 1.0 / (v1 + v2)
        mean_nm = inv * (v1 * m2 + v2 * m1)
        var_nm = 2.0 * v1 * inv * v2
        mag = jnp.sum((m1 - m2) ** 2 * inv, axis=-1)
        l2 = ls ** 2
        l_nm = 2.0 * l2[:, None] * l2[None, :] / (l2[:, None] + l2[None, :])
        alpha = (w[:, None] * w[None, :] * jnp.exp(-_pi ** 2 * mag)
                 * twopi * jnp.sqrt(jnp.prod(var_nm, axis=-1))
                 * jnp.power(jnp.sqrt(l_nm), float(D)))
        dth = theta[:, None] - theta[None, :]
        dph = phi[:, None, None] - phi[None, :, None]
        cent = jnp.broadcast_to(center, (O, O, D))
        # order: [V_d, M_d, dt_d]*D + [alpha, dp, l_nm] + [center_d]*D
        return jnp.concatenate(
            [jnp.stack([var_nm, mean_nm, dth], axis=-1).reshape(O, O, 3 * D),
             alpha[..., None], dph, l_nm[..., None], cent], axis=-1)

    def tile(x1t, x2t, svals, D=D):
        e_acc = None
        a_acc = None
        dist2 = None
        for d in range(D):
            V, M, dt = svals[3 * d], svals[3 * d + 1], svals[3 * d + 2]
            td = (x1t[:, d][:, None] - x2t[:, d][None, :]) + dt
            e = td * td * V
            a_ = td * M
            e_acc = e if e_acc is None else e_acc + e
            a_acc = a_ if a_acc is None else a_acc + a_
            avgd = (0.5 * (x1t[:, d][:, None] + x2t[:, d][None, :])
                    - svals[3 * D + 3 + d])
            s2 = avgd * avgd
            dist2 = s2 if dist2 is None else dist2 + s2
        alpha, dp, l_nm = svals[3 * D], svals[3 * D + 1], svals[3 * D + 2]
        return (alpha * jnp.exp(-0.5 * (e_acc + dist2 * l_nm))
                * jnp.cos(2.0 * _pi * a_acc + dp))

    return pack, tile


def _lmc_sm_spec(statics):
    """SM-LMC (LMC over plain SpectralKernels): per block the coregionalized
    amplitude a_ij,q = σ²_q Σ_r W_iqr W_jqr is a pair scalar and the spectral
    envelope/frequency are shared. params = (W (O,Q,Rq), mag (Q,1),
    mu (Q,D), var (Q,D))."""
    Q, D = statics

    def pack(params):
        W, mag, mu, var = params
        O = W.shape[0]
        W = W.reshape(O, Q, -1)
        amp = (jnp.einsum("iqr,jqr->ijq", W, W)
               * mag.reshape(Q))                              # (O,O,Q)
        shared = jnp.broadcast_to(
            jnp.concatenate([var.reshape(-1), mu.reshape(-1)]),
            (O, O, 2 * Q * D))
        # order: [amp_q]*Q + [var_qd]*(Q·D) + [mu_qd]*(Q·D)
        return jnp.concatenate([amp, shared], axis=-1)

    def tile(x1t, x2t, svals, Q=Q, D=D):
        K = None
        for q in range(Q):
            acc = None
            for d in range(D):
                v = svals[Q + q * D + d]
                m = svals[Q + Q * D + q * D + d]
                taud = x1t[:, d][:, None] - x2t[:, d][None, :]
                t = (jnp.exp(-2.0 * _pi ** 2 * taud * taud * v)
                     * jnp.cos(2.0 * _pi * taud * m))
                acc = t if acc is None else acc + t
            Kq = svals[q] * acc
            K = Kq if K is None else K + Kq
        return K

    return pack, tile


_BLOCK_FAMILIES = {
    "umosm": _umosm_spec,
    "csm": _csm_spec,
    "conv": _conv_spec,
    "mohsm": _mohsm_spec,
    "lmc_sm": _lmc_sm_spec,
}


def has_block_family(name):
    return name in _BLOCK_FAMILIES


def _resolve(name, statics):
    return _BLOCK_FAMILIES[name](statics)


# -- generic kernels -----------------------------------------------------------

def _read_svals(s_ref, S):
    return [s_ref[k, 0] for k in range(S)]


def _fwd_kernel(x1_ref, x2_ref, s_ref, out_ref, *, tile, S):
    out_ref[:, :] = tile(x1_ref[:, :], x2_ref[:, :],
                         _read_svals(s_ref, S)).astype(out_ref.dtype)


def _vjp_scalars(tile, x1_ref, x2_ref, svals, g):
    x1t, x2t = x1_ref[:, :], x2_ref[:, :]
    _, vjp = jax.vjp(lambda *s: tile(x1t, x2t, list(s)), *svals)
    return vjp(g)


def _vjp_to_scalars(tile, x1_ref, x2_ref, s_ref, S, g, dout_refs):
    for dref, d in zip(dout_refs,
                       _vjp_scalars(tile, x1_ref, x2_ref,
                                    _read_svals(s_ref, S), g)):
        dref[...] += d


def _bwd_kernel(x1_ref, x2_ref, s_ref, g_ref, *dout_refs, tile, S):
    i, j = pl.program_id(0), pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        for dref in dout_refs:
            dref[...] = jnp.zeros_like(dref)

    _vjp_to_scalars(tile, x1_ref, x2_ref, s_ref, S, g_ref[:, :], dout_refs)


def _lowrank_bwd_kernel(x1_ref, x2_ref, s_ref, a1_ref, b1_ref, a2_ref, b2_ref,
                        *dout_refs, tile, S, sym):
    i, j = pl.program_id(0), pl.program_id(1)

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
    _vjp_to_scalars(tile, x1_ref, x2_ref, s_ref, S, g, dout_refs)


def _lowrank_bwd_batched_kernel(idx_ref, x1_ref, x2_ref, s_ref, a1_ref, b1_ref,
                                a2_ref, b2_ref, out_ref, *, tile, S):
    """ALL channel pairs' low-rank cotangents in ONE grid (the family-generic
    twin of block_mosm._lowrank_bwd_batched_kernel): s_ref holds the (O², S)
    scalar packs, idx_ref the pair-grouped tile list."""
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
    svals = [s_ref[pair, k] for k in range(S)]
    ds = _vjp_scalars(tile, x1_ref, x2_ref, svals, g)
    row = jnp.concatenate([d.reshape(1, 1, 1) for d in ds], axis=2)
    out_ref[...] += row.astype(out_ref.dtype)


def _matvec_diag_kernel(x1_ref, x2_ref, s_ref, v_ref, out_ref, *, tile, S):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    K_tile = tile(x1_ref[:, :], x2_ref[:, :], _read_svals(s_ref, S))
    out_ref[:, :] += jnp.dot(K_tile, v_ref[:, :],
                             preferred_element_type=out_ref.dtype)


def _matvec_offdiag_kernel(x1_ref, x2_ref, s_ref, vi_ref, vj_ref,
                           outi_ref, outjp_ref, *, tile, S):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        outi_ref[:, :] = jnp.zeros_like(outi_ref)

    K_tile = tile(x1_ref[:, :], x2_ref[:, :], _read_svals(s_ref, S))
    outi_ref[:, :] += jnp.dot(K_tile, vj_ref[:, :],
                              preferred_element_type=outi_ref.dtype)
    # partial stored TRANSPOSED, (R, TILE): R minor would lane-pad to 128
    # (see block_mosm._matvec_offdiag_kernel)
    outjp_ref[0, :, :] = jax.lax.dot_general(
        vi_ref[:, :], K_tile, (((0,), (0,)), ((), ())),
        preferred_element_type=outi_ref.dtype)


def _smem_spec(shape):
    return pl.BlockSpec(shape, lambda i, j: (0,) * len(shape),
                        memory_space=pltpu.SMEM)


# -- per-block custom VJP ------------------------------------------------------

def _block_impl(name, statics, xi, xj, s):
    _, tile = _resolve(name, statics)
    S = s.shape[0]
    dtype = s.dtype                    # output (HBM) dtype — bf16 stays bf16
    cdtype = _compute_dtype(dtype)     # in-tile math dtype (f32 for sub-f32)
    s = s.astype(cdtype)
    ni, nj = xi.shape[0], xj.shape[0]
    x1p = _pad_rows(xi.astype(cdtype), TILE)
    x2p = _pad_rows(xj.astype(cdtype), TILE)
    D = xi.shape[1]
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, tile=tile, S=S),
        out_shape=jax.ShapeDtypeStruct((x1p.shape[0], x2p.shape[0]), dtype),
        grid=(x1p.shape[0] // TILE, x2p.shape[0] // TILE),
        in_specs=[
            pl.BlockSpec((TILE, D), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, D), lambda i, j: (j, 0)),
            _smem_spec((S, 1)),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=_interpret(),
    )(x1p, x2p, s.reshape(S, 1))
    return out[:ni, :nj]


@functools.partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _gram_block(name, statics, xi, xj, s):
    """One channel block from the (S,) scalar pack; differentiable w.r.t.
    the pack (training inputs are constant → zero cotangents)."""
    return _block_impl(name, statics, xi, xj, s)


def _gram_block_fwd(name, statics, xi, xj, s):
    return _block_impl(name, statics, xi, xj, s), (xi, xj, s)


def _gram_block_bwd(name, statics, res, g):
    xi, xj, s = res
    _, tile = _resolve(name, statics)
    S = s.shape[0]
    pack_dtype = s.dtype
    dtype = _compute_dtype(pack_dtype)
    s = s.astype(dtype)
    T = BWD_TILE
    x1p = _pad_rows(xi.astype(dtype), T)
    x2p = _pad_rows(xj.astype(dtype), T)
    gp = _pad_rows(_pad_rows(g.astype(dtype), T).T, T).T
    D = xi.shape[1]
    scalar_spec = pl.BlockSpec((1, 1), lambda i, j: (0, 0))
    douts = pl.pallas_call(
        functools.partial(_bwd_kernel, tile=tile, S=S),
        out_shape=tuple(jax.ShapeDtypeStruct((1, 1), dtype) for _ in range(S)),
        grid=(x1p.shape[0] // T, x2p.shape[0] // T),
        in_specs=[
            pl.BlockSpec((T, D), lambda i, j: (i, 0)),
            pl.BlockSpec((T, D), lambda i, j: (j, 0)),
            _smem_spec((S, 1)),
            pl.BlockSpec((T, T), lambda i, j: (i, j)),
        ],
        out_specs=tuple(scalar_spec for _ in range(S)),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x1p, x2p, s.reshape(S, 1), gp)
    ds = jnp.stack([d[0, 0] for d in douts]).astype(pack_dtype)
    return jnp.zeros_like(xi), jnp.zeros_like(xj), ds


_gram_block.defvjp(_gram_block_fwd, _gram_block_bwd)


# -- public entry points -------------------------------------------------------

def family_gram_sorted(name, statics, x, counts, params):
    """Full (N, N) Gram for channel-sorted x; upper blocks run kernels,
    lower blocks are transposes (valid: every registered family is
    symmetric under channel-pair exchange)."""
    counts = tuple(int(n) for n in counts)
    pack_fn, _ = _resolve(name, statics)
    packs = pack_fn(params)                      # (O, O, S)
    O = packs.shape[0]
    xs, _ = _split_counts(x, counts)
    blocks = {}
    for i in range(O):
        for j in range(i, O):
            if counts[i] == 0 or counts[j] == 0:
                blocks[(i, j)] = jnp.zeros((counts[i], counts[j]), packs.dtype)
            else:
                blocks[(i, j)] = _gram_block(name, statics, xs[i], xs[j],
                                             packs[i, j])
    rows = []
    for i in range(O):
        row = [blocks[(j, i)].T if j < i else blocks[(i, j)]
               for j in range(O)]
        rows.append(jnp.concatenate(row, axis=1) if O > 1 else row[0])
    return jnp.concatenate(rows, axis=0) if O > 1 else rows[0]


def family_matvec_sorted(name, statics, x, counts, params, V):
    """K @ V without materializing K; one tile evaluation per symmetric
    block pair (see block_mosm.mosm_matvec_sorted for the partial-slot
    trick on the transposed direction)."""
    counts = tuple(int(n) for n in counts)
    pack_fn, tile = _resolve(name, statics)
    # matvecs feed CG/Lanczos: run and return in the solve dtype (f32 for
    # sub-f32 configs, mirroring ops/linalg._solve_dtype)
    packs = pack_fn(params)
    packs = packs.astype(_compute_dtype(packs.dtype))
    O, _, S = packs.shape
    dtype = packs.dtype
    R = V.shape[1]
    D = x.shape[1]
    xs, _ = _split_counts(x, counts)
    vs, _ = _split_counts(V, counts)

    outs = [jnp.zeros((counts[i], R), dtype) for i in range(O)]
    for i in range(O):
        if counts[i] == 0:
            continue
        xi = _pad_rows(xs[i].astype(dtype), TILE)
        vi = _pad_rows(vs[i].astype(dtype), TILE)
        ni = xi.shape[0]
        out = pl.pallas_call(
            functools.partial(_matvec_diag_kernel, tile=tile, S=S),
            out_shape=jax.ShapeDtypeStruct((ni, R), dtype),
            grid=(ni // TILE, ni // TILE),
            in_specs=[
                pl.BlockSpec((TILE, D), lambda i_, j_: (i_, 0)),
                pl.BlockSpec((TILE, D), lambda i_, j_: (j_, 0)),
                _smem_spec((S, 1)),
                pl.BlockSpec((TILE, R), lambda i_, j_: (j_, 0)),
            ],
            out_specs=pl.BlockSpec((TILE, R), lambda i_, j_: (i_, 0)),
            interpret=_interpret(),
        )(xi, xi, packs[i, i].reshape(S, 1), vi)
        outs[i] = outs[i] + out[:counts[i]]
        for j in range(i + 1, O):
            if counts[j] == 0:
                continue
            xj = _pad_rows(xs[j].astype(dtype), TILE)
            vj = _pad_rows(vs[j].astype(dtype), TILE)
            nj = xj.shape[0]
            gi = ni // TILE
            oi, ojp = pl.pallas_call(
                functools.partial(_matvec_offdiag_kernel, tile=tile, S=S),
                out_shape=(jax.ShapeDtypeStruct((ni, R), dtype),
                           jax.ShapeDtypeStruct((gi, R, nj), dtype)),
                grid=(gi, nj // TILE),
                in_specs=[
                    pl.BlockSpec((TILE, D), lambda i_, j_: (i_, 0)),
                    pl.BlockSpec((TILE, D), lambda i_, j_: (j_, 0)),
                    _smem_spec((S, 1)),
                    pl.BlockSpec((TILE, R), lambda i_, j_: (i_, 0)),
                    pl.BlockSpec((TILE, R), lambda i_, j_: (j_, 0)),
                ],
                out_specs=(
                    pl.BlockSpec((TILE, R), lambda i_, j_: (i_, 0)),
                    pl.BlockSpec((1, R, TILE), lambda i_, j_: (i_, 0, j_)),
                ),
                interpret=_interpret(),
            )(xi, xj, packs[i, j].reshape(S, 1), vi, vj)
            outs[i] = outs[i] + oi[:counts[i]]
            outs[j] = outs[j] + jnp.sum(ojp, axis=0).T[:counts[j]]
    return jnp.concatenate(outs, axis=0) if O > 1 else outs[0]


def family_lowrank_vjp_sorted(name, statics, x, counts, params, A, B):
    """Parameter cotangents for dK = A Bᵀ without materializing dK: scalar
    cotangents per block, chained through the pack by XLA autodiff. All
    channel pairs run as ONE pallas_call over a prefetched pair-grouped tile
    list (cf. block_mosm.mosm_lowrank_vjp_sorted — the call-per-pair layout
    paid ~3× the kernels' own time in launch + scalar-stacking glue)."""
    counts = tuple(int(n) for n in counts)
    pack_fn, tile = _resolve(name, statics)
    packs, vjp_pack = jax.vjp(lambda ps: pack_fn(ps), tuple(params))
    O, _, S = packs.shape
    pack_dtype = packs.dtype
    dtype = _compute_dtype(pack_dtype)
    R = A.shape[1]
    D = x.shape[1]
    T = BWD_TILE
    xs, _ = _split_counts(x, counts)
    As, _ = _split_counts(A, counts)
    Bs_, _ = _split_counts(B, counts)

    layout = _batched_pair_layout(xs, As, Bs_, counts, dtype, T, O)
    if layout is None:
        (dparams,) = vjp_pack(jnp.zeros_like(packs))
        return dparams
    xp, ap, bp, idx, mask = layout

    ss = packs.reshape(O * O, S).astype(dtype)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(idx.shape[1],),
        in_specs=[
            pl.BlockSpec((T, D), lambda s, ix: (ix[0, s], 0)),
            pl.BlockSpec((T, D), lambda s, ix: (ix[1, s], 0)),
            pl.BlockSpec(ss.shape, lambda s, ix: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((T, R), lambda s, ix: (ix[0, s], 0)),
            pl.BlockSpec((T, R), lambda s, ix: (ix[0, s], 0)),
            pl.BlockSpec((T, R), lambda s, ix: (ix[1, s], 0)),
            pl.BlockSpec((T, R), lambda s, ix: (ix[1, s], 0)),
        ],
        # 3-D: trailing block dims must equal the array's (cf. block_mosm)
        out_specs=pl.BlockSpec((1, 1, S), lambda s, ix: (ix[2, s], 0, 0)),
    )
    out = pl.pallas_call(
        functools.partial(_lowrank_bwd_batched_kernel, tile=tile, S=S),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((O * O, 1, S), dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(idx, xp, xp, ss, ap, bp, ap, bp)
    dpacks = jnp.where(mask, out[:, 0, :], jnp.zeros((), out.dtype))
    (dparams,) = vjp_pack(dpacks.reshape(O, O, S).astype(pack_dtype))
    return dparams
