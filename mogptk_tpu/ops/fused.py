"""Generalized fused Gram kernels: one Pallas machine, many kernel families.

ops/pallas_mosm.py implements the MOSM Gram as VMEM tiles with three
primitives (materialize, matvec, low-rank VJP). Every multi-output spectral
family in this framework shares the same structure — per-point parameter
gathers realized as one-hot matmuls followed by fused elementwise algebra —
so the Pallas plumbing here is written ONCE, parameterized by a per-family
tile function:

    tile(x1t, c1oh, x2t, c2oh, *params) -> (TN, TM)

Families registered: "mosm" (MOSM/MOSM-Q, reference mogptk/gpr/
multioutput.py:41-210), "umosm" (:212-293), "csm" (:397-454),
"conv" (:504-553), "mohsm" (:295-395, nonstationary envelope fused
in-tile), "lmc_sm" (LMC over plain SpectralKernels, :456-502). The
iterative exact engine (gpr/iterative.py) consumes
these through `resolve_family`, giving materialization-free exact inference
for the whole family zoo, not just MOSM.

A family is identified by a hashable (name, statics) pair so it can ride in
custom_vjp nondiff static arguments; the callables are rebuilt on demand.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import pallas_mosm as _pm
from .pallas_mosm import _pad, _tile_forward, _interpret, _compute_dtype

_pi = np.pi


# -- per-family tile + dense functions ----------------------------------------

def _mosm_family(statics):
    twopi, phase_inside = statics

    def tile(x1t, c1oh, x2t, c2oh, w, mu, var, theta, phi):
        return _tile_forward(x1t, c1oh, x2t, c2oh, w, mu, var, theta, phi,
                             twopi, phase_inside)

    def dense(c1, x1, c2, x2, params):
        from ..gpr.multioutput import _mosm_K
        return _mosm_K(c1, x1, c2, x2, params, twopi, phase_inside)

    def diag(c, x, params):
        w, mu, var, theta, phi = params
        alpha = (w ** 2) * twopi * jnp.sqrt(jnp.prod(var, axis=-1))   # OxQ
        return jnp.sum(alpha, axis=-1)[c]

    return tile, dense, diag


def _umosm_family(statics):
    (twopi,) = statics

    def tile(x1t, c1oh, x2t, c2oh, W, mu, var, theta, phi):
        mag = jnp.tril(W) @ jnp.tril(W).T                  # OxO
        cw = jnp.dot(jnp.dot(c1oh, mag, preferred_element_type=c1oh.dtype),
                     c2oh.T, preferred_element_type=c1oh.dtype)  # TNxTM
        return _tile_forward(x1t, c1oh, x2t, c2oh, None, mu, var, theta, phi,
                             twopi, False, cross_weight=cw)

    def dense(c1, x1, c2, x2, params):
        from ..gpr.multioutput import _umosm_K
        return _umosm_K(c1, x1, c2, x2, params, twopi)

    def diag(c, x, params):
        W, mu, var, theta, phi = params
        mag = jnp.diagonal(jnp.tril(W) @ jnp.tril(W).T)     # O
        alpha = mag[:, None] * twopi * jnp.sqrt(jnp.prod(var, axis=-1))  # Ox1
        return jnp.sum(alpha, axis=-1)[c]

    return tile, dense, diag


def _csm_family(statics):
    (Rq, D) = statics

    def tile(x1t, c1oh, x2t, c2oh, amp, mu, var, shift):
        expo_acc = None
        ang_acc = None
        for d in range(D):
            taud = x1t[:, d][:, None] - x2t[:, d][None, :]
            e = taud * taud * var[0, d]
            a_ = taud * mu[0, d]
            expo_acc = e if expo_acc is None else expo_acc + e
            ang_acc = a_ if ang_acc is None else ang_acc + a_
        expo = jnp.exp(-0.5 * expo_acc)
        K = None
        for r in range(Rq):
            a1 = c1oh @ amp[:, r][:, None]                 # TNx1
            a2 = (c2oh @ amp[:, r][:, None]).T             # 1xTM
            s1 = c1oh @ shift[:, r][:, None]
            s2 = (c2oh @ shift[:, r][:, None]).T
            Kr = jnp.sqrt(a1 * a2) * expo * jnp.cos(2.0 * _pi * (ang_acc + (s1 - s2)))
            K = Kr if K is None else K + Kr
        return K

    def dense(c1, x1, c2, x2, params):
        from ..gpr.multioutput import _csm_K
        return _csm_K(c1, x1, c2, x2, params)

    def diag(c, x, params):
        amp, mu, var, shift = params
        return jnp.sum(amp, axis=-1)[c]

    return tile, dense, diag


def _conv_family(statics):
    (D,) = statics

    def tile(x1t, c1oh, x2t, c2oh, w, var, base):
        w1 = c1oh @ w                                      # TNx1
        w2 = (c2oh @ w).T                                  # 1xTM
        expo_acc = None
        prod_var = None
        for d in range(D):
            taud2 = (x1t[:, d][:, None] - x2t[:, d][None, :]) ** 2
            vd = (c1oh @ var[:, d][:, None]) + (c2oh @ var[:, d][:, None]).T + base[0, d]
            e = taud2 / vd
            expo_acc = e if expo_acc is None else expo_acc + e
            prod_var = vd if prod_var is None else prod_var * vd
        magnitude = w1 * w2 * jnp.sqrt(jnp.prod(base) / prod_var)
        return magnitude * jnp.exp(-0.5 * expo_acc)

    def dense(c1, x1, c2, x2, params):
        from ..gpr.multioutput import _conv_K
        return _conv_K(c1, x1, c2, x2, params)

    def diag(c, x, params):
        w, var, base = params
        variances = 2.0 * var + base                       # OxD
        mag = (w[:, 0] ** 2) * jnp.sqrt(jnp.prod(base) / jnp.prod(variances, axis=-1))
        return mag[c]

    return tile, dense, diag


def _mohsm_family(statics):
    twopi, D = statics

    def tile(x1t, c1oh, x2t, c2oh, w, mu, var, theta, phi, ls, center):
        # nonstationary envelope (reference mogptk/gpr/multioutput.py:369-378):
        # pair scalar l_ij = 2li²lj²/(li²+lj²) via one-hot gathers, then
        # (√l_ij)^D · exp(−½‖(x+x')/2 − center‖²·l_ij), fused with the MOSM
        # Q=1 tile (phase outside 2π).
        l2 = ls[:, 0] ** 2                                 # O
        l1 = c1oh @ l2[:, None]                            # TNx1
        l2m = (c2oh @ l2[:, None]).T                       # 1xTM
        l_nm = 2.0 * l1 * l2m / (l1 + l2m)                 # TNxTM
        dist2 = None
        for d in range(D):
            avgd = 0.5 * (x1t[:, d][:, None] + x2t[:, d][None, :]) - center[0, d]
            e = avgd * avgd
            dist2 = e if dist2 is None else dist2 + e
        env = jnp.power(jnp.sqrt(l_nm), float(D)) * jnp.exp(-0.5 * dist2 * l_nm)
        return env * _tile_forward(x1t, c1oh, x2t, c2oh, w, mu, var, theta,
                                   phi, twopi, False)

    def dense(c1, x1, c2, x2, params):
        from ..gpr.multioutput import _mohsm_K
        return _mohsm_K(c1, x1, c2, x2, params, twopi)

    def diag(c, x, params):
        w, mu, var, theta, phi, ls, center = params
        l2 = ls[:, 0] ** 2                                 # O
        alpha = (w[:, 0] ** 2 * twopi * jnp.sqrt(jnp.prod(var[:, 0, :], axis=-1))
                 * jnp.power(jnp.sqrt(l2), float(D)))      # O
        dist2 = jnp.sum((x - center[0]) ** 2, axis=-1)     # N
        return alpha[c] * jnp.exp(-0.5 * dist2 * l2[c])

    return tile, dense, diag


def _lmc_sm_family(statics):
    (Q, D) = statics

    def tile(x1t, c1oh, x2t, c2oh, W, mag, mu, var):
        K = None
        for q in range(Q):
            Aq = jnp.dot(W[:, q, :], W[:, q, :].T,
                         preferred_element_type=c1oh.dtype)   # OxO
            cw = jnp.dot(jnp.dot(c1oh, Aq, preferred_element_type=c1oh.dtype),
                         c2oh.T, preferred_element_type=c1oh.dtype)  # TNxTM
            acc = None
            for d in range(D):
                taud = x1t[:, d][:, None] - x2t[:, d][None, :]
                t = (jnp.exp(-2.0 * _pi ** 2 * taud * taud * var[q, d])
                     * jnp.cos(2.0 * _pi * taud * mu[q, d]))
                acc = t if acc is None else acc + t
            Kq = cw * (mag[q, 0] * acc)
            K = Kq if K is None else K + Kq
        return K

    def dense(c1, x1, c2, x2, params):
        from ..gpr.multioutput import _lmc_sm_K
        return _lmc_sm_K(c1, x1, c2, x2, params)

    def diag(c, x, params):
        W, mag, mu, var = params
        B = jnp.sum(W * W, axis=-1)                        # OxQ
        per = jnp.sum(B * mag.reshape(1, -1), axis=-1) * float(D)  # O
        return per[c]

    return tile, dense, diag


_FAMILIES = {
    "mosm": _mosm_family,
    "umosm": _umosm_family,
    "csm": _csm_family,
    "conv": _conv_family,
    "mohsm": _mohsm_family,
    "lmc_sm": _lmc_sm_family,
}


def resolve_family(family):
    """family = (name, statics) hashable pair -> (tile, dense, diag)."""
    name, statics = family
    return _FAMILIES[name](statics)


# -- generic Pallas wrappers ---------------------------------------------------

def _param_specs(params):
    return [pl.BlockSpec(p.shape, functools.partial(lambda nd, i, j: (0,) * nd, p.ndim))
            for p in params]


def _onehot(c_ref, O, dtype):
    return (c_ref[:, 0][:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, O), 1)).astype(dtype)


def _prep(x1, c1, x2, c2, params, T):
    """Pad/cast inputs. Tile math runs in the compute dtype (f32 for sub-f32
    configs — see pallas_mosm._compute_dtype); params are cast accordingly."""
    dtype = _compute_dtype(params[0].dtype)
    params = tuple(p.astype(dtype) for p in params)
    x1p = _pad(x1.astype(dtype), T, 0)
    x2p = _pad(x2.astype(dtype), T, 0)
    c1p = _pad(c1.astype(jnp.int32).reshape(-1, 1), T, 0)
    c2p = _pad(c2.astype(jnp.int32).reshape(-1, 1), T, 0)
    return x1p, c1p, x2p, c2p, params, dtype


def fused_gram_matvec(family, O, x1, c1, x2, c2, params, V, precision=None):
    """K @ V in (TILE, TILE) VMEM tiles for any registered family; K is never
    materialized. V is (M, R).

    precision: dot precision for the tile×V contraction. The default is the
    MXU's single bf16 pass — fine for CG solves (self-correcting) and
    probe-trace gradients (unbiased), but spectral estimates read the
    OPERATOR's noise directly: Lanczos quadrature on a 2⁻⁸-input-rounded
    matvec lands thousands of nats off at N=16k (the readout path passes
    "highest")."""
    tile_fn, _, _ = resolve_family(family)
    N, D = x1.shape
    R = V.shape[1]
    T = _pm.TILE
    x1p, c1p, x2p, c2p, params, dtype = _prep(x1, c1, x2, c2, params, T)
    Vp = _pad(V.astype(dtype), T, 0)
    Np, Mp = x1p.shape[0], x2p.shape[0]

    def kernel(*refs):
        x1_ref, c1_ref, x2_ref, c2_ref = refs[:4]
        param_refs = refs[4:-2]
        v_ref, out_ref = refs[-2], refs[-1]
        j = pl.program_id(1)

        @pl.when(j == 0)
        def _():
            out_ref[:, :] = jnp.zeros_like(out_ref)

        c1oh = _onehot(c1_ref, O, out_ref.dtype)
        c2oh = _onehot(c2_ref, O, out_ref.dtype)
        K_tile = tile_fn(x1_ref[:, :], c1oh, x2_ref[:, :], c2oh,
                         *[r[...] for r in param_refs])
        out_ref[:, :] += jnp.dot(K_tile, v_ref[:, :],
                                 preferred_element_type=out_ref.dtype,
                                 precision=precision)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, R), dtype),
        grid=(Np // T, Mp // T),
        in_specs=[
            pl.BlockSpec((T, D), lambda i, j: (i, 0)),
            pl.BlockSpec((T, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((T, D), lambda i, j: (j, 0)),
            pl.BlockSpec((T, 1), lambda i, j: (j, 0)),
        ] + _param_specs(params) + [
            pl.BlockSpec((T, R), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((T, R), lambda i, j: (i, 0)),
        interpret=_interpret(),
    )(x1p, c1p, x2p, c2p, *params, Vp)
    return out[:N, :]


def fused_gram_lowrank_vjp(family, O, x1, c1, x2, c2, params, A, B):
    """Parameter cotangents for dK = A Bᵀ without materializing dK, for any
    registered family. Returns a tuple matching `params`."""
    tile_fn, _, _ = resolve_family(family)
    N, D = x1.shape
    R = A.shape[1]
    T = _pm.BWD_TILE
    pack_dtype = params[0].dtype
    x1p, c1p, x2p, c2p, params, dtype = _prep(x1, c1, x2, c2, params, T)
    Ap = _pad(A.astype(dtype), T, 0)
    Bp = _pad(B.astype(dtype), T, 0)
    Np, Mp = x1p.shape[0], x2p.shape[0]

    def kernel(*refs):
        x1_ref, c1_ref, x2_ref, c2_ref = refs[:4]
        nparams = len(params)
        param_refs = refs[4:4 + nparams]
        a_ref, b_ref = refs[4 + nparams], refs[5 + nparams]
        dout_refs = refs[6 + nparams:]
        i = pl.program_id(0)
        j = pl.program_id(1)

        @pl.when((i == 0) & (j == 0))
        def _():
            for dref in dout_refs:
                dref[...] = jnp.zeros_like(dref)

        c1oh = _onehot(c1_ref, O, a_ref.dtype)
        c2oh = _onehot(c2_ref, O, a_ref.dtype)
        x1t = x1_ref[:, :]
        x2t = x2_ref[:, :]
        g_tile = jnp.dot(a_ref[:, :], b_ref[:, :].T, preferred_element_type=a_ref.dtype)

        _, vjp = jax.vjp(lambda *ps: tile_fn(x1t, c1oh, x2t, c2oh, *ps),
                         *[r[...] for r in param_refs])
        douts = vjp(g_tile)
        for dref, d in zip(dout_refs, douts):
            dref[...] += d

    zero_ix = lambda nd: functools.partial(lambda nd_, i, j: (0,) * nd_, nd)
    douts = pl.pallas_call(
        kernel,
        out_shape=tuple(jax.ShapeDtypeStruct(p.shape, dtype) for p in params),
        grid=(Np // T, Mp // T),
        in_specs=[
            pl.BlockSpec((T, D), lambda i, j: (i, 0)),
            pl.BlockSpec((T, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((T, D), lambda i, j: (j, 0)),
            pl.BlockSpec((T, 1), lambda i, j: (j, 0)),
        ] + _param_specs(params) + [
            pl.BlockSpec((T, R), lambda i, j: (i, 0)),
            pl.BlockSpec((T, R), lambda i, j: (j, 0)),
        ],
        out_specs=tuple(pl.BlockSpec(p.shape, zero_ix(p.ndim)) for p in params),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        interpret=_interpret(),
    )(x1p, c1p, x2p, c2p, *params, Ap, Bp)
    return tuple(d.astype(pack_dtype) for d in douts)


def fused_gram(family, O, x1, c1, x2, c2, params):
    """Materialize the (N, M) Gram in VMEM tiles (used by blocked prediction;
    training paths should prefer matvec/low-rank)."""
    tile_fn, _, _ = resolve_family(family)
    N, D = x1.shape
    M = x2.shape[0]
    T = _pm.TILE
    out_dtype = params[0].dtype        # bf16 Grams stay bf16 in HBM
    x1p, c1p, x2p, c2p, params, dtype = _prep(x1, c1, x2, c2, params, T)
    Np, Mp = x1p.shape[0], x2p.shape[0]

    def kernel(*refs):
        x1_ref, c1_ref, x2_ref, c2_ref = refs[:4]
        param_refs = refs[4:-1]
        out_ref = refs[-1]
        c1oh = _onehot(c1_ref, O, x1_ref.dtype)
        c2oh = _onehot(c2_ref, O, x1_ref.dtype)
        out_ref[:, :] = tile_fn(x1_ref[:, :], c1oh, x2_ref[:, :], c2oh,
                                *[r[...] for r in param_refs]).astype(out_ref.dtype)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((Np, Mp), out_dtype),
        grid=(Np // T, Mp // T),
        in_specs=[
            pl.BlockSpec((T, D), lambda i, j: (i, 0)),
            pl.BlockSpec((T, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((T, D), lambda i, j: (j, 0)),
            pl.BlockSpec((T, 1), lambda i, j: (j, 0)),
        ] + _param_specs(params),
        out_specs=pl.BlockSpec((T, T), lambda i, j: (i, j)),
        interpret=_interpret(),
    )(x1p, c1p, x2p, c2p, *params)
    return out[:N, :M]
