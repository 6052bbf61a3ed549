"""Fused MOSM Gram-matrix Pallas kernel with tile-level custom VJP.

The MOSM cross-spectral Gram (Parra & Tobar 2017; reference math at
mogptk/gpr/multioutput.py:103-117, 188-203) is the hot elementwise op of the
framework. This kernel computes K in (TN, TM) tiles resident in VMEM:

- forward: one pass, HBM traffic = read x/c tiles + write K tiles; the
  channel-indexed parameters are expanded per point with one-hot matmuls on
  the MXU (tiny (T,O)x(O,Q) contractions), and the cross-spectral algebra
  runs fused on the VPU.
- backward: a second Pallas kernel recomputes each tile's forward under
  jax.vjp *inside VMEM* and accumulates the parameter cotangents across the
  sequentially-executed grid into (O,Q)-shaped outputs. Training memory for
  the Gram is exactly K + dK — no N×N autodiff residuals at all.

Numerical layout: all tiles are float32-friendly (T multiple of 8/128); the
host wrapper pads N/M up to tile multiples and slices the result.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_pi = np.pi

TILE = 512
BWD_TILE = 256  # backward holds ~40 VJP temps per tile in VMEM


# one source of truth for the interpret/compute-dtype policy (the numerics
# rationale lives on the definitions there)
from .block_mosm import _interpret, _compute_dtype


def _tile_forward(x1t, c1oh, x2t, c2oh, w, mu, var, theta, phi, twopi,
                  phase_inside, cross_weight=None):
    """MOSM math for one (TN, TM) tile. x1t (TN,1), c1oh (TN,O) one-hot.

    Same per-point-gather + broadcast formulation as gpr/multioutput.py
    _mosm_K, with the gathers realized as one-hot matmuls (Mosaic-friendly).
    `cross_weight` (TN,TM) replaces the wi·wj factor (uMOSM, ops/fused.py).
    """
    O, Q, D = mu.shape
    K = None
    for q in range(Q):
        expo_acc = None
        ang_acc = None
        mag_acc = None
        var_prod = None
        for d in range(D):
            v1 = (c1oh @ var[:, q, d][:, None])          # (TN,1)
            v2 = (c2oh @ var[:, q, d][:, None]).T        # (1,TM)
            m1 = (c1oh @ mu[:, q, d][:, None])
            m2 = (c2oh @ mu[:, q, d][:, None]).T
            t1 = (c1oh @ theta[:, q, d][:, None])
            t2 = (c2oh @ theta[:, q, d][:, None]).T
            taud = x1t[:, d][:, None] - x2t[:, d][None, :]
            td = taud + (t1 - t2)

            inv = 1.0 / (v1 + v2)
            diffm = m1 - m2
            mean_nm = inv * (v1 * m2 + v2 * m1)
            var_nm = 2.0 * v1 * inv * v2

            e = td * td * var_nm
            a_ = td * mean_nm
            g = diffm * diffm * inv
            expo_acc = e if expo_acc is None else expo_acc + e
            ang_acc = a_ if ang_acc is None else ang_acc + a_
            mag_acc = g if mag_acc is None else mag_acc + g
            var_prod = var_nm if var_prod is None else var_prod * var_nm

        if cross_weight is None:
            w1 = c1oh @ w[:, q][:, None]
            w2 = (c2oh @ w[:, q][:, None]).T
            w1w2 = w1 * w2
        else:
            w1w2 = cross_weight
        p1 = c1oh @ phi[:, q][:, None]
        p2 = (c2oh @ phi[:, q][:, None]).T
        alpha = w1w2 * jnp.exp(-_pi ** 2 * mag_acc) * twopi * jnp.sqrt(var_prod)
        if phase_inside:
            cos = jnp.cos(2.0 * _pi * (ang_acc + (p1 - p2)))
        else:
            cos = jnp.cos(2.0 * _pi * ang_acc + (p1 - p2))
        Kq = alpha * jnp.exp(-0.5 * expo_acc) * cos
        K = Kq if K is None else K + Kq
    return K


def _fwd_kernel(x1_ref, c1_ref, x2_ref, c2_ref, w_ref, mu_ref, var_ref,
                th_ref, ph_ref, out_ref, *, twopi, phase_inside, O):
    c1oh = (c1_ref[:, 0][:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, O), 1)).astype(w_ref.dtype)
    c2oh = (c2_ref[:, 0][:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, O), 1)).astype(w_ref.dtype)
    out_ref[:, :] = _tile_forward(x1_ref[:, :], c1oh, x2_ref[:, :], c2oh,
                                  w_ref[:, :], mu_ref[:, :, :], var_ref[:, :, :],
                                  th_ref[:, :, :], ph_ref[:, :], twopi,
                                  phase_inside).astype(out_ref.dtype)


def _bwd_kernel(x1_ref, c1_ref, x2_ref, c2_ref, w_ref, mu_ref, var_ref,
                th_ref, ph_ref, g_ref, dw_ref, dmu_ref, dvar_ref, dth_ref,
                dph_ref, *io_refs, twopi, phase_inside, O, with_inputs=False):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        dmu_ref[:, :, :] = jnp.zeros_like(dmu_ref)
        dvar_ref[:, :, :] = jnp.zeros_like(dvar_ref)
        dth_ref[:, :, :] = jnp.zeros_like(dth_ref)
        dph_ref[:, :] = jnp.zeros_like(dph_ref)

    c1oh = (c1_ref[:, 0][:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, O), 1)).astype(g_ref.dtype)
    c2oh = (c2_ref[:, 0][:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, O), 1)).astype(g_ref.dtype)
    x1t = x1_ref[:, :]
    x2t = x2_ref[:, :]

    if with_inputs:
        # Input cotangents for TRAINED inducing inputs (sparse models): dx1
        # accumulates across the (consecutive) inner j-grid; dx2 is written
        # as a per-(i,j) partial slab summed over i by the host wrapper,
        # because its natural output block would be revisited
        # non-consecutively across the grid.
        dx1_ref, dx2p_ref = io_refs

        @pl.when(j == 0)
        def _():
            dx1_ref[:, :] = jnp.zeros_like(dx1_ref)

        def tile_fn(x1v, x2v, w, mu, var, theta, phi):
            return _tile_forward(x1v, c1oh, x2v, c2oh, w, mu, var, theta,
                                 phi, twopi, phase_inside)

        _, vjp = jax.vjp(tile_fn, x1t, x2t, w_ref[:, :], mu_ref[:, :, :],
                         var_ref[:, :, :], th_ref[:, :, :], ph_ref[:, :])
        dx1, dx2, dw, dmu, dvar, dth, dph = vjp(g_ref[:, :])
        dx1_ref[:, :] += dx1
        # partial slab stored TRANSPOSED, (D, T): tiny D minor would be
        # lane-padded to 128 in HBM (CLAUDE.md layout rule — up to 128×
        # blowup on 1-D inducing grids)
        dx2p_ref[0, :, :] = dx2.T
    else:
        def tile_fn(w, mu, var, theta, phi):
            return _tile_forward(x1t, c1oh, x2t, c2oh, w, mu, var, theta,
                                 phi, twopi, phase_inside)

        _, vjp = jax.vjp(tile_fn, w_ref[:, :], mu_ref[:, :, :],
                         var_ref[:, :, :], th_ref[:, :, :], ph_ref[:, :])
        dw, dmu, dvar, dth, dph = vjp(g_ref[:, :])
    dw_ref[:, :] += dw
    dmu_ref[:, :, :] += dmu
    dvar_ref[:, :, :] += dvar
    dth_ref[:, :, :] += dth
    dph_ref[:, :] += dph


def _pad(a, mult, axis, value=0.0):
    n = a.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return a
    pad = [(0, 0)] * a.ndim
    pad[axis] = (0, rem)
    return jnp.pad(a, pad, constant_values=value)


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11))
def mosm_gram(x1, c1, x2, c2, w, mu, var, theta, phi, twopi, phase_inside,
              input_grads=False):
    """MOSM Gram via the fused Pallas kernel; differentiable w.r.t. the
    kernel parameters. With input_grads=True the backward kernel also emits
    x1/x2 cotangents (needed when x is TRAINED — sparse models' inducing
    points); the default skips that work because training data is constant
    (array args cannot be nondiff_argnums under jit)."""
    return _mosm_gram_impl(x1, c1, x2, c2, w, mu, var, theta, phi, twopi, phase_inside)


def _specs(O, Q, D, dtype):
    param_specs = [
        pl.BlockSpec((O, Q), lambda i, j: (0, 0)),
        pl.BlockSpec((O, Q, D), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((O, Q, D), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((O, Q, D), lambda i, j: (0, 0, 0)),
        pl.BlockSpec((O, Q), lambda i, j: (0, 0)),
    ]
    return param_specs


def _mosm_gram_impl(x1, c1, x2, c2, w, mu, var, theta, phi, twopi, phase_inside):
    N, D = x1.shape
    M = x2.shape[0]
    O, Q = w.shape
    dtype = w.dtype                    # output (HBM) dtype — bf16 stays bf16
    cdtype = _compute_dtype(dtype)     # in-tile math dtype

    x1p = _pad(x1.astype(cdtype), TILE, 0)
    x2p = _pad(x2.astype(cdtype), TILE, 0)
    c1p = _pad(c1.astype(jnp.int32).reshape(-1, 1), TILE, 0)
    c2p = _pad(c2.astype(jnp.int32).reshape(-1, 1), TILE, 0)
    Np, Mp = x1p.shape[0], x2p.shape[0]

    grid = (Np // TILE, Mp // TILE)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, twopi=twopi, phase_inside=phase_inside, O=O),
        out_shape=jax.ShapeDtypeStruct((Np, Mp), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, D), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, D), lambda i, j: (j, 0)),
            pl.BlockSpec((TILE, 1), lambda i, j: (j, 0)),
        ] + _specs(O, Q, D, cdtype),
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j)),
        interpret=_interpret(),
    )(x1p, c1p, x2p, c2p, *(p.astype(cdtype) for p in (w, mu, var, theta, phi)))
    return out[:N, :M]


def _mosm_gram_fwd(x1, c1, x2, c2, w, mu, var, theta, phi, twopi,
                   phase_inside, input_grads=False):
    out = _mosm_gram_impl(x1, c1, x2, c2, w, mu, var, theta, phi, twopi, phase_inside)
    return out, (x1, c1, x2, c2, w, mu, var, theta, phi)


def _mosm_gram_bwd(twopi, phase_inside, input_grads, res, g):
    x1, c1, x2, c2, w, mu, var, theta, phi = res
    N, D = x1.shape
    M = x2.shape[0]
    O, Q = w.shape
    pack_dtype = w.dtype
    dtype = _compute_dtype(pack_dtype)
    w, mu, var, theta, phi = (p.astype(dtype) for p in (w, mu, var, theta, phi))

    T = BWD_TILE
    x1p = _pad(x1.astype(dtype), T, 0)
    x2p = _pad(x2.astype(dtype), T, 0)
    # padded rows of g are zero, so the padded points (channel id 0)
    # contribute zero cotangent
    c1p = _pad(c1.astype(jnp.int32).reshape(-1, 1), T, 0)
    c2p = _pad(c2.astype(jnp.int32).reshape(-1, 1), T, 0)
    gp = _pad(_pad(g.astype(dtype), T, 0), T, 1)
    Np, Mp = x1p.shape[0], x2p.shape[0]

    grid = (Np // T, Mp // T)
    zero = lambda i, j: tuple([0] * 2)
    zero3 = lambda i, j: tuple([0] * 3)
    out_shape = [
        jax.ShapeDtypeStruct((O, Q), dtype),
        jax.ShapeDtypeStruct((O, Q, D), dtype),
        jax.ShapeDtypeStruct((O, Q, D), dtype),
        jax.ShapeDtypeStruct((O, Q, D), dtype),
        jax.ShapeDtypeStruct((O, Q), dtype),
    ]
    out_specs = [
        pl.BlockSpec((O, Q), zero),
        pl.BlockSpec((O, Q, D), zero3),
        pl.BlockSpec((O, Q, D), zero3),
        pl.BlockSpec((O, Q, D), zero3),
        pl.BlockSpec((O, Q), zero),
    ]
    if input_grads:
        out_shape += [
            jax.ShapeDtypeStruct((Np, D), dtype),            # dx1
            jax.ShapeDtypeStruct((Np // T, D, Mp), dtype),   # dx2 partials, transposed
        ]
        out_specs += [
            pl.BlockSpec((T, D), lambda i, j: (i, 0)),
            pl.BlockSpec((1, D, T), lambda i, j: (i, 0, j)),
        ]
    douts = pl.pallas_call(
        functools.partial(_bwd_kernel, twopi=twopi, phase_inside=phase_inside,
                          O=O, with_inputs=input_grads),
        out_shape=tuple(out_shape),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, D), lambda i, j: (i, 0)),
            pl.BlockSpec((T, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((T, D), lambda i, j: (j, 0)),
            pl.BlockSpec((T, 1), lambda i, j: (j, 0)),
        ] + _specs(O, Q, D, dtype) + [
            pl.BlockSpec((T, T), lambda i, j: (i, j)),
        ],
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
        out_specs=tuple(out_specs),
    )(x1p, c1p, x2p, c2p, w, mu, var, theta, phi, gp)
    if input_grads:
        dx1 = douts[5][:N].astype(x1.dtype)
        dx2 = jnp.sum(douts[6], axis=0).T[:M].astype(x2.dtype)
        douts = douts[:5]
    else:
        dx1 = jnp.zeros_like(x1)
        dx2 = jnp.zeros_like(x2)
    zeros_c1 = jnp.zeros_like(c1)
    zeros_c2 = jnp.zeros_like(c2)
    return (dx1, zeros_c1, dx2, zeros_c2) + tuple(
        d.astype(pack_dtype) for d in douts)


mosm_gram.defvjp(_mosm_gram_fwd, _mosm_gram_bwd)


# -- materialization-free Gram application ----------------------------------
# K @ V and low-rank-cotangent parameter gradients without ever storing the
# N×N Gram in HBM: the tiles live only in VMEM. This is what lifts exact
# inference past the O(N²) memory wall (BBMM-style iterative solvers consume
# only these two primitives).

def _matvec_kernel(x1_ref, c1_ref, x2_ref, c2_ref, w_ref, mu_ref, var_ref,
                   th_ref, ph_ref, v_ref, out_ref, *, twopi, phase_inside, O):
    j = pl.program_id(1)

    @pl.when(j == 0)
    def _():
        out_ref[:, :] = jnp.zeros_like(out_ref)

    c1oh = (c1_ref[:, 0][:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, O), 1)).astype(out_ref.dtype)
    c2oh = (c2_ref[:, 0][:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, O), 1)).astype(out_ref.dtype)
    K_tile = _tile_forward(x1_ref[:, :], c1oh, x2_ref[:, :], c2oh,
                           w_ref[:, :], mu_ref[:, :, :], var_ref[:, :, :],
                           th_ref[:, :, :], ph_ref[:, :], twopi, phase_inside)
    out_ref[:, :] += jnp.dot(K_tile, v_ref[:, :], preferred_element_type=out_ref.dtype)


def mosm_gram_matvec(x1, c1, x2, c2, w, mu, var, theta, phi, twopi, phase_inside, V):
    """Compute K @ V in (TILE, TILE) VMEM tiles; K is never materialized.

    V has shape (M, R); R should be lane-friendly (pad to a multiple of 128
    for best throughput — correctness holds for any R).
    """
    N, D = x1.shape
    M, R = V.shape
    O, Q = w.shape
    # matvecs feed CG/Lanczos: run and return in the solve dtype (f32 for
    # sub-f32 configs, mirroring ops/linalg._solve_dtype)
    dtype = _compute_dtype(w.dtype)
    w, mu, var, theta, phi = (p.astype(dtype) for p in (w, mu, var, theta, phi))

    x1p = _pad(x1.astype(dtype), TILE, 0)
    x2p = _pad(x2.astype(dtype), TILE, 0)
    c1p = _pad(c1.astype(jnp.int32).reshape(-1, 1), TILE, 0)
    c2p = _pad(c2.astype(jnp.int32).reshape(-1, 1), TILE, 0)
    Vp = _pad(V.astype(dtype), TILE, 0)
    Np, Mp = x1p.shape[0], x2p.shape[0]

    grid = (Np // TILE, Mp // TILE)
    out = pl.pallas_call(
        functools.partial(_matvec_kernel, twopi=twopi, phase_inside=phase_inside, O=O),
        out_shape=jax.ShapeDtypeStruct((Np, R), dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, D), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((TILE, D), lambda i, j: (j, 0)),
            pl.BlockSpec((TILE, 1), lambda i, j: (j, 0)),
        ] + _specs(O, Q, D, dtype) + [
            pl.BlockSpec((TILE, R), lambda i, j: (j, 0)),
        ],
        out_specs=pl.BlockSpec((TILE, R), lambda i, j: (i, 0)),
        interpret=_interpret(),
    )(x1p, c1p, x2p, c2p, w, mu, var, theta, phi, Vp)
    return out[:N, :]


def _lowrank_vjp_kernel(x1_ref, c1_ref, x2_ref, c2_ref, w_ref, mu_ref, var_ref,
                        th_ref, ph_ref, a_ref, b_ref, dw_ref, dmu_ref, dvar_ref,
                        dth_ref, dph_ref, *, twopi, phase_inside, O):
    i = pl.program_id(0)
    j = pl.program_id(1)

    @pl.when((i == 0) & (j == 0))
    def _():
        dw_ref[:, :] = jnp.zeros_like(dw_ref)
        dmu_ref[:, :, :] = jnp.zeros_like(dmu_ref)
        dvar_ref[:, :, :] = jnp.zeros_like(dvar_ref)
        dth_ref[:, :, :] = jnp.zeros_like(dth_ref)
        dph_ref[:, :] = jnp.zeros_like(dph_ref)

    c1oh = (c1_ref[:, 0][:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, O), 1)).astype(a_ref.dtype)
    c2oh = (c2_ref[:, 0][:, None] == jax.lax.broadcasted_iota(jnp.int32, (1, O), 1)).astype(a_ref.dtype)
    x1t = x1_ref[:, :]
    x2t = x2_ref[:, :]
    # cotangent tile from the low-rank factors, formed in VMEM
    g_tile = jnp.dot(a_ref[:, :], b_ref[:, :].T, preferred_element_type=a_ref.dtype)

    def tile_fn(w, mu, var, theta, phi):
        return _tile_forward(x1t, c1oh, x2t, c2oh, w, mu, var, theta, phi,
                             twopi, phase_inside)

    _, vjp = jax.vjp(tile_fn, w_ref[:, :], mu_ref[:, :, :], var_ref[:, :, :],
                     th_ref[:, :, :], ph_ref[:, :])
    dw, dmu, dvar, dth, dph = vjp(g_tile)
    dw_ref[:, :] += dw
    dmu_ref[:, :, :] += dmu
    dvar_ref[:, :, :] += dvar
    dth_ref[:, :, :] += dth
    dph_ref[:, :] += dph


def mosm_gram_lowrank_vjp(x1, c1, x2, c2, w, mu, var, theta, phi, twopi,
                          phase_inside, A, B):
    """Parameter cotangents for dK = A Bᵀ without materializing dK.

    A (N, R), B (M, R). Used by iterative exact inference where the LML
    cotangent is the low-rank ½g(ααᵀ − R⁻¹ Σ u_r z_rᵀ).
    """
    N, D = x1.shape
    M = x2.shape[0]
    O, Q = w.shape
    pack_dtype = w.dtype
    dtype = _compute_dtype(pack_dtype)
    w, mu, var, theta, phi = (p.astype(dtype) for p in (w, mu, var, theta, phi))
    R = A.shape[1]

    T = BWD_TILE
    x1p = _pad(x1.astype(dtype), T, 0)
    x2p = _pad(x2.astype(dtype), T, 0)
    c1p = _pad(c1.astype(jnp.int32).reshape(-1, 1), T, 0)
    c2p = _pad(c2.astype(jnp.int32).reshape(-1, 1), T, 0)
    Ap = _pad(A.astype(dtype), T, 0)
    Bp = _pad(B.astype(dtype), T, 0)
    Np, Mp = x1p.shape[0], x2p.shape[0]

    grid = (Np // T, Mp // T)
    zero = lambda i, j: (0, 0)
    zero3 = lambda i, j: (0, 0, 0)
    douts = pl.pallas_call(
        functools.partial(_lowrank_vjp_kernel, twopi=twopi, phase_inside=phase_inside, O=O),
        out_shape=(
            jax.ShapeDtypeStruct((O, Q), dtype),
            jax.ShapeDtypeStruct((O, Q, D), dtype),
            jax.ShapeDtypeStruct((O, Q, D), dtype),
            jax.ShapeDtypeStruct((O, Q, D), dtype),
            jax.ShapeDtypeStruct((O, Q), dtype),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((T, D), lambda i, j: (i, 0)),
            pl.BlockSpec((T, 1), lambda i, j: (i, 0)),
            pl.BlockSpec((T, D), lambda i, j: (j, 0)),
            pl.BlockSpec((T, 1), lambda i, j: (j, 0)),
        ] + _specs(O, Q, D, dtype) + [
            pl.BlockSpec((T, R), lambda i, j: (i, 0)),
            pl.BlockSpec((T, R), lambda i, j: (j, 0)),
        ],
        out_specs=(
            pl.BlockSpec((O, Q), zero),
            pl.BlockSpec((O, Q, D), zero3),
            pl.BlockSpec((O, Q, D), zero3),
            pl.BlockSpec((O, Q, D), zero3),
            pl.BlockSpec((O, Q), zero),
        ),
        interpret=_interpret(),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )(x1p, c1p, x2p, c2p, w, mu, var, theta, phi, Ap, Bp)
    return tuple(d.astype(pack_dtype) for d in douts)
