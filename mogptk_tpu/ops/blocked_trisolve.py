"""MXU-blocked triangular solves with many right-hand sides.

XLA:TPU's solve_triangular expander is the bottleneck of the exact
closed-form LML gradient (ops/linalg._lml_bwd computes K⁻¹ through two
N-RHS triangular solves; measured ~0.55 s of the 0.70 s exact-grad step at
N=16k). This implementation is the TRSM analog of ops/blocked_cholesky.py:
invert each B×B diagonal panel once (cheap, "highest" precision), then the
substitution sweep is one large MXU GEMM per block row at configurable
precision — the same left-looking structure, the same accuracy reasoning
(panels carry the cancellation-sensitive work; the accumulation GEMMs run
at "high" = bf16x3, ~f32-quality).

Semantics match jax.scipy.linalg.solve_triangular(L, B, lower=...) for a
full (possibly non-unit) triangular matrix and 2-D B.
"""
import functools

import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _dot(a, b, precision):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               precision=precision)


def panel_inverses(L, lower=True, block_size=1024, panel_precision="highest"):
    """Explicit inverses of the B×B diagonal panels of a triangular matrix,
    in solve order. Hoist out of loops that solve against the same factor
    repeatedly (e.g. the column-blocked K⁻¹ scan in ops/linalg._lml_bwd)."""
    n = L.shape[-1]
    Bs = int(min(block_size, n))
    nb = -(-n // Bs)
    order = range(nb) if lower else range(nb - 1, -1, -1)
    with jax.default_matmul_precision(panel_precision):
        return [jsl.solve_triangular(
                    L[i * Bs:min((i + 1) * Bs, n), i * Bs:min((i + 1) * Bs, n)],
                    jnp.eye(min(Bs, n - i * Bs), dtype=L.dtype), lower=lower)
                for i in order]


def blocked_trisolve(L, B, lower=True, block_size=1024,
                     update_precision="high", panel_precision="highest",
                     invs=None):
    """Solve T x = B for triangular T (T = L if lower else treat L as upper).

    Left-looking block forward/back-substitution: at block row i,
    B_i ← B_i − T[i, others] @ X[others] (one MXU GEMM over the already-
    solved prefix), then X_i = T_ii⁻¹ B_i via the explicit panel inverse
    (pass `invs` from panel_inverses() to reuse them across solves).
    """
    n = L.shape[-1]
    if L.ndim != 2 or B.ndim != 2:
        raise ValueError("blocked_trisolve expects 2-D L and B")
    Bs = int(min(block_size, n))
    nb = -(-n // Bs)
    npad = nb * Bs
    if invs is None:
        invs = panel_inverses(L, lower=lower, block_size=block_size,
                              panel_precision=panel_precision)
    if npad != n:
        pad = npad - n
        # zero-pad only: the sweep never reads L's diagonal blocks (the
        # panel solves go through `invs`, whose padded tail gets the
        # identity below), and padded off-diagonal rows contribute 0
        L = jnp.pad(L, ((0, pad), (0, pad)))
        B = jnp.pad(B, ((0, pad), (0, 0)))
        k = -1 if lower else 0
        invs = list(invs)
        invs[k] = jnp.pad(invs[k], ((0, pad), (0, pad)))
        invs[k] = invs[k].at[jnp.arange(Bs - pad, Bs),
                             jnp.arange(Bs - pad, Bs)].set(1.0)

    # X lives in ONE buffer updated in place: rebuilding the solved prefix
    # by concatenation each block row kept O(nb) (n, r) temps live — at a
    # wide RHS (the 16k-factor, 8k-RHS predict solve) that blew past HBM
    order = range(nb) if lower else range(nb - 1, -1, -1)
    X = jnp.zeros_like(B)
    for step, i in enumerate(order):
        r0 = i * Bs
        Bi = B[r0:r0 + Bs]
        if step > 0:
            if lower:
                done = X[:r0]                                 # (i·Bs, r)
                Ti = L[r0:r0 + Bs, :r0]                       # (Bs, i·Bs)
            else:
                done = X[r0 + Bs:]
                Ti = L[r0:r0 + Bs, r0 + Bs:]
            Bi = Bi - _dot(Ti, done, update_precision)
        Xi = _dot(invs[step], Bi, update_precision)
        X = jax.lax.dynamic_update_slice(X, Xi, (r0, 0))
    return X[:n]


def blocked_cho_solve(L, B, invs=None, **kw):
    """K⁻¹B given the lower Cholesky factor L: forward then back solve.

    invs (optional) are the LOWER-sweep panel inverses from
    panel_inverses(L, lower=True); the upper sweep's inverses are derived
    from them ((L.T)_ii⁻¹ = (L_ii⁻¹)ᵀ, reversed into solve order) — computed
    once here either way, halving the 2·nb sequential panel inversions a
    naive double solve pays."""
    if invs is None:
        invs = panel_inverses(L, lower=True,
                              block_size=kw.get("block_size", 1024),
                              panel_precision=kw.get("panel_precision",
                                                     "highest"))
    Z = blocked_trisolve(L, B, lower=True, invs=invs, **kw)
    invs_up = [inv.T for inv in reversed(invs)]
    return blocked_trisolve(L.T, Z, lower=False, invs=invs_up, **kw)


def blocked_tri_inverse(L, block_size=1024, update_precision="high",
                        panel_precision="highest", invs=None):
    """Explicit W = L⁻¹ for lower-triangular L, blocked for the MXU.

    Row-block recursion: W_ii = L_ii⁻¹ (the panel inverses) and
    W[i, :i] = −W_ii · (L[i, :i] @ W[:i, :i]) — one (B, iB)×(iB, iB) GEMM
    pair per block row, ≈ n³/3 MACs total. This is the cheap half of the
    inverse-from-factor route for the exact closed-form LML gradient
    (spd_inverse_from_factor): computing K⁻¹ as WᵀW costs ≈ n³/2 MACs
    total versus the ≈ n³ of the column-blocked double-TRSM sweep it
    replaces (ops/linalg._dense_lml_cotangents), with W reused across
    every column instead of re-solved per block.

    Requires n % block_size == 0 (callers: the factorization's effective
    block always divides the padded n). Returns W with its strict upper
    zero.
    """
    n = L.shape[-1]
    Bs = int(min(block_size, n))
    if n % Bs:
        raise ValueError("blocked_tri_inverse needs n %% block_size == 0")
    nb = n // Bs
    if invs is None:
        invs = panel_inverses(L, lower=True, block_size=Bs,
                              panel_precision=panel_precision)
    # ONE preallocated buffer updated with dynamic_update_slice: XLA keeps
    # the (dead-temp) buffer in place, so each step writes only its (Bs,
    # r0+Bs) row strip. The earlier concatenate chain rebuilt the growing W
    # every block row — Σ (iBs)² read+write ≈ 22 GB of pure copy traffic at
    # n=16k (the bulk of the measured 125 ms spd_inverse_from_factor;
    # benchmarks/closed_decomp.py).
    W = jnp.zeros((n, n), L.dtype)
    W = jax.lax.dynamic_update_slice(W, invs[0], (0, 0))
    for i in range(1, nb):
        r0 = i * Bs
        strict = -_dot(invs[i], _dot(L[r0:r0 + Bs, :r0], W[:r0, :r0],
                                     update_precision), update_precision)
        W = jax.lax.dynamic_update_slice(
            W, jnp.concatenate([strict, invs[i]], axis=1), (r0, 0))
    return W


def _fold_ij(r, c, nb):
    """Lower-triangle pair from the folded (nb/2, nb+1) rectangle: row r
    holds diagonal-offset q = r (its nb - r pairs) followed by offset
    q = nb-1-r (its r + 1 pairs) - every rectangle cell names exactly one
    (i, j) with j <= i. Pure arithmetic/select so it lowers on the scalar
    core as an index map."""
    cond = c < nb - r
    q = jnp.where(cond, r, nb - 1 - r)
    j = jnp.where(cond, c, c - (nb - r))
    return j + q, j


def _syrk_lower_kernel(wi_ref, wj_ref, out_ref, acc_ref, *, nb, nk, kpb):
    """Block-lower W^T W: out(i,j) = sum_k W[k-rows, i-cols]^T W[k-rows,
    j-cols], (i, j) from the triangular fold (no upper-triangle programs),
    k streamed innermost, manual bf16x3 (the "high" recipe)."""
    r = pl.program_id(0)
    c = pl.program_id(1)
    k = pl.program_id(2)
    i, _ = _fold_ij(r, c, nb)

    @pl.when(k == 0)
    def _():
        acc_ref[:, :] = jnp.zeros_like(acc_ref)

    # W is lower triangular: row chunks k < i*kpb against column block i
    # are zero - skip their MACs (their DMA is the grid's remaining waste)
    @pl.when(k >= i * kpb)
    def _():
        from .blocked_cholesky import _bf16x3_terms
        a = wi_ref[:, :].astype(jnp.float32)
        b = wj_ref[:, :].astype(jnp.float32)
        acc = acc_ref[:, :]
        for t in _bf16x3_terms(a, b, ((0,), (0,))):
            acc += t
        acc_ref[:, :] = acc

    @pl.when(k == nk - 1)
    def _():
        out_ref[:, :] = acc_ref[:, :]


def syrk_lower(W, block=1024, k_chunk=512):
    """Block-lower part of W^T W as one streamed Pallas kernel (TPU, f32,
    block | n, n/block even). The folded (nb/2)(nb+1) grid runs ONLY
    lower-triangle pairs, and 1024^2 output tiles cut the HBM read traffic
    versus the per-(i,j)-pair XLA dots (traffic ~ MACs/B_out). Returns
    (n, n) with the STRICT upper blocks uninitialized - callers mask or
    mirror, never read them."""
    n = W.shape[0]
    nb = n // block
    nk = n // k_chunk
    kpb = block // k_chunk
    vmem = 4 * (block * block + 4 * k_chunk * block + block * block)
    return pl.pallas_call(
        functools.partial(_syrk_lower_kernel, nb=nb, nk=nk, kpb=kpb),
        out_shape=jax.ShapeDtypeStruct((n, n), jnp.float32),
        grid=(nb // 2, nb + 1, nk),
        in_specs=[
            pl.BlockSpec((k_chunk, block),
                         lambda r, c, k: (k, _fold_ij(r, c, nb)[0])),
            pl.BlockSpec((k_chunk, block),
                         lambda r, c, k: (k, _fold_ij(r, c, nb)[1])),
        ],
        out_specs=pl.BlockSpec((block, block),
                               lambda r, c, k: _fold_ij(r, c, nb)),
        scratch_shapes=[pltpu.VMEM((block, block), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=max(48 * 1024 * 1024, vmem + (vmem >> 2))),
        interpret=jax.default_backend() == "cpu",
    )(W, W)


def _syrk_lower_applicable(n, dtype, update_precision, block=1024):
    from ..gpr.config import config
    if getattr(config, "pallas_syrk", True) is False:
        return False
    if update_precision != "high":      # the kernel IS the bf16x3 recipe
        return False
    if dtype != jnp.float32 or n % block or n < 2 * block:
        return False
    if (n // block) % 2:                # the folded grid needs nb even
        return False
    return jax.default_backend() == "tpu"


def spd_inverse_from_factor(L, block_size=1024, update_precision="high",
                            panel_precision="highest", invs=None):
    """K⁻¹ from the lower Cholesky factor L, as WᵀW with W = L⁻¹.

    The (i, j) lower block (i ≥ j) is W[i:, i]ᵀ @ W[i:, j] — only the
    lower triangle is computed (≈ n³/6 MACs; the syrk exploits symmetry)
    and mirrored with one masked transpose pass. End to end ≈ n³/2 MACs
    versus ≈ n³ for the double-TRSM column sweep, and every GEMM is a
    large MXU-saturating dot.

    Accuracy: the explicit triangular inverse is not backward-stable the
    way substitution is — for the jittered Gram factors this serves
    (closed-form ∂LML/∂K), the measured gradient error stays at the same
    order as the blocked-TRSM route (tests/test_linalg.py::
    test_spd_inverse_from_factor_*), because the B×B panels are jittered
    Gram diagonals and the off-diagonal growth is bounded by the same
    panel conditioning the TRSM-via-inverse route already relies on.
    """
    n = L.shape[-1]
    Bs = int(min(block_size, n))
    if n % Bs:
        raise ValueError("spd_inverse_from_factor needs n %% block_size == 0")
    nb = n // Bs
    W = blocked_tri_inverse(L, block_size=Bs,
                            update_precision=update_precision,
                            panel_precision=panel_precision, invs=invs)
    if _syrk_lower_applicable(n, W.dtype, update_precision):
        # streamed Pallas syrk: 1024² output tiles halve the HBM reads of
        # the per-pair dot loop below and the bf16x3 MACs ride the stream
        Kl = syrk_lower(W)
        Bm = 1024
    else:
        # lower blocks per column, assembled column-block-wise
        cols = []
        for j in range(nb):
            rows = [jnp.zeros((j * Bs, Bs), L.dtype)] if j else []
            for i in range(j, nb):
                r0 = i * Bs
                # K⁻¹_ij = Σ_{k ≥ i} W_kiᵀ W_kj (k < i terms vanish: W lower)
                blk = jax.lax.dot_general(
                    W[r0:, r0:r0 + Bs], W[r0:, j * Bs:(j + 1) * Bs],
                    (((0,), (0,)), ((), ())), precision=update_precision)
                rows.append(blk)
            cols.append(jnp.concatenate(rows, axis=0))
        Kl = jnp.concatenate(cols, axis=1)    # block-lower (diag blocks full)
        Bm = Bs
    rb = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0) // Bm
    cb = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1) // Bm
    strict = rb > cb
    return jnp.where(strict, Kl, jnp.zeros((), L.dtype)).T \
        + jnp.where(rb >= cb, Kl, jnp.zeros((), L.dtype))
