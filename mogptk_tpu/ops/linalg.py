"""Dense linear-algebra primitives for the GP compute path.

The reference delegates to torch.linalg (cholesky/cholesky_solve/
solve_triangular at mogptk/gpr/model.py:246,452,470). Here the same
capability maps onto XLA's blocked TPU implementations via jax.
`jittered_cholesky` reproduces the reference's relative-jitter strategy
(gpr/model.py:242-255): jitter is scaled by the mean of the diagonal. Under
jit, a failed factorization produces NaNs instead of raising; callers detect
NaN losses host-side and raise CholeskyException with diagnostics.
"""
import functools
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from .blocked_cholesky import blocked_cholesky


def cholesky(K, diag_shift=None, return_panel_invs=False, zero_upper=True,
             fused_trsm=False):
    """Lower-Cholesky factor, routed to the MXU-blocked implementation when
    the policy says so (gpr.config.blocked_cholesky_enabled: auto = TPU,
    2-D, n ≥ 4096 — where it measures ~3× XLA's expander), else
    jnp.linalg.cholesky. Both return NaN rows for non-PSD input.

    diag_shift (optional traced scalar, (...,1,1) for batched K, or an (n,)
    vector for 2-D K) factors K + diag(diag_shift); the blocked path applies
    it per diagonal panel in the factor dtype, so jitter survives even a
    bf16 Gram — and a vector shift carries the GP noise diagonal into the
    factorization without an N² HBM pass over the Gram. Sub-f32 K returns
    an f32 factor (ops/blocked_cholesky docstring; _solve_dtype).

    return_panel_invs=True returns (L, invs): the blocked factorization's
    diagonal-panel inverses for reuse in cholesky_solve(invs=...) — None
    whenever the blocked path didn't run or padded."""
    from ..gpr.config import config, blocked_cholesky_enabled
    vector_shift = (diag_shift is not None
                    and jnp.ndim(diag_shift) == 1 and K.ndim == 2)
    if blocked_cholesky_enabled(K.shape[-1], K.ndim, K.dtype):
        out = blocked_cholesky(
            K, block_size=config.blocked_cholesky_block,
            update_precision=config.blocked_cholesky_update_precision,
            diag_shift=(None if diag_shift is None else diag_shift
                        if vector_shift else jnp.reshape(diag_shift, ())),
            return_panel_invs=return_panel_invs, zero_upper=zero_upper,
            fused_trsm=fused_trsm and config.blocked_cholesky_fused_trsm)
        return out
    K = K.astype(_solve_dtype(K.dtype))
    if vector_shift:
        n = K.shape[-1]
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        K = K + jnp.where(r == c, jnp.asarray(diag_shift, K.dtype)[:, None],
                          jnp.zeros((), K.dtype))
    elif diag_shift is not None:
        K = K + jnp.asarray(diag_shift, K.dtype) * jnp.eye(K.shape[-1],
                                                           dtype=K.dtype)
    L = jnp.linalg.cholesky(K)
    return (L, None) if return_panel_invs else L


def split_bf16(K):
    """Error-compensated two-term bfloat16 split of an f32 array:
    hi = bf16(K), lo = bf16(K − hi). merge_bf16 reconstructs ~17 explicit
    mantissa bits (vs plain bf16's 8) — enough that the Exact LML lands at
    the reconstruction noise floor instead of bf16's Gram-rounding shift
    (ROADMAP #2). Same 4 bytes/entry as f32, so use it only where a Gram
    must PERSIST in a bf16 pipeline (checkpointed/user-held Grams);
    the in-place blocked Cholesky factorizes a dead-temp f32 Gram at the
    same 4 bytes/entry peak with full f32 accuracy."""
    hi = K.astype(jnp.bfloat16)
    lo = (K - hi.astype(K.dtype)).astype(jnp.bfloat16)
    return hi, lo


def merge_bf16(hi, lo, dtype=jnp.float32):
    """Reconstruct the f32 array from a split_bf16 (hi, lo) pair."""
    return hi.astype(dtype) + lo.astype(dtype)


def _sensitive(fn):
    """Run fn's matmuls at the scoped sensitive-product precision
    (gpr.config.sensitive_matmul_precision): factorizations and triangular
    solves subtract large like terms, and XLA:TPU's default bf16-pass f32
    matmuls lose exactly the digits the cancellation needs."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        from ..gpr.config import sensitive_matmul_scope
        with sensitive_matmul_scope():
            return fn(*args, **kwargs)
    return wrapped


@_sensitive
def jittered_cholesky(K, jitter=None, ladder=None, extra_diag=None,
                      ladder_base=None):
    """Cholesky factor of K with optional relative jitter added to the diagonal.

    jitter is relative: `jitter * mean(diag(K))` is added, matching the
    reference (mogptk/gpr/model.py:242-244).

    extra_diag (optional (n,) vector, 2-D K only) factors K + diag(extra_diag)
    with the vector applied INSIDE the factorization (vector diag_shift) —
    the noisy Gram never exists in HBM, and K stays an opaque engine output
    (see the diag-shifted LML variants below for why that matters on TPU).
    The relative-jitter base then uses mean(diag(K) + extra_diag), identical
    to materializing the sum first.

    ladder_base (optional float): when the model's relative jitter is already
    folded INTO extra_diag (so `jitter` is None here), the ladder's rung
    escalation would fall back to the hardcoded 1e-8 — pass the model's
    jitter as ladder_base so rungs keep scaling from it.

    ladder > 0 (default: config.jitter_ladder) escalates beyond the reference:
    each rung retries with 10× more jitter if the previous factorization is
    unusable — NaN entries (XLA's Cholesky of a non-PSD matrix yields NaN rows
    rather than raising), or a diagonal ratio min|Lii|/max|Lii| below
    1000·eps(dtype). The conditioning check matters as much as the NaN check:
    a *barely* successful factorization is finite forward but its backward
    pass contains L⁻¹, so the gradient overflows first (observed: f32 Titsias
    with 500 trained inducing points NaNs through the gradient, never through
    the factor). The retry is a `lax.cond`, so under jit only the needed
    factorizations execute. The ladder is a custom-VJP op: the rung-0
    factorization IS the returned factor on the happy path (no duplicate
    trial — the r02 design paid one full extra factorization per call), and
    the backward applies the explicit Cholesky-gradient formula to the
    final (usable) factor only, so a NaN'd early rung can never poison the
    gradient (the 0×NaN failure mode that forced the two-factorization
    design). Cost of rungs that never fire: two diag reductions + a cond.
    """
    if ladder is None:
        from ..gpr.config import config
        ladder = config.jitter_ladder
    # K is NOT upcast here: sub-f32 Grams flow into cholesky() as-is (the
    # blocked path upcasts per-tile in VMEM, diag_shift carries the jitter
    # in the factor dtype — adding 1e-8·diag to a bf16 K would round away)
    sd = _solve_dtype(K.dtype)
    if extra_diag is not None:
        if K.ndim != 2:
            raise ValueError("extra_diag requires a 2-D K")
        extra = jnp.asarray(extra_diag, sd).reshape(-1)
    else:
        extra = None

    base = jitter if jitter is not None else 0.0
    if int(ladder) <= 0:
        if extra is None:
            mean_diag = jnp.mean(
                jnp.diagonal(K, axis1=-2, axis2=-1).astype(sd),
                axis=-1)[..., None, None]
        else:
            mean_diag = jnp.mean(jnp.diagonal(K).astype(sd) + extra)
        return cholesky(K, diag_shift=_shift(base if base != 0.0 else None,
                                             extra, mean_diag))

    rung_base = base if base != 0.0 else (
        ladder_base if ladder_base else 1e-8)
    extra_arg = jnp.zeros(0, sd) if extra is None else extra
    return _ladder_cholesky(K, extra_arg, float(base), int(ladder),
                            float(rung_base))


def _shift(scalar, e, m):
    """cholesky() diag_shift: optional scalar relative-jitter value (times
    the mean-diagonal base m) combined with the optional extra vector."""
    if e is None:
        return None if scalar is None else scalar * m
    return e if scalar is None else e + scalar * m


def _unusable(L, tol):
    d = jnp.abs(jnp.diagonal(L, axis1=-2, axis2=-1))
    return (jnp.any(jnp.isnan(L))
            | jnp.any(jnp.min(d, axis=-1) <= tol * jnp.max(d, axis=-1)))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def _ladder_cholesky(K, extra, base, ladder, rung_base):
    """Jitter-laddered Cholesky as one custom-VJP op.

    extra is an (n,) vector diag shift, or a zero-length sentinel when K is
    batched / has no vector shift. base/ladder/rung_base are static Python
    numbers. Gradients flow to K (dense, symmetrized) and extra
    (= diag(dK)); the relative-jitter shift itself contributes none (it is
    selected data-dependently — same semantics as the r02 ladder, whose
    final factorization used a stop-gradient mean diagonal)."""
    return _ladder_fwd(K, extra, base, ladder, rung_base)[0]


@_sensitive
def _ladder_fwd(K, extra, base, ladder, rung_base):
    sd = _solve_dtype(K.dtype)
    e = extra if extra.size else None
    if e is not None:
        md = jnp.mean(jnp.diagonal(K).astype(sd) + e)
    else:
        md = jnp.mean(jnp.diagonal(K, axis1=-2, axis2=-1).astype(sd),
                      axis=-1)[..., None, None]
    tol = 1000.0 * jnp.finfo(sd).eps
    L = cholesky(K, diag_shift=_shift(base if base != 0.0 else None, e, md))
    for i in range(int(ladder)):
        rung = rung_base * (10.0 ** (i + 1))
        L = jax.lax.cond(
            _unusable(L, tol),
            lambda L_, rung=rung: cholesky(K, diag_shift=_shift(rung, e, md)),
            lambda L_: L_,
            L)
    # the extra sentinel keeps its (static) length so the backward knows
    # whether a vector-shift cotangent is owed
    return L, (L, jnp.zeros(0, K.dtype), jnp.zeros(extra.shape, extra.dtype))


@_sensitive
def _ladder_bwd(base, ladder, rung_base, res, gL):
    """Explicit Cholesky VJP (Murray 2016) from the final factor:
    dK = ½(G + Gᵀ), G = L⁻ᵀ Φ(Lᵀ tril(gL)) L⁻¹ with Φ = tril, diag halved.
    Two triangular solves + one GEMM — the same cost shape as autodiff
    through the factorization, but computable from L alone."""
    L, k_sent, e_sent = res
    gL = jnp.tril(gL)
    middle = jnp.matmul(jnp.swapaxes(L, -1, -2), gL, precision="highest")
    middle = jnp.tril(middle)
    diag = jnp.diagonal(middle, axis1=-2, axis2=-1)
    n = L.shape[-1]
    r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
    middle = jnp.where(r == c, 0.5 * diag[..., None, :], middle)
    # G = L⁻ᵀ middle L⁻¹: T1 = L⁻ᵀ middle, then G = (L⁻ᵀ T1ᵀ)ᵀ = T1 L⁻¹
    T1 = jsl.solve_triangular(L, middle, lower=True, trans=1)
    G = jnp.swapaxes(
        jsl.solve_triangular(L, jnp.swapaxes(T1, -1, -2), lower=True,
                             trans=1), -1, -2)
    dK = 0.5 * (G + jnp.swapaxes(G, -1, -2))
    dextra = (jnp.diagonal(dK).astype(e_sent.dtype) if e_sent.size
              else jnp.zeros(0, e_sent.dtype))
    return dK.astype(k_sent.dtype), dextra


_ladder_cholesky.defvjp(_ladder_fwd, _ladder_bwd)


def _static_ge(a, b):
    """a >= b for shape dims that may be SYMBOLIC (jax.export shape
    polymorphism): an inconclusive comparison means the dim is unbounded,
    so routing policies conservatively answer False (expander path)."""
    try:
        return bool(a >= b)
    except Exception:
        return False


def _blocked_trisolve_worthwhile(L, B):
    """Route many-RHS triangular solves to the MXU-blocked TRSM
    (ops/blocked_trisolve.py) when the GEMM sweep amortizes the panel
    inverses: either a big factor with a moderately wide RHS (e.g.
    Exact.predict_f's N×M cross-solve), or a small factor with R ≫ n —
    the sparse models' Luu⁻¹Kuf whitening solve has n=M≈1k but R=N≈16k,
    where one n×n inverse + one MXU GEMM replaces an n×R expander solve."""
    if B.ndim != 2:
        return False
    from ..gpr.config import blocked_cholesky_enabled, config
    import jax as _jax
    n, R = L.shape[-1], B.shape[1]
    if _static_ge(R, 64) and blocked_cholesky_enabled(n, L.ndim, L.dtype):
        return True
    if L.ndim != 2 or L.dtype not in (jnp.float32, jnp.float64):
        return False
    if config.blocked_cholesky is not None and not config.blocked_cholesky:
        return False
    on_tpu = config.blocked_cholesky or _jax.default_backend() == "tpu"
    return bool(on_tpu) and _static_ge(n, 256) and _static_ge(R, 4 * n)


def _trisolve_block(n):
    """Panel width for routed triangular solves: the B×B diagonal-panel
    inversions go through XLA's sequential expander (cost ≳ B³), so small
    factors — the sparse models' M≈1k whitening solves — use 256² panels
    (16× cheaper inversions; the substitution sweep stays pure GEMMs).
    Large factors keep 1024 so the sweep GEMMs dominate."""
    try:
        small = n <= 2048
    except Exception:       # symbolic dim (jax.export)
        small = False
    return 256 if small else 1024


@_sensitive
def solve_triangular(L, B, lower=True, trans=False):
    if _blocked_trisolve_worthwhile(L, B):
        from .blocked_trisolve import blocked_trisolve
        bs = _trisolve_block(L.shape[-1])
        if trans:
            # op(L)=Lᵀ: solve against the transposed triangle
            return blocked_trisolve(L.T, B, lower=not lower, block_size=bs)
        return blocked_trisolve(L, B, lower=lower, block_size=bs)
    return jsl.solve_triangular(L, B, lower=lower, trans=1 if trans else 0)


@_sensitive
def trisolve_lower(L, B):
    if _blocked_trisolve_worthwhile(L, B):
        from .blocked_trisolve import blocked_trisolve
        return blocked_trisolve(L, B, lower=True)
    return jsl.solve_triangular(L, B, lower=True)


@_sensitive
def cholesky_solve(L, B, invs=None):
    """Solve K x = B given the lower Cholesky factor L of K.

    invs: diagonal-panel inverses from cholesky(return_panel_invs=True).
    With them the blocked substitution sweep is worthwhile at ANY RHS width
    (its usual cost is the 2·nb sequential panel inversions, ~4.5 ms at
    N=16k — already paid by the factorization), so narrow solves like the
    LML's (1+R)-column batch skip XLA's expander (5.8 → ~2 ms).

    On TPU the invs= path routes narrow solves to a fused Pallas kernel
    that is NOT differentiable (it raises a descriptive error under
    autodiff); the custom-VJP LML forwards that call it never differentiate
    through the solve. Differentiable callers should pass invs=None or run
    where the blocked substitution is used (CPU, wide RHS, unaligned N)."""
    if invs is not None and L.ndim == 2 and B.ndim == 2:
        bs = invs[0].shape[-1]
        if jax.default_backend() != "cpu":
            # TPU: the LML's narrow solve runs both substitution sweeps as
            # ONE pallas kernel (RHS resident in VMEM, L streamed by DMA,
            # no Lᵀ materialization). Only reached from custom-VJP LML
            # forwards, which never differentiate through the solve (the
            # kernel has no transpose rule); CPU keeps the blocked path so
            # generic autodiff through cholesky_solve stays available.
            from .pallas_solve import fused_cho_solve, fused_solve_applicable
            if fused_solve_applicable(L, B, invs, block_size=bs):
                return fused_cho_solve(L, invs, B, block_size=bs)
        from .blocked_trisolve import blocked_cho_solve
        return blocked_cho_solve(L, B, invs=invs, block_size=bs)
    if _blocked_trisolve_worthwhile(L, B):
        from .blocked_trisolve import blocked_cho_solve
        return blocked_cho_solve(L, B)
    return jsl.cho_solve((L, True), B)


def _solve_dtype(dtype):
    """Mixed precision: a bf16/f16 Gram may feed the factorization, but the
    factorization itself is numerically meaningless below f32 — upcast there.
    (`use_half_precision` keeps params and the Gram assembly in bf16 for MXU
    throughput and HBM halving; the O(N³) solve runs f32.)"""
    if dtype in (jnp.bfloat16, jnp.float16):
        return jnp.float32
    return dtype


@_sensitive
def _chol_lml(K, diag, y):
    """Shared LML forward core: factor K (+ optional vector diag shift
    applied inside the factorization), solve y. Returns (val, L, alpha, yc)."""
    yc = y.astype(_solve_dtype(y.dtype))
    shift = None if diag is None else diag.astype(_solve_dtype(K.dtype))
    # custom-VJP forward: nothing differentiates through the factorization,
    # so the fused below-TRSM pipeline is legal; zero_upper=False because
    # every consumer of this L (solves, diagonal, the closed-form backward's
    # inverse-from-factor) reads only the lower triangle
    L, invs = cholesky(K, diag_shift=shift, return_panel_invs=True,
                       zero_upper=False, fused_trsm=True)
    alpha = cholesky_solve(L, yc, invs=invs)
    val = -jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * jnp.sum(yc * alpha)
    return val, L, alpha, yc, invs


@_sensitive
def _chol_lml_probes(K, diag, y, num_probes, seed):
    """Shared stochastic-LML forward core: the Hutchinson probes are solved
    WITH y in one batched cho_solve — the probes are seed-fixed (independent
    of the cotangent), and a triangular solve's cost is dominated by the
    sequential panel traversal, not the RHS count, so batching makes the
    backward pure GEMMs and removes two (1+R)-column solves per step.
    Returns (val, alpha, U, Z)."""
    yc = y.astype(_solve_dtype(y.dtype))
    shift = None if diag is None else diag.astype(_solve_dtype(K.dtype))
    # custom-VJP forward; lower-only consumers (see _chol_lml)
    L, invs = cholesky(K, diag_shift=shift, return_panel_invs=True,
                       zero_upper=False, fused_trsm=True)
    n = K.shape[0]
    Z = jax.random.rademacher(jax.random.PRNGKey(seed), (n, num_probes),
                              dtype=L.dtype)
    AU = cholesky_solve(L, jnp.concatenate([yc, Z], axis=1), invs=invs)
    alpha, U = AU[:, :1], AU[:, 1:]
    val = -jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * jnp.sum(yc * alpha)
    return val, alpha, U, Z


def _stoch_lowrank(alpha, U, Z, g, num_probes):
    """dK = ½g(ααᵀ − R⁻¹ U Zᵀ) as an explicit low-rank pair (A, B):
    dK = A Bᵀ."""
    A = (0.5 * g) * jnp.concatenate([alpha, -U / num_probes], axis=1)
    B = jnp.concatenate([alpha, Z], axis=1)
    return A, B


@jax.custom_vjp
@_sensitive
def lml_quadform_logdet(K, y):
    """−Σ log diag(chol(K)) − ½ yᵀK⁻¹y — the data-dependent part of the exact
    GP log marginal likelihood (reference math: mogptk/gpr/model.py:438-453).

    Uses the closed-form gradient ∂/∂K = −½(K⁻¹ − ααᵀ) with α = K⁻¹y instead
    of differentiating through the Cholesky factorization: the backward pass
    is one triangular solve plus one N×N GEMM on the MXU, roughly 3× cheaper
    and far less sequential than autodiff through the factorization panels.

    A bf16/f16 K feeds cholesky() directly — the blocked path upcasts
    per-tile in VMEM (no f32 HBM copy) and returns an f32 factor;
    cotangents come back in the original dtype.
    """
    return _chol_lml(K, None, y)[0]


@_sensitive
def _lml_fwd(K, y):
    val, L, alpha, _, invs = _chol_lml(K, None, y)
    # zero-length sentinels carry the primal dtypes through the residuals
    # (custom_vjp residuals must be JAX types, not dtype objects)
    return val, (L, alpha, invs, jnp.zeros(0, K.dtype), jnp.zeros(0, y.dtype))


@_sensitive
def _dense_lml_cotangents(L, alpha, g, invs=None):
    """dK = ½g(ααᵀ − K⁻¹) and dy = −gα, with K⁻¹ computed in column blocks
    under lax.scan.

    A single triangular solve with an N×N identity RHS makes XLA keep
    multiple N² loop buffers live (observed 35+GB at N=16k); the blocked scan
    keeps L + one (N,B) block + the stacked output — ~3.5GB at N=16k f32.
    """
    n = L.shape[0]

    from ..gpr.config import blocked_cholesky_enabled
    use_blocked_trsm = blocked_cholesky_enabled(n, L.ndim, L.dtype)

    B = min(n, 2048)
    nb = -(-n // B)

    rows = jnp.arange(n)

    if use_blocked_trsm:
        from .blocked_cholesky import effective_block
        from .blocked_trisolve import (blocked_trisolve, panel_inverses,
                                       spd_inverse_from_factor)
        if invs is not None and invs[0].shape[-1] * len(invs) != n:
            invs = None            # padded factorization: inverses unusable
        eff = (invs[0].shape[-1] if invs is not None
               else effective_block(n, 1024))
        if n % eff == 0:
            # MXU inverse-from-factor: K⁻¹ = WᵀW with W = L⁻¹ built by the
            # blocked row recursion (≈ n³/3 MACs) and a lower-only syrk
            # (≈ n³/6) — about half the MACs of the double-TRSM column
            # sweep below, with W computed ONCE instead of re-solving per
            # column block. Cut the measured closed-form backward's
            # dominant term accordingly (ROADMAP #1 / VERDICT r4 #4).
            Kinv = spd_inverse_from_factor(L, block_size=eff, invs=invs)
            dK = (0.5 * g) * (alpha * alpha[:, 0][None, :] - Kinv)
            return dK, -g * alpha
        # non-divisible n: the column-blocked double-TRSM sweep (panel
        # inverses hoisted out of the scan + one GEMM sweep per block row),
        # peak HBM L + Lᵀ + one (n,B) block + the stacked output (a
        # whole-matrix blocked_cho_solve(L, I) exceeded the v5e's HBM by
        # ~0.9 GB at n=16k)
        LT = L.T
        invs_lo = panel_inverses(L, lower=True)
        # upper-sweep inverses are the lower ones transposed, in reverse
        # solve order — saves nb sequential "highest" panel inversions
        invs_up = [inv.T for inv in reversed(invs_lo)]

        def body_trsm(_, b):
            cols = b * B + jnp.arange(B)
            E = (rows[:, None] == cols[None, :]).astype(L.dtype)
            Z = blocked_trisolve(L, E, lower=True, invs=invs_lo)
            Kinv_b = blocked_trisolve(LT, Z, lower=False, invs=invs_up)
            aaT_b = alpha * alpha[cols, 0][None, :]
            return None, (0.5 * g) * (aaT_b - Kinv_b)

        _, blocks = jax.lax.scan(body_trsm, None, jnp.arange(nb))
        dK = jnp.transpose(blocks, (1, 0, 2)).reshape(n, nb * B)[:, :n]
        return dK, -g * alpha

    def body(_, b):
        cols = b * B + jnp.arange(B)
        E = (rows[:, None] == cols[None, :]).astype(L.dtype)        # n x B
        Z = jsl.solve_triangular(L, E, lower=True)
        Kinv_b = jsl.solve_triangular(L.T, Z, lower=False)          # n x B
        aaT_b = alpha * alpha[cols, 0][None, :]                     # n x B
        dK_b = (0.5 * g) * (aaT_b - Kinv_b)
        return None, dK_b

    _, blocks = jax.lax.scan(body, None, jnp.arange(nb))            # nb x n x B
    dK = jnp.transpose(blocks, (1, 0, 2)).reshape(n, nb * B)[:, :n]
    return dK, -g * alpha


def _lml_bwd(res, g):
    L, alpha, invs, k_sent, y_sent = res
    dK, dy = _dense_lml_cotangents(L, alpha, g, invs=invs)
    return dK.astype(k_sent.dtype), dy.astype(y_sent.dtype)


lml_quadform_logdet.defvjp(_lml_fwd, _lml_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
@_sensitive
def lml_quadform_logdet_stochastic(K, y, num_probes, seed):
    """Same value as lml_quadform_logdet, but the backward estimates
    tr(K⁻¹ ∂K) with Hutchinson probes solved against the saved Cholesky
    factor: dK = ½g(ααᵀ − R⁻¹ Σ u_r z_rᵀ), u_r = K⁻¹ z_r.

    The backward is two triangular solves on R columns instead of an N×N
    inverse — at N=16k this cuts the exact-GP backward from ~600ms to ~30ms.
    Gradients are unbiased with variance O(1/R) (BBMM, Gardner et al. 2018).

    A bf16/f16 K feeds cholesky() directly (per-tile VMEM upcast, f32
    factor out — see _solve_dtype and ops/blocked_cholesky).
    """
    return _chol_lml(K, None, y)[0]


@_sensitive
def _lml_stoch_fwd(K, y, num_probes, seed):
    val, alpha, U, Z = _chol_lml_probes(K, None, y, num_probes, seed)
    return val, (alpha, U, Z, jnp.zeros(0, K.dtype), jnp.zeros(0, y.dtype))


@_sensitive
def _lml_stoch_bwd(num_probes, seed, res, g):
    alpha, U, Z, k_sent, y_sent = res
    A, B = _stoch_lowrank(alpha, U, Z, g, num_probes)
    dK = A @ B.T
    dy = -g * alpha
    return dK.astype(k_sent.dtype), dy.astype(y_sent.dtype)


lml_quadform_logdet_stochastic.defvjp(_lml_stoch_fwd, _lml_stoch_bwd)


# -- diag-shifted LML variants ------------------------------------------------
# Same values and gradients as calling the unshifted functions on
# K + diag(d), but d rides the factorization as a vector diag_shift, so the
# shifted Gram never exists in HBM. Beyond saving the N² pass, this keeps K
# an OPAQUE engine output: a fusible elementwise diagonal-add producer
# feeding the blocked Cholesky's Pallas S-panel reads costs ~40 ms at N=16k
# (XLA re-materializes the fused operand per pallas_call; an
# optimization_barrier does NOT prevent it — benchmarks/exact_fwd_decomp.py).


@jax.custom_vjp
@_sensitive
def lml_quadform_logdet_shifted(K, diag, y):
    """lml_quadform_logdet of K + diag(`diag`), shift applied inside the
    factorization; gradients flow to K (dense), diag (= diag(dK)) and y."""
    return _chol_lml(K, diag, y)[0]


@_sensitive
def _lml_shift_fwd(K, diag, y):
    val, L, alpha, _, invs = _chol_lml(K, diag, y)
    return val, (L, alpha, invs, jnp.zeros(0, K.dtype),
                 jnp.zeros(0, diag.dtype), jnp.zeros(0, y.dtype))


@_sensitive
def _lml_shift_bwd(res, g):
    L, alpha, invs, k_sent, d_sent, y_sent = res
    dK, dy = _dense_lml_cotangents(L, alpha, g, invs=invs)
    return (dK.astype(k_sent.dtype),
            jnp.diagonal(dK).astype(d_sent.dtype), dy.astype(y_sent.dtype))


lml_quadform_logdet_shifted.defvjp(_lml_shift_fwd, _lml_shift_bwd)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4))
@_sensitive
def lml_quadform_logdet_stochastic_shifted(K, diag, y, num_probes, seed):
    """lml_quadform_logdet_stochastic of K + diag(`diag`), shift applied
    inside the factorization (see lml_quadform_logdet_shifted)."""
    return _chol_lml(K, diag, y)[0]


@_sensitive
def _lml_stoch_shift_fwd(K, diag, y, num_probes, seed):
    val, alpha, U, Z = _chol_lml_probes(K, diag, y, num_probes, seed)
    return val, (alpha, U, Z, jnp.zeros(0, K.dtype), jnp.zeros(0, diag.dtype),
                 jnp.zeros(0, y.dtype))


@_sensitive
def _lml_stoch_shift_bwd(num_probes, seed, res, g):
    alpha, U, Z, k_sent, d_sent, y_sent = res
    A, B = _stoch_lowrank(alpha, U, Z, g, num_probes)
    dK = A @ B.T
    ddiag = jnp.sum(A * B, axis=1)
    dy = -g * alpha
    return (dK.astype(k_sent.dtype), ddiag.astype(d_sent.dtype),
            dy.astype(y_sent.dtype))


lml_quadform_logdet_stochastic_shifted.defvjp(_lml_stoch_shift_fwd,
                                              _lml_stoch_shift_bwd)


# -- fused channel-block Cholesky LML -----------------------------------------

def _sorted_gram(family, x, counts, params, lower_only=False):
    """Channel-sorted Gram via the block engines. lower_only=True asks for
    the band-lower variant (only the tiles the blocked factorization reads
    are written; the strict upper is UNDEFINED — see mosm_gram_sorted_lower)
    and is only legal when the consumer is the MXU-blocked Cholesky:
    callers must pre-check that gate. Falls back to the full Gram when the
    family/shape has no lower variant."""
    name, statics = family
    if name == "mosm":
        from .block_mosm import mosm_gram_sorted, mosm_gram_sorted_lower
        twopi, phase_inside = statics
        if lower_only:
            from .blocked_cholesky import effective_block
            from ..gpr.config import config
            n = x.shape[0]
            band = effective_block(n, config.blocked_cholesky_block)
            if n % band == 0:
                K = mosm_gram_sorted_lower(x, counts, *params, twopi,
                                           phase_inside=phase_inside,
                                           band=band)
                if K is not None:
                    return K
        return mosm_gram_sorted(x, counts, *params, twopi,
                                phase_inside=phase_inside)
    from .block_families import family_gram_sorted
    return family_gram_sorted(name, statics, x, counts, params)


def _sorted_lowrank_vjp(family, x, counts, params, A, B):
    name, statics = family
    if name == "mosm":
        from .block_mosm import mosm_lowrank_vjp_sorted
        twopi, phase_inside = statics
        return mosm_lowrank_vjp_sorted(x, counts, params, twopi, A, B,
                                       phase_inside=phase_inside)
    from .block_families import family_lowrank_vjp_sorted
    return family_lowrank_vjp_sorted(name, statics, x, counts, params, A, B)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def lml_chol_fused(static, x, diag, y, params):
    """−Σ log diag(chol(K+D)) − ½ yᵀ(K+D)⁻¹y with the Gram K built by a
    channel-block engine and D = diag(`diag`) applied INSIDE the
    factorization (vector diag_shift) — the noisy Gram never exists as a
    separate N² array in HBM.

    One custom VJP spans gram assembly + factorization + solves: the
    backward feeds the probe-trace low-rank cotangent dK = A Bᵀ
    (A = ½g[α, −U/R], B = [α, Z]; BBMM, Gardner et al. 2018) STRAIGHT to
    the engine's low-rank VJP, so the dense N×N cotangent is never
    materialized either. Versus chaining K_sorted's dense-cotangent VJP
    into lml_quadform_logdet_stochastic, this removes one N×N GEMM, one
    N² write and one N² read per step (~12 ms at N=16k f32).

    static = (family, counts, num_probes, seed): the fused-family id
    (name, statics), per-channel counts tuple, probe count, PRNG seed.
    x is channel-sorted (N, D) coordinates. Input cotangents for x are
    ZERO (training data is constant in Exact inference — matching the
    sorted engines, ops/block_mosm._gram_block_bwd).
    """
    val, _ = _lml_chol_fused_fwd(static, x, diag, y, params)
    return val


@_sensitive
def _lml_chol_fused_fwd(static, x, diag, y, params):
    family, counts, num_probes, seed = static
    from ..gpr.config import blocked_cholesky_enabled, config as _cfg
    # band-lower Gram: legal ONLY when the MXU-blocked factorization will
    # consume it (the XLA expander symmetrizes — it would read the
    # undefined strict-upper tiles; measured NaN contamination)
    lower_ok = blocked_cholesky_enabled(x.shape[0], 2, _cfg.dtype)
    K = _sorted_gram(family, x, counts, params, lower_only=lower_ok)
    sd = _solve_dtype(K.dtype)
    # zero_upper=False: this forward only reads L through fused_cho_solve
    # (lower blocks + panel inverses) and jnp.diagonal — skipping the
    # strict-upper strip zeroing saves the 0.5 GB of zero writes
    L, invs = cholesky(K, diag_shift=diag.astype(sd), return_panel_invs=True,
                       zero_upper=False, fused_trsm=True)
    yc = y.astype(sd)
    n = x.shape[0]
    Z = jax.random.rademacher(jax.random.PRNGKey(seed), (n, num_probes),
                              dtype=L.dtype)
    AU = cholesky_solve(L, jnp.concatenate([yc, Z], axis=1), invs=invs)
    alpha, U = AU[:, :1], AU[:, 1:]
    val = -jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * jnp.sum(yc * alpha)
    return val, (x, diag, y, params, alpha, U, Z)


@_sensitive
def _lml_chol_fused_bwd(static, res, g):
    family, counts, num_probes, seed = static
    x, diag, y, params, alpha, U, Z = res
    # dK = ½g(ααᵀ − R⁻¹ U Zᵀ) = A Bᵀ — same estimator and conventions as
    # gpr/iterative._lml_iter_bwd
    A = (0.5 * g) * jnp.concatenate([alpha, -U / num_probes], axis=1)
    B = jnp.concatenate([alpha, Z], axis=1)
    dparams = _sorted_lowrank_vjp(family, x, counts, params, A, B)
    ddiag = jnp.sum(A * B, axis=1)       # diag(A Bᵀ)
    dy = -g * alpha
    return (jnp.zeros_like(x), ddiag.astype(diag.dtype), dy.astype(y.dtype),
            tuple(dp.astype(p.dtype) for dp, p in zip(dparams, params)))


lml_chol_fused.defvjp(_lml_chol_fused_fwd, _lml_chol_fused_bwd)
