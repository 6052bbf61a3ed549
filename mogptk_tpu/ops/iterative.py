"""Matmul-only iterative linear algebra: batched conjugate gradients and
stochastic Lanczos quadrature.

This is the BBMM approach of Gardner et al. 2018 (GPyTorch) mapped onto the
TPU: every operation inside the solver is a matrix-vector/matrix product
that runs on the MXU, there is no sequential factorization, and — combined
with a fused Gram matvec kernel — the N×N kernel matrix never needs to be
materialized in HBM. This removes the O(N²) memory wall of Cholesky-based
exact inference entirely.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp


def cg_solve(matvec, B, max_iters=100, tol=1e-6, M_inv=None,
             track_coeffs=False, X0=None):
    """Batched (preconditioned) conjugate gradients: solve A X = B.

    Args:
        matvec: function V -> A @ V for V of shape (N, R).
        B: Right-hand sides (N, R).
        max_iters: Fixed iteration budget (static for XLA).
        tol: Relative residual tolerance; converged columns freeze.
        M_inv: Optional preconditioner application V -> M⁻¹ V.
        track_coeffs: Also return the per-iteration CG coefficients
            (alphas, betas, actives, rz0), each (m, R) / (R,) — CG is
            Lanczos, so these define the tridiagonalization of
            M^{-1/2} A M^{-1/2} w.r.t. each starting vector for free
            (consumed by cg_logdet_quadrature).

    Returns:
        (X, res_norm[, coeffs]): solution (N, R), final relative residual
        (R,), and the coefficient tuple when track_coeffs.
    """
    if M_inv is None:
        M_inv = lambda v: v

    # tolerance floor at ~32 eps of the solve dtype: a tol below what the
    # arithmetic can reach (e.g. the evaluation-grade 1e-10 in f32) means
    # columns NEVER freeze — CG keeps iterating on round-off noise after
    # convergence, the post-convergence "coefficients" violate the Lanczos
    # relation, and the logdet quadrature reads spurious near-zero Ritz
    # values out of them: measured −2.2e6 instead of +1320 at N=16k with
    # 250 iterations (the true value sits at ~60 iterations' convergence).
    # Frozen iterations contribute identity rows — exactly what the
    # quadrature wants once the solve has converged.
    tol = max(float(tol), 32.0 * float(jnp.finfo(B.dtype).eps))

    b_norm = jnp.sqrt(jnp.sum(B * B, axis=0))               # R
    b_norm = jnp.where(b_norm == 0.0, 1.0, b_norm)

    # warm start (X0): lets long solves run as several bounded executables
    # (restarted preconditioned CG); the relative-residual reference stays
    # ‖B‖ so chunked calls share one convergence criterion
    if X0 is None:
        X0 = jnp.zeros_like(B)
        R0 = B
    else:
        R0 = B - matvec(X0)
    Z0 = M_inv(R0)
    P0 = Z0
    rz0 = jnp.sum(R0 * Z0, axis=0)

    def body(carry, _):
        X, R, P, rz, frozen, best, stall = carry
        res = jnp.sqrt(jnp.sum(R * R, axis=0)) / b_norm
        # LATCHED freeze: converged, broken down, or (when the coefficients
        # feed a quadrature) stalled on the round-off plateau.
        # Finite-precision CG on an ill-conditioned operator bottoms out
        # far above any tol; iterating on the plateau yields coefficients
        # that violate the Lanczos relation and poison the logdet
        # quadrature with spurious ~0 Ritz values — measured −2.2e6
        # instead of +1320 at N=16k/250 iters on TPU-f32. A column freezes
        # after 24 consecutive iterations with <0.2% progress on its best
        # residual — ONLY under track_coeffs: a pure solve self-corrects,
        # and a legitimate pre-convergence plateau (weak preconditioner,
        # clustered spectrum) must be allowed to break through. NO
        # divergence latch: preconditioned CG residual 2-norms
        # legitimately spike transiently (only the A-norm of the error is
        # monotone) — a 3×-past-best latch froze converging columns of
        # the masked mesh operator at 8× their floor.
        if track_coeffs:
            improved = res < 0.998 * best
            stall = jnp.where(improved, 0, stall + 1)
            frozen = frozen | (stall >= 24)
        frozen = frozen | (res <= tol)
        best = jnp.minimum(best, res)
        AP = matvec(P)
        pAp = jnp.sum(P * AP, axis=0)
        # pAp ≤ 0 is CG breakdown (a round-off non-SPD step): freeze for
        # good BEFORE `active` is recorded, so the quadrature decouples the
        # breakdown row from the last valid one (actives gates the
        # off-diagonal) instead of keeping a spurious coupling
        frozen = frozen | (pAp <= 0.0)
        active = ~frozen
        alpha = jnp.where(pAp > 0.0, rz / jnp.where(pAp == 0.0, 1.0, pAp), 0.0)
        alpha = jnp.where(active, alpha, 0.0)
        X = X + alpha[None, :] * P
        R = R - alpha[None, :] * AP
        Z = M_inv(R)
        rz_new = jnp.sum(R * Z, axis=0)
        beta = jnp.where(rz > 0.0, rz_new / jnp.where(rz == 0.0, 1.0, rz), 0.0)
        beta = jnp.where(active, beta, 0.0)
        P = Z + beta[None, :] * P
        # keep the frozen state's R/X from drifting: alpha/beta are already
        # zeroed, so X and R are constant for frozen columns
        return (X, R, P, rz_new, frozen, best, stall), (alpha, beta, active)

    frozen0 = jnp.zeros(B.shape[1], dtype=bool)
    best0 = jnp.full((B.shape[1],), jnp.inf, dtype=b_norm.dtype)
    stall0 = jnp.zeros(B.shape[1], dtype=jnp.int32)
    (X, R, _, _, _, _, _), (alphas, betas, actives) = jax.lax.scan(
        body, (X0, R0, P0, rz0, frozen0, best0, stall0), None,
        length=max_iters)
    res = jnp.sqrt(jnp.sum(R * R, axis=0)) / b_norm
    if track_coeffs:
        return X, res, (alphas, betas, actives, rz0)
    return X, res


def cg_logdet_quadrature(coeffs):
    """logdet contribution from CG coefficients (Gardner et al. 2018).

    For PCG on A with preconditioner P and starting vector z, the CG step
    sizes α_k and direction updates β_k define the Lanczos tridiagonal T of
    Ã = P^{-1/2} A P^{-1/2} w.r.t. z̃ = P^{-1/2} z:

        T[k,k]   = 1/α_k + β_{k−1}/α_{k−1}
        T[k,k+1] = √β_k / α_k

    and  z̃ᵀ log(Ã) z̃ ≈ (zᵀP⁻¹z) · e₁ᵀ log(T) e₁.  With probes
    z ~ N(0, P) this estimates tr log(Ã) = logdet(A) − logdet(P); the
    caller adds logdet(P) back. Frozen (converged) iterations contribute
    identity rows (log 1 = 0).

    Returns per-probe estimates, shape (R,).
    """
    alphas, betas, actives, rz0 = coeffs
    m, R = alphas.shape

    safe_a = jnp.where(alphas > 0.0, alphas, 1.0)
    inv_a = 1.0 / safe_a                                    # (m, R)
    prev_ba = jnp.concatenate(
        [jnp.zeros((1, R), alphas.dtype), betas[:-1] * inv_a[:-1]], axis=0)
    diag = jnp.where(actives, inv_a + prev_ba, 1.0)          # (m, R)
    # non-finite coefficients (breakdown past the dtype's reachable
    # residual) contribute identity rows, like frozen iterations
    diag = jnp.where(jnp.isfinite(diag), diag, 1.0)
    off = jnp.sqrt(jnp.maximum(betas, 0.0)) * inv_a          # (m, R)
    off = jnp.where(jnp.isfinite(off), off, 0.0)
    # off-diagonal k couples iterations k and k+1: zero once either froze
    both = actives[:-1] & actives[1:]
    off = jnp.where(both, off[:-1], 0.0)                     # (m-1, R)

    def one(d, o, w):
        T = jnp.diag(d) + jnp.diag(o, 1) + jnp.diag(o, -1)
        lam, U = jnp.linalg.eigh(T)
        lam = jnp.maximum(lam, 1e-12)
        return jnp.sum((U[0, :] ** 2) * jnp.log(lam)) * w

    return jax.vmap(one, in_axes=(1, 1, 0))(diag, off, rz0)


def lanczos(matvec, Z, m):
    """m-step Lanczos tridiagonalization of A, batched over probes Z (N, R).

    Every iteration is ONE batched matvec (MXU-friendly). Returns
    (alphas (m, R), betas (m-1, R)) of the per-probe tridiagonals. Plain
    three-term recurrence without reorthogonalization — adequate for logdet
    quadrature with modest m.
    """
    n, R = Z.shape
    # run the recurrence in the matvec's OUTPUT dtype: a dtype mismatch
    # (f32 probes against an f64 operator under x64) would otherwise fail
    # the scan's carry-type check on q_next
    out_dtype = jax.eval_shape(matvec,
                               jax.ShapeDtypeStruct(Z.shape, Z.dtype)).dtype
    Z = Z.astype(out_dtype)
    q = Z / jnp.linalg.norm(Z, axis=0, keepdims=True)

    def body(carry, _):
        q_prev, q_cur, beta_prev = carry
        v = matvec(q_cur)                                  # N x R
        alpha = jnp.sum(q_cur * v, axis=0)                 # R
        v = v - alpha[None, :] * q_cur - beta_prev[None, :] * q_prev
        beta = jnp.linalg.norm(v, axis=0)                  # R
        q_next = v / jnp.where(beta == 0.0, 1.0, beta)[None, :]
        return (q_cur, q_next, beta), (alpha, beta)

    init = (jnp.zeros_like(q), q, jnp.zeros(R, dtype=Z.dtype))
    _, (alphas, betas) = jax.lax.scan(body, init, None, length=m)
    return alphas, betas[:-1]


def lanczos_reorth(matvec, Z, m):
    """Fully reorthogonalized Lanczos tridiagonalization, batched over
    probes Z (n, R).

    The plain three-term recurrence loses orthogonality in f32 well before
    ~50 iterations on ill-conditioned operators; the resulting "ghost"
    copies of extremal Ritz values bias logdet quadrature catastrophically
    (measured −9.5k vs a true +1.3k at N=16k with ~60 effective
    iterations). Full reorthogonalization stores the basis — (m, R, n)
    memory (n MINOR: the probe axis would pad to 128 vector lanes, an 8×
    HBM blowup at R=16 — CLAUDE.md's small-axis rule), m²nR extra MACs in
    two batched GEMM-like einsums per sweep — and keeps the Ritz values
    clean; this is the evaluation-grade variant
    (log_marginal_likelihood_readout), while `lanczos` remains the cheap
    training-path estimate. The orthogonalization dots run at "highest"
    precision: bf16-pass projections would re-introduce exactly the drift
    this exists to remove.
    """
    n, R = Z.shape
    out_dtype = jax.eval_shape(matvec,
                               jax.ShapeDtypeStruct(Z.shape, Z.dtype)).dtype
    Z = Z.astype(out_dtype)
    q = Z / jnp.linalg.norm(Z, axis=0, keepdims=True)
    Q0 = jnp.zeros((m, R, n), out_dtype)

    def body(carry, k):
        Qb, q_cur = carry
        Qb = jax.lax.dynamic_update_slice(Qb, q_cur.T[None], (k, 0, 0))
        v = matvec(q_cur)                                  # n x R
        alpha = jnp.sum(q_cur * v, axis=0)                 # R
        # project out EVERY stored vector (rows > k are zero — harmless)
        proj = jnp.einsum("krn,nr->kr", Qb, v, precision="highest")
        v = v - jnp.einsum("krn,kr->nr", Qb, proj, precision="highest")
        # second CGS pass ("twice is enough"): one pass leaves O(eps·κ)
        # residual components along the basis
        proj2 = jnp.einsum("krn,nr->kr", Qb, v, precision="highest")
        v = v - jnp.einsum("krn,kr->nr", Qb, proj2, precision="highest")
        beta = jnp.linalg.norm(v, axis=0)                  # R
        q_next = v / jnp.where(beta == 0.0, 1.0, beta)[None, :]
        return (Qb, q_next), (alpha, beta)

    _, (alphas, betas) = jax.lax.scan(body, (Q0, q), jnp.arange(m))
    return alphas, betas[:-1]


def woodbury_m_inv(L, sigma2, Linner=None):
    """P⁻¹ application closure for P = σ²I + L Lᵀ (Woodbury). Every dot
    runs "highest" — the consumers (CG preconditioning feeding logdet
    quadratures, probe sampling) are value-critical (see
    pivoted_cholesky). Pass a precomputed `Linner` (chol(σ²I + LᵀL)) to
    amortize the r×r inner factorization across calls; returns
    (M_inv, Linner)."""
    if Linner is None:
        r = L.shape[1]
        inner = (sigma2 * jnp.eye(r, dtype=L.dtype)
                 + jnp.matmul(L.T, L, precision="highest"))
        Linner = jnp.linalg.cholesky(inner)

    def M_inv(V):
        t = jnp.matmul(L.T, V, precision="highest")
        t = jax.scipy.linalg.cho_solve((Linner, True), t)
        return (V - jnp.matmul(L, t, precision="highest")) / sigma2

    return M_inv, Linner


def woodbury_half_powers(L, sigma2):
    """Exact P^{±1/2} application closures for P = σ²I + L Lᵀ.

    From the r×r eigendecomposition LᵀL = V Λ Vᵀ: U = L V Λ^{−1/2} has
    orthonormal columns and P = σ²I + U Λ Uᵀ, so
    P^s = σ^{2s} (I + U ((1 + Λ/σ²)^s − 1) Uᵀ) for any power s. Returns
    (apply_half, apply_neg_half, logdetP). All dots "highest": these feed
    logdet values directly.
    """
    r = L.shape[1]
    G = jnp.matmul(L.T, L, precision="highest")
    lam, V = jnp.linalg.eigh(G)
    lam = jnp.maximum(lam, 0.0)
    # guard rank-deficient columns (duplicate pivots): U column ~ 0 there
    inv_sqrt = jnp.where(lam > 0.0, 1.0 / jnp.sqrt(jnp.maximum(lam, 1e-30)),
                         0.0)
    U = jnp.matmul(L, V * inv_sqrt[None, :], precision="highest")  # (n, r)
    ratio = 1.0 + lam / sigma2

    def apply_pow(X, s):
        t = jnp.matmul(U.T, X, precision="highest")
        t = (ratio ** s - 1.0)[:, None] * t
        return (sigma2 ** s) * (X + jnp.matmul(U, t, precision="highest"))

    logdetP = ((L.shape[0] - r) * jnp.log(sigma2)
               + jnp.sum(jnp.log(sigma2 * ratio)))

    return (lambda X: apply_pow(X, 0.5), lambda X: apply_pow(X, -0.5),
            logdetP)


def preconditioned_slq_logdet(matvec, L, sigma2, n, num_probes=16,
                              lanczos_iters=64, key=None,
                              dtype=jnp.float32):
    """Evaluation-grade logdet(A): exact logdet(P) plus reorthogonalized
    SLQ of tr log(P^{−1/2} A P^{−1/2}) with P = σ²I + L Lᵀ.

    The preconditioner does double duty: it shrinks ‖log(Ã)‖ (so both the
    Hutchinson variance and the Lanczos-degree requirement drop), and its
    own logdet is exact. Rademacher probes, cov I — no P-sampling or CG
    coupling, so the estimate is immune to the CG-stagnation pathologies
    the training-path quadrature guards against (ops/iterative.cg_solve).
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    apply_half, apply_neg_half, logdetP = woodbury_half_powers(
        L.astype(dtype), jnp.asarray(sigma2, dtype))

    def matvec_tilde(V):
        return apply_neg_half(matvec(apply_neg_half(V)))

    Z = jax.random.rademacher(key, (n, num_probes), dtype=dtype)
    alphas, betas = lanczos_reorth(matvec_tilde, Z, lanczos_iters)

    def one(a, b, z2):
        T = jnp.diag(a) + jnp.diag(b, 1) + jnp.diag(b, -1)
        lam, Uv = jnp.linalg.eigh(T)
        lam = jnp.maximum(lam, 1e-12)
        w = Uv[0, :] ** 2
        return jnp.sum(w * jnp.log(lam)) * z2

    vals = jax.vmap(one, in_axes=(1, 1, 0))(alphas, betas,
                                            jnp.sum(Z * Z, axis=0))
    return logdetP + jnp.mean(vals)


def slq_logdet(matvec, n, num_probes=16, lanczos_iters=32, key=None, dtype=jnp.float32):
    """Stochastic Lanczos quadrature estimate of log det(A) for SPD A.

    logdet(A) = E_z[zᵀ log(A) z] for Rademacher probes z;
    zᵀ f(A) z ≈ ‖z‖² Σ_k w_k f(λ_k) from the eigendecomposition of the
    Lanczos tridiagonal (Ubaru, Chen & Saad 2017). All probes run in one
    batched recurrence.
    """
    if key is None:
        key = jax.random.PRNGKey(0)
    Z = jax.random.rademacher(key, (n, num_probes), dtype=dtype)
    alphas, betas = lanczos(matvec, Z, lanczos_iters)      # (m,R), (m-1,R)

    def one(a, b, z2):
        T = jnp.diag(a) + jnp.diag(b, 1) + jnp.diag(b, -1)
        lam, U = jnp.linalg.eigh(T)
        lam = jnp.maximum(lam, 1e-12)
        w = U[0, :] ** 2
        return jnp.sum(w * jnp.log(lam)) * z2

    vals = jax.vmap(one, in_axes=(1, 1, 0))(alphas, betas, jnp.sum(Z * Z, axis=0))
    return jnp.mean(vals)


def pivoted_cholesky(K_diag, K_row, n, rank, jitter=1e-6):
    """Partial pivoted Cholesky preconditioner factors (Gardner et al. 2018).

    Args:
        K_diag: (n,) diagonal of K.
        K_row: function i -> row i of K, shape (n,).
        rank: number of pivots.

    Returns L (n, rank) with K ≈ L Lᵀ (+ noise), for use in a
    Woodbury-inverted preconditioner.
    """
    def body(carry, k):
        L, d = carry
        i = jnp.argmax(d)
        val = jnp.maximum(d[i], jitter)
        row = K_row(i)                                  # n
        # "highest": XLA:TPU's default bf16-pass f32 matmul compounds over
        # the sequential pivots — at rank 256 / N=65k the residual diagonal
        # drifts into garbage pivots and the Woodbury P breaks down (the
        # readout LML moved by ~10k nats; CPU-f32 is exact at every rank).
        # The matvec is O(n·rank) per pivot — precision here is free.
        l = ((row - jnp.matmul(L, L[i, :], precision="highest"))
             / jnp.sqrt(val))
        l = l.at[i].set(jnp.sqrt(val))
        L = L.at[:, k].set(l)
        d = jnp.maximum(d - l * l, 0.0)
        d = d.at[i].set(0.0)
        return (L, d), None

    L0 = jnp.zeros((n, rank), dtype=K_diag.dtype)
    (L, _), _ = jax.lax.scan(body, (L0, K_diag), jnp.arange(rank))
    return L
