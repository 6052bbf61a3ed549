"""ExactIterative: matmul-only exact GP inference (BBMM, Gardner et al. 2018).

Exact-GP training without Cholesky: the LML quadratic form is solved with
batched conjugate gradients, the log-determinant is estimated by stochastic
Lanczos quadrature, and the parameter gradients use the probe-vector trace
identity  dLML/dθ = ½ tr((ααᵀ − K⁻¹) ∂K/∂θ)  with K⁻¹ ≈ R⁻¹ Σ u_r z_rᵀ,
u_r = K⁻¹ z_r — i.e. a LOW-RANK cotangent.

Every K-application runs through a fused Pallas Gram kernel (ops/fused.py:
one tile machine parameterized per kernel family — MOSM, MOSM-Q, uMOSM, CSM,
CONV, MOHSM) and the low-rank cotangent is consumed tile-by-tile: the N×N Gram is
NEVER materialized. This removes the O(N²) HBM wall of Cholesky inference —
exact GPs at N far beyond what the reference (or any materialized-K
approach) can hold on one chip.

The reference has no analog of this subsystem (SURVEY.md §5: scaling N is
only via sparse approximations); this is TPU-native headroom, not a port.
"""
import functools
import numpy as np
import jax
import jax.numpy as jnp

from .model import Model
from .likelihood import GaussianLikelihood
from .multioutput import (MultiOutputSpectralKernel,
                          MultiOutputSpectralMixtureKernel,
                          UncoupledMultiOutputSpectralKernel,
                          CrossSpectralKernel,
                          GaussianConvolutionProcessKernel,
                          MultiOutputHarmonizableSpectralKernel,
                          LinearModelOfCoregionalizationKernel)
from .config import config
from ..ops.iterative import (cg_solve, slq_logdet, pivoted_cholesky,
                             cg_logdet_quadrature,
                             preconditioned_slq_logdet, woodbury_m_inv)
from ..ops.block_families import has_block_family as _has_block_family
from ..ops.fused import resolve_family, fused_gram_matvec, fused_gram_lowrank_vjp


def _family_of(kernel):
    """Map a kernel instance to its fused-family id (name, statics) — a
    hashable pair that rides in custom_vjp static arguments."""
    if isinstance(kernel, (MultiOutputSpectralKernel,
                           MultiOutputSpectralMixtureKernel)):
        return ("mosm", (kernel.twopi, True))
    if isinstance(kernel, UncoupledMultiOutputSpectralKernel):
        return ("umosm", (kernel.twopi,))
    if isinstance(kernel, CrossSpectralKernel):
        return ("csm", (kernel.Rq, kernel.input_dims))
    if isinstance(kernel, GaussianConvolutionProcessKernel):
        return ("conv", (kernel.input_dims,))
    if isinstance(kernel, MultiOutputHarmonizableSpectralKernel):
        return ("mohsm", (kernel.twopi, kernel.input_dims))
    if (isinstance(kernel, LinearModelOfCoregionalizationKernel)
            and kernel._all_spectral()):
        return ("lmc_sm", (kernel.Q, kernel.input_dims))
    raise ValueError(
        "ExactIterative supports the fused multi-output spectral families "
        "(MOSM, MOSM-Q, uMOSM, CSM, CONV, MOHSM, SM-LMC); use Exact for "
        "other kernels")


def _fused_kernel_params(kernel):
    """Pure parameter tuple matching the family's tile/dense signatures."""
    if isinstance(kernel, UncoupledMultiOutputSpectralKernel):
        w, mu, var, theta, phi = (kernel.weight(),) + kernel._params()[1:]
        return (w, mu, var, theta, phi)
    if isinstance(kernel, (CrossSpectralKernel, GaussianConvolutionProcessKernel,
                           MultiOutputHarmonizableSpectralKernel,
                           LinearModelOfCoregionalizationKernel)):
        return kernel._fused_params()
    return kernel._params()


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lml_iter(static, x, c, noise_diag, y, mask, params):
    """−½ yᵀK⁻¹y − ½ logdet(K) for K = family(x,c;params) + diag(noise).

    mask is an optional (N,) 0/1 row mask: masked-out rows act as independent
    unit-variance zeros (block-diagonal identity extension), so padded data
    under mesh sharding contributes exactly 0 to both terms."""
    val, _ = _lml_iter_fwd(static, x, c, noise_diag, y, mask, params)
    return val


def _solve_dt(dt):
    """CG/Lanczos/preconditioner dtype: sub-f32 configs (use_half_precision)
    solve in f32 — the fused engines already return f32 ('solve dtype'), and
    bf16 recurrences/Cholesky would crash or lose the solves' accuracy."""
    return jnp.float32 if jnp.dtype(dt).itemsize < 4 else jnp.dtype(dt)


def _counts_or_none(counts, x):
    """Drop channel counts that no longer describe x (e.g. rows padded for
    mesh sharding after the counts were computed) — the sorted engines
    would otherwise produce a shape mismatch at trace time."""
    if counts is not None and int(sum(counts)) != x.shape[0]:
        return None
    return counts


def _make_matvec(static, x, c, noise_diag, params, mask=None, hp=False):
    (family, O, max_cg, tol, probes, lanczos_iters, seed, use_pallas,
     precond_rank, ring, counts) = static
    counts = _counts_or_none(counts, x)
    sd = _solve_dt(noise_diag.dtype)
    noise_diag = noise_diag.astype(sd)

    if hp and ring is None:
        # high-precision operator for spectral estimates (the readout's
        # Lanczos): the fast kernels' single-bf16-pass contraction puts
        # ~2⁻⁸ input rounding directly into the operator the quadrature
        # probes — fine for CG/gradients, catastrophic for tr log at scale
        if use_pallas:
            def base(V):
                return (fused_gram_matvec(family, O, x, c, x, c, params, V,
                                          precision="highest").astype(sd)
                        + noise_diag[:, None] * V)
        else:
            _, dense, _ = resolve_family(family)
            K = dense(c, x, c, None, params).astype(sd)

            def base(V):
                with jax.default_matmul_precision("highest"):
                    return K @ V + noise_diag[:, None] * V
        if mask is None:
            return base
        m_ = mask.reshape(-1, 1).astype(sd)
        return lambda V: m_ * base(m_ * V) + (1.0 - m_) * V

    if ring is not None:
        from ..parallel.ring import ring_gram_matvec
        mesh, axis = ring

        def base(V):
            return ring_gram_matvec(mesh, axis, family, O, x, c, noise_diag,
                                    params, use_pallas, V).astype(sd)
    elif use_pallas and counts is not None and family[0] == "mosm":
        # channel-sorted layout: scalar-stat tiles, one evaluation per
        # symmetric block pair (ops/block_mosm.py) — ~2x the generic
        # one-hot matvec kernel per CG iteration
        from ..ops.block_mosm import mosm_matvec_sorted
        twopi, phase_inside = family[1]

        def base(V):
            return (mosm_matvec_sorted(x, counts, *params, twopi, V,
                                       phase_inside=phase_inside).astype(sd)
                    + noise_diag[:, None] * V)
    elif use_pallas and counts is not None and _has_block_family(family[0]):
        from ..ops.block_families import family_matvec_sorted

        def base(V):
            return (family_matvec_sorted(family[0], family[1], x, counts,
                                         params, V).astype(sd)
                    + noise_diag[:, None] * V)
    elif use_pallas:
        def base(V):
            return (fused_gram_matvec(family, O, x, c, x, c, params, V).astype(sd)
                    + noise_diag[:, None] * V)
    else:
        _, dense, _ = resolve_family(family)
        K = dense(c, x, c, None, params).astype(sd)

        def base(V):
            return K @ V + noise_diag[:, None] * V
    if mask is None:
        return base
    m = mask.reshape(-1, 1).astype(sd)

    def matvec(V):
        # apply M(K+σ²)M + (I−M): padded coordinates pass through untouched
        return m * base(m * V) + (1.0 - m) * V
    return matvec


def _pivoted_factor(static, x, c, noise_diag, params, rank=None):
    """(L, σ̄²): the partial-pivoted-Cholesky factor of the Gram (rank
    columns) and the mean noise — the raw pieces of P = σ̄²I + L Lᵀ."""
    family = static[0]
    sd = _solve_dt(noise_diag.dtype)
    _, dense, diag = resolve_family(family)
    sigma2 = jnp.mean(noise_diag.astype(sd))
    n = x.shape[0]

    def K_row(i):
        xi = jax.lax.dynamic_slice(x, (i, 0), (1, x.shape[1]))
        ci = jax.lax.dynamic_slice(c, (i,), (1,))
        return dense(ci, xi, c, x, params)[0, :].astype(sd)

    rank = int(static[8] if rank is None else rank)
    L = pivoted_cholesky(diag(c, x, params).astype(sd), K_row, n, rank)
    return L, sigma2


def _make_preconditioner(static, x, c, noise_diag, params, full=False):
    """Woodbury-inverted partial-pivoted-Cholesky preconditioner
    P = σ̄²I + L Lᵀ (Gardner et al. 2018). Returns M_inv (or None), and with
    full=True the triple (M_inv, sample, logdetP) where sample(key, R)
    draws z ~ N(0, P) (z = σ̄u₀ + Lu₁) and logdetP is exact — the pieces
    the CG-coefficient logdet quadrature needs."""
    family = static[0]
    precond_rank = static[8]
    n = x.shape[0]
    sd = _solve_dt(noise_diag.dtype)
    if not precond_rank:
        if not full:
            return None

        def sample_id(key, R):
            return jax.random.normal(key, (n, R), dtype=sd)

        return None, sample_id, jnp.zeros((), sd)
    # solve dtype throughout: bf16 params would otherwise put a bf16 matrix
    # into the Woodbury jnp.linalg.cholesky below (rejected by lax.linalg).
    # Every dot in the Woodbury pieces is value-critical (logdetP and the
    # P-probe/M_inv consistency the CG logdet quadrature relies on) — they
    # run "highest" inside woodbury_m_inv/sample (at rank 256 the default
    # bf16 passes broke the N=65k readout by ~10k nats; see
    # ops/iterative.pivoted_cholesky)
    L, sigma2 = _pivoted_factor(static, x, c, noise_diag, params)
    r = L.shape[1]
    M_inv, Linner = woodbury_m_inv(L, sigma2)

    if not full:
        return M_inv

    def sample(key, R):
        k0, k1 = jax.random.split(key)
        u0 = jax.random.normal(k0, (n, R), dtype=L.dtype)
        u1 = jax.random.normal(k1, (r, R), dtype=L.dtype)
        return (jnp.sqrt(sigma2) * u0
                + jnp.matmul(L, u1, precision="highest"))

    # det(σ²I_n + LLᵀ) = σ^{2(n−r)} · det(σ²I_r + LᵀL)
    logdetP = ((n - r) * jnp.log(sigma2)
               + 2.0 * jnp.sum(jnp.log(jnp.diagonal(Linner))))
    return M_inv, sample, logdetP


def _lml_iter_fwd(static, x, c, noise_diag, y, mask, params):
    (family, O, max_cg, tol, probes, lanczos_iters, seed, use_pallas,
     precond_rank, ring, counts) = static
    n = x.shape[0]
    y_primal = y
    y = y.astype(_solve_dt(y.dtype))   # CG/quadrature run in the solve dtype
    matvec = _make_matvec(static, x, c, noise_diag, params, mask)
    M_inv, sample_P, logdetP = _make_preconditioner(
        static, x, c, noise_diag, params, full=True)
    if mask is not None:
        y = y * mask.reshape(-1, 1)
        if M_inv is not None:
            m = mask.reshape(-1, 1)
            M0 = M_inv
            # keep the preconditioner consistent with the masked operator
            M_inv = lambda V: m * M0(m * V) + (1.0 - m) * V

    Z = jax.random.rademacher(jax.random.PRNGKey(seed + 1), (n, probes), dtype=y.dtype)
    if mask is None:
        # ONE batched CG for y, the gradient probes (Rademacher, cov I) and
        # the logdet probes (z ~ N(0, P)): CG is Lanczos, so the logdet
        # quadrature reads the CG coefficients of the P-probes for free —
        # no separate SLQ sweep (Gardner et al. 2018). At N=65k this
        # removes ~⅓ of all Gram applications per step.
        Zl = sample_P(jax.random.PRNGKey(seed), probes)
        sols, _, coeffs = cg_solve(matvec, jnp.concatenate([y, Z, Zl], axis=1),
                                   max_iters=max_cg, tol=tol, M_inv=M_inv,
                                   track_coeffs=True)
        alpha = sols[:, :1]
        U = sols[:, 1:1 + probes]
        quad = cg_logdet_quadrature(jax.tree_util.tree_map(
            lambda a: a[..., 1 + probes:] if a.ndim > 1 else a[1 + probes:],
            coeffs))
        logdet = logdetP + jnp.mean(quad)
    else:
        # masked (padded) operator: keep the separate SLQ estimate — the
        # identity extension contributes log 1 = 0 under any cov-I probes,
        # while the P-probe sampler and logdetP above are built for the
        # unmasked P
        sols, _ = cg_solve(matvec, jnp.concatenate([y, Z], axis=1),
                           max_iters=max_cg, tol=tol, M_inv=M_inv)
        alpha = sols[:, :1]
        U = sols[:, 1:]
        logdet = slq_logdet(matvec, n, num_probes=probes,
                            lanczos_iters=lanczos_iters,
                            key=jax.random.PRNGKey(seed), dtype=y.dtype)
    val = -0.5 * jnp.sum(y * alpha) - 0.5 * logdet
    return val, (x, c, noise_diag, y_primal, mask, params, alpha, U, Z)


def _lml_iter_bwd(static, res, g):
    (family, O, max_cg, tol, probes, lanczos_iters, seed, use_pallas,
     precond_rank, ring, counts) = static
    x, c, noise_diag, y, mask, params, alpha, U, Z = res
    counts = _counts_or_none(counts, x)

    # dK = ½g(ααᵀ − R⁻¹ U Zᵀ) = A Bᵀ with (solves already done in fwd)
    A = (0.5 * g) * jnp.concatenate([alpha, -U / probes], axis=1)  # N x (R+1)
    B = jnp.concatenate([alpha, Z], axis=1)                        # N x (R+1)
    if mask is not None:
        # the kernel only sees the masked block: dK_masked = M dK M
        m = mask.reshape(-1, 1)
        A = A * m
        B = B * m

    if ring is not None:
        from ..parallel.ring import ring_gram_lowrank_vjp
        mesh, axis_name = ring
        dparams = ring_gram_lowrank_vjp(mesh, axis_name, family, O, x, c,
                                        params, use_pallas, A, B)
    elif use_pallas and counts is not None and family[0] == "mosm":
        from ..ops.block_mosm import mosm_lowrank_vjp_sorted
        twopi, phase_inside = family[1]
        dparams = mosm_lowrank_vjp_sorted(x, counts, params, twopi, A, B,
                                          phase_inside=phase_inside)
    elif use_pallas and counts is not None and _has_block_family(family[0]):
        from ..ops.block_families import family_lowrank_vjp_sorted
        dparams = family_lowrank_vjp_sorted(family[0], family[1], x, counts,
                                            params, A, B)
    elif use_pallas:
        dparams = fused_gram_lowrank_vjp(family, O, x, c, x, c, params, A, B)
    else:
        _, dense, _ = resolve_family(family)
        dK = (A @ B.T).astype(params[0].dtype)
        _, vjp = jax.vjp(lambda ps: dense(c, x, c, None, ps), params)
        (dparams,) = vjp(dK)

    # cotangent dtypes must match the primal inputs (the solves ran in the
    # solve dtype, which differs under use_half_precision)
    dnoise = jnp.sum(A * B, axis=1).astype(noise_diag.dtype)   # diag(A Bᵀ)
    dy = (-g * alpha).astype(y.dtype)
    dparams = tuple(d.astype(p.dtype) for d, p in zip(dparams, params))
    zeros = lambda a: jnp.zeros_like(a)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (zeros(x), zeros(c), dnoise, dy, dmask, dparams)


_lml_iter.defvjp(_lml_iter_fwd, _lml_iter_bwd)


class ExactIterative(Model):
    """Exact GP regression with iterative (CG/SLQ) inference.

    Drop-in alternative to `Exact` for the fused multi-output spectral
    families (`MultiOutputSpectralKernel`, `MultiOutputSpectralMixtureKernel`,
    `UncoupledMultiOutputSpectralKernel`, `CrossSpectralKernel`,
    `GaussianConvolutionProcessKernel`):

    - the LML quadratic form: batched CG (`max_cg_iters`, `cg_tol`),
    - the log-determinant: stochastic Lanczos quadrature (`num_probes`,
      `lanczos_iters`) — a consistent stochastic estimate, so reported
      losses carry ~1% probe noise while gradients stay unbiased,
    - gradients: probe-vector trace estimation with a LOW-RANK cotangent
      consumed by the materialization-free Pallas VJP (ops/fused.py).

    Args mirror `Exact` plus the solver controls.
    """

    supports_row_mask = True

    def __init__(self, kernel, X, y, variance=1.0, data_variance=None,
                 jitter=1e-8, mean=None, max_cg_iters=100, cg_tol=1e-5,
                 num_probes=16, lanczos_iters=32, seed=0, precond_rank=64):
        _family_of(kernel)  # raises for unsupported kernels

        if data_variance is not None:
            data_variance = jnp.asarray(data_variance, dtype=config.dtype).reshape(-1)

        variance = jnp.asarray(variance, dtype=config.dtype)
        channels = kernel.output_dims if kernel.output_dims is not None else 1
        if 1 < variance.ndim or (variance.ndim == 1 and variance.shape[0] != channels):
            raise ValueError("variance must be float or have shape (channels,)")

        super().__init__(kernel, X, y, GaussianLikelihood(jnp.sqrt(variance)), jitter, mean)
        self.data_variance = data_variance
        self.max_cg_iters = max_cg_iters
        self.cg_tol = cg_tol
        self.num_probes = num_probes
        self.lanczos_iters = lanczos_iters
        self.seed = seed
        # rank-64 default: measured at N=65k (benchmarks/iter_tune.py), the
        # pivoted-Cholesky preconditioner's rank dominates CG iterations —
        # rank 64 @ 15 iters reaches 3.7% LML error at the same step cost
        # where rank 16 stays ~90% off at ANY iteration budget
        self.precond_rank = min(int(precond_rank), self.X.shape[0])
        self.log_marginal_likelihood_constant = 0.5 * self.X.shape[0] * np.log(2.0 * np.pi)
        object.__setattr__(self, "_ring", None)

    def use_ring(self, mesh, axis="data"):
        """Distribute every Gram application over the mesh as a shard_map
        ppermute ring: each device owns N/devices rows, per-device memory is
        O(N/devices), and N scales linearly with the device count. Call with
        mesh=None to go back to single-device. Training data should be
        row-sharded over the same axis (parallel.sharding.shard_data)."""
        object.__setattr__(self, "_ring", None if mesh is None else (mesh, axis))
        self._jit_cache.clear()

    def _noise_diag(self):
        noise = self._index_channel(self.likelihood.scale() ** 2, self.X)
        diag = jnp.broadcast_to(jnp.asarray(noise, dtype=config.dtype).reshape(-1),
                                (self.X.shape[0],))
        if self.data_variance is not None:
            dv = self.data_variance
            if dv.shape[0] != diag.shape[0]:
                # X padded for mesh sharding; padded rows are masked out
                dv = jnp.pad(dv, (0, diag.shape[0] - dv.shape[0]))
            diag = diag + dv
        # small absolute floor in place of the Cholesky jitter ladder
        return diag + self.jitter

    def _static(self):
        from .config import pallas_enabled
        # channel-sorted layouts ride the scalar-stat block engine; the
        # ring path keeps the generic kernel (row shards straddle channels),
        # and a row mask means X was padded AFTER the counts were computed
        # (mesh sharding), so the sorted split no longer describes it
        counts = None if (getattr(self, "_ring", None) is not None
                          or getattr(self, "_row_mask", None) is not None) \
            else getattr(self, "_channel_counts", None)
        return (_family_of(self.kernel), self.kernel.output_dims,
                self.max_cg_iters, self.cg_tol,
                self.num_probes, self.lanczos_iters, self.seed, pallas_enabled(),
                self.precond_rank, getattr(self, "_ring", None), counts)

    def _kernel_params(self):
        return _fused_kernel_params(self.kernel)

    def cg_diagnostics(self):
        """Return the CG relative residuals for the current parameters —
        (residual_y, max_residual_probes). Use to tune max_cg_iters/
        precond_rank: residuals above cg_tol mean the LML/gradients are
        under-converged."""
        c = self.X[:, 0].astype(jnp.int32)
        x = self.X[:, 1:]
        y = self._residual_y()
        params = self._kernel_params()
        static = self._static()
        matvec = _make_matvec(static, x, c, self._noise_diag(), params)
        M_inv = _make_preconditioner(static, x, c, self._noise_diag(), params)
        Z = jax.random.rademacher(jax.random.PRNGKey(self.seed + 1),
                                  (self.X.shape[0], self.num_probes), dtype=y.dtype)
        _, res = cg_solve(matvec, jnp.concatenate([y, Z], axis=1),
                          max_iters=self.max_cg_iters, tol=self.cg_tol, M_inv=M_inv)
        res = np.asarray(res)
        return float(res[0]), float(res[1:].max())

    def log_marginal_likelihood(self):
        c = self.X[:, 0].astype(jnp.int32)
        x = self.X[:, 1:]
        y = self._residual_y()
        mask = getattr(self, "_row_mask", None)
        val = _lml_iter(self._static(), x, c, self._noise_diag(), y, mask,
                        self._kernel_params())
        if mask is None:
            const = self.log_marginal_likelihood_constant
        else:
            const = 0.5 * jnp.sum(mask) * np.log(2.0 * np.pi)
        return val - const

    def log_marginal_likelihood_readout(self, max_cg_iters=None, cg_tol=None,
                                        num_probes=None, lanczos_iters=None,
                                        precond_rank=None, seeds=1):
        """Evaluation-grade LML of the CURRENT parameters.

        Training steps keep the cheap per-step budget — the probe-trace
        gradients are unbiased at ANY budget, so optimization converges
        regardless — and their CG-coefficient logdet estimate is
        budget-limited AND (in f32, at long chains) Lanczos-ghost-biased.
        This method computes the value with a different, evaluation-grade
        estimator: the quadratic term by chunked preconditioned CG, and
        the logdet as the EXACT logdet(P) (Woodbury eigen-split of the
        pivoted-Cholesky factor) plus a fully REORTHOGONALIZED stochastic
        Lanczos quadrature of tr log(P^{-1/2} K P^{-1/2}) on a
        precision-"highest" operator (ops/iterative.py). The
        preconditioner rank is the dominant accuracy lever — it crushes
        ‖log(P⁻¹K)‖_F, shrinking both the Hutchinson variance and the
        Lanczos-degree requirement; `seeds` averages independent probe
        streams across executables (error ∝ 1/√(seeds·probes)).

        Measured on TPU-f32 against the dense-exact LML at N=16,384:
        relative error 3e-5 at the default rank 256 (1.5% at rank 64);
        self-consistent to ~0.04% across seeds and ranks at N=65,536
        (benchmarks/iter_tune.py VSDENSE/READOUT cells, round 5). Warm
        wall cost at N=65,536: ~2.4 min for the whole evaluation call
        (pivoted factor + chunked CG + reorthogonalized quadrature,
        compile-cache primed) — a one-time cost per model-selection
        readout, not a per-step cost.

        Use for model selection (BIC/AIC), convergence reporting, or any
        place the LML value itself matters. Gradients are not needed here,
        so each call is forward-only (no low-rank backward)."""
        max_cg = int(max_cg_iters if max_cg_iters is not None
                     else max(250, self.max_cg_iters))
        tol = float(cg_tol if cg_tol is not None else min(self.cg_tol, 1e-10))
        probes = int(num_probes if num_probes is not None
                     else max(64, self.num_probes))
        lanczos = int(lanczos_iters if lanczos_iters is not None
                      else max(64, self.lanczos_iters))
        # rank 256 default: the dominant accuracy lever. Validated against
        # the dense-exact LML at N=16,384 on TPU (iter_tune VSDENSE cells):
        # rank 256 → 3e-5 relative, rank 64 → 1.5%. The pivoted factor
        # costs O(n·rank) memory and rank sequential pivot steps — noise
        # next to the quadrature itself.
        rank = int(precond_rank if precond_rank is not None
                   else max(256, self.precond_rank))
        rank = min(rank, self.X.shape[0])

        base = self._static()
        c = self.X[:, 0].astype(jnp.int32)
        x = self.X[:, 1:]
        y = self._residual_y()
        mask = getattr(self, "_row_mask", None)
        params = self._kernel_params()
        noise = self._noise_diag()
        if mask is not None:
            # padded mesh rows: keep the training-path estimate (the
            # identity extension interacts with P; budgets still raised),
            # averaged over `seeds` independent probe streams like the
            # unmasked path
            vals_m = []
            for s in range(int(seeds)):
                static = (base[0], base[1], max_cg, tol, probes, lanczos,
                          self.seed + 7919 * s, base[7], rank, base[9],
                          base[10])
                fn = jax.jit(lambda x_, c_, nd, y_, p, static=static:
                             _lml_iter(static, x_, c_, nd, y_, mask, p))
                vals_m.append(fn(x, c, noise, y, params))
            val = jnp.mean(jnp.stack(vals_m))
            const = 0.5 * jnp.sum(mask) * np.log(2.0 * np.pi)
            return val - const
        # piece-wise executables: ONE jit call covering pivot + CG +
        # reorthogonalized Lanczos at N=65k runs past the tunneled TPU
        # worker's ~100 s single-executable kill (CLAUDE.md) — factor,
        # solve, and quadrature each get their own call, and the probe
        # key is a traced ARGUMENT so seed averaging reuses one executable
        static = (base[0], base[1], max_cg, tol, probes, lanczos,
                  self.seed, base[7], rank, base[9], base[10])
        n = x.shape[0]

        @jax.jit
        def factor_fn(x_, c_, nd, p):
            return _pivoted_factor(static, x_, c_, nd, p)

        L, sigma2 = factor_fn(x, c, noise, params)

        # the CG solve runs in CHUNKED executables (restarted PCG, warm
        # X0): one 250-iteration high-precision-matvec executable at
        # N=65k outlives the worker kill even alone. The r-by-r Woodbury
        # inner factor is computed ONCE and threaded into every chunk.
        chunk = 48
        yc = y.astype(_solve_dt(y.dtype)).reshape(n, -1)

        @jax.jit
        def inner_fn(L_, s2):
            return woodbury_m_inv(L_, s2)[1]

        Linner = inner_fn(L, sigma2)

        @jax.jit
        def solve_chunk(x_, c_, nd, y_, p, L_, s2, Li, X0):
            matvec = _make_matvec(static, x_, c_, nd, p, hp=True)
            M_inv, _ = woodbury_m_inv(L_, s2, Linner=Li)
            return cg_solve(matvec, y_, max_iters=chunk, tol=tol,
                            M_inv=M_inv, X0=X0)

        # cg_solve floors tol at 32 eps of the solve dtype — compare the
        # host-side early exit against the SAME effective tolerance, or
        # converged f32 solves (frozen at ~3.8e-6 > 1e-10) would never
        # break and every chunk would run regardless
        tol_eff = max(float(tol), 32.0 * float(jnp.finfo(yc.dtype).eps))
        alpha = jnp.zeros_like(yc)
        for _ in range(-(-max_cg // chunk)):
            alpha, res = solve_chunk(x, c, noise, yc, params, L, sigma2,
                                     Linner, alpha)
            if float(jnp.max(res)) <= tol_eff:
                break
        quad = -0.5 * jnp.sum(yc * alpha)

        @jax.jit
        def logdet_fn(x_, c_, nd, p, L_, s2, key):
            matvec = _make_matvec(static, x_, c_, nd, p, hp=True)
            return preconditioned_slq_logdet(
                matvec, L_, s2, n, num_probes=probes,
                lanczos_iters=lanczos, key=key,
                dtype=_solve_dt(noise.dtype))

        lds = [logdet_fn(x, c, noise, params, L, sigma2,
                         jax.random.PRNGKey(self.seed + 1 + 7919 * s))
               for s in range(int(seeds))]
        val = quad - 0.5 * jnp.mean(jnp.stack(lds))
        return val - self.log_marginal_likelihood_constant

    def predict_f(self, X, full=False, block_size=1024):
        """Posterior via CG solves, blocked over the prediction grid.

        The diagonal-variance path never materializes the N×S cross-Gram:
        prediction points are processed in `block_size` column blocks under
        lax.scan — per-block memory is N×B for the cross block and the CG
        state, so predicting at N=65k with arbitrarily large grids stays
        within the single-chip HBM budget the training path established.
        `full=True` (an S×S posterior covariance) necessarily materializes
        N×S and S×S and is intended for small grids.
        """
        self._sync_mesh()
        X = self._check_input(X)
        c = self.X[:, 0].astype(jnp.int32)
        x = self.X[:, 1:]
        cs = X[:, 0].astype(jnp.int32)
        xs = X[:, 1:]
        y = self._residual_y()
        mask = getattr(self, "_row_mask", None)
        params = self._kernel_params()
        static = self._static()
        family, O = static[0], static[1]
        use_pallas = static[7]
        matvec = _make_matvec(static, x, c, self._noise_diag(), params,
                              mask=mask)
        M_inv = _make_preconditioner(static, x, c, self._noise_diag(), params)
        if mask is not None:
            # mesh-padded rows (use_mesh with non-divisible N): the masked
            # matvec solves M(K+σ²)M + (I−M); zeroing the padded targets and
            # cross-covariance rows makes the fake points contribute exactly
            # nothing (their alpha/V coordinates solve to 0). M_inv stays the
            # unmasked preconditioner — any SPD M_inv leaves the CG fixed
            # point unchanged.
            y = y * mask.reshape(-1, 1)

        alpha, _ = cg_solve(matvec, y, max_iters=self.max_cg_iters,
                            tol=self.cg_tol, M_inv=M_inv)

        def cross(cs_b, xs_b):
            # K(X_train, X_s block): (N, B) — the only O(N·B) temp
            if use_pallas:
                from ..ops.fused import fused_gram
                Kfs_b = fused_gram(family, O, x, c, xs_b, cs_b, params)
            else:
                _, dense, _ = resolve_family(family)
                Kfs_b = dense(c, x, cs_b, xs_b, params)
            if mask is not None:
                Kfs_b = Kfs_b * mask.reshape(-1, 1).astype(Kfs_b.dtype)
            return Kfs_b

        if full:
            Kfs = cross(cs, xs)
            V, _ = cg_solve(matvec, Kfs, max_iters=self.max_cg_iters,
                            tol=self.cg_tol, M_inv=M_inv)
            mu_s = Kfs.T @ alpha
            Kss = self.kernel.K(X)
            var_s = Kss - Kfs.T @ V
        else:
            S = xs.shape[0]
            B = int(min(block_size, S))
            pad = (-S) % B
            xs_p = jnp.pad(xs, ((0, pad), (0, 0)))
            cs_p = jnp.pad(cs, (0, pad))
            nb = (S + pad) // B

            def body(_, i):
                xs_b = jax.lax.dynamic_slice(xs_p, (i * B, 0), (B, xs_p.shape[1]))
                cs_b = jax.lax.dynamic_slice(cs_p, (i * B,), (B,))
                Kfs_b = cross(cs_b, xs_b)                        # N x B
                V_b, _ = cg_solve(matvec, Kfs_b, max_iters=self.max_cg_iters,
                                  tol=self.cg_tol, M_inv=M_inv)
                return None, (Kfs_b.T @ alpha[:, 0],             # B
                              jnp.sum(Kfs_b * V_b, axis=0))      # B
            _, (mus, qfs) = jax.lax.scan(body, None, jnp.arange(nb))
            mu_s = mus.reshape(-1)[:S].reshape(-1, 1)
            Kss_diag = self.kernel.K_diag(X)
            var_s = (Kss_diag - qfs.reshape(-1)[:S]).reshape(-1, 1)

        if self.mean is not None:
            mu_s = mu_s + self.mean(X).reshape(-1, 1)
        return mu_s, var_s
