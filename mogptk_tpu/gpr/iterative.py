"""ExactIterative: matmul-only exact GP inference (BBMM, Gardner et al. 2018).

Exact-GP training without Cholesky: the LML quadratic form is solved with
batched conjugate gradients, the log-determinant is estimated by stochastic
Lanczos quadrature, and the parameter gradients use the probe-vector trace
identity  dLML/dθ = ½ tr((ααᵀ − K⁻¹) ∂K/∂θ)  with K⁻¹ ≈ R⁻¹ Σ u_r z_rᵀ,
u_r = K⁻¹ z_r — i.e. a LOW-RANK cotangent.

For MOSM-family kernels every K-application runs through the fused Pallas
Gram matvec (ops/pallas_mosm.mosm_gram_matvec) and the low-rank cotangent is
consumed tile-by-tile (mosm_gram_lowrank_vjp): the N×N Gram is NEVER
materialized. This removes the O(N²) HBM wall of Cholesky inference — exact
GPs at N far beyond what the reference (or any materialized-K approach) can
hold on one chip.

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
                          MultiOutputSpectralMixtureKernel)
from .config import config
from ..ops.iterative import cg_solve, slq_logdet, pivoted_cholesky
from ..ops.pallas_mosm import mosm_gram_matvec, mosm_gram_lowrank_vjp


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def _lml_iter(static, x, c, noise_diag, y, mask, w, mu, var, theta, phi):
    """−½ yᵀK⁻¹y − ½ logdet(K) for K = MOSM(x,c;θ) + diag(noise).

    mask is an optional (N,) 0/1 row mask: masked-out rows act as independent
    unit-variance zeros (block-diagonal identity extension), so padded data
    under mesh sharding contributes exactly 0 to both terms."""
    val, _ = _lml_iter_fwd(static, x, c, noise_diag, y, mask, w, mu, var, theta, phi)
    return val


def _make_matvec(static, x, c, noise_diag, w, mu, var, theta, phi, mask=None):
    twopi, phase_inside, max_cg, tol, probes, lanczos_iters, seed, use_pallas, precond_rank = static[:9]
    ring = static[9] if len(static) > 9 else None

    if ring is not None:
        from ..parallel.ring import mosm_ring_matvec
        mesh, axis = ring

        def base(V):
            return mosm_ring_matvec(mesh, axis, x, c, noise_diag,
                                    (w, mu, var, theta, phi), twopi,
                                    phase_inside, use_pallas, V)
    elif use_pallas:
        def base(V):
            return (mosm_gram_matvec(x, c, x, c, w, mu, var, theta, phi,
                                     twopi, phase_inside, V)
                    + noise_diag[:, None] * V)
    else:
        from .multioutput import _mosm_K
        K = _mosm_K(c, x, c, None, (w, mu, var, theta, phi), twopi, phase_inside)

        def base(V):
            return K @ V + noise_diag[:, None] * V
    if mask is None:
        return base
    m = mask.reshape(-1, 1)

    def matvec(V):
        # apply M(K+σ²)M + (I−M): padded coordinates pass through untouched
        return m * base(m * V) + (1.0 - m) * V
    return matvec


def _make_preconditioner(static, x, c, noise_diag, w, mu, var, theta, phi):
    """Woodbury-inverted partial-pivoted-Cholesky preconditioner
    P = σ̄²I + L Lᵀ (Gardner et al. 2018). Returns M_inv or None."""
    twopi, phase_inside = static[0], static[1]
    precond_rank = static[8]
    if not precond_rank:
        return None
    from .multioutput import _mosm_K
    n = x.shape[0]
    sigma2 = jnp.mean(noise_diag)

    def K_row(i):
        xi = jax.lax.dynamic_slice(x, (i, 0), (1, x.shape[1]))
        ci = jax.lax.dynamic_slice(c, (i,), (1,))
        return _mosm_K(ci, xi, c, x, (w, mu, var, theta, phi), twopi, phase_inside)[0, :]

    def K_diag_fn():
        # MOSM diagonal is channel-constant: α_c = Σ_q w² twopi √(Πd Σ)
        alpha = (w ** 2) * twopi * jnp.sqrt(jnp.prod(var, axis=-1))   # O x Q
        return jnp.sum(alpha, axis=-1)[c]

    L = pivoted_cholesky(K_diag_fn(), K_row, n, precond_rank)
    r = L.shape[1]
    inner = sigma2 * jnp.eye(r, dtype=L.dtype) + L.T @ L
    Linner = jnp.linalg.cholesky(inner)

    def M_inv(V):
        t = L.T @ V
        t = jax.scipy.linalg.cho_solve((Linner, True), t)
        return (V - L @ t) / sigma2

    return M_inv


def _lml_iter_fwd(static, x, c, noise_diag, y, mask, w, mu, var, theta, phi):
    twopi, phase_inside, max_cg, tol, probes, lanczos_iters, seed, use_pallas, precond_rank = static[:9]
    n = x.shape[0]
    matvec = _make_matvec(static, x, c, noise_diag, w, mu, var, theta, phi, mask)
    M_inv = _make_preconditioner(static, x, c, noise_diag, w, mu, var, theta, phi)
    if mask is not None:
        y = y * mask.reshape(-1, 1)
        if M_inv is not None:
            m = mask.reshape(-1, 1)
            M0 = M_inv
            # keep the preconditioner consistent with the masked operator
            M_inv = lambda V: m * M0(m * V) + (1.0 - m) * V

    # one batched CG for y AND the gradient probes: (N, R+1) right-hand
    # sides fill the vector lanes, and the backward needs no solves at all
    Z = jax.random.rademacher(jax.random.PRNGKey(seed + 1), (n, probes), dtype=y.dtype)
    sols, _ = cg_solve(matvec, jnp.concatenate([y, Z], axis=1),
                       max_iters=max_cg, tol=tol, M_inv=M_inv)
    alpha = sols[:, :1]
    U = sols[:, 1:]
    logdet = slq_logdet(matvec, n, num_probes=probes, lanczos_iters=lanczos_iters,
                        key=jax.random.PRNGKey(seed), dtype=y.dtype)
    val = -0.5 * jnp.sum(y * alpha) - 0.5 * logdet
    return val, (x, c, noise_diag, y, mask, w, mu, var, theta, phi, alpha, U, Z)


def _lml_iter_bwd(static, res, g):
    twopi, phase_inside, max_cg, tol, probes, lanczos_iters, seed, use_pallas, precond_rank = static[:9]
    ring = static[9] if len(static) > 9 else None
    x, c, noise_diag, y, mask, w, mu, var, theta, phi, alpha, U, Z = res

    # dK = ½g(ααᵀ − R⁻¹ U Zᵀ) = A Bᵀ with (solves already done in fwd)
    A = (0.5 * g) * jnp.concatenate([alpha, -U / probes], axis=1)  # N x (R+1)
    B = jnp.concatenate([alpha, Z], axis=1)                        # N x (R+1)
    if mask is not None:
        # the kernel only sees the masked block: dK_masked = M dK M
        m = mask.reshape(-1, 1)
        A = A * m
        B = B * m

    if ring is not None:
        from ..parallel.ring import mosm_ring_lowrank_vjp
        mesh, axis_name = ring
        dw, dmu, dvar, dth, dph = mosm_ring_lowrank_vjp(
            mesh, axis_name, x, c, (w, mu, var, theta, phi), twopi,
            phase_inside, use_pallas, A, B)
    elif use_pallas:
        dw, dmu, dvar, dth, dph = mosm_gram_lowrank_vjp(
            x, c, x, c, w, mu, var, theta, phi, twopi, phase_inside, A, B)
    else:
        from .multioutput import _mosm_K
        dK = A @ B.T
        _, vjp = jax.vjp(lambda w_, mu_, var_, th_, ph_: _mosm_K(
            c, x, c, None, (w_, mu_, var_, th_, ph_), twopi, phase_inside),
            w, mu, var, theta, phi)
        dw, dmu, dvar, dth, dph = vjp(dK)

    dnoise = jnp.sum(A * B, axis=1)      # diag(A Bᵀ)
    dy = -g * alpha
    zeros = lambda a: jnp.zeros_like(a)
    dmask = None if mask is None else jnp.zeros_like(mask)
    return (zeros(x), zeros(c), dnoise, dy, dmask, dw, dmu, dvar, dth, dph)


_lml_iter.defvjp(_lml_iter_fwd, _lml_iter_bwd)


class ExactIterative(Model):
    """Exact GP regression with iterative (CG/SLQ) inference.

    Drop-in alternative to `Exact` for MOSM-family kernels
    (`MultiOutputSpectralKernel`, `MultiOutputSpectralMixtureKernel`):

    - the LML quadratic form: batched CG (`max_cg_iters`, `cg_tol`),
    - the log-determinant: stochastic Lanczos quadrature (`num_probes`,
      `lanczos_iters`) — a consistent stochastic estimate, so reported
      losses carry ~1% probe noise while gradients stay unbiased,
    - gradients: probe-vector trace estimation with a LOW-RANK cotangent
      consumed by the materialization-free Pallas VJP.

    Args mirror `Exact` plus the solver controls.
    """

    def __init__(self, kernel, X, y, variance=1.0, data_variance=None,
                 jitter=1e-8, mean=None, max_cg_iters=100, cg_tol=1e-5,
                 num_probes=16, lanczos_iters=32, seed=0, precond_rank=16):
        if not isinstance(kernel, (MultiOutputSpectralKernel, MultiOutputSpectralMixtureKernel)):
            raise ValueError(
                "ExactIterative currently supports the MOSM kernel family "
                "(MultiOutputSpectralKernel, MultiOutputSpectralMixtureKernel); "
                "use Exact for other kernels")

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
        self.precond_rank = precond_rank
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
            diag = diag + self.data_variance
        # small absolute floor in place of the Cholesky jitter ladder
        return diag + self.jitter

    def _static(self):
        from .config import pallas_enabled
        k = self.kernel
        return (k.twopi, True, self.max_cg_iters, self.cg_tol,
                self.num_probes, self.lanczos_iters, self.seed, pallas_enabled(),
                self.precond_rank, getattr(self, "_ring", None))

    def _kernel_params(self):
        return self.kernel._params()

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
        matvec = _make_matvec(static, x, c, self._noise_diag(), *params)
        M_inv = _make_preconditioner(static, x, c, self._noise_diag(), *params)
        Z = jax.random.rademacher(jax.random.PRNGKey(self.seed + 1),
                                  (self.X.shape[0], self.num_probes), dtype=y.dtype)
        _, res = cg_solve(matvec, jnp.concatenate([y, Z], axis=1),
                          max_iters=self.max_cg_iters, tol=self.cg_tol, M_inv=M_inv)
        res = np.asarray(res)
        return float(res[0]), float(res[1:].max())

    supports_row_mask = True

    def log_marginal_likelihood(self):
        c = self.X[:, 0].astype(jnp.int32)
        x = self.X[:, 1:]
        y = self._residual_y()
        w, mu, var, theta, phi = self._kernel_params()
        mask = getattr(self, "_row_mask", None)
        val = _lml_iter(self._static(), x, c, self._noise_diag(), y, mask,
                        w, mu, var, theta, phi)
        if mask is None:
            const = self.log_marginal_likelihood_constant
        else:
            const = 0.5 * jnp.sum(mask) * np.log(2.0 * np.pi)
        return val - const

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
        X = self._check_input(X)
        c = self.X[:, 0].astype(jnp.int32)
        x = self.X[:, 1:]
        cs = X[:, 0].astype(jnp.int32)
        xs = X[:, 1:]
        y = self._residual_y()
        params = self._kernel_params()
        w, mu, var, theta, phi = params
        static = self._static()
        twopi, phase_inside = static[0], static[1]
        use_pallas = static[7]
        matvec = _make_matvec(static, x, c, self._noise_diag(), *params)
        M_inv = _make_preconditioner(static, x, c, self._noise_diag(), *params)

        alpha, _ = cg_solve(matvec, y, max_iters=self.max_cg_iters,
                            tol=self.cg_tol, M_inv=M_inv)

        def cross(cs_b, xs_b):
            # K(X_train, X_s block): (N, B) — the only O(N·B) temp
            if use_pallas:
                from ..ops.pallas_mosm import mosm_gram
                return mosm_gram(x, c, xs_b, cs_b, w, mu, var, theta, phi,
                                 twopi, phase_inside)
            from .multioutput import _mosm_K
            return _mosm_K(c, x, cs_b, xs_b, params, twopi, phase_inside)

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
