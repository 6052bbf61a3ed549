"""Single-output kernels.

Capability parity with mogptk/gpr/singleoutput.py (15 kernels, lines 5-656),
re-derived as pure jnp expressions. All kernels produce an (N,M) Gram matrix
from stationary distances or dot products; XLA fuses the elementwise chains
into a single VPU pass per kernel, and einsum contractions hit the MXU.
"""
import numpy as np
import jax.numpy as jnp

from .kernel import Kernel
from .parameter import Parameter
from .config import config

_pi = np.pi


class WhiteKernel(Kernel):
    """K(x,x') = σ² I (reference: gpr/singleoutput.py:5-35)."""

    def __init__(self, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        if X2 is None:
            return self.magnitude() * jnp.eye(X1.shape[0], dtype=config.dtype)
        return jnp.zeros((X1.shape[0], X2.shape[0]), dtype=config.dtype)

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude()


class ConstantKernel(Kernel):
    """K(x,x') = σ² (reference: gpr/singleoutput.py:37-67)."""

    def __init__(self, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        if X2 is None:
            X2 = X1
        return self.magnitude() * jnp.ones((X1.shape[0], X2.shape[0]), dtype=config.dtype)

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude()


class LinearKernel(Kernel):
    """K(x,x') = σ² x·x' + c (reference: gpr/singleoutput.py:69-101)."""

    def __init__(self, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.bias = Parameter(0.0, lower=0.0)
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        if X2 is None:
            X2 = X1
        return self.magnitude() * (X1 @ X2.T) + self.bias()

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return self.magnitude() * jnp.sum(X1 * X1, axis=1) + self.bias()


class PolynomialKernel(Kernel):
    """K(x,x') = (σ² x·x' + c)^d (reference: gpr/singleoutput.py:103-138)."""

    def __init__(self, degree, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.degree = degree
        self.bias = Parameter(0.0, lower=0.0)
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        if X2 is None:
            X2 = X1
        return (self.magnitude() * (X1 @ X2.T) + self.bias()) ** self.degree

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return (self.magnitude() * jnp.sum(X1 * X1, axis=1) + self.bias()) ** self.degree


class FunctionKernel(Kernel):
    """K(x,x') = φ(x)ᵀ Σ φ(x') for a feature map φ
    (reference: gpr/singleoutput.py:140-179)."""

    def __init__(self, phi, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        out = phi(jnp.ones((42, input_dims), dtype=config.dtype))
        out = jnp.asarray(out)
        if out.ndim != 2 or out.shape[0] != 42:
            raise ValueError("phi must take (data_points,input_dims) as input, and return (data_points,feature_dims) as output")
        feature_dims = out.shape[1]
        self.magnitude = Parameter(jnp.ones(feature_dims), lower=config.positive_minimum)
        self.phi = phi

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        f1 = self.phi(X1)
        f2 = f1 if X2 is None else self.phi(X2)
        return (f1 * self.magnitude()[None, :]) @ f2.T

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        f1 = self.phi(X1)
        return jnp.sum(f1 * self.magnitude()[None, :] * f1, axis=1)


class ExponentialKernel(Kernel):
    """K(x,x') = σ² exp(−τ/(2l)) (reference: gpr/singleoutput.py:181-216)."""

    def __init__(self, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)
        self.lengthscale = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)

    def K(self, X1, X2=None):
        # per-dimension unroll keeps temps at (N,M) — no lane-padded (N,M,D)
        X1, X2 = self._active_input(X1, X2)
        X2e = X1 if X2 is None else X2
        invl = 1.0 / self.lengthscale()
        acc = None
        for d in range(self.input_dims):
            t = jnp.abs(X1[:, d][:, None] - X2e[:, d][None, :]) * invl[d]
            acc = t if acc is None else acc + t
        return self.magnitude() * jnp.exp(-0.5 * acc)

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude()


def _prec_factor(kernel):
    """Upper factor R with M = RᵀR of the precision matrix (D×D, tiny)."""
    M = _lengthscale_matrix(kernel)
    # M is SPD by construction; its Cholesky is a D×D op (negligible cost)
    return jnp.linalg.cholesky(M).T


def _quadform_gemm(kernel, X1, X2):
    """τᵀMτ for all pairs via the GEMM squared-distance identity:
    with z = X Rᵀ (M = RᵀR), τᵀMτ = ‖z1‖² + ‖z2‖² − 2 z1·z2ᵀ.
    No (N,M,D) broadcast temp (whose minor D axis would be lane-padded on
    TPU); the cross term is one MXU matmul."""
    from .config import sensitive_matmul_scope
    with sensitive_matmul_scope():
        # the subtraction cancels to ~‖τ‖² ≪ ‖z‖² for nearby points, so the
        # cross GEMM runs at the sensitive (full-f32) matmul precision
        R = _prec_factor(kernel)
        z1 = X1 @ R.T
        z2 = z1 if X2 is None else X2 @ R.T
        sq1 = jnp.sum(z1 * z1, axis=1)
        sq2 = sq1 if X2 is None else jnp.sum(z2 * z2, axis=1)
        q = sq1[:, None] + sq2[None, :] - 2.0 * (z1 @ z2.T)
    return jnp.maximum(q, 0.0)


def _quadform_unrolled(tau_fn, D, Mmat):
    """τᵀMτ with per-dimension unrolling for non-linear per-dim transforms
    (e.g. sin(πτ/p)); tau_fn(d) must return the (N,M) slice for dim d."""
    cols = [tau_fn(d) for d in range(D)]
    out = None
    for i in range(D):
        row = None
        for j in range(D):
            term = Mmat[i, j] * cols[j]
            row = term if row is None else row + term
        contrib = cols[i] * row
        out = contrib if out is None else out + contrib
    return out


def _lengthscale_matrix(kernel):
    """Precision matrix M = LLᵀ + diag(l)⁻² shared by the SE/RQ/periodic
    family (reference: gpr/singleoutput.py:252-262 and analogues)."""
    if kernel.order == -1:
        inv2 = jnp.tile(1.0 / kernel.lengthscale() ** 2, kernel.input_dims)
        return jnp.diag(inv2)
    elif kernel.order == 0:
        return jnp.diag(1.0 / kernel.lengthscale() ** 2)
    else:
        L = kernel.cross_lengthscale()
        return L @ L.T + jnp.diag(1.0 / kernel.lengthscale() ** 2)




class SquaredExponentialKernel(Kernel):
    """K(x,x') = σ² exp(−½ τᵀMτ) with optional cross-lengthscales
    (reference: gpr/singleoutput.py:218-268)."""

    def __init__(self, order=0, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        lengthscale = 1.0 if order == -1 else jnp.ones(input_dims)
        self.order = order
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)
        self.lengthscale = Parameter(lengthscale, lower=config.positive_minimum)
        if 0 < order:
            self.cross_lengthscale = Parameter(jnp.ones((input_dims, order)), lower=config.positive_minimum)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        return self.magnitude() * jnp.exp(-0.5 * _quadform_gemm(self, X1, X2))

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude()


class RationalQuadraticKernel(Kernel):
    """K(x,x') = σ² (1 + τᵀMτ/(2α))^(−α) (reference: gpr/singleoutput.py:270-323)."""

    def __init__(self, alpha=1.0, order=0, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        lengthscale = 1.0 if order == -1 else jnp.ones(input_dims)
        self.alpha = alpha
        self.order = order
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)
        self.lengthscale = Parameter(lengthscale, lower=config.positive_minimum)
        if 0 < order:
            self.cross_lengthscale = Parameter(jnp.ones((input_dims, order)), lower=config.positive_minimum)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        power = 1.0 + 0.5 * _quadform_gemm(self, X1, X2) / self.alpha
        return self.magnitude() * power ** (-self.alpha)

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude()


class PeriodicKernel(Kernel):
    """K(x,x') = σ² exp(−2 sin²(πτ/p)ᵀ M sin²) (reference: gpr/singleoutput.py:325-379)."""

    def __init__(self, order=0, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        lengthscale = 1.0 if order == -1 else jnp.ones(input_dims)
        self.order = order
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)
        self.period = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)
        self.lengthscale = Parameter(lengthscale, lower=config.positive_minimum)
        if 0 < order:
            self.cross_lengthscale = Parameter(jnp.ones((input_dims, order)), lower=config.positive_minimum)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        X2e = X1 if X2 is None else X2
        p = self.period()
        M = _lengthscale_matrix(self)
        sin_d = lambda d: jnp.sin(_pi * (X1[:, d][:, None] - X2e[:, d][None, :]) / p[d])
        return self.magnitude() * jnp.exp(-2.0 * _quadform_unrolled(sin_d, self.input_dims, M))

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude()


class LocallyPeriodicKernel(Kernel):
    """Periodic × squared-exponential envelope (reference: gpr/singleoutput.py:381-436)."""

    def __init__(self, order=0, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        lengthscale = 1.0 if order == -1 else jnp.ones(input_dims)
        self.order = order
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)
        self.period = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)
        self.lengthscale = Parameter(lengthscale, lower=config.positive_minimum)
        if 0 < order:
            self.cross_lengthscale = Parameter(jnp.ones((input_dims, order)), lower=config.positive_minimum)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        X2e = X1 if X2 is None else X2
        p = self.period()
        M = _lengthscale_matrix(self)
        sin_d = lambda d: jnp.sin(_pi * (X1[:, d][:, None] - X2e[:, d][None, :]) / p[d])
        tau_d = lambda d: X1[:, d][:, None] - X2e[:, d][None, :]
        q1 = _quadform_unrolled(sin_d, self.input_dims, M)
        q2 = _quadform_unrolled(tau_d, self.input_dims, M)
        return self.magnitude() * jnp.exp(-2.0 * q1 - 0.5 * q2)

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude()


class CosineKernel(Kernel):
    """K(x,x') = σ² cos(2πτ/l) (reference: gpr/singleoutput.py:438-473)."""

    def __init__(self, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)
        self.lengthscale = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)

    def K(self, X1, X2=None):
        # tensordot(τ, v) is rank-1: (X1·v)[:,None] − (X2·v)[None,:]
        X1, X2 = self._active_input(X1, X2)
        X2e = X1 if X2 is None else X2
        v = 1.0 / self.lengthscale()
        z1 = X1 @ v
        z2 = z1 if X2 is None else X2e @ v
        return self.magnitude() * jnp.cos(2.0 * _pi * (z1[:, None] - z2[None, :]))

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude()


class SincKernel(Kernel):
    """K(x,x') = σ² sinc(Δτ) cos(2πξ₀τ) (reference: gpr/singleoutput.py:475-518)."""

    def __init__(self, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)
        self.frequency = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)
        self.bandwidth = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)

    @staticmethod
    def _sinc(x):
        x = jnp.where(x == 0.0, 1e-20, x)
        return jnp.sin(_pi * x) / (_pi * x)

    def K(self, X1, X2=None):
        # both contractions are linear in τ → rank-1 projections
        X1, X2 = self._active_input(X1, X2)
        X2e = X1 if X2 is None else X2
        b1 = X1 @ self.bandwidth()
        b2 = b1 if X2 is None else X2e @ self.bandwidth()
        f1 = X1 @ self.frequency()
        f2 = f1 if X2 is None else X2e @ self.frequency()
        sinc = b1[:, None] - b2[None, :]
        cos = 2.0 * _pi * (f1[:, None] - f2[None, :])
        return self.magnitude() * self._sinc(sinc) * jnp.cos(cos)

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude()


class SpectralKernel(Kernel):
    """K(x,x') = σ² exp(−2π²τ²Σ) cos(2πμτ) — Wilson & Adams spectral component
    (reference: gpr/singleoutput.py:520-561)."""

    def __init__(self, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.magnitude = Parameter(1.0, lower=config.positive_minimum)
        self.mean = Parameter(jnp.zeros(input_dims), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        X2e = X1 if X2 is None else X2
        var = self.variance()
        mu = self.mean()
        acc = None
        for d in range(self.input_dims):
            taud = X1[:, d][:, None] - X2e[:, d][None, :]
            t = jnp.exp(-2.0 * _pi ** 2 * taud * taud * var[d]) * jnp.cos(2.0 * _pi * taud * mu[d])
            acc = t if acc is None else acc + t
        return self.magnitude() * acc

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude() * self.input_dims


class SpectralMixtureKernel(Kernel):
    """K(x,x') = Σ_q σ_q² Σ_d exp(−2π²τ_d²Σ_qd) cos(2πμ_qd τ_d)
    (reference: gpr/singleoutput.py:563-605 — the reference SUMS the per-dim
    exp·cos terms, einsum 'q,qnmd,qnmd->nm', exactly like its SpectralKernel;
    this keeps SpectralMixtureKernel(Q, D) == MixtureKernel(SpectralKernel(D), Q))."""

    def __init__(self, Q=1, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.Q = Q
        self.magnitude = Parameter(jnp.ones(Q), lower=config.positive_minimum)
        self.mean = Parameter(jnp.zeros((Q, input_dims)), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((Q, input_dims)), lower=config.positive_minimum)

    def K(self, X1, X2=None):
        # Q and D unrolled in Python: every temp is (N,M), fusing into one
        # elementwise pass (a (Q,N,M)/(N,M,D) temp would be fine/minor-padded
        # respectively; this form is safe for both axes)
        X1, X2 = self._active_input(X1, X2)
        X2e = X1 if X2 is None else X2
        mag = self.magnitude()
        var = self.variance()
        mu = self.mean()
        K = None
        for q in range(self.Q):
            acc = None
            for d in range(self.input_dims):
                taud = X1[:, d][:, None] - X2e[:, d][None, :]
                t = (jnp.exp(-2.0 * _pi ** 2 * taud * taud * var[q, d])
                     * jnp.cos(2.0 * _pi * taud * mu[q, d]))
                acc = t if acc is None else acc + t
            Kq = mag[q] * acc
            K = Kq if K is None else K + Kq
        return K

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return (jnp.full((X1.shape[0],), 1.0, dtype=config.dtype)
                * jnp.sum(self.magnitude()) * self.input_dims)


class MaternKernel(Kernel):
    """Matérn kernel for ν ∈ {1/2, 3/2, 5/2} (reference: gpr/singleoutput.py:607-655)."""

    def __init__(self, nu=0.5, input_dims=1, active_dims=None):
        super().__init__(input_dims, active_dims)
        if nu not in [0.5, 1.5, 2.5]:
            raise ValueError("nu parameter must be 0.5, 1.5, or 2.5")
        self.nu = nu
        self.magnitude = Parameter(1.0, lower=1e-6)
        self.lengthscale = Parameter(jnp.ones(input_dims), lower=1e-6)

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        # |Σ_d τ_d / l_d| as a rank-1 projection: all temps stay (N, M) —
        # the (N, M, D) distance tensor would be lane-padded to 128 on TPU
        X2e = X1 if X2 is None else X2
        v = 1.0 / self.lengthscale()
        p1 = X1 @ v
        p2 = X2e @ v
        dist = jnp.abs(p1[:, None] - p2[None, :])
        if self.nu == 0.5:
            constant = 1.0
        elif self.nu == 1.5:
            constant = 1.0 + np.sqrt(3.0) * dist
        else:
            constant = 1.0 + np.sqrt(5.0) * dist + 5.0 / 3.0 * dist ** 2
        return self.magnitude() * constant * jnp.exp(-np.sqrt(self.nu * 2.0) * dist)

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return jnp.full((X1.shape[0],), 1.0, dtype=config.dtype) * self.magnitude()
