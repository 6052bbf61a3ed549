"""Multi-output kernels — the library's raison d'être.

Capability parity with mogptk/gpr/multioutput.py (8 kernels, lines 5-553),
redesigned TPU-first. The reference assembles the Gram matrix channel-pair by
channel-pair in a Python loop with boolean-mask writes (gpr/kernel.py:446-481)
— data-dependent shapes that XLA cannot compile. Here each kernel computes
tiny cross-channel parameter tables of shape (O,O,...) — the exact algebra of
the reference's Ksub cross terms (e.g. gpr/multioutput.py:103-117) — then
produces the full (N,M) Gram in one fused broadcast/gather pass driven by
per-point channel IDs. The cross formulas reduce exactly to the diagonal
formulas at i==j, so no branch is needed and shapes stay static.
"""
import numpy as np
import jax.numpy as jnp

from .kernel import Kernel, MultiOutputKernel
from .parameter import Parameter
from .config import config

_pi = np.pi


def _pair(table, c1, c2):
    """Gather an (O,O,...) pair table at (c1[n], c2[m]) → (N,M,...)."""
    return table[c1[:, None], c2[None, :]]


class IndependentMultiOutputKernel(MultiOutputKernel):
    """Block-diagonal kernel: one subkernel per channel, no cross-channel
    correlation (reference: mogptk/gpr/multioutput.py:5-39)."""

    def __init__(self, *kernels, output_dims=None):
        if output_dims is None:
            output_dims = len(kernels)
        super().__init__(output_dims)
        self.kernels = self._check_kernels(kernels, output_dims)

    def __getitem__(self, key):
        return self.kernels[key]

    def name(self):
        return "%s[%s]" % (self.__class__.__name__, ",".join(k.name() for k in self.kernels))

    def K_mo(self, c1, x1, c2, x2=None):
        x2e = x1 if x2 is None else x2
        # Only diagonal blocks are nonzero: mask each channel's subkernel over
        # the full input. O× elementwise overhead versus the reference's
        # per-block loop, but fully fused and static-shaped.
        out = jnp.zeros((x1.shape[0], x2e.shape[0]), dtype=config.dtype)
        for i in range(self.output_dims):
            m1 = (c1 == i).astype(config.dtype)[:, None]
            m2 = (c2 == i).astype(config.dtype)[None, :]
            out = out + m1 * self.kernels[i].K(x1, x2e) * m2
        return out

    def K_mo_diag(self, c1, x1):
        out = jnp.zeros((x1.shape[0],), dtype=config.dtype)
        for i in range(self.output_dims):
            m1 = (c1 == i).astype(config.dtype)
            out = out + m1 * self.kernels[i].K_diag(x1)
        return out

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        if i == j:
            return self.kernels[i].K(X1, X2)
        if X2 is None:
            X2 = X1
        return jnp.zeros((X1.shape[0], X2.shape[0]), dtype=config.dtype)

    def Ksub_diag(self, i, X1):
        X1, _ = self._active_input(X1)
        return self.kernels[i].K_diag(X1)


def _mosm_tables(w, mu, var, theta, phi, twopi):
    """Cross-channel MOSM parameter tables from per-channel parameters.

    Implements the closed-form cross-spectral algebra of Parra & Tobar 2017
    (reference: mogptk/gpr/multioutput.py:103-117 and 188-203):
      Σij = 2Σi(Σi+Σj)⁻¹Σj,  μij = (Σi+Σj)⁻¹(Σiμj+Σjμi),
      wij = wiwj·exp(−π²(μi−μj)ᵀ(Σi+Σj)⁻¹(μi−μj)),
      αij = wij·(2π)^(D/2)·√(∏Σij),  θij = θi−θj,  φij = φi−φj.
    All shapes (O,Q,D)/(O,Q) → tables (O,O,Q,D)/(O,O,Q). At i==j these reduce
    exactly to the diagonal formulas, so one table drives the whole Gram.
    """
    inv_var = 1.0 / (var[:, None] + var[None, :])                    # OxOxQxD
    diff_mean = mu[:, None] - mu[None, :]                            # OxOxQxD
    magnitude = w[:, None] * w[None, :] * jnp.exp(
        -_pi ** 2 * jnp.sum(diff_mean * inv_var * diff_mean, axis=-1))  # OxOxQ
    mean_ij = inv_var * (var[:, None] * mu[None, :] + var[None, :] * mu[:, None])  # OxOxQxD
    var_ij = 2.0 * var[:, None] * inv_var * var[None, :]             # OxOxQxD
    delay_ij = theta[:, None] - theta[None, :]                       # OxOxQxD
    phase_ij = phi[:, None] - phi[None, :]                           # OxOxQ
    alpha_ij = magnitude * twopi * jnp.sqrt(jnp.prod(var_ij, axis=-1))  # OxOxQ
    return alpha_ij, mean_ij, var_ij, delay_ij, phase_ij


def _mosm_K(c1, x1, c2, x2, tables, phase_inside_2pi=True):
    """Evaluate the MOSM Gram from pair tables with per-point-pair gathers."""
    alpha_ij, mean_ij, var_ij, delay_ij, phase_ij = tables
    x2e = x1 if x2 is None else x2
    tau = x1[:, None, :] - x2e[None, :, :]                           # NxMxD

    a = _pair(alpha_ij, c1, c2)                                      # NxMxQ
    m = _pair(mean_ij, c1, c2)                                       # NxMxQxD
    v = _pair(var_ij, c1, c2)                                        # NxMxQxD
    d = _pair(delay_ij, c1, c2)                                      # NxMxQxD
    p = _pair(phase_ij, c1, c2)                                      # NxMxQ

    tau_delay = tau[:, :, None, :] + d                               # NxMxQxD
    expo = jnp.exp(-0.5 * jnp.sum(tau_delay ** 2 * v, axis=-1))      # NxMxQ
    ang = jnp.sum(tau_delay * m, axis=-1)                            # NxMxQ
    if phase_inside_2pi:
        cos = jnp.cos(2.0 * _pi * (ang + p))
    else:
        cos = jnp.cos(2.0 * _pi * ang + p)
    return jnp.sum(a * expo * cos, axis=-1)                          # NxM


class MultiOutputSpectralKernel(MultiOutputKernel):
    """Multi-output spectral kernel (MOSM, Q=1), Parra & Tobar 2017
    (reference: mogptk/gpr/multioutput.py:41-123)."""

    def __init__(self, output_dims, input_dims=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.weight = Parameter(jnp.ones(output_dims), lower=config.positive_minimum)
        self.mean = Parameter(jnp.zeros((output_dims, input_dims)), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((output_dims, input_dims)), lower=config.positive_minimum)
        self.delay = Parameter(jnp.zeros((output_dims, input_dims)))
        self.phase = Parameter(jnp.zeros(output_dims))
        if output_dims == 1:
            self.delay.train = False
            self.phase.train = False
        self.twopi = np.power(2.0 * np.pi, float(input_dims) / 2.0)

    def _tables(self):
        return _mosm_tables(self.weight()[:, None], self.mean()[:, None, :],
                            self.variance()[:, None, :], self.delay()[:, None, :],
                            self.phase()[:, None], self.twopi)

    def K_mo(self, c1, x1, c2, x2=None):
        return _mosm_K(c1, x1, c2, x2, self._tables(), phase_inside_2pi=True)

    def K_mo_diag(self, c1, x1):
        variance = self.variance()  # OxD
        alpha = self.weight() ** 2 * self.twopi * jnp.sqrt(jnp.prod(variance, axis=-1))  # O
        return alpha[c1]

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return _mosm_K(c1, X1, c2, X2, self._tables(), phase_inside_2pi=True)


class MultiOutputSpectralMixtureKernel(MultiOutputKernel):
    """Multi-output spectral mixture kernel (MOSM with Q components),
    Parra & Tobar 2017 (reference: mogptk/gpr/multioutput.py:125-210)."""

    def __init__(self, Q, output_dims, input_dims=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.Q = Q
        self.weight = Parameter(jnp.ones((output_dims, Q)), lower=config.positive_minimum)
        self.mean = Parameter(jnp.zeros((output_dims, Q, input_dims)), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((output_dims, Q, input_dims)), lower=config.positive_minimum)
        self.delay = Parameter(jnp.zeros((output_dims, Q, input_dims)))
        self.phase = Parameter(jnp.zeros((output_dims, Q)))
        if output_dims == 1:
            self.delay.train = False
            self.phase.train = False
        self.twopi = np.power(2.0 * np.pi, float(input_dims) / 2.0)

    def _tables(self):
        return _mosm_tables(self.weight(), self.mean(), self.variance(),
                            self.delay(), self.phase(), self.twopi)

    def K_mo(self, c1, x1, c2, x2=None):
        return _mosm_K(c1, x1, c2, x2, self._tables(), phase_inside_2pi=True)

    def K_mo_diag(self, c1, x1):
        variance = self.variance()  # OxQxD
        alpha = self.weight() ** 2 * self.twopi * jnp.sqrt(jnp.prod(variance, axis=-1))  # OxQ
        return jnp.sum(alpha, axis=-1)[c1]

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return _mosm_K(c1, X1, c2, X2, self._tables(), phase_inside_2pi=True)


class UncoupledMultiOutputSpectralKernel(MultiOutputKernel):
    """uMOSM: MOSM with a trained lower-triangular cross-channel weight
    (reference: mogptk/gpr/multioutput.py:212-293)."""

    def __init__(self, output_dims, input_dims=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.weight = Parameter(jnp.tril(jnp.ones((output_dims, output_dims))))
        self.weight.num_parameters = int((output_dims * output_dims + output_dims) / 2)
        self.mean = Parameter(jnp.zeros((output_dims, input_dims)), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((output_dims, input_dims)), lower=config.positive_minimum)
        self.delay = Parameter(jnp.zeros((output_dims, input_dims)))
        self.phase = Parameter(jnp.zeros(output_dims))
        if output_dims == 1:
            self.delay.train = False
            self.phase.train = False
        self.twopi = np.power(2.0 * np.pi, float(input_dims) / 2.0)

    def _tables(self):
        W = jnp.tril(self.weight())
        magnitude = W @ W.T  # OxO; replaces the wi·wj factor of MOSM
        mu = self.mean()[:, None, :]
        var = self.variance()[:, None, :]
        theta = self.delay()[:, None, :]
        phi = self.phase()[:, None]
        inv_var = 1.0 / (var[:, None] + var[None, :])
        diff_mean = mu[:, None] - mu[None, :]
        mag = magnitude[:, :, None] * jnp.exp(
            -_pi ** 2 * jnp.sum(diff_mean * inv_var * diff_mean, axis=-1))
        mean_ij = inv_var * (var[:, None] * mu[None, :] + var[None, :] * mu[:, None])
        var_ij = 2.0 * var[:, None] * inv_var * var[None, :]
        delay_ij = theta[:, None] - theta[None, :]
        phase_ij = phi[:, None] - phi[None, :]
        alpha_ij = mag * self.twopi * jnp.sqrt(jnp.prod(var_ij, axis=-1))
        return alpha_ij, mean_ij, var_ij, delay_ij, phase_ij

    def K_mo(self, c1, x1, c2, x2=None):
        # reference places the phase outside the 2π factor for uMOSM
        # (gpr/multioutput.py:285)
        return _mosm_K(c1, x1, c2, x2, self._tables(), phase_inside_2pi=False)

    def K_mo_diag(self, c1, x1):
        W = jnp.tril(self.weight())
        magnitude = jnp.diagonal(W @ W.T)  # O
        variance = self.variance()
        alpha = magnitude * self.twopi * jnp.sqrt(jnp.prod(variance, axis=-1))
        return alpha[c1]

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return _mosm_K(c1, X1, c2, X2, self._tables(), phase_inside_2pi=False)


class MultiOutputHarmonizableSpectralKernel(MultiOutputKernel):
    """MOHSM: nonstationary harmonizable spectral kernel, Altamirano 2021
    (reference: mogptk/gpr/multioutput.py:295-395)."""

    def __init__(self, output_dims, input_dims=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.weight = Parameter(jnp.ones(output_dims), lower=config.positive_minimum)
        self.mean = Parameter(jnp.zeros((output_dims, input_dims)), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((output_dims, input_dims)), lower=config.positive_minimum)
        self.lengthscale = Parameter(jnp.ones(output_dims), lower=config.positive_minimum)
        self.center = Parameter(jnp.zeros(input_dims))
        self.delay = Parameter(jnp.zeros((output_dims, input_dims)))
        self.phase = Parameter(jnp.zeros(output_dims))
        if output_dims == 1:
            self.delay.train = False
            self.phase.train = False
        self.twopi = np.power(2.0 * np.pi, float(input_dims))

    def _tables(self):
        l2 = self.lengthscale() ** 2  # O
        inv_l = 1.0 / (l2[:, None] + l2[None, :])          # OxO
        lengthscale_ij = 2.0 * l2[:, None] * inv_l * l2[None, :]  # OxO
        alpha_ij, mean_ij, var_ij, delay_ij, phase_ij = _mosm_tables(
            self.weight()[:, None], self.mean()[:, None, :],
            self.variance()[:, None, :], self.delay()[:, None, :],
            self.phase()[:, None], self.twopi)
        alpha_ij = alpha_ij * jnp.power(jnp.sqrt(lengthscale_ij), float(self.input_dims))[:, :, None]
        return alpha_ij, mean_ij, var_ij, delay_ij, phase_ij, lengthscale_ij

    def K_mo(self, c1, x1, c2, x2=None):
        alpha_ij, mean_ij, var_ij, delay_ij, phase_ij, lengthscale_ij = self._tables()
        x2e = x1 if x2 is None else x2
        base = _mosm_K(c1, x1, c2, x2,
                       (alpha_ij, mean_ij, var_ij, delay_ij, phase_ij),
                       phase_inside_2pi=False)
        avg = 0.5 * (x1[:, None, :] + x2e[None, :, :])     # NxMxD
        l_nm = _pair(lengthscale_ij, c1, c2)               # NxM
        dist2 = jnp.sum((avg - self.center()) ** 2, axis=-1)  # NxM
        return base * jnp.exp(-0.5 * dist2 * l_nm)

    def K_mo_diag(self, c1, x1):
        variance = self.variance()
        l2 = self.lengthscale() ** 2  # O
        alpha = (self.weight() ** 2 * self.twopi * jnp.sqrt(jnp.prod(variance, axis=-1))
                 * jnp.power(jnp.sqrt(l2), float(self.input_dims)))
        dist2 = jnp.sum((x1 - self.center()) ** 2, axis=-1)
        return alpha[c1] * jnp.exp(-0.5 * dist2 * l2[c1])

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return self.K_mo(c1, X1, c2, X2)


class CrossSpectralKernel(MultiOutputKernel):
    """Cross-spectral kernel (CSM) with Rq phase-shifted subcomponents,
    Ulrich et al. 2015 (reference: mogptk/gpr/multioutput.py:397-454)."""

    def __init__(self, output_dims, input_dims=1, Rq=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.Rq = Rq
        self.amplitude = Parameter(jnp.ones((output_dims, Rq)), lower=config.positive_minimum)
        self.mean = Parameter(jnp.zeros(input_dims), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)
        self.shift = Parameter(jnp.zeros((output_dims, Rq)))

    def K_mo(self, c1, x1, c2, x2=None):
        x2e = x1 if x2 is None else x2
        tau = x1[:, None, :] - x2e[None, :, :]             # NxMxD
        a1 = self.amplitude()[c1]                          # NxRq
        a2 = self.amplitude()[c2]                          # MxRq
        s1 = self.shift()[c1]                              # NxRq
        s2 = self.shift()[c2]                              # MxRq
        amplitude = jnp.sqrt(a1[:, None, :] * a2[None, :, :])  # NxMxRq
        shift = s1[:, None, :] - s2[None, :, :]            # NxMxRq
        expo = jnp.exp(-0.5 * jnp.tensordot(tau ** 2, self.variance(), axes=1))  # NxM
        ang = jnp.tensordot(tau, self.mean(), axes=1)      # NxM
        cos = jnp.cos(2.0 * _pi * (ang[:, :, None] + shift))  # NxMxRq
        return jnp.sum(amplitude * expo[:, :, None] * cos, axis=-1)

    def K_mo_diag(self, c1, x1):
        return jnp.sum(self.amplitude(), axis=-1)[c1]

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return self.K_mo(c1, X1, c2, X2)


class LinearModelOfCoregionalizationKernel(MultiOutputKernel):
    """LMC: K_ij = Σ_q (Σ_r w_iqr·w_jqr)·k_q(x,x'), Goovaerts 1997
    (reference: mogptk/gpr/multioutput.py:456-502).

    TPU design: each base kernel is evaluated once over the full input (the
    bases are channel-independent), and the coregionalization weights enter as
    a per-point-pair contraction einsum('nqr,mqr->nmq') on the MXU — strictly
    fewer FLOPs than the reference's per-pair block loop.
    """

    def __init__(self, *kernels, output_dims, input_dims=1, Q=None, Rq=1):
        super().__init__(output_dims, input_dims)
        if Q is None:
            Q = len(kernels)
        kernels = self._check_kernels(kernels, Q)
        self.kernels = kernels
        self.Q = Q
        self.Rq = Rq
        self.weight = Parameter(jnp.ones((output_dims, Q, Rq)), lower=config.positive_minimum)

    def __getitem__(self, key):
        return self.kernels[key]

    def name(self):
        return "%s[%s]" % (self.__class__.__name__, ",".join(k.name() for k in self.kernels))

    def K_mo(self, c1, x1, c2, x2=None):
        x2e = x1 if x2 is None else x2
        w1 = self.weight()[c1]                              # NxQxR
        w2 = self.weight()[c2]                              # MxQxR
        B = jnp.einsum("nqr,mqr->nmq", w1, w2)              # NxMxQ
        Ks = jnp.stack([k.K(x1, x2e) for k in self.kernels], axis=-1)  # NxMxQ
        return jnp.sum(B * Ks, axis=-1)

    def K_mo_diag(self, c1, x1):
        w1 = self.weight()[c1]                              # NxQxR
        B = jnp.sum(w1 * w1, axis=-1)                       # NxQ
        Ks = jnp.stack([k.K_diag(x1) for k in self.kernels], axis=-1)  # NxQ
        return jnp.sum(B * Ks, axis=-1)

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        magnitude = jnp.sum(self.weight()[i] * self.weight()[j], axis=-1)  # Q
        Ks = jnp.stack([k.K(X1, X2) for k in self.kernels], axis=-1)
        return jnp.tensordot(Ks, magnitude, axes=1)

    def Ksub_diag(self, i, X1):
        X1, _ = self._active_input(X1)
        magnitude = jnp.sum(self.weight()[i] ** 2, axis=-1)
        Ks = jnp.stack([k.K_diag(X1) for k in self.kernels], axis=-1)
        return jnp.tensordot(Ks, magnitude, axes=1)


class GaussianConvolutionProcessKernel(MultiOutputKernel):
    """Gaussian convolution process kernel (CONV), Álvarez & Lawrence 2009
    (reference: mogptk/gpr/multioutput.py:504-553)."""

    def __init__(self, output_dims, input_dims=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.weight = Parameter(jnp.ones(output_dims), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((output_dims, input_dims)), lower=0.0)
        self.base_variance = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)

    def K_mo(self, c1, x1, c2, x2=None):
        x2e = x1 if x2 is None else x2
        tau2 = (x1[:, None, :] - x2e[None, :, :]) ** 2      # NxMxD
        v1 = self.variance()[c1]                            # NxD
        v2 = self.variance()[c2]                            # MxD
        w1 = self.weight()[c1]                              # N
        w2 = self.weight()[c2]                              # M
        base = self.base_variance()                         # D
        variances = v1[:, None, :] + v2[None, :, :] + base  # NxMxD; = 2Σi+Σ0 at i==j
        magnitude = (w1[:, None] * w2[None, :]
                     * jnp.sqrt(jnp.prod(base) / jnp.prod(variances, axis=-1)))  # NxM
        expo = jnp.exp(-0.5 * jnp.sum(tau2 / variances, axis=-1))
        return magnitude * expo

    def K_mo_diag(self, c1, x1):
        variances = 2.0 * self.variance() + self.base_variance()  # OxD
        magnitude = self.weight() ** 2 * jnp.sqrt(
            jnp.prod(self.base_variance()) / jnp.prod(variances, axis=-1))  # O
        return magnitude[c1]

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return self.K_mo(c1, X1, c2, X2)
