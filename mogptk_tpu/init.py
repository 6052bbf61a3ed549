"""Bayesian Nonparametric Spectral Estimation (BNSE), Tobar 2018.

Capability parity with mogptk/init.py:5-122: fit an exact GP with a spectral
kernel to the signal, then compute the closed-form posterior over the Fourier
transform of f via time↔frequency cross-kernels; the PSD follows a
generalized chi-squared distribution. The inner GP fit and the frequency-
domain linear algebra run as jitted XLA programs.
"""
import numpy as np
import jax.numpy as jnp

from . import gpr
from .ops.linalg import jittered_cholesky, cholesky_solve, solve_triangular

_pi = np.pi


def _kernel_ff(f1, f2, magnitude, mean, variance, alpha):
    """Freq-freq covariance of the windowed spectral GP
    (reference: mogptk/init.py:61-70)."""
    mean = mean.reshape(1, 1, -1)
    variance = variance.reshape(1, 1, -1)
    gamma = 2.0 * _pi ** 2 * variance
    const = 0.5 * _pi * magnitude / jnp.sqrt(alpha ** 2 + 2.0 * alpha * jnp.prod(gamma))
    sqdist = (f1[:, None, :] - f2[None, :, :]) ** 2
    avg = 0.5 * (f1[:, None, :] + f2[None, :, :])
    exp1 = -0.5 * _pi ** 2 / alpha * sqdist
    exp2a = -2.0 * _pi ** 2 / (alpha + 2.0 * gamma) * (avg - mean) ** 2
    exp2b = -2.0 * _pi ** 2 / (alpha + 2.0 * gamma) * (avg + mean) ** 2
    return const * jnp.sum(jnp.exp(exp1 + exp2a) + jnp.exp(exp1 + exp2b), axis=2)


def _kernel_tf(t, f, magnitude, mean, variance, alpha):
    """Time-freq cross covariance, real and imaginary parts
    (reference: mogptk/init.py:72-90, including the empirically corrected
    Lq_inv inversion at init.py:78)."""
    mean = mean.reshape(1, -1)
    variance = variance.reshape(1, -1)
    gamma = 2.0 * _pi ** 2 * variance
    Lq_inv = _pi ** 2 * (1.0 / alpha + 1.0 / gamma)
    Lq_inv = 1.0 / Lq_inv

    const = jnp.sqrt(_pi / (alpha + jnp.prod(gamma)))
    exp1 = -_pi ** 2 * jnp.tensordot(t ** 2, Lq_inv.T, axes=1)          # Nx1
    exp2a = -jnp.tensordot(_pi ** 2 / (alpha + gamma), (f - mean).T ** 2, axes=1)  # 1xM
    exp2b = -jnp.tensordot(_pi ** 2 / (alpha + gamma), (f + mean).T ** 2, axes=1)  # 1xM
    exp3a = -2.0 * _pi * jnp.tensordot(t @ Lq_inv, _pi ** 2 * (f / alpha + mean / gamma).T, axes=1)  # NxM
    exp3b = -2.0 * _pi * jnp.tensordot(t @ Lq_inv, _pi ** 2 * (f / alpha - mean / gamma).T, axes=1)  # NxM

    a = 0.5 * magnitude * const * jnp.exp(exp1)
    real = jnp.exp(exp2a) * jnp.cos(exp3a) + jnp.exp(exp2b) * jnp.cos(exp3b)
    imag = jnp.exp(exp2a) * jnp.sin(exp3a) + jnp.exp(exp2b) * jnp.sin(exp3b)
    return a * real, a * imag


def BNSE(x, y, y_err=None, max_freq=None, n=1000, iters=100):
    """Estimate the PSD of a signal via BNSE (reference: mogptk/init.py:5-122).

    Args:
        x: Input data of shape (data_points,).
        y: Output data of shape (data_points,).
        y_err: Optional std.dev. per point.
        max_freq: Maximum frequency (defaults to the Nyquist estimate).
        n: Number of frequency grid points.
        iters: Training iterations for the inner GP fit.

    Returns:
        (frequencies, psd_mean, psd_variance) as numpy arrays of shape (n,).
    """
    x = np.asarray(x, dtype=np.float64).copy()
    y = np.asarray(y, dtype=np.float64)
    x -= np.median(x)
    x_range = np.max(x) - np.min(x)
    x_dist = x_range / len(x)
    if max_freq is None:
        max_freq = 0.5 / x_dist

    x2 = x.reshape(-1, 1)
    y2 = y.reshape(-1, 1)

    kernel = gpr.SpectralKernel()
    model = gpr.Exact(kernel, x2, y2,
                      data_variance=(np.asarray(y_err) ** 2
                                     if y_err is not None else None))

    # initialize parameters as the reference does (init.py:40-48)
    magnitude = float(np.var(y))
    mean = 0.01
    variance = 0.25 / _pi ** 2 / x_dist ** 2
    noise = float(np.std(y)) / 10.0
    model.kernel.magnitude.assign(magnitude)
    model.kernel.mean.assign(mean, upper=max_freq)
    model.kernel.variance.assign(variance)
    model.likelihood.scale.assign(noise)

    # train the inner GP (Adam lr=2.0 as in the reference, init.py:54-56)
    gpr.train(model, method="Adam", lr=2.0, iters=iters)

    alpha = float(0.5 / x_range ** 2)
    w = jnp.linspace(0.0, max_freq, n).reshape(-1, 1)

    xj = jnp.asarray(x2, dtype=gpr.config.dtype)
    yj = jnp.asarray(y2, dtype=gpr.config.dtype)

    mag = kernel.magnitude()
    mu = kernel.mean()
    var = kernel.variance()

    Ktt = kernel.K(xj)
    noise_diag = model.likelihood.scale() ** 2 * jnp.eye(xj.shape[0], dtype=gpr.config.dtype)
    Ktt = Ktt + noise_diag
    if model.data_variance is not None:
        Ktt = Ktt + jnp.diag(model.data_variance)
    Ltt = jittered_cholesky(Ktt, model.jitter)

    Kff = _kernel_ff(w, w, mag, mu, var, alpha)
    Pff = _kernel_ff(w, -w, mag, mu, var, alpha)
    Kff_real = 0.5 * (Kff + Pff)
    Kff_imag = 0.5 * (Kff - Pff)

    Ktf_real, Ktf_imag = _kernel_tf(xj, w, mag, mu, var, alpha)

    a = cholesky_solve(Ltt, yj)
    b = solve_triangular(Ltt, Ktf_real)
    c = solve_triangular(Ltt, Ktf_imag)

    mu_real = Ktf_real.T @ a
    mu_imag = Ktf_imag.T @ a
    var_real = jnp.diagonal(Kff_real - b.T @ b).reshape(-1, 1)
    var_imag = jnp.diagonal(Kff_imag - c.T @ c).reshape(-1, 1)

    # PSD = N(mu_r,var_r)² + N(mu_i,var_i)² — generalized chi-squared moments
    psd_mean = mu_real ** 2 + mu_imag ** 2 + var_real + var_imag
    psd_var = (2.0 * var_real ** 2 + 2.0 * var_imag ** 2
               + 4.0 * var_real * mu_real ** 2 + 4.0 * var_imag * mu_imag ** 2)

    return (np.asarray(w).reshape(-1),
            np.asarray(psd_mean).reshape(-1),
            np.asarray(psd_var).reshape(-1))
