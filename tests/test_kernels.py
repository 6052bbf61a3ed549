"""Kernel unit tests.

Includes the reference's own assertion surface (K_diag == diag(K) for every
kernel, tests/unit/test_kernels.py:43-57) plus stronger properties: PSD-ness,
symmetry, cross-kernel consistency, and multi-output identities (MOSM i==j
reduces to a spectral kernel).
"""
import numpy as np
import pytest
import jax.numpy as jnp

import mogptk_tpu.gpr as gpr


def single_output_kernels():
    k = [
        gpr.WhiteKernel(),
        gpr.ConstantKernel(),
        gpr.LinearKernel(),
        gpr.PolynomialKernel(2),
        gpr.FunctionKernel(lambda x: jnp.concatenate([x, x ** 2], axis=1)),
        gpr.ExponentialKernel(),
        gpr.SquaredExponentialKernel(),
        gpr.SquaredExponentialKernel(order=-1),
        gpr.SquaredExponentialKernel(order=2),
        gpr.RationalQuadraticKernel(alpha=2.0),
        gpr.PeriodicKernel(),
        gpr.LocallyPeriodicKernel(),
        gpr.CosineKernel(),
        gpr.SincKernel(),
        gpr.SpectralKernel(),
        gpr.SpectralMixtureKernel(Q=3),
        gpr.MaternKernel(nu=0.5),
        gpr.MaternKernel(nu=1.5),
        gpr.MaternKernel(nu=2.5),
        gpr.SquaredExponentialKernel() + gpr.CosineKernel(),
        gpr.SquaredExponentialKernel() * gpr.CosineKernel(),
        gpr.MixtureKernel(gpr.SpectralKernel(), 3),
        gpr.ChangePointsKernel([0.5], 1.0, gpr.SquaredExponentialKernel(), gpr.CosineKernel()),
    ]
    return k


def multi_output_kernels():
    return [
        gpr.IndependentMultiOutputKernel(gpr.SquaredExponentialKernel(), gpr.CosineKernel(), output_dims=2),
        gpr.MultiOutputSpectralKernel(output_dims=2),
        gpr.MultiOutputSpectralMixtureKernel(2, output_dims=2),
        gpr.UncoupledMultiOutputSpectralKernel(output_dims=2),
        gpr.MultiOutputHarmonizableSpectralKernel(output_dims=2),
        gpr.CrossSpectralKernel(output_dims=2, Rq=2),
        gpr.LinearModelOfCoregionalizationKernel(
            gpr.SquaredExponentialKernel(), gpr.SpectralKernel(), output_dims=2),
        gpr.GaussianConvolutionProcessKernel(output_dims=2),
    ]


X1 = np.array([[1.0], [2.0], [3.0], [4.5]])
X2 = np.array([[2.5], [3.5]])
XMO = np.array([[0.0, 1.0], [0.0, 2.0], [1.0, 1.5], [1.0, 3.0], [0.0, 4.0]])


@pytest.mark.parametrize("kernel", single_output_kernels(), ids=lambda k: k.name())
def test_kdiag_matches_k_diagonal(kernel):
    # the reference's own test (tests/unit/test_kernels.py:44-57)
    K = np.asarray(kernel(X1))
    K_diag = np.asarray(kernel.K_diag(jnp.asarray(X1)))
    np.testing.assert_allclose(K_diag, np.diagonal(K), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("kernel", single_output_kernels(), ids=lambda k: k.name())
def test_symmetry_and_psd(kernel):
    K = np.asarray(kernel(X1))
    np.testing.assert_allclose(K, K.T, rtol=1e-8, atol=1e-10)
    eig = np.linalg.eigvalsh(K + 1e-8 * np.eye(K.shape[0]))
    assert eig.min() > -1e-6, "kernel must be PSD, got min eig %g" % eig.min()


@pytest.mark.parametrize("kernel", single_output_kernels(), ids=lambda k: k.name())
def test_cross_matches_gram(kernel):
    # K(X1, X1) must equal K(X1) for every kernel except White (which is
    # defined to be zero off the Gram path, gpr/singleoutput.py:25-30)
    if isinstance(kernel, gpr.WhiteKernel):
        return
    K_gram = np.asarray(kernel(X1))
    K_cross = np.asarray(kernel(X1, X1))
    np.testing.assert_allclose(K_cross, K_gram, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("kernel", multi_output_kernels(), ids=lambda k: k.name())
def test_mo_kdiag_matches_k_diagonal(kernel):
    K = np.asarray(kernel(XMO))
    K_diag = np.asarray(kernel.K_diag(jnp.asarray(XMO)))
    np.testing.assert_allclose(K_diag, np.diagonal(K), rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("kernel", multi_output_kernels(), ids=lambda k: k.name())
def test_mo_symmetry_and_blocks(kernel):
    K = np.asarray(kernel(XMO))
    np.testing.assert_allclose(K, K.T, rtol=1e-8, atol=1e-10)
    # the Gram assembled from per-point gathers must equal block-wise Ksub eval
    c = XMO[:, 0].astype(int)
    x = jnp.asarray(XMO[:, 1:])
    for i in range(2):
        for j in range(2):
            idx_i = np.where(c == i)[0]
            idx_j = np.where(c == j)[0]
            block = np.asarray(kernel.Ksub(i, j, x[idx_i], x[idx_j] if (i != j or True) else None))
            np.testing.assert_allclose(K[np.ix_(idx_i, idx_j)], block, rtol=1e-7, atol=1e-9,
                                       err_msg="block (%d,%d) mismatch" % (i, j))


def test_mosm_diag_block_reduces_to_spectral():
    """MOSM with one channel reduces to a (scaled) spectral kernel — analytic
    identity from Parra & Tobar 2017."""
    mosm = gpr.MultiOutputSpectralKernel(output_dims=1)
    mosm.weight.assign([0.7])
    mosm.mean.assign([[0.3]])
    mosm.variance.assign([[0.5]])

    sk = gpr.SpectralKernel()
    # MOSM parametrizes the spectral Gaussian directly: alpha = w²(2π)^(D/2)√Σ,
    # exp(−τ²Σ/2)cos(2πμτ); SpectralKernel uses exp(−2π²τ²Σ')cos(2πμ'τ).
    # Match: Σ' = Σ/(4π²), μ' = μ, magnitude = alpha.
    w, mu, var = 0.7, 0.3, 0.5
    alpha = w ** 2 * np.sqrt(2.0 * np.pi) * np.sqrt(var)
    sk.magnitude.assign(alpha)
    sk.mean.assign([mu])
    sk.variance.assign([var / (4.0 * np.pi ** 2)])

    X = np.concatenate([np.zeros((4, 1)), X1], axis=1)
    K_mosm = np.asarray(mosm(X))
    K_s = np.asarray(sk(X1))
    np.testing.assert_allclose(K_mosm, K_s, rtol=5e-7, atol=1e-12)


def test_lmc_equals_weighted_sum():
    lmc = gpr.LinearModelOfCoregionalizationKernel(
        gpr.SquaredExponentialKernel(), gpr.CosineKernel(), output_dims=2)
    lmc.weight.assign(np.array([[[0.5], [1.5]], [[2.0], [0.3]]]))
    K = np.asarray(lmc(XMO))
    c = XMO[:, 0].astype(int)
    x = XMO[:, 1:]
    K1 = np.asarray(lmc.kernels[0](x))
    K2 = np.asarray(lmc.kernels[1](x))
    w = np.array([[0.5, 1.5], [2.0, 0.3]])
    expected = (w[c][:, None, 0] * w[c][None, :, 0]) * K1 + (w[c][:, None, 1] * w[c][None, :, 1]) * K2
    np.testing.assert_allclose(K, expected, rtol=1e-7)


def test_add_mul_operators():
    k1 = gpr.SquaredExponentialKernel()
    k2 = gpr.CosineKernel()
    Ka = np.asarray((k1 + k2)(X1))
    Km = np.asarray((k1 * k2)(X1))
    np.testing.assert_allclose(Ka, np.asarray(k1(X1)) + np.asarray(k2(X1)), rtol=1e-8)
    np.testing.assert_allclose(Km, np.asarray(k1(X1)) * np.asarray(k2(X1)), rtol=1e-8)


def test_active_dims():
    k = gpr.SquaredExponentialKernel(input_dims=1, active_dims=[1])
    X = np.concatenate([np.random.rand(4, 1), X1], axis=1)
    np.testing.assert_allclose(np.asarray(k(X)), np.asarray(gpr.SquaredExponentialKernel()(X1)), rtol=1e-8)


def test_mixture_kernel_is_sum_of_clones():
    k = gpr.MixtureKernel(gpr.SpectralKernel(), 2)
    assert len(k.kernels) == 2
    # clones share values initially but are independent parameters
    k.kernels[0].magnitude.assign(2.0)
    K = np.asarray(k(X1))
    expected = np.asarray(k.kernels[0](X1)) + np.asarray(k.kernels[1](X1))
    np.testing.assert_allclose(K, expected, rtol=1e-8)


def test_nested_compositor_skips_channel_column():
    """A single-output compositor nested under a multi-output composite gets
    active_dims=[1] from _check_kernels — its K must APPLY it (the leaves
    previously read the channel-ID column as the time axis)."""
    mosm = gpr.MultiOutputSpectralKernel(output_dims=2)
    mix = gpr.MixtureKernel(gpr.SpectralKernel(), Q=2)
    k = mosm + mix
    assert mix.active_dims == [1]
    rng = np.random.RandomState(0)
    x = np.sort(rng.rand(12) * 5)
    X = np.column_stack([np.repeat([0.0, 1.0], 6), np.concatenate([x[:6], x[6:]])])
    K = np.asarray(k.K(jnp.asarray(X)))
    # the mixture part must depend only on the time axis: direct evaluation
    # on the stripped column must match K − MOSM part
    K_mix = np.asarray(mix.K(jnp.asarray(X)))
    K_mix_direct = None
    for sub in mix.kernels:
        t = np.asarray(sub.K(jnp.asarray(X[:, 1:])))
        K_mix_direct = t if K_mix_direct is None else K_mix_direct + t
    np.testing.assert_allclose(K_mix, K_mix_direct, rtol=1e-12)
    np.testing.assert_allclose(K, np.asarray(mosm.K(jnp.asarray(X))) + K_mix_direct,
                               rtol=1e-12)


def test_nested_changepoints_not_flattened():
    """ChangePoints regime weights depend on the nesting: a nested
    ChangePointsKernel must survive as one subkernel (the old
    same-class flatten dropped its locations/steepness)."""
    k1, k2, k3 = (gpr.SquaredExponentialKernel() for _ in range(3))
    inner = gpr.ChangePointsKernel([2.0], 1.0, k2, k3)
    outer = gpr.ChangePointsKernel([5.0], 1.0, k1, inner)
    assert len(outer.kernels) == 2
    X = jnp.asarray(np.linspace(0, 8, 16).reshape(-1, 1))
    K = np.asarray(outer.K(X))
    np.testing.assert_allclose(K, K.T, rtol=1e-12)
    np.testing.assert_allclose(np.diag(K), np.asarray(outer.K_diag(X)), rtol=1e-12)
    # Add/Mul still flatten like-kind compositors
    flat = (k1 + k2) + k3
    assert len(flat.kernels) == 3


def test_spectral_mixture_multidim_matches_mixture_of_spectrals():
    """The reference SUMS the per-dim exp·cos terms (einsum
    'q,qnmd,qnmd->nm'), so SpectralMixtureKernel(Q, D) must equal
    MixtureKernel(SpectralKernel(D), Q) at matched parameters — the product
    form silently diverged for D > 1."""
    rng = np.random.RandomState(0)
    Q, D, n = 2, 2, 14
    X = jnp.asarray(rng.rand(n, D) * 3)
    sm = gpr.SpectralMixtureKernel(Q=Q, input_dims=D)
    mag = 0.5 + rng.rand(Q)
    mu = 0.2 + rng.rand(Q, D)
    var = 0.3 + rng.rand(Q, D)
    sm.magnitude.assign(mag)
    sm.mean.assign(mu)
    sm.variance.assign(var)
    parts = []
    for q in range(Q):
        s = gpr.SpectralKernel(D)
        s.magnitude.assign(mag[q])
        s.mean.assign(mu[q])
        s.variance.assign(var[q])
        parts.append(s)
    mix = gpr.AddKernel(*parts)
    np.testing.assert_allclose(np.asarray(sm.K(X)), np.asarray(mix.K(X)),
                               rtol=1e-12)
    np.testing.assert_allclose(np.asarray(sm.K_diag(X)),
                               np.diag(np.asarray(sm.K(X))), rtol=1e-12)


def test_white_kernel_survives_multioutput_gram_path():
    """K_mo must forward x2=None (the Gram path): materializing X2 made
    WhiteKernel bases return zeros, silently dropping per-channel noise
    blocks inside IndependentMultiOutput and LMC composites."""
    rng = np.random.RandomState(0)
    n_per = 8
    x = np.sort(rng.rand(2 * n_per) * 5)
    X = jnp.asarray(np.column_stack([np.repeat([0.0, 1.0], n_per), x]))
    se_w = [gpr.SquaredExponentialKernel() + gpr.WhiteKernel() for _ in range(2)]
    for k in se_w:
        k[1].magnitude.assign(0.25)
    imo = gpr.IndependentMultiOutputKernel(*se_w, output_dims=2)
    K = np.asarray(imo.K(X))
    se_only = gpr.IndependentMultiOutputKernel(
        gpr.SquaredExponentialKernel(), gpr.SquaredExponentialKernel(),
        output_dims=2)
    K_se = np.asarray(se_only.K(X))
    np.testing.assert_allclose(K, K_se + 0.25 * np.eye(2 * n_per),
                               rtol=1e-10, atol=1e-12)
    # cross-Gram path still has NO white contribution
    Kx = np.asarray(imo.K(X, X))
    np.testing.assert_allclose(Kx, K_se, rtol=1e-10, atol=1e-12)
