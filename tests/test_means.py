"""Mean function tests and full-vs-diagonal prediction consistency across
every inference model."""
import numpy as np
import pytest
import jax.numpy as jnp

import mogptk_tpu.gpr as gpr


def test_constant_mean():
    m = gpr.ConstantMean()
    m.bias.assign(2.5)
    X = np.random.rand(5, 1)
    np.testing.assert_allclose(np.asarray(m(X)), 2.5 * np.ones((5, 1)), rtol=1e-8)


def test_linear_mean():
    m = gpr.LinearMean(input_dims=2)
    m.bias.assign(1.0)
    m.slope.assign([2.0, -1.0])
    X = np.array([[1.0, 1.0], [0.0, 2.0]])
    np.testing.assert_allclose(np.asarray(m(X)).reshape(-1), [2.0, -1.0], rtol=1e-8)


def test_multioutput_mean_dispatch():
    m0 = gpr.ConstantMean()
    m0.bias.assign(1.0)
    m1 = gpr.LinearMean()
    m1.slope.assign([3.0])
    mo = gpr.MultiOutputMean(m0, m1)
    X = np.array([[0.0, 0.5], [1.0, 0.5], [0.0, 2.0], [1.0, 2.0]])
    out = np.asarray(mo(X)).reshape(-1)
    np.testing.assert_allclose(out, [1.0, 1.5, 1.0, 6.0], rtol=1e-8)


def test_exact_model_with_trainable_mean():
    rng = np.random.RandomState(0)
    X = np.linspace(0, 5, 40).reshape(-1, 1)
    y = 2.0 * X + 1.0 + 0.3 * np.sin(4 * X) + 0.05 * rng.randn(40, 1)
    mean = gpr.LinearMean()
    model = gpr.Exact(gpr.SquaredExponentialKernel(), X, y, variance=0.1, mean=mean)
    losses, _ = gpr.train(model, method="Adam", lr=0.05, iters=150)
    # the linear mean should absorb the trend
    assert abs(float(mean.slope().squeeze()) - 2.0) < 0.5
    mu, var = model.predict_f(X)
    assert np.mean(np.abs(np.asarray(mu) - y)) < 0.3


def test_ard_kernel():
    k = gpr.AutomaticRelevanceDeterminationKernel(gpr.SquaredExponentialKernel(input_dims=1), 3)
    X = np.random.RandomState(0).rand(6, 3)
    K = np.asarray(k(X))
    # product over per-dimension SE kernels
    expected = np.ones((6, 6))
    for d in range(3):
        expected *= np.asarray(gpr.SquaredExponentialKernel()(X[:, d:d + 1]))
    np.testing.assert_allclose(K, expected, rtol=1e-7)


@pytest.mark.parametrize("factory", [
    lambda k, X, y: gpr.Exact(k, X, y, variance=0.1, jitter=0.0),
    lambda k, X, y: gpr.Titsias(k, X, y, Z=8, variance=0.1),
    lambda k, X, y: gpr.Snelson(k, X, y, Z=8, variance=0.1),
    lambda k, X, y: gpr.SparseHensman(k, X, y, Z=8, likelihood=gpr.GaussianLikelihood(0.3)),
    lambda k, X, y: gpr.OpperArchambeau(k, X, y, likelihood=gpr.GaussianLikelihood(0.3)),
], ids=["exact", "titsias", "snelson", "hensman", "opper"])
def test_full_covariance_diag_consistency(factory):
    """predict_f(full=True) diagonal must equal predict_f(full=False) for
    every inference model (the reference's Snelson full branch was broken,
    gpr/model.py:571)."""
    rng = np.random.RandomState(0)
    X = np.linspace(0, 5, 24).reshape(-1, 1)
    y = np.sin(1.3 * X) + 0.05 * rng.randn(24, 1)
    model = factory(gpr.SquaredExponentialKernel(), X, y)
    Xs = np.linspace(0.5, 4.5, 9).reshape(-1, 1)
    mu_d, var_d = model.predict_f(Xs, full=False)
    mu_f, var_f = model.predict_f(Xs, full=True)
    np.testing.assert_allclose(np.asarray(mu_f), np.asarray(mu_d), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.diag(np.asarray(var_f)).reshape(-1, 1),
                               np.asarray(var_d), rtol=1e-5, atol=1e-7)


@pytest.mark.parametrize("factory", [
    lambda k, X, y, m: gpr.OpperArchambeau(
        k, X, y, likelihood=gpr.GaussianLikelihood(0.3), mean=m),
    lambda k, X, y, m: gpr.Hensman(
        k, X, y, likelihood=gpr.GaussianLikelihood(0.3), mean=m),
], ids=["opper", "hensman_nonsparse"])
def test_variational_training_with_mean_is_unbiased(factory):
    """y is the mean-residual and qf_mu the zero-mean GP part: subtracting
    the mean from qf_mu in the ELBO (as the reference does) makes q fit the
    RAW y and predictions come out biased by +mean. Train with a large
    constant mean and require predictions near the data, not mean-shifted."""
    rng = np.random.RandomState(0)
    X = np.linspace(0, 5, 30).reshape(-1, 1)
    y = 10.0 + np.sin(1.3 * X) + 0.05 * rng.randn(30, 1)
    mean = gpr.ConstantMean()
    mean.bias.assign(10.0)
    mean.bias.train = False
    model = factory(gpr.SquaredExponentialKernel(), X, y, mean)
    gpr.train(model, method="Adam", lr=0.02, iters=500)
    mu, _ = model.predict_f(X)
    err = float(np.max(np.abs(np.asarray(mu) - y)))
    assert err < 1.5, "predictions biased by the mean (max err %.2f)" % err
