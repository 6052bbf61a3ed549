"""Likelihood zoo tests: log-density correctness vs scipy, quadrature vs
closed forms, variational training with non-Gaussian likelihoods, and
multi-output channel dispatch."""
import numpy as np
import pytest
import jax.numpy as jnp
import scipy.stats as st

import mogptk_tpu.gpr as gpr


X1 = np.linspace(0, 1, 7).reshape(-1, 1)


def _lp(lik, y, f, X=None):
    if X is None:
        X = jnp.asarray(X1[: len(y)])
    return np.asarray(lik.log_prob(X, jnp.asarray(y).reshape(-1, 1), jnp.asarray(f).reshape(-1, 1))).reshape(-1)


def test_gaussian_log_prob():
    lik = gpr.GaussianLikelihood(0.7)
    y = np.array([0.1, -0.5, 2.0])
    f = np.array([0.0, 0.0, 1.5])
    np.testing.assert_allclose(_lp(lik, y, f), st.norm.logpdf(y, loc=f, scale=0.7), rtol=1e-6)


def test_studentt_log_prob():
    lik = gpr.StudentTLikelihood(dof=4, scale=0.5)
    y = np.array([0.1, -0.5, 2.0])
    f = np.array([0.0, 0.0, 1.5])
    np.testing.assert_allclose(_lp(lik, y, f), st.t.logpdf(y, df=4, loc=f, scale=0.5), rtol=1e-6)


def test_exponential_log_prob():
    lik = gpr.ExponentialLikelihood()
    y = np.array([0.5, 1.0, 2.0])
    f = np.array([0.1, -0.3, 0.7])
    np.testing.assert_allclose(_lp(lik, y, f), st.expon.logpdf(y, scale=np.exp(f)), rtol=1e-6)


def test_laplace_log_prob():
    lik = gpr.LaplaceLikelihood(scale=0.8)
    y = np.array([0.5, -1.0])
    f = np.array([0.1, 0.2])
    np.testing.assert_allclose(_lp(lik, y, f), st.laplace.logpdf(y, loc=f, scale=0.8), rtol=1e-6)


def test_bernoulli_log_prob():
    lik = gpr.BernoulliLikelihood()
    y = np.array([1.0, 0.0, 1.0])
    f = np.array([0.5, -0.5, 2.0])
    p = np.asarray(gpr.inv_probit(jnp.asarray(f)))
    expected = np.where(y == 1.0, np.log(p), np.log(1 - p))
    np.testing.assert_allclose(_lp(lik, y, f), expected, rtol=1e-6)


def test_beta_log_prob():
    lik = gpr.BetaLikelihood(scale=3.0)
    y = np.array([0.3, 0.7])
    f = np.array([0.1, -0.4])
    mix = np.asarray(gpr.inv_probit(jnp.asarray(f)))
    alpha = mix * 3.0
    beta = 3.0 - alpha
    np.testing.assert_allclose(_lp(lik, y, f), st.beta.logpdf(y, alpha, beta), rtol=1e-5)


def test_gamma_log_prob():
    lik = gpr.GammaLikelihood(shape=2.0)
    y = np.array([0.5, 1.5])
    f = np.array([0.1, -0.2])
    np.testing.assert_allclose(_lp(lik, y, f), st.gamma.logpdf(y, 2.0, scale=np.exp(f)), rtol=1e-6)


def test_poisson_log_prob():
    lik = gpr.PoissonLikelihood()
    y = np.array([0.0, 2.0, 5.0])
    f = np.array([0.1, 0.5, 1.5])
    np.testing.assert_allclose(_lp(lik, y, f), st.poisson.logpmf(y, np.exp(f)), rtol=1e-6)


def test_weibull_log_prob():
    lik = gpr.WeibullLikelihood(shape=1.5)
    y = np.array([0.5, 1.5])
    f = np.array([0.1, -0.2])
    np.testing.assert_allclose(_lp(lik, y, f), st.weibull_min.logpdf(y, 1.5, scale=np.exp(f)), rtol=1e-6)


def test_loglogistic_log_prob():
    lik = gpr.LogLogisticLikelihood(shape=2.0)
    y = np.array([0.5, 1.5])
    f = np.array([0.1, -0.2])
    np.testing.assert_allclose(_lp(lik, y, f), st.fisk.logpdf(y, 2.0, scale=np.exp(f)), rtol=1e-6)


def test_loggaussian_log_prob():
    lik = gpr.LogGaussianLikelihood(scale=0.6)
    y = np.array([0.5, 1.5])
    f = np.array([0.1, -0.2])
    np.testing.assert_allclose(_lp(lik, y, f), st.lognorm.logpdf(y, 0.6, scale=np.exp(f)), rtol=1e-6)


def test_chisquared_log_prob():
    lik = gpr.ChiSquaredLikelihood()
    y = np.array([0.5, 1.5])
    f = np.array([0.5, 1.0])
    np.testing.assert_allclose(_lp(lik, y, f), st.chi2.logpdf(y, np.exp(f)), rtol=1e-6)


def test_gaussian_variational_expectation_closed_form_matches_quadrature():
    """Gaussian var-exp has a closed form (gpr/likelihood.py:338-343); it must
    agree with the generic GH quadrature."""
    lik = gpr.GaussianLikelihood(0.7)
    X = jnp.asarray(X1[:3])
    y = jnp.asarray([[0.1], [0.5], [-0.3]])
    mu = jnp.asarray([[0.0], [0.4], [-0.1]])
    var = jnp.asarray([[0.2], [0.1], [0.3]])
    closed = float(lik.variational_expectation(X, y, mu, var))
    generic = float(gpr.Likelihood.variational_expectation(lik, X, y, mu, var))
    np.testing.assert_allclose(closed, generic, rtol=1e-8)


@pytest.mark.parametrize("lik_cls", [gpr.ExponentialLikelihood, gpr.PoissonLikelihood])
def test_exp_link_var_exp_closed_forms(lik_cls):
    lik = lik_cls()
    X = jnp.asarray(X1[:3])
    y = jnp.asarray([[1.0], [2.0], [3.0]])
    mu = jnp.asarray([[0.1], [0.4], [-0.1]])
    var = jnp.asarray([[0.2], [0.1], [0.3]])
    closed = float(lik.variational_expectation(X, y, mu, var))
    generic = float(gpr.Likelihood.variational_expectation(lik, X, y, mu, var))
    # quadrature deg=20 approximates the closed form
    np.testing.assert_allclose(closed, generic, rtol=1e-4)


def test_quadrature_integrates_polynomial_exactly():
    q = gpr.GaussHermiteQuadrature(deg=20, t_scale=np.sqrt(2), w_scale=1.0 / np.sqrt(np.pi))
    mu = jnp.asarray([[1.5]])
    var = jnp.asarray([[0.49]])
    # E[f^2] under N(1.5, 0.49) = mu^2 + var
    out = float(q(mu, var, lambda f: f ** 2).squeeze())
    np.testing.assert_allclose(out, 1.5 ** 2 + 0.49, rtol=1e-10)


def test_multioutput_likelihood_dispatch():
    """Per-channel dispatch must equal evaluating each likelihood on its own
    channel's points."""
    lik = gpr.MultiOutputLikelihood(gpr.GaussianLikelihood(0.5), gpr.BernoulliLikelihood())
    X = jnp.asarray([[0.0, 0.1], [1.0, 0.2], [0.0, 0.3], [1.0, 0.4]])
    y = jnp.asarray([[0.5], [1.0], [-0.2], [0.0]])
    f = jnp.asarray([[0.4], [0.6], [-0.1], [-0.5]])
    out = np.asarray(lik.log_prob(X, y, f)).reshape(-1)

    g = gpr.GaussianLikelihood(0.5)
    b = gpr.BernoulliLikelihood()
    exp_g = np.asarray(g.log_prob(X, y, f)).reshape(-1)
    exp_b = np.asarray(b.log_prob(X, y, f)).reshape(-1)
    np.testing.assert_allclose(out[[0, 2]], exp_g[[0, 2]], rtol=1e-8)
    np.testing.assert_allclose(out[[1, 3]], exp_b[[1, 3]], rtol=1e-8)

    # variational expectation sums per-channel contributions
    mu = f
    var = 0.1 * jnp.ones((4, 1))
    ve = float(lik.variational_expectation(X, y, mu, var))
    ve_g = float(g.variational_expectation(X[::2], y[::2], mu[::2], var[::2]))
    ve_b = float(b.variational_expectation(X[1::2], y[1::2], mu[1::2], var[1::2]))
    np.testing.assert_allclose(ve, ve_g + ve_b, rtol=1e-8)


def test_multioutput_validate_y():
    lik = gpr.MultiOutputLikelihood(gpr.BernoulliLikelihood(), gpr.GaussianLikelihood())
    X = np.asarray([[0.0, 0.1], [1.0, 0.2]])
    lik.validate_y(X, np.asarray([[1.0], [5.0]]))  # ok
    with pytest.raises(ValueError):
        lik.validate_y(X, np.asarray([[0.5], [5.0]]))  # 0.5 invalid for Bernoulli


@pytest.mark.parametrize("lik,make_y", [
    (gpr.StudentTLikelihood(dof=4), lambda f: f),
    (gpr.BernoulliLikelihood(), lambda f: (f > 0).astype(np.float64)),
    (gpr.PoissonLikelihood(), lambda f: np.round(np.exp(f))),
    (gpr.GammaLikelihood(), lambda f: np.exp(f) + 0.1),
    (gpr.BetaLikelihood(), lambda f: 1.0 / (1.0 + np.exp(-f)) * 0.9 + 0.05),
], ids=["studentt", "bernoulli", "poisson", "gamma", "beta"])
def test_hensman_trains_with_nongaussian_likelihood(lik, make_y):
    """SVGP ELBO decreases with each non-Gaussian likelihood (GH quadrature
    path, reference gpr/likelihood.py:141-159)."""
    rng = np.random.RandomState(0)
    X = np.linspace(0, 5, 24).reshape(-1, 1)
    f = np.sin(1.5 * X[:, 0])
    y = make_y(f).reshape(-1, 1)
    model = gpr.SparseHensman(gpr.SquaredExponentialKernel(), X, y, Z=8, likelihood=lik)
    loss0 = model.loss()
    losses, _ = gpr.train(model, method="Adam", lr=0.05, iters=80)
    assert losses[-1] < loss0, "training must reduce loss for %s" % lik.name()


def test_conditional_samples_in_support():
    import jax
    key = jax.random.PRNGKey(0)
    X = jnp.asarray(X1[:5])
    f = jnp.asarray(np.linspace(-1, 1, 5).reshape(-1, 1))
    for lik, low, high in [
        (gpr.ExponentialLikelihood(), 0.0, np.inf),
        (gpr.GammaLikelihood(), 0.0, np.inf),
        (gpr.PoissonLikelihood(), 0.0, np.inf),
        (gpr.WeibullLikelihood(), 0.0, np.inf),
        (gpr.LogGaussianLikelihood(), 0.0, np.inf),
        (gpr.ChiSquaredLikelihood(), 0.0, np.inf),
        (gpr.BetaLikelihood(), 0.0, 1.0),
        (gpr.LogLogisticLikelihood(), 0.0, np.inf),
    ]:
        s = np.asarray(lik.conditional_sample(X, f, key=key))
        assert np.all(s >= low) and np.all(s <= high), lik.name()


def test_gaussian_predict_ci_quantiles():
    lik = gpr.GaussianLikelihood(0.5)
    X = jnp.asarray(X1[:3])
    mu = jnp.asarray([[0.0], [1.0], [-1.0]])
    var = jnp.asarray([[0.04], [0.09], [0.01]])
    mean, lo, up = lik.predict(X, mu, var, ci=[0.025, 0.975])
    total_sd = np.sqrt(np.asarray(var).reshape(-1) + 0.25)
    np.testing.assert_allclose(np.asarray(lo).reshape(-1),
                               np.asarray(mu).reshape(-1) - 1.959964 * total_sd, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(up).reshape(-1),
                               np.asarray(mu).reshape(-1) + 1.959964 * total_sd, rtol=1e-4)


def test_studentt_predict_mc_ci():
    lik = gpr.StudentTLikelihood(dof=5, scale=0.3)
    X = jnp.asarray(X1[:2])
    mu = jnp.asarray([[0.0], [1.0]])
    var = jnp.asarray([[0.04], [0.04]])
    mean, lo, up = lik.predict(X, mu, var, ci=[0.05, 0.95], n=4000)
    assert np.all(np.asarray(lo) < np.asarray(mean))
    assert np.all(np.asarray(mean) < np.asarray(up))


def test_multioutput_sample_y_and_axis_conventions():
    """conditional_sample carries the data axis SECOND ((S, N)): the
    multi-output mask must broadcast along it (Model.sample_y crashed), and
    the Gaussian per-channel scale must land on the data axis even when the
    sample count equals N."""
    import jax
    rng = np.random.RandomState(0)
    n_per = 4
    x0 = np.linspace(0, 1, n_per).reshape(-1, 1)
    _, X, y = gpr.merge_data([x0, x0], [np.sin(x0), np.cos(x0)])
    lik = gpr.MultiOutputLikelihood(gpr.GaussianLikelihood(0.001),
                                    gpr.GaussianLikelihood(5.0))
    model = gpr.SparseHensman(gpr.MultiOutputSpectralKernel(output_dims=2),
                              X, y, Z=4, likelihood=lik)
    s = model.sample_y(X, n=3, key=jax.random.PRNGKey(0))
    assert s.shape == (3, 2 * n_per)

    # Gaussian axis convention: S == N must still put channel noise on the
    # data axis (a value-based heuristic used to misfire here)
    glik = gpr.GaussianLikelihood(jnp.asarray([0.001, 5.0]))
    glik.output_dims = 2
    f = jnp.zeros((2 * n_per, 2 * n_per))      # S == N
    samples = np.asarray(glik.conditional_sample(X, f, key=jax.random.PRNGKey(1)))
    stds = samples.std(axis=0)                  # per data point, over samples
    assert stds[:n_per].max() < 0.1             # channel-0 points: tiny noise
    assert stds[n_per:].min() > 1.0             # channel-1 points: big noise


def test_multioutput_sample_none_propagates():
    """A channel that cannot sample y|f (Bernoulli) must make the whole
    multi-output sample None — not leak latent f values as y samples."""
    import jax
    x0 = np.linspace(0, 1, 3).reshape(-1, 1)
    _, X, _ = gpr.merge_data([x0, x0], [np.zeros_like(x0), np.zeros_like(x0)])
    lik = gpr.MultiOutputLikelihood(gpr.GaussianLikelihood(1.0),
                                    gpr.BernoulliLikelihood())
    out = lik.conditional_sample(X, jnp.full((2, 6), 5.0),
                                 key=jax.random.PRNGKey(0))
    assert out is None


def test_multioutput_predict_mean_only_with_sigma():
    """ci=None is the mean-only path even if sigma is set (bounds go through
    the ci branch); a Gaussian sub-likelihood's (mu, lo, up) tuple used to
    crash the masked sum."""
    x0 = np.linspace(0, 1, 3).reshape(-1, 1)
    _, X, _ = gpr.merge_data([x0, x0], [np.zeros_like(x0), np.zeros_like(x0)])
    lik = gpr.MultiOutputLikelihood(gpr.GaussianLikelihood(1.0),
                                    gpr.GaussianLikelihood(2.0))
    mu = jnp.ones((6, 1))
    var = 0.1 * jnp.ones((6, 1))
    out = lik.predict(X, mu, var, ci=None, sigma=2)
    np.testing.assert_allclose(np.asarray(out), np.ones((6, 1)), rtol=1e-12)
