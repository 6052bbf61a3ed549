"""Inference model tests: golden-value LML vs direct multivariate-normal
logpdf, prediction vs closed-form GP posterior, ELBO ≤ LML property, and
training smoke tests."""
import numpy as np
import pytest
import jax.numpy as jnp

import mogptk_tpu.gpr as gpr


def _toy_data(n=20, seed=0):
    rng = np.random.RandomState(seed)
    X = np.linspace(0, 5, n).reshape(-1, 1)
    y = np.sin(2.0 * X[:, 0]) + 0.1 * rng.randn(n)
    return X, y.reshape(-1, 1)


def _direct_lml(K, noise_var, y):
    Ky = K + noise_var * np.eye(K.shape[0])
    sign, logdet = np.linalg.slogdet(Ky)
    alpha = np.linalg.solve(Ky, y)
    return float(-0.5 * K.shape[0] * np.log(2 * np.pi) - 0.5 * logdet - 0.5 * (y.T @ alpha).squeeze())


def test_exact_lml_matches_direct():
    X, y = _toy_data()
    kernel = gpr.SquaredExponentialKernel()
    kernel.lengthscale.assign([0.7])
    kernel.magnitude.assign(1.3)
    model = gpr.Exact(kernel, X, y, variance=0.05, jitter=0.0)
    K = np.asarray(kernel(X))
    expected = _direct_lml(K, 0.05, y)
    lml = float(model.log_marginal_likelihood())
    np.testing.assert_allclose(lml, expected, rtol=1e-6)


def test_exact_prediction_matches_closed_form():
    X, y = _toy_data()
    Xs = np.linspace(-0.5, 5.5, 13).reshape(-1, 1)
    kernel = gpr.SquaredExponentialKernel()
    kernel.lengthscale.assign([0.7])
    noise = 0.05
    model = gpr.Exact(kernel, X, y, variance=noise, jitter=0.0)

    K = np.asarray(kernel(X))
    Ks = np.asarray(kernel(X, Xs))
    Kss = np.asarray(kernel(Xs))
    Ky = K + noise * np.eye(K.shape[0])
    mu_e = Ks.T @ np.linalg.solve(Ky, y)
    var_e = np.diag(Kss - Ks.T @ np.linalg.solve(Ky, Ks)).reshape(-1, 1)

    mu, var = model.predict_f(Xs)
    np.testing.assert_allclose(np.asarray(mu), mu_e, rtol=1e-6, atol=1e-7)
    np.testing.assert_allclose(np.asarray(var), var_e, rtol=1e-5, atol=1e-7)

    mu_full, var_full = model.predict_f(Xs, full=True)
    np.testing.assert_allclose(np.diag(np.asarray(var_full)).reshape(-1, 1), var_e, rtol=1e-5, atol=1e-7)


def test_exact_data_variance():
    X, y = _toy_data()
    dv = 0.01 * np.ones(X.shape[0])
    kernel = gpr.SquaredExponentialKernel()
    model = gpr.Exact(kernel, X, y, variance=0.05, data_variance=dv, jitter=0.0)
    K = np.asarray(kernel(X))
    expected = _direct_lml(K, 0.0, y * 0 + y)  # placeholder; compute with dv below
    Ky = K + (0.05 + 0.01) * np.eye(K.shape[0])
    sign, logdet = np.linalg.slogdet(Ky)
    alpha = np.linalg.solve(Ky, y)
    expected = float(-0.5 * K.shape[0] * np.log(2 * np.pi) - 0.5 * logdet - 0.5 * (y.T @ alpha).squeeze())
    np.testing.assert_allclose(float(model.log_marginal_likelihood()), expected, rtol=1e-6)


def test_titsias_elbo_below_lml():
    X, y = _toy_data(n=30)
    kernel = gpr.SquaredExponentialKernel()
    kernel.lengthscale.assign([0.7])
    exact = gpr.Exact(kernel.clone(), X, y, variance=0.05, jitter=0.0)
    lml = float(exact.log_marginal_likelihood())
    sparse = gpr.Titsias(kernel.clone(), X, y, Z=10, variance=0.05)
    elbo = float(sparse.elbo())
    assert elbo <= lml + 1e-6, "ELBO %g must lower-bound LML %g" % (elbo, lml)


def test_titsias_with_all_inducing_matches_exact():
    # with Z = X the collapsed bound is tight (up to jitter)
    X, y = _toy_data(n=15)
    kernel = gpr.SquaredExponentialKernel()
    exact = gpr.Exact(kernel.clone(), X, y, variance=0.1, jitter=0.0)
    sparse = gpr.Titsias(kernel.clone(), X, y, Z=jnp.asarray(X), variance=0.1)
    np.testing.assert_allclose(float(sparse.elbo()), float(exact.log_marginal_likelihood()),
                               rtol=1e-4)


def test_hensman_elbo_below_lml_after_training():
    X, y = _toy_data(n=20)
    kernel = gpr.SquaredExponentialKernel()
    exact = gpr.Exact(kernel.clone(), X, y, variance=0.05, jitter=0.0)
    lml = float(exact.log_marginal_likelihood())
    model = gpr.Hensman(kernel.clone(), X, y, likelihood=gpr.GaussianLikelihood(np.sqrt(0.05)))
    # only train the variational parameters for the bound property
    for p in model.kernel.parameters():
        p.train = False
    model.likelihood.scale.train = False
    losses, _ = gpr.train(model, method="Adam", lr=0.05, iters=200)
    assert float(model.elbo()) <= lml + 1e-3


def test_snelson_lml_close_to_exact_with_all_points():
    X, y = _toy_data(n=15)
    kernel = gpr.SquaredExponentialKernel()
    exact = gpr.Exact(kernel.clone(), X, y, variance=0.1, jitter=0.0)
    fitc = gpr.Snelson(kernel.clone(), X, y, Z=jnp.asarray(X), variance=0.1)
    # FITC with Z=X is exact
    np.testing.assert_allclose(float(fitc.log_marginal_likelihood()),
                               float(exact.log_marginal_likelihood()), rtol=1e-4)


def test_opper_archambeau_runs():
    X, y = _toy_data(n=15)
    model = gpr.OpperArchambeau(gpr.SquaredExponentialKernel(), X, y,
                                likelihood=gpr.GaussianLikelihood(0.3))
    loss0 = model.loss()
    losses, _ = gpr.train(model, method="Adam", lr=0.02, iters=50)
    assert losses[-1] < loss0


def test_adam_training_reduces_loss():
    X, y = _toy_data(n=30)
    kernel = gpr.SpectralMixtureKernel(Q=2)
    kernel.mean.assign(np.array([[0.3], [0.8]]))
    kernel.variance.assign(np.array([[0.1], [0.1]]))
    model = gpr.Exact(kernel, X, y, variance=0.5)
    loss0 = model.loss()
    losses, _ = gpr.train(model, method="Adam", lr=0.05, iters=100)
    assert losses[-1] < loss0
    assert len(losses) == 100


def test_lbfgs_training_reduces_loss():
    X, y = _toy_data(n=25)
    kernel = gpr.SquaredExponentialKernel()
    model = gpr.Exact(kernel, X, y, variance=0.5)
    loss0 = model.loss()
    losses, _ = gpr.train(model, method="LBFGS", iters=20)
    assert losses[-1] < loss0


def test_fixed_parameters_stay_fixed():
    X, y = _toy_data(n=15)
    kernel = gpr.SquaredExponentialKernel()
    kernel.magnitude.assign(2.0)
    kernel.magnitude.train = False
    model = gpr.Exact(kernel, X, y, variance=0.1)
    gpr.train(model, method="Adam", lr=0.1, iters=30)
    np.testing.assert_allclose(float(kernel.magnitude().squeeze()), 2.0, rtol=1e-6)


def test_pegged_parameter_follows():
    X, y = _toy_data(n=15)
    k1 = gpr.SpectralKernel()
    k2 = gpr.SpectralKernel()
    kernel = k1 + k2
    k2.magnitude.peg(k1.magnitude)
    model = gpr.Exact(kernel, X, y, variance=0.1)
    gpr.train(model, method="Adam", lr=0.05, iters=30)
    np.testing.assert_allclose(np.asarray(k2.magnitude()), np.asarray(k1.magnitude()), rtol=1e-12)


def test_multioutput_exact_with_channel_noise():
    rng = np.random.RandomState(1)
    x0 = np.linspace(0, 4, 12)
    x1 = np.linspace(0, 4, 9)
    N, X, Y = gpr.merge_data([x0.reshape(-1, 1), x1.reshape(-1, 1)],
                             [np.sin(x0).reshape(-1, 1), np.cos(x1).reshape(-1, 1)])
    kernel = gpr.MultiOutputSpectralKernel(output_dims=2)
    model = gpr.Exact(kernel, X, Y, variance=np.array([0.1, 0.2]))
    loss0 = model.loss()
    losses, _ = gpr.train(model, method="Adam", lr=0.02, iters=50)
    assert losses[-1] < loss0
    mu, lo, up = model.predict_y(X, ci=[0.025, 0.975])
    assert np.asarray(mu).shape == (X.shape[0], 1)
    assert np.all(np.asarray(lo) <= np.asarray(up))


def test_sample_shapes():
    X, y = _toy_data(n=10)
    model = gpr.Exact(gpr.SquaredExponentialKernel(), X, y, variance=0.1)
    Z = np.linspace(0, 5, 7).reshape(-1, 1)
    s = model.sample_f(Z, n=3)
    assert np.asarray(s).shape == (3, 7)
    s1 = model.sample_y(Z)
    assert np.asarray(s1).shape == (7,)


def test_cholesky_exception_diagnostics():
    X, y = _toy_data(n=10)
    kernel = gpr.SquaredExponentialKernel()
    model = gpr.Exact(kernel, X, y, variance=0.1)
    # poison a parameter raw value to NaN
    kernel.magnitude._raw = jnp.asarray(np.nan)
    with pytest.raises(gpr.CholeskyException):
        model.loss()


def test_jit_cache_keeps_distinct_programs():
    """Alternating loss()/predict_f() must not evict each other's compiled
    programs (only stale structure_version entries are evicted)."""
    rng = np.random.RandomState(0)
    X = np.linspace(0, 5, 16).reshape(-1, 1)
    y = np.sin(X) + 0.05 * rng.randn(16, 1)
    model = gpr.Exact(gpr.SquaredExponentialKernel(), X, y, variance=0.1)
    model.loss()
    model.predict_f(X[:4])
    model.loss()
    names = {k[0] for k in model._jit_cache}
    assert {"loss", "predict_f"} <= names


def test_titsias_rejects_vector_variance():
    X = np.linspace(0, 5, 12).reshape(-1, 1)
    y = np.sin(X)
    with pytest.raises(ValueError, match="scalar variance"):
        gpr.Titsias(gpr.SquaredExponentialKernel(), X, y, Z=4,
                    variance=[1.0, 2.0])


def test_exact_validates_data_variance_length_1d_x():
    X = np.linspace(0, 5, 12)          # 1-D X: one point per entry
    y = np.sin(X).reshape(-1, 1)
    with pytest.raises(ValueError, match="data variance"):
        gpr.Exact(gpr.SquaredExponentialKernel(), X, y,
                  data_variance=np.ones(6))


def test_init_grid_accepts_cube_roots():
    from mogptk_tpu.gpr.model import _init_grid
    X = np.random.RandomState(0).rand(50, 3)
    Z = _init_grid(1000, X)            # 10**3; 1000**(1/3) rounds to 9.99…
    assert Z.shape == (1000, 3)
    with pytest.raises(ValueError):
        _init_grid(1001, X)


def test_flat_loss_fn_matches_and_roundtrips():
    # make_flat_loss_fn packs the trainable raws into ONE vector (single
    # optimizer leaf — gpr/training.py builds every step through it)
    import jax

    X, y = _toy_data(n=20)
    kernel = gpr.SpectralMixtureKernel(Q=2)
    kernel.mean.assign(np.array([[0.3], [0.8]]))
    model = gpr.Exact(kernel, X, y, variance=0.5)
    train, fixed = model._split_raws()
    loss_fn = model.make_loss_fn()
    loss_flat, flatten, unflatten = model.make_flat_loss_fn()
    vec = flatten(train)
    assert vec.ndim == 1
    assert vec.shape[0] == sum(int(np.prod(p.shape)) for p in train)
    back = unflatten(vec)
    assert len(back) == len(train)
    for a, b in zip(back, train):
        assert a.shape == b.shape
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    v1 = float(loss_fn(train, fixed))
    v2 = float(loss_flat(vec, fixed))
    np.testing.assert_allclose(v1, v2, rtol=1e-12)
    g = jax.grad(loss_flat)(vec, fixed)
    assert g.shape == vec.shape
    assert np.all(np.isfinite(np.asarray(g)))
