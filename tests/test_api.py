"""End-to-end tests of the user-facing API: data loading, transformations,
model construction, training, prediction, metrics, save/load — the vertical
slice matching the reference quick-start (examples/00_Quick_Start.ipynb)."""
import os
import numpy as np
import pytest

import mogptk_tpu as mogptk


def _two_channel_dataset(n=60):
    t = np.linspace(0, 10, n)
    y1 = np.sin(0.7 * 2 * np.pi * t * 0.3) + 0.05 * np.random.RandomState(0).randn(n)
    y2 = 2.0 * np.cos(0.2 * 2 * np.pi * t * 0.3) + 0.05 * np.random.RandomState(1).randn(n)
    return mogptk.DataSet(t, [y1, y2], names=["A", "B"])


def test_data_basic():
    data = mogptk.Data([0.0, 1.0, 2.0, 3.0], [4.0, 3.0, 5.0, 6.0])
    assert data.get_input_dims() == 1
    x, y = data.get_data()
    assert x.shape == (4, 1) and y.shape == (4,)


def test_load_function_and_removal():
    data = mogptk.LoadFunction(lambda x: np.sin(3 * x), 0, 10, n=200, var=0.01, name="Sine")
    assert len(data.Y) == 200
    data.remove_range(3, 8)
    assert data.has_test_data()
    x_train, _ = data.get_train_data()
    assert np.all((x_train[:, 0] < 3) | (x_train[:, 0] > 8))
    x_test, y_test = data.get_test_data()
    assert len(x_test) > 0
    data.reset()
    assert not data.has_test_data()


def test_remove_randomly_and_indices():
    data = mogptk.LoadFunction(lambda x: np.sin(x), 0, 10, n=100)
    data.remove_randomly(pct=0.3)
    assert np.sum(~data.mask) == 30
    data.reset()
    data.remove_indices([1, 5, 7])
    assert np.sum(~data.mask) == 3
    data.reset()
    data.remove(n=10)
    assert np.sum(~data.mask) == 10


def test_transformations_roundtrip():
    rng = np.random.RandomState(0)
    y = 5.0 + 3.0 * rng.rand(50)
    x = np.linspace(0, 1, 50)
    data = mogptk.Data(x, y)
    data.transform(mogptk.TransformStandard())
    data.transform(mogptk.TransformLog)
    xt, yt = data.get_data(transformed=True)
    back = data.Y_transformer.backward(yt, xt)
    np.testing.assert_allclose(back, y, rtol=1e-10)


def test_transform_detrend():
    x = np.linspace(0, 10, 100)
    y = 2.0 * x + 1.0 + np.sin(x)
    data = mogptk.Data(x, y)
    data.transform(mogptk.TransformDetrend(degree=1))
    _, yt = data.get_data(transformed=True)
    assert np.abs(np.polyfit(x, yt, 1)[0]) < 0.05


def test_aggregate():
    x = np.arange(100, dtype=np.float64)
    y = np.ones(100)
    data = mogptk.Data(x, y)
    data.aggregate(10, f=np.sum)
    assert len(data.Y) == 10
    np.testing.assert_allclose(data.Y, 10.0)


def test_duration_parsing():
    from mogptk_tpu.data import _parse_delta
    assert _parse_delta(5.0, np.float64) == 5.0
    d = _parse_delta("3W1D", np.dtype("datetime64[D]"))
    assert d == 22.0
    assert _parse_delta("day", np.dtype("datetime64[D]")) == 1.0


def test_datetime_handling():
    x = np.array(["2020-01-01", "2020-01-02", "2020-01-03", "2020-01-04"], dtype="datetime64[D]")
    y = [1.0, 2.0, 3.0, 4.0]
    data = mogptk.Data(x, y)
    assert np.issubdtype(data.X_dtypes[0], np.datetime64)
    data.filter("2020-01-02", "2020-01-04")
    assert len(data.Y) == 2


def test_dataset_accessors():
    dataset = _two_channel_dataset()
    assert dataset.get_output_dims() == 2
    assert dataset.get_names() == ["A", "B"]
    assert dataset["A"] is dataset[0]
    assert dataset.get_index("B") == 1
    assert dataset.get_input_dims() == [1, 1]


def test_load_dataframe():
    import pandas as pd
    df = pd.DataFrame({"t": [0.0, 1.0, 2.0], "a": [1.0, 2.0, 3.0], "b": [2.0, 1.0, 0.0]})
    ds = mogptk.LoadDataFrame(df, x_col="t", y_col=["a", "b"])
    assert ds.get_output_dims() == 2
    single = mogptk.LoadDataFrame(df, x_col="t", y_col="a")
    assert isinstance(single, mogptk.Data)


def test_model_quickstart_vertical_slice():
    """Train MOSM end-to-end: init → train → predict → error → save/load."""
    dataset = _two_channel_dataset()
    for channel in dataset:
        channel.transform(mogptk.TransformStandard())
        channel.remove_randomly(pct=0.2)

    model = mogptk.MOSM(dataset, Q=2)
    model.init_parameters("LS")
    loss0 = model.loss()
    losses, errors = model.train(method="Adam", lr=0.05, iters=60, error="MAE")
    assert losses[-1] < loss0
    assert model.iters == 60
    # per-iteration error tracking must see the CURRENT parameters, not the
    # initial ones (training syncs raws before each callback) — a training
    # run that moves the loss this much cannot leave every error identical
    assert np.isfinite(model.errors).all()
    assert len(np.unique(np.round(model.errors, 12))) > 1

    # predict over the prediction range
    X, Mu, Lower, Upper = model.predict()
    assert len(Mu) == 2
    assert np.all(np.asarray(Lower[0]) <= np.asarray(Upper[0]))

    # error metrics on the removed points
    err = model.error("MAE")
    assert np.isfinite(err)
    assert np.isfinite(model.error("RMSE"))

    # information criteria + lml
    assert np.isfinite(model.BIC())
    assert np.isfinite(model.AIC())
    assert np.isfinite(model.log_marginal_likelihood())

    # save / load roundtrip
    model.save("/tmp/test_mosm_model")
    loaded = mogptk.LoadModel("/tmp/test_mosm_model")
    np.testing.assert_allclose(loaded.loss(), model.loss(), rtol=1e-6)
    os.remove("/tmp/test_mosm_model.npy")


def test_sm_model():
    dataset = _two_channel_dataset()
    model = mogptk.SM(dataset, Q=2)
    model.init_parameters("IPS")
    losses, _ = model.train(method="Adam", lr=0.05, iters=30)
    assert np.isfinite(losses[-1])


def test_csm_model():
    dataset = _two_channel_dataset()
    model = mogptk.CSM(dataset, Q=2, Rq=1)
    model.init_parameters("LS")
    losses, _ = model.train(method="Adam", lr=0.05, iters=30)
    assert np.isfinite(losses[-1])


def test_sm_lmc_model():
    dataset = _two_channel_dataset()
    model = mogptk.SM_LMC(dataset, Q=2, Rq=1)
    model.init_parameters("LS")
    losses, _ = model.train(method="Adam", lr=0.05, iters=30)
    assert np.isfinite(losses[-1])
    # per-component magnitudes stay pegged to 1
    for q in range(2):
        np.testing.assert_allclose(float(model.gpr.kernel[q].magnitude().squeeze()), 1.0, rtol=1e-6)


def test_conv_model():
    dataset = _two_channel_dataset()
    model = mogptk.CONV(dataset, Q=1)
    model.init_parameters("LS")
    losses, _ = model.train(method="Adam", lr=0.05, iters=30)
    assert np.isfinite(losses[-1])


def test_mohsm_model():
    # The MOHSM construction (reference gpr/multioutput.py:353-386) is not
    # PSD for arbitrary parameters — with narrow LS-estimated spectral
    # variances over a long X range its most negative eigenvalue exceeds the
    # noise diagonal (verified identical in a numpy mirror of the reference
    # formula). Exercise it in its well-conditioned regime: short X range
    # and the default wide spectral variances.
    t = np.linspace(0, 3, 40)
    y1 = np.sin(2.0 * t) + 0.05 * np.random.RandomState(0).randn(40)
    y2 = np.cos(2.0 * t) + 0.05 * np.random.RandomState(1).randn(40)
    dataset = mogptk.DataSet(t, [y1, y2], names=["A", "B"])
    model = mogptk.MOHSM(dataset, P=1, Q=1)
    loss0 = model.loss()
    losses, _ = model.train(method="Adam", lr=0.02, iters=30)
    assert np.isfinite(losses[-1])
    assert losses[-1] < loss0


def test_mohsm_psd_safe_trains_where_default_is_non_psd():
    """psd_safe=True caps the envelope precision at the locally-stationary
    PSD bound (gpr/multioutput._effective_l2): on the long-range LS-init
    config where the reference-parity formula is indefinite (loss NaN →
    CholeskyException), the safe kernel has a PSD Gram and trains."""
    xs, ys = _huge_axis_dataset()

    mogptk.gpr.config.set_seed(11)
    m_default = mogptk.MOHSM(mogptk.DataSet(xs, ys, names=["A", "B"]), P=1,
                             Q=2, rescale_x="normalize")
    m_default.init_parameters("LS")
    with pytest.raises(Exception):
        m_default.train(method="Adam", lr=0.01, iters=3)

    mogptk.gpr.config.set_seed(11)
    m_safe = mogptk.MOHSM(mogptk.DataSet(xs, ys, names=["A", "B"]), P=1,
                          Q=2, rescale_x="normalize", psd_safe=True)
    m_safe.init_parameters("LS")
    # the Gram itself is PSD up to jitter scale
    K = np.asarray(m_safe.gpr.kernel(m_safe.gpr.X))
    eig = np.linalg.eigvalsh(0.5 * (K + K.T))
    assert eig.min() >= -1e-8 * max(eig.max(), 1.0), eig.min()
    losses, _ = m_safe.train(method="Adam", lr=0.01, iters=10)
    assert np.all(np.isfinite(losses))

    # in the well-conditioned regime the cap is slack: psd_safe matches the
    # default formula to the tanh saturation's second-order error
    k_def = mogptk.gpr.MultiOutputHarmonizableSpectralKernel(output_dims=2)
    k_safe = mogptk.gpr.MultiOutputHarmonizableSpectralKernel(
        output_dims=2, psd_safe=True)
    for k in (k_def, k_safe):
        k.lengthscale.assign(0.2 * np.ones(2))     # l² = 0.04 « 2·min Σ = 2
    X = np.concatenate([np.zeros((20, 1)), np.linspace(0, 3, 20).reshape(-1, 1)], axis=1)
    np.testing.assert_allclose(np.asarray(k_safe(X)), np.asarray(k_def(X)),
                               rtol=1e-4, atol=1e-7)


def test_mohsm_init_parameters_assigns():
    t = np.linspace(0, 3, 40)
    y1 = np.sin(2.0 * t)
    y2 = np.cos(2.0 * t)
    dataset = mogptk.DataSet(t, [y1, y2], names=["A", "B"])
    model = mogptk.MOHSM(dataset, P=2, Q=1)
    model.init_parameters("LS")
    # P>1 spreads centers (reference: models/mohsm.py:82-86)
    c0 = model.gpr.kernel[0].center.numpy()
    c1 = model.gpr.kernel[1].center.numpy()
    assert not np.allclose(c0, c1)


def test_precompile_primes_cache_and_train_matches():
    """Model.precompile compiles the EXACT chunked training-step program
    train() runs (shared builder) into the persistent cache — training
    afterwards produces identical results to an unprimed run."""
    import tempfile
    dataset = _two_channel_dataset(n=30)
    mogptk.gpr.config.set_seed(3)
    m1 = mogptk.MOSM(dataset, Q=1)
    cache = tempfile.mkdtemp()
    secs = m1.precompile(method="Adam", lr=0.02, cache_dir=cache)
    assert secs >= 0.0
    assert len(os.listdir(cache)) > 0  # program landed in the cache
    losses1, _ = m1.train(method="Adam", lr=0.02, iters=20)

    mogptk.gpr.config.set_seed(3)
    m2 = mogptk.MOSM(dataset, Q=1)
    losses2, _ = m2.train(method="Adam", lr=0.02, iters=20)
    np.testing.assert_allclose(losses1, losses2, rtol=1e-12)

    # LBFGS path compiles too
    mogptk.gpr.config.set_seed(3)
    m3 = mogptk.MOSM(dataset, Q=1)
    assert m3.precompile(method="LBFGS", cache_dir=cache) >= 0.0


def test_model_with_titsias_inference():
    dataset = _two_channel_dataset(n=40)
    model = mogptk.MOSM(dataset, Q=1, inference=mogptk.Titsias(inducing_points=10))
    losses, _ = model.train(method="Adam", lr=0.02, iters=20)
    assert np.isfinite(losses[-1])


def test_model_with_hensman_multilikelihood():
    """Multi-likelihood Hensman SVGP: Bernoulli + Gaussian channels
    (BASELINE.md config #5)."""
    rng = np.random.RandomState(0)
    t = np.linspace(0, 6, 40)
    y_class = (np.sin(t) > 0).astype(np.float64)
    y_reg = np.cos(t) + 0.05 * rng.randn(40)
    dataset = mogptk.DataSet(t, [y_class, y_reg], names=["class", "reg"])

    likelihood = mogptk.gpr.MultiOutputLikelihood(
        mogptk.gpr.BernoulliLikelihood(), mogptk.gpr.GaussianLikelihood(0.5))
    model = mogptk.MOSM(dataset, Q=1,
                        inference=mogptk.Hensman(likelihood=likelihood))
    loss0 = model.loss()
    losses, _ = model.train(method="Adam", lr=0.05, iters=40)
    assert losses[-1] < loss0

    X, Mu, Lower, Upper = model.predict()
    assert np.all((0.0 <= np.asarray(Mu[0])) & (np.asarray(Mu[0]) <= 1.0))


def test_error_comparison_table():
    dataset = _two_channel_dataset()
    for channel in dataset:
        channel.remove_randomly(pct=0.2)
    m1 = mogptk.MOSM(dataset, Q=1)
    m1.train(iters=10, lr=0.05)
    m2 = mogptk.SM(dataset, Q=1)
    m2.train(iters=10, lr=0.05)
    errs = mogptk.error(m1, m2)
    assert len(errs) == 2
    assert "MAE" in errs[0] and "RMSE" in errs[1]
    errs_pc = mogptk.error(m1, m2, per_channel=True)
    assert len(errs_pc[0]) == 2


def test_kernel_registry():
    assert mogptk.kernels.MOSM is mogptk.gpr.MultiOutputSpectralMixtureKernel
    assert mogptk.kernels.SE is mogptk.gpr.SquaredExponentialKernel
    assert mogptk.kernels["RBF"] is mogptk.gpr.SquaredExponentialKernel


def test_model_K_and_sample():
    dataset = _two_channel_dataset(n=30)
    model = mogptk.MOSM(dataset, Q=1)
    X = [np.linspace(0, 10, 5), np.linspace(0, 10, 4)]
    K = model.K(X)
    assert K.shape == (9, 9)
    s = model.sample(X, n=3)
    assert len(s) == 2 and s[0].shape == (5, 3)


def test_plots_run():
    import matplotlib.pyplot as plt
    dataset = _two_channel_dataset(n=30)
    model = mogptk.MOSM(dataset, Q=1)
    model.train(iters=5, lr=0.05)
    model.plot_losses()
    model.plot_prediction()
    model.plot_gram(n=5)
    model.plot_kernel(n=11)
    model.plot_correlation()
    dataset.plot()
    dataset.plot_spectrum(n=101)
    plt.close("all")


def test_bnse_estimation_finds_peak():
    t = np.linspace(0, 10, 120)
    freq = 0.5
    y = np.sin(2 * np.pi * freq * t)
    data = mogptk.Data(t, y)
    A, B, C = data.get_bnse_estimation(Q=1, n=500, iters=50)
    assert abs(B[0, 0] - freq) < 0.15, "BNSE peak %g should be near %g" % (B[0, 0], freq)


def test_ls_estimation_finds_peak():
    t = np.linspace(0, 10, 120)
    freq = 0.5
    y = np.sin(2 * np.pi * freq * t)
    data = mogptk.Data(t, y)
    A, B, C = data.get_ls_estimation(Q=1)
    assert abs(B[0, 0] - freq) < 0.1


def test_save_load_parameters_npz():
    dataset = _two_channel_dataset(n=25)
    m1 = mogptk.MOSM(dataset, Q=1)
    m1.train(iters=15, lr=0.05)
    m1.save_parameters("/tmp/mosm_params")
    m2 = mogptk.MOSM(dataset, Q=1)
    assert abs(m2.loss() - m1.loss()) > 1e-6  # different random init
    m2.load_parameters("/tmp/mosm_params")
    np.testing.assert_allclose(m2.loss(), m1.loss(), rtol=1e-8)
    os.remove("/tmp/mosm_params.npz")


def test_load_split_data():
    x_train = np.linspace(0, 5, 20)
    x_test = np.linspace(5, 6, 5)
    data = mogptk.LoadSplitData(x_train, x_test, np.sin(x_train), np.sin(x_test), name="split")
    assert len(data.Y) == 25
    assert int(np.sum(~data.mask)) == 5
    xt, yt = data.get_test_data()
    np.testing.assert_allclose(xt[:, 0], x_test)


def test_set_prediction_range_variants():
    data = mogptk.Data(np.linspace(0, 10, 50), np.sin(np.linspace(0, 10, 50)))
    data.set_prediction_range(2, 8, n=100)
    assert data.get_prediction_data().shape == (100, 1)
    data.set_prediction_range(0, 10, step=0.5)
    x = data.get_prediction_data()
    assert abs(x[1, 0] - x[0, 0] - 0.5) < 1e-9
    data.set_prediction_data(np.array([1.0, 2.0, 3.0]))
    assert data.get_prediction_data().shape == (3, 1)


def test_use_debug_toggles():
    import jax
    mogptk.gpr.use_debug(nans=True)
    assert jax.config.jax_debug_nans
    mogptk.gpr.use_debug(nans=False)
    assert not jax.config.jax_debug_nans


def test_scalability_harness_smoke():
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "benchmarks"))
    import scalability
    model = scalability.make_model("mosm", 64, M=2)
    t, mem = scalability.time_training(model, iters=2)
    assert t > 0


def test_aggregate_with_gaps_drops_empty_bins():
    # sensor gap: no points in [30, 60) — empty bins must be dropped, not NaN
    x = np.concatenate([np.arange(0, 30.0), np.arange(60.0, 90.0)])
    y = np.ones_like(x)
    data = mogptk.Data(x, y)
    data.aggregate(10.0)
    assert np.isfinite(data.Y).all()
    assert len(data.Y) == 6  # 9 bins minus 3 empty


def test_rescale_x_centers_and_matches_predictions():
    # huge absolute axis (like minutes-since-epoch): stationary kernels are
    # translation invariant, so rescale_x must not change f64 predictions
    offset = 2.6e7
    x = offset + np.linspace(0.0, 20.0, 60)
    y = np.sin(0.7 * (x - offset))
    data = mogptk.Data(x, y)

    m_raw = mogptk.Model(mogptk.DataSet(data), _sq_exp_kernel(), mogptk.Exact())
    m_ctr = mogptk.Model(mogptk.DataSet(data), _sq_exp_kernel(), mogptk.Exact(),
                         rescale_x=True)
    assert m_ctr._x_offset is not None
    assert np.allclose(m_ctr._x_offset, offset + 10.0)
    # kernel-format x is centered (channel column untouched for single output)
    assert np.abs(m_ctr.gpr.X).max() < 100.0

    # ground truth: the same data centered at the source
    data0 = mogptk.Data(x - (offset + 10.0), y)
    m_true = mogptk.Model(mogptk.DataSet(data0), _sq_exp_kernel(), mogptk.Exact())

    xq = offset + np.linspace(2.0, 18.0, 17)
    _, mu_true, _, _ = m_true.predict([xq - (offset + 10.0)])
    _, mu_ctr, _, _ = m_ctr.predict([xq])
    _, mu_raw, _, _ = m_raw.predict([xq])
    # centered model matches ground truth to machine precision; the raw model
    # only roughly — at |x|~2.6e7 the GEMM squared-distance identity loses
    # ~1e-1 absolute in tau^2 to cancellation even in f64. rescale_x is the fix.
    assert np.allclose(mu_true, mu_ctr, atol=1e-10)
    assert not np.allclose(mu_true, mu_raw, atol=1e-10)
    assert np.allclose(mu_true, mu_raw, atol=0.1)


def test_rescale_x_named_model_kwarg():
    x = 1e7 + np.linspace(0.0, 10.0, 40)
    y = np.sin(x - 1e7)
    model = mogptk.SM(mogptk.DataSet(mogptk.Data(x, y)), Q=1, rescale_x=True)
    assert model._x_offset is not None


def _huge_axis_dataset(offset=2.0e6, span=40.0, n=70):
    xs, ys = [], []
    for j, f in enumerate([0.21, 0.34]):
        x = offset + span * np.linspace(0.0, 1.0, n) + 3.0 * j
        y = np.sin(2 * np.pi * f * (x - offset)) + 0.02 * np.random.RandomState(j).randn(n)
        xs.append(x)
        ys.append(y)
    return xs, ys


@pytest.mark.parametrize("family,kw", [
    ("SM", {}), ("MOSM", {}), ("CSM", {"Rq": 2}), ("SM_LMC", {"Rq": 2}),
    ("CONV", {}), ("MOHSM", {"P": 1}),
])
def test_rescale_x_normalize_matches_manual_normalization(family, kw):
    # spec (model.py rescale_x docs): rescale_x="normalize" is IDENTICAL to
    # manually normalizing X ((x - mean)/std over concatenated train X) and
    # running the same flow — per-family LS init must give the same LML
    xs, ys = _huge_axis_dataset()
    allx = np.concatenate(xs)
    off, s = allx.mean(), allx.std()

    cls = getattr(mogptk, family)

    mogptk.gpr.config.set_seed(11)
    m_auto = cls(mogptk.DataSet(xs, ys, names=["A", "B"]), Q=2,
                 rescale_x="normalize", **kw)
    mogptk.gpr.config.set_seed(11)
    m_manual = cls(mogptk.DataSet([(x - off) / s for x in xs], ys,
                                  names=["A", "B"]), Q=2, **kw)
    assert m_auto._x_scale is not None
    assert np.allclose(m_auto.gpr.X, m_manual.gpr.X, atol=1e-12)

    m_auto.init_parameters("LS")
    m_manual.init_parameters("LS")

    # every initialized parameter identical — the conversion IS the manual
    # normalization
    for pa, pm in zip(m_auto.gpr.parameters(), m_manual.gpr.parameters()):
        assert np.allclose(pa.numpy(), pm.numpy(), rtol=1e-6, atol=1e-10), \
            "%s: parameter %s differs" % (family, pa._name)

    if family == "MOHSM":
        # LS-initialized MOHSM is legitimately non-PSD on this long-range
        # config (reference formula parity; see test_mohsm_model) — the
        # parameter equality above is the meaningful check
        return

    lml_auto = float(m_auto.gpr.log_marginal_likelihood())
    lml_manual = float(m_manual.gpr.log_marginal_likelihood())
    assert np.isfinite(lml_auto)
    assert np.isclose(lml_auto, lml_manual, rtol=1e-6), \
        "%s: %r != %r" % (family, lml_auto, lml_manual)

    # predictions agree too (same map, same query points)
    xq = [x[5:20] for x in xs]
    _, mu_a, _, _ = m_auto.predict(xq)
    _, mu_m, _, _ = m_manual.predict([(x - off) / s for x in xq])
    for a, b in zip(mu_a, mu_m):
        assert np.allclose(a, b, atol=1e-8)


def test_rescale_x_normalize_data_unit_readbacks():
    # plot_spectrum/check read parameters back in DATA units: the displayed
    # frequencies from a normalized model must match an unnormalized one
    xs, ys = _huge_axis_dataset(offset=0.0)   # O(1) axis: both models sane
    mogptk.gpr.config.set_seed(3)
    m_norm = mogptk.SM(mogptk.DataSet(xs, ys, names=["A", "B"]), Q=2,
                       rescale_x="normalize")
    mogptk.gpr.config.set_seed(3)
    m_raw = mogptk.SM(mogptk.DataSet(xs, ys, names=["A", "B"]), Q=2)
    m_norm.init_parameters("LS")
    m_raw.init_parameters("LS")
    for j in range(2):
        f_norm = m_norm._x_from_kernel_units(
            m_norm.gpr.kernel[j].mean.numpy(), xpow=-1)
        f_raw = m_raw.gpr.kernel[j].mean.numpy()
        assert np.allclose(f_norm, f_raw, rtol=1e-6)
    # round-trip identity
    v = np.array([0.5, 2.0])
    assert np.allclose(
        m_norm._x_from_kernel_units(m_norm._x_to_kernel_units(v, -2), -2), v)


def test_rescale_x_normalize_f32_wide_span_trains():
    # the payoff case for scale normalization: a wide raw axis (~3e4 span,
    # like seconds over a week) where f32 squared distances lose most of
    # their digits — normalized, f32 LS-init training is clean
    import jax.numpy as jnp
    span, n = 3.0e4, 80
    x = span * np.linspace(0.0, 1.0, n)
    y = np.sin(2 * np.pi * (6.0 / span) * x) + 0.02 * np.random.RandomState(0).randn(n)
    mogptk.gpr.config.dtype = jnp.float32
    try:
        model = mogptk.SM(mogptk.DataSet(mogptk.Data(x, y)), Q=1,
                          rescale_x="normalize")
        model.init_parameters("LS")
        losses, _ = model.train(method="Adam", lr=0.02, iters=40)
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
    finally:
        mogptk.gpr.config.dtype = None


def test_rescale_x_invalid_value_raises():
    xs, ys = _huge_axis_dataset()
    with pytest.raises(ValueError):
        mogptk.SM(mogptk.DataSet(xs, ys, names=["A", "B"]), Q=1,
                  rescale_x="bogus")


def _sq_exp_kernel():
    k = mogptk.gpr.SquaredExponentialKernel()
    k.lengthscale.assign(1.5)
    return k


def test_top_level_namespace_matches_reference_surface():
    # the reference's star-import chain exposes the common kernel /
    # likelihood classes and CholeskyException directly on the package
    # (mogptk/__init__.py:4-18); user code addresses them that way
    for name in ["CholeskyException", "GaussianLikelihood", "Kernels",
                 "MixtureKernel", "SpectralKernel", "SpectralMixtureKernel",
                 "IndependentMultiOutputKernel", "MultiOutputSpectralKernel",
                 "MultiOutputSpectralMixtureKernel", "CrossSpectralKernel",
                 "LinearModelOfCoregionalizationKernel",
                 "GaussianConvolutionProcessKernel",
                 "MultiOutputHarmonizableSpectralKernel"]:
        assert hasattr(mogptk, name), name
        assert getattr(mogptk, name) is getattr(mogptk.gpr, name)


def test_training_times_are_filled_and_monotone():
    """Per-iteration times history must not be mostly zeros: callbacks fire
    only at chunk boundaries and the gaps are interpolated."""
    dataset = _two_channel_dataset()
    model = mogptk.SM(dataset, Q=1)
    model.train(method="Adam", lr=0.02, iters=40)
    t = np.asarray(model.times)
    assert t.shape[0] == 41
    assert np.all(np.diff(t) >= 0)
    assert np.count_nonzero(t[1:]) == 40


def test_meshgrid_data_input():
    """A list of np.meshgrid coordinate grids with a grid-shaped Y loads as
    flattened (N, 2) data (the reference's meshgrid branch never worked)."""
    xx, yy = np.meshgrid(np.linspace(0, 1, 3), np.linspace(0, 1, 4))
    Y = np.sin(xx) + yy
    data = mogptk.Data([xx, yy], Y)
    X, y = data.get_data()
    assert X.shape == (12, 2) and y.shape == (12,)


def test_error_and_predict_with_single_point_channels():
    """One test point per channel must not collapse to 0-d arrays
    (np.squeeze) and crash error()/predict()."""
    t = np.linspace(0, 10, 20)
    ds = mogptk.DataSet(t, [np.sin(t), np.cos(t)], names=["a", "b"])
    for channel in ds:
        channel.remove_indices([5])
    model = mogptk.MOSM(ds, Q=1)
    model.init_parameters("LS")
    assert np.isfinite(model.error("MAE"))
    X, Mu, Lo, Up = model.predict([np.array([3.0]), np.array([4.0])])
    assert Mu[0].shape == (1,) and Up[1].shape == (1,)
