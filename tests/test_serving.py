"""Serving artifacts (mogptk_tpu/serving.py): export → reload → predict
parity with Model.predict, symbolic batch sizes, transform inversion."""
import numpy as np
import pytest

import mogptk_tpu as mogptk
from mogptk_tpu import serving


def _trained_model(tmp_path, rescale=False, multioutput=True):
    t = np.linspace(0, 10, 50)
    y1 = np.sin(1.3 * t) + 0.05 * np.random.RandomState(0).randn(50)
    y2 = np.cos(0.8 * t) + 0.05 * np.random.RandomState(1).randn(50)
    if multioutput:
        ds = mogptk.DataSet(t, [y1, y2], names=["A", "B"])
        for ch in ds:
            ch.transform(mogptk.TransformStandard())
        model = mogptk.MOSM(ds, Q=1,
                            rescale_x="normalize" if rescale else False)
    else:
        d = mogptk.Data(t, y1)
        d.transform(mogptk.TransformDetrend(degree=1))
        model = mogptk.SM(mogptk.DataSet(d), Q=1)
    model.train(method="Adam", lr=0.02, iters=20)
    return model


def test_export_reload_matches_model_predict(tmp_path):
    model = _trained_model(tmp_path)
    path = serving.export_predictor(model, str(tmp_path / "artifact"))
    pred = serving.Predictor(path)

    xq = [np.linspace(1.0, 9.0, 17), np.linspace(0.5, 8.5, 13)]
    X_m, mu_m, lo_m, up_m = model.predict(xq, sigma=2)
    X_p, mu_p, lo_p, up_p = pred.predict(xq, sigma=2)
    for j in range(2):
        np.testing.assert_allclose(mu_p[j], mu_m[j], rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(lo_p[j], lo_m[j], rtol=1e-6, atol=1e-8)
        np.testing.assert_allclose(up_p[j], up_m[j], rtol=1e-6, atol=1e-8)


def test_symbolic_batch_and_rescale(tmp_path):
    model = _trained_model(tmp_path, rescale=True)
    path = serving.export_predictor(model, str(tmp_path / "artifact_r"))
    pred = serving.Predictor(path)
    # one artifact, several query sizes (symbolic n)
    for n in [3, 8, 31]:
        xq = [np.linspace(2.0, 9.0, n), np.linspace(2.0, 9.0, n)]
        _, mu_m, _, _ = model.predict(xq)
        _, mu_p, _, _ = pred.predict(xq)
        for j in range(2):
            np.testing.assert_allclose(mu_p[j], mu_m[j], rtol=1e-6, atol=1e-8)


def test_single_output_detrend(tmp_path):
    model = _trained_model(tmp_path, multioutput=False)
    path = serving.export_predictor(model, str(tmp_path / "artifact_s"))
    pred = serving.Predictor(path)
    xq = [np.linspace(1.0, 9.0, 11)]
    # single-output predict returns unwrapped arrays in both APIs
    _, mu_m, lo_m, _ = model.predict(xq, sigma=2)
    _, mu_p, lo_p, _ = pred.predict(xq, sigma=2)
    np.testing.assert_allclose(mu_p, mu_m, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(lo_p, lo_m, rtol=1e-6, atol=1e-8)


def test_channel_count_validation(tmp_path):
    model = _trained_model(tmp_path)
    path = serving.export_predictor(model, str(tmp_path / "artifact_v"))
    pred = serving.Predictor(path)
    with pytest.raises(ValueError):
        pred.predict([np.linspace(0, 1, 4)] * 3)


def test_restricted_unpickler_refuses_payload(tmp_path):
    """A crafted meta.pkl must not execute code on load: the Predictor uses
    a restricted unpickler (plain containers, numpy, mogptk_tpu only)."""
    import io
    import pickle
    import zipfile
    import pytest
    from mogptk_tpu.serving import _restricted_loads

    class Evil:
        def __reduce__(self):
            import os
            return (os.system, ("true",))

    payload = pickle.dumps(Evil())
    with pytest.raises(pickle.UnpicklingError):
        _restricted_loads(payload)
    # the benign metadata shapes still load
    import numpy as np
    meta = {"a": np.arange(3), "b": [1.0, "s"], "c": None}
    out = _restricted_loads(pickle.dumps(meta))
    assert out["b"] == [1.0, "s"]
