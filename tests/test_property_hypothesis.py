"""Hypothesis property-based tests for the host-side layers (ROADMAP #11).

`tests/test_property_fuzz.py` covers the Gram-matrix contracts with a
self-contained RNG sweep; this file uses `hypothesis` (available in this
image) to search the *host-side* invariants adversarially — the layers
where the reference's behavior is defined by round-trip identities rather
than by linear algebra:

- Transformer stacks invert exactly: backward(forward(y)) == y for any
  fitted composition (reference: mogptk/transformer.py:4-153).
- Parameter constrained/raw transforms round-trip and always respect
  bounds (reference: mogptk/gpr/parameter.py:99-346).
- merge_data/split_data are mutually inverse (reference: mogptk/gpr/util.py).
- `_parse_delta` duration strings compose additively
  (reference: mogptk/data.py:1361-1413).
- Error metrics: identity-zero, RMSE² == MSE, sMAPE symmetry
  (reference: mogptk/util.py:6-44).

All properties run on small NumPy arrays (the Parameter ones touch jax on
CPU with cheap elementwise ops only), so the suite stays fast.
"""
import numpy as np
import pytest

from hypothesis import given, settings, assume, HealthCheck
from hypothesis import strategies as st
from hypothesis.extra import numpy as hnp

import mogptk_tpu as mt
import mogptk_tpu.gpr as gpr
from mogptk_tpu.gpr.parameter import Softplus, Sigmoid
from mogptk_tpu.data import _parse_delta

SETTINGS = dict(max_examples=30, deadline=None,
                suppress_health_check=[HealthCheck.too_slow])

finite = dict(allow_nan=False, allow_infinity=False)


def y_arrays(min_side=3, max_side=24):
    return hnp.arrays(
        np.float64, st.integers(min_side, max_side),
        elements=st.floats(-1e3, 1e3, **finite))


# ---------------------------------------------------------------- transformer

@given(y=y_arrays(),
       stack=st.lists(st.sampled_from(["standard", "normalize", "log",
                                       "linear", "detrend"]),
                      min_size=1, max_size=4),
       seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_transformer_stack_roundtrip(y, stack, seed):
    # fitted transforms need spread (Normalize/Standard divide by the range/
    # std of the data *as seen at their position in the stack*; rather than
    # predict that, require healthy spread up front and skip degenerate draws)
    assume(np.std(y) > 1e-3 * (1.0 + np.abs(y).max()))
    rng = np.random.RandomState(seed)
    x = np.sort(rng.uniform(-5.0, 5.0, y.shape[0])).reshape(-1, 1)

    t = mt.Transformer()
    makers = {
        "standard": lambda: mt.TransformStandard(),
        "normalize": lambda: mt.TransformNormalize(),
        "log": lambda: mt.TransformLog(),
        "linear": lambda: mt.TransformLinear(bias=float(rng.randn()),
                                             slope=float(np.exp(rng.randn()))),
        "detrend": lambda: mt.TransformDetrend(degree=int(rng.randint(0, 3))),
    }
    for name in stack:
        yf = t.forward(y, x)
        if name in ("standard", "normalize") and np.ptp(yf) < 1e-9:
            continue  # fitting on (now-)constant data is ill-posed
        t.append(makers[name](), y, x)

    z = t.forward(y, x)
    back = t.backward(z, x)
    scale = 1.0 + np.abs(y).max()
    np.testing.assert_allclose(back, y, atol=1e-6 * scale, rtol=1e-6)


@given(y=y_arrays(), seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_transform_log_maps_min_to_zero_of_log1(y, seed):
    tl = mt.TransformLog()
    tl.set_data(y)
    z = tl.forward(y)
    # min(y) is shifted to 1 before the log: min of log(y+shift) is 0,
    # so min(z) == -mean by construction
    assert np.isfinite(z).all()
    np.testing.assert_allclose(z.min(), -tl.mean, atol=1e-12)


# ------------------------------------------------------------------ parameter

@given(value=st.floats(-50.0, 50.0, **finite),
       lower=st.floats(-60.0, 40.0, **finite),
       width=st.floats(0.5, 100.0, **finite),
       bounded_above=st.booleans())
@settings(**SETTINGS)
def test_parameter_assign_respects_bounds(value, lower, width, bounded_above):
    upper = lower + width if bounded_above else None
    p = gpr.Parameter(np.clip(value, lower + 0.1 * width,
                              (lower + 0.9 * width) if bounded_above else None),
                      lower=lower, upper=upper)
    p.assign(value)
    got = float(np.asarray(p.numpy()))
    assert got >= lower - 1e-8 * max(1.0, abs(lower))
    if upper is not None:
        assert got <= upper + 1e-8 * max(1.0, abs(upper))
    # strictly-interior values round-trip through the unconstrained storage
    if lower + 0.05 * width < value < lower + 0.95 * width:
        np.testing.assert_allclose(got, value, rtol=1e-5, atol=1e-7)


@given(y=st.floats(0.05, 1e4, **finite), beta=st.floats(0.05, 5.0, **finite))
@settings(**SETTINGS)
def test_softplus_roundtrip(y, beta):
    t = Softplus(lower=0.0, beta=beta)
    np.testing.assert_allclose(float(t.forward(t.inverse(np.float64(y)))), y,
                               rtol=1e-6, atol=1e-10)


@given(frac=st.floats(1e-4, 1.0 - 1e-4, **finite),
       lower=st.floats(-100.0, 100.0, **finite),
       width=st.floats(0.1, 200.0, **finite))
@settings(**SETTINGS)
def test_sigmoid_roundtrip(frac, lower, width):
    t = Sigmoid(lower=lower, upper=lower + width)
    y = lower + frac * width
    np.testing.assert_allclose(float(t.forward(t.inverse(np.float64(y)))), y,
                               rtol=1e-6, atol=1e-8 * max(1.0, abs(lower) + width))


# ---------------------------------------------------------- merge/split_data

@given(sizes=st.lists(st.integers(1, 12), min_size=1, max_size=4),
       dims=st.integers(1, 3), seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_merge_split_roundtrip(sizes, dims, seed):
    rng = np.random.RandomState(seed)
    xs = [rng.randn(n, dims) for n in sizes]
    ys = [rng.randn(n, 1) for n in sizes]
    N, X, Y = gpr.merge_data(xs, ys)
    assert list(N) == sizes
    xs2, ys2 = gpr.split_data(N, np.asarray(X)[:, 1:], np.asarray(Y))
    for a, b in zip(xs, xs2):
        np.testing.assert_allclose(a, b)
    for a, b in zip(ys, ys2):
        np.testing.assert_allclose(a, b)


# ---------------------------------------------------------------- _parse_delta

@given(h=st.integers(0, 99), m=st.integers(0, 99), s=st.integers(0, 99))
@settings(**SETTINGS)
def test_parse_delta_composes_additively(h, m, s):
    assume(h + m + s > 0)
    text = "".join(p for p in [("%dh" % h) if h else "",
                               ("%dm" % m) if m else "",
                               ("%ds" % s) if s else ""])
    dtype = np.dtype("datetime64[s]")
    got = _parse_delta(text, dtype)
    assert got == 3600.0 * h + 60.0 * m + float(s)


@given(n=st.integers(1, 1000),
       unit=st.sampled_from(["week", "day", "hour", "minute", "second"]))
@settings(**SETTINGS)
def test_parse_delta_unit_names_match_symbols(n, unit):
    sym = {"week": "W", "day": "D", "hour": "h",
           "minute": "m", "second": "s"}[unit]
    dtype = np.dtype("datetime64[s]")
    assert n * _parse_delta(unit, dtype) == _parse_delta("%d%s" % (n, sym), dtype)


# -------------------------------------------------------------------- metrics

@given(y=y_arrays())
@settings(**SETTINGS)
def test_metric_identities(y):
    yt = y.reshape(-1, 1)
    assert mt.mean_absolute_error(yt, yt) == 0.0
    assert mt.mean_squared_error(yt, yt) == 0.0


@given(y=y_arrays(), seed=st.integers(0, 2**31 - 1))
@settings(**SETTINGS)
def test_rmse_is_sqrt_mse_and_smape_symmetric(y, seed):
    rng = np.random.RandomState(seed)
    yp = y + rng.randn(*y.shape)
    np.testing.assert_allclose(mt.root_mean_squared_error(y, yp),
                               np.sqrt(mt.mean_squared_error(y, yp)))
    a = mt.symmetric_mean_absolute_percentage_error(y, yp)
    b = mt.symmetric_mean_absolute_percentage_error(yp, y)
    np.testing.assert_allclose(a, b, rtol=1e-12)
