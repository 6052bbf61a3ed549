"""Channel-block MOSM Gram engine (ops/block_mosm.py) parity tests
(interpret mode on CPU): forward and hand-derived backward must match the
jnp broadcast formulation."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import mogptk_tpu.ops.block_mosm as bm
from mogptk_tpu.gpr.multioutput import _mosm_K


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(bm.pl, "pallas_call", interp)
    monkeypatch.setattr(bm, "TILE", 32)
    monkeypatch.setattr(bm, "BWD_TILE", 16)
    yield


def _setup(counts, Q=2, D=1, seed=0):
    O = len(counts)
    rng = np.random.RandomState(seed)
    N = sum(counts)
    x = jnp.asarray(np.sort(rng.rand(N, D) * 5, axis=0), dtype=jnp.float64)
    c = jnp.asarray(np.repeat(np.arange(O), counts), dtype=jnp.int32)
    w = jnp.asarray(0.5 + rng.rand(O, Q))
    mu = jnp.asarray(0.1 + rng.rand(O, Q, D))
    var = jnp.asarray(0.2 + rng.rand(O, Q, D))
    th = jnp.asarray(0.1 * rng.randn(O, Q, D))
    ph = jnp.asarray(0.1 * rng.randn(O, Q))
    twopi = float((2 * np.pi) ** (D / 2))
    return x, c, (w, mu, var, th, ph), twopi


@pytest.mark.parametrize("counts,Q,D", [
    ((40, 33, 27), 2, 1),
    ((33, 0, 50), 1, 2),    # empty channel + multi-dim inputs
    ((64,), 3, 1),          # single channel
])
def test_forward_matches_dense(counts, Q, D):
    x, c, params, twopi = _setup(counts, Q=Q, D=D)
    K_blk = bm.mosm_gram_sorted(x, counts, *params, twopi, True)
    K_ref = _mosm_K(c, x, c, x, params, twopi, phase_inside_2pi=True)
    np.testing.assert_allclose(np.asarray(K_blk), np.asarray(K_ref),
                               rtol=1e-12, atol=1e-12)


def test_gradient_matches_dense():
    counts = (40, 33, 27)
    x, c, params, twopi = _setup(counts, Q=2, D=2, seed=3)
    R = jnp.asarray(np.random.RandomState(4).randn(sum(counts), sum(counts)))

    def f_blk(params):
        return jnp.sum(bm.mosm_gram_sorted(x, counts, *params, twopi, True) * R)

    def f_ref(params):
        return jnp.sum(_mosm_K(c, x, c, x, params, twopi,
                               phase_inside_2pi=True) * R)

    g_blk = jax.grad(f_blk)(params)
    g_ref = jax.grad(f_ref)(params)
    for a, b, name in zip(g_blk, g_ref, ["w", "mu", "var", "theta", "phi"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11, err_msg=name)


def test_bf16_gram_is_f32_math_rounded():
    # sub-f32 Grams (use_half_precision) store bf16 but COMPUTE in f32
    # in-tile (_compute_dtype): the bf16 output must equal the f32 Gram
    # rounded to bf16 — raw-bf16 τ-chains would lose the cosine phase
    counts = (40, 33)
    x, c, params, twopi = _setup(counts, Q=2, D=1, seed=2)
    x32 = x.astype(jnp.float32)
    p32 = tuple(p.astype(jnp.float32) for p in params)
    p16 = tuple(p.astype(jnp.bfloat16) for p in params)

    K32 = bm.mosm_gram_sorted(x32, counts, *p32, twopi, True)
    K16 = bm.mosm_gram_sorted(x32, counts, *p16, twopi, True)
    assert K16.dtype == jnp.bfloat16
    # bf16 params shift the stats slightly; output matches the f32 Gram to
    # bf16 resolution plus that parameter rounding
    np.testing.assert_allclose(np.asarray(K16, dtype=np.float32),
                               np.asarray(K32), rtol=3e-2, atol=3e-2)

    # matvec returns the SOLVE dtype (f32), computed in f32; only the bf16
    # PARAMS differ between the two calls (same f32 V isolates the path)
    V = jnp.asarray(np.random.RandomState(1).randn(sum(counts), 3),
                    dtype=jnp.float32)
    out = bm.mosm_matvec_sorted(x32, counts, *p16, twopi, V)
    assert out.dtype == jnp.float32
    out32 = bm.mosm_matvec_sorted(x32, counts, *p32, twopi, V)
    np.testing.assert_allclose(np.asarray(out), np.asarray(out32),
                               rtol=5e-2, atol=5e-1)

    # low-rank VJP returns cotangents in the parameter dtype
    A = jnp.asarray(np.random.RandomState(2).randn(sum(counts), 2),
                    dtype=jnp.float32)
    dparams = bm.mosm_lowrank_vjp_sorted(x32, counts, p16, twopi, A, A)
    assert all(d.dtype == jnp.bfloat16 for d in dparams)


def test_sorted_channel_counts():
    X = np.column_stack([np.repeat([0, 1, 2], [3, 0, 4] if False else [3, 2, 4]),
                         np.arange(9.0)])
    assert bm.sorted_channel_counts(X, 3) == (3, 2, 4)
    # unsorted channels -> None
    Xu = X.copy()
    Xu[0, 0] = 2
    assert bm.sorted_channel_counts(Xu, 3) is None
    # channel id out of range -> None
    assert bm.sorted_channel_counts(X, 2) is None
    # missing trailing channel padded with zero count
    X2 = np.column_stack([np.repeat([0, 1], [3, 2]), np.arange(5.0)])
    assert bm.sorted_channel_counts(X2, 3) == (3, 2, 0)


def test_exact_model_routes_to_block_engine(monkeypatch):
    """merge_data layout + MOSM + pallas on -> _Kff uses the channel-block
    engine, and the loss matches the generic jnp path."""
    import mogptk_tpu.gpr as gpr

    rng = np.random.RandomState(0)
    xs = [np.sort(rng.uniform(0, 10, n)).reshape(-1, 1) for n in (33, 47)]
    ys = [np.sin(x) + 0.05 * rng.randn(*x.shape) for x in xs]
    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.MultiOutputSpectralMixtureKernel(2, output_dims=2)
    kernel.mean.assign(0.1 + 0.2 * rng.rand(2, 2, 1))
    model = gpr.Exact(kernel, X, Y, variance=0.1)
    assert model._channel_counts == (33, 47)

    loss_generic = float(model.loss())

    calls = {"n": 0}
    orig = bm.mosm_gram_sorted

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    import mogptk_tpu.gpr.multioutput as mo
    monkeypatch.setattr(bm, "mosm_gram_sorted", spy)
    old = gpr.config.pallas
    try:
        gpr.use_pallas(True)
        jax.clear_caches()
        g = jax.grad(model.make_loss_fn())(*model._split_raws())
        loss_block = float(model.loss())
        assert calls["n"] >= 1, "block engine was not used"
        np.testing.assert_allclose(loss_block, loss_generic, rtol=1e-10)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in jax.tree_util.tree_leaves(g))
    finally:
        gpr.config.pallas = old
        gpr.config.bump()
        jax.clear_caches()


def test_unsorted_data_skips_block_engine():
    import mogptk_tpu.gpr as gpr
    rng = np.random.RandomState(1)
    X = np.column_stack([rng.randint(0, 2, 40), np.sort(rng.rand(40) * 5)])
    Y = np.sin(X[:, 1:]) + 0.01 * rng.randn(40, 1)
    kernel = gpr.MultiOutputSpectralMixtureKernel(2, output_dims=2)
    model = gpr.Exact(kernel, X, Y, variance=0.1)
    assert model._channel_counts is None
    assert np.isfinite(float(model.loss()))


def test_matvec_sorted_matches_dense():
    counts = (40, 33, 27)
    x, c, params, twopi = _setup(counts, Q=2, D=1, seed=5)
    N = sum(counts)
    V = jnp.asarray(np.random.RandomState(6).randn(N, 5))
    out = bm.mosm_matvec_sorted(x, counts, *params, twopi, V)
    K = _mosm_K(c, x, c, x, params, twopi, phase_inside_2pi=True)
    np.testing.assert_allclose(np.asarray(out), np.asarray(K @ V),
                               rtol=1e-10, atol=1e-10)
    # empty channel + multi-dim
    counts2 = (30, 0, 40)
    x2, c2, params2, twopi2 = _setup(counts2, Q=1, D=2, seed=7)
    V2 = jnp.asarray(np.random.RandomState(8).randn(sum(counts2), 3))
    out2 = bm.mosm_matvec_sorted(x2, counts2, *params2, twopi2, V2)
    K2 = _mosm_K(c2, x2, c2, x2, params2, twopi2, phase_inside_2pi=True)
    np.testing.assert_allclose(np.asarray(out2), np.asarray(K2 @ V2),
                               rtol=1e-10, atol=1e-10)


def test_lowrank_vjp_sorted_matches_dense():
    counts = (40, 33)
    x, c, params, twopi = _setup(counts, Q=2, D=2, seed=9)
    N = sum(counts)
    rng = np.random.RandomState(10)
    A = jnp.asarray(rng.randn(N, 4))
    B = jnp.asarray(rng.randn(N, 4))

    dparams = bm.mosm_lowrank_vjp_sorted(x, counts, params, twopi, A, B)

    def f(params):
        K = _mosm_K(c, x, c, x, params, twopi, phase_inside_2pi=True)
        return jnp.sum(K * (A @ B.T))

    dref = jax.grad(f)(params)
    for a, b, name in zip(dparams, dref, ["w", "mu", "var", "theta", "phi"]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-9, atol=1e-11, err_msg=name)


def test_iterative_routes_to_block_engine():
    """ExactIterative with channel-sorted data + pallas on must use the
    scalar-stat matvec/low-rank VJP and agree with the generic path."""
    import mogptk_tpu.gpr as gpr

    rng = np.random.RandomState(2)
    xs = [np.sort(rng.uniform(0, 10, n)).reshape(-1, 1) for n in (40, 56)]
    ys = [np.sin(x) + 0.05 * rng.randn(*x.shape) for x in xs]
    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.MultiOutputSpectralMixtureKernel(2, output_dims=2)
    kernel.mean.assign(0.1 + 0.2 * rng.rand(2, 2, 1))
    model = gpr.ExactIterative(kernel, X, Y, variance=0.1, max_cg_iters=200,
                               cg_tol=1e-10, num_probes=64, lanczos_iters=30)
    assert model._channel_counts == (40, 56)

    loss_fn = model.make_loss_fn()
    train, fixed = model._split_raws()
    v_gen, g_gen = jax.value_and_grad(loss_fn)(train, fixed)

    old = gpr.config.pallas
    try:
        gpr.use_pallas(True)
        jax.clear_caches()
        model._jit_cache.clear()
        assert model._static()[7] is True and model._static()[-1] == (40, 56)
        loss_fn2 = model.make_loss_fn()
        v_blk, g_blk = jax.value_and_grad(loss_fn2)(train, fixed)
    finally:
        gpr.config.pallas = old
        gpr.config.bump()
        jax.clear_caches()

    # same probes/seed -> the stochastic estimates agree up to solver noise
    np.testing.assert_allclose(float(v_blk), float(v_gen), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_blk),
                    jax.tree_util.tree_leaves(g_gen)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)
