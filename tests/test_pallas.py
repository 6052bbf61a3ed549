"""Pallas MOSM Gram kernel tests (interpret mode on CPU): forward and
parameter gradients must match the jnp broadcast formulation."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import mogptk_tpu.ops.pallas_mosm as pm
from mogptk_tpu.gpr.multioutput import _mosm_K


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(pm.pl, "pallas_call", interp)
    monkeypatch.setattr(pm, "TILE", 64)
    yield


def _setup(O=3, Q=2, D=1, N=100, M=80, seed=0):
    rng = np.random.RandomState(seed)
    x1 = jnp.asarray(rng.rand(N, D) * 5, dtype=jnp.float32)
    x2 = jnp.asarray(rng.rand(M, D) * 5, dtype=jnp.float32)
    c1 = jnp.asarray(rng.randint(0, O, N), dtype=jnp.int32)
    c2 = jnp.asarray(rng.randint(0, O, M), dtype=jnp.int32)
    w = jnp.asarray(0.5 + rng.rand(O, Q), dtype=jnp.float32)
    mu = jnp.asarray(0.1 + rng.rand(O, Q, D), dtype=jnp.float32)
    var = jnp.asarray(0.2 + rng.rand(O, Q, D), dtype=jnp.float32)
    th = jnp.asarray(0.1 * rng.randn(O, Q, D), dtype=jnp.float32)
    ph = jnp.asarray(0.1 * rng.randn(O, Q), dtype=jnp.float32)
    twopi = float((2 * np.pi) ** (D / 2))
    return x1, c1, x2, c2, w, mu, var, th, ph, twopi


@pytest.mark.parametrize("D", [1, 2])
def test_forward_matches_jnp(D):
    x1, c1, x2, c2, w, mu, var, th, ph, twopi = _setup(D=D)
    K_pallas = pm.mosm_gram(x1, c1, x2, c2, w, mu, var, th, ph, twopi, True)
    K_jnp = _mosm_K(c1, x1, c2, x2, (w, mu, var, th, ph), twopi, True)
    np.testing.assert_allclose(np.asarray(K_pallas), np.asarray(K_jnp), rtol=1e-3, atol=2e-6)


def test_gradients_match_jnp():
    x1, c1, x2, c2, w, mu, var, th, ph, twopi = _setup()

    def loss_p(w, mu, var, th, ph):
        return jnp.sum(pm.mosm_gram(x1, c1, x2, c2, w, mu, var, th, ph, twopi, True) ** 2)

    def loss_j(w, mu, var, th, ph):
        return jnp.sum(_mosm_K(c1, x1, c2, x2, (w, mu, var, th, ph), twopi, True) ** 2)

    gp = jax.grad(loss_p, argnums=(0, 1, 2, 3, 4))(w, mu, var, th, ph)
    gj = jax.grad(loss_j, argnums=(0, 1, 2, 3, 4))(w, mu, var, th, ph)
    for name, a, b in zip(["w", "mu", "var", "theta", "phi"], gp, gj):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=1e-4,
                                   err_msg="grad mismatch for %s" % name)


def test_under_jit_with_tracer_inputs():
    x1, c1, x2, c2, w, mu, var, th, ph, twopi = _setup(N=64, M=64)

    @jax.jit
    def f(x1, w):
        return jnp.sum(pm.mosm_gram(x1, c1, x2, c2, w, mu, var, th, ph, twopi, True))

    out = f(x1, w)
    assert np.isfinite(float(out))
    g = jax.jit(jax.grad(f, argnums=1))(x1, w)
    assert np.all(np.isfinite(np.asarray(g)))


# -- generalized fused families (ops/fused.py) --------------------------------

import mogptk_tpu.ops.fused as fused


@pytest.fixture(autouse=True)
def interpret_fused(monkeypatch):
    orig = fused.pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(fused.pl, "pallas_call", interp)
    monkeypatch.setattr(pm, "BWD_TILE", 64)
    yield


def _family_setup(name, O=3, D=1, N=96, M=72, seed=0):
    rng = np.random.RandomState(seed)
    x1 = jnp.asarray(rng.rand(N, D) * 5, dtype=jnp.float32)
    x2 = jnp.asarray(rng.rand(M, D) * 5, dtype=jnp.float32)
    c1 = jnp.asarray(rng.randint(0, O, N), dtype=jnp.int32)
    c2 = jnp.asarray(rng.randint(0, O, M), dtype=jnp.int32)
    twopi = float((2 * np.pi) ** (D / 2))
    if name == "umosm":
        params = (jnp.asarray(np.tril(0.5 + rng.rand(O, O)), dtype=jnp.float32),
                  jnp.asarray(0.1 + rng.rand(O, 1, D), dtype=jnp.float32),
                  jnp.asarray(0.2 + rng.rand(O, 1, D), dtype=jnp.float32),
                  jnp.asarray(0.1 * rng.randn(O, 1, D), dtype=jnp.float32),
                  jnp.asarray(0.1 * rng.randn(O, 1), dtype=jnp.float32))
        family = ("umosm", (twopi,))
    elif name == "csm":
        Rq = 2
        params = (jnp.asarray(0.5 + rng.rand(O, Rq), dtype=jnp.float32),
                  jnp.asarray(0.1 + rng.rand(1, D), dtype=jnp.float32),
                  jnp.asarray(0.2 + rng.rand(1, D), dtype=jnp.float32),
                  jnp.asarray(0.1 * rng.randn(O, Rq), dtype=jnp.float32))
        family = ("csm", (Rq, D))
    elif name == "conv":
        params = (jnp.asarray(0.5 + rng.rand(O, 1), dtype=jnp.float32),
                  jnp.asarray(0.2 + rng.rand(O, D), dtype=jnp.float32),
                  jnp.asarray(0.3 + rng.rand(1, D), dtype=jnp.float32))
        family = ("conv", (D,))
    else:
        raise ValueError(name)
    return family, O, x1, c1, x2, c2, params


@pytest.mark.parametrize("name", ["umosm", "csm", "conv"])
def test_fused_gram_matches_dense(name):
    family, O, x1, c1, x2, c2, params = _family_setup(name)
    _, dense, _ = fused.resolve_family(family)
    K_pallas = fused.fused_gram(family, O, x1, c1, x2, c2, params)
    K_dense = dense(c1, x1, c2, x2, params)
    np.testing.assert_allclose(np.asarray(K_pallas), np.asarray(K_dense),
                               rtol=1e-3, atol=2e-6)


@pytest.mark.parametrize("name", ["umosm", "csm", "conv"])
def test_fused_matvec_matches_dense(name):
    family, O, x1, c1, x2, c2, params = _family_setup(name)
    _, dense, _ = fused.resolve_family(family)
    V = jnp.asarray(np.random.RandomState(3).randn(x2.shape[0], 4), dtype=jnp.float32)
    got = fused.fused_gram_matvec(family, O, x1, c1, x2, c2, params, V)
    want = dense(c1, x1, c2, x2, params) @ V
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-3, atol=1e-4)


@pytest.mark.parametrize("name", ["umosm", "csm", "conv"])
def test_fused_lowrank_vjp_matches_dense(name):
    family, O, x1, c1, x2, c2, params = _family_setup(name)
    _, dense, _ = fused.resolve_family(family)
    rng = np.random.RandomState(4)
    A = jnp.asarray(rng.randn(x1.shape[0], 3), dtype=jnp.float32)
    B = jnp.asarray(rng.randn(x2.shape[0], 3), dtype=jnp.float32)
    got = fused.fused_gram_lowrank_vjp(family, O, x1, c1, x2, c2, params, A, B)
    _, vjp = jax.vjp(lambda ps: dense(c1, x1, c2, x2, ps), params)
    (want,) = vjp(jnp.asarray(A @ B.T))
    for g, w in zip(got, want):
        np.testing.assert_allclose(np.asarray(g), np.asarray(w), rtol=2e-3, atol=1e-3)


@pytest.mark.parametrize("name", ["mosm"])
def test_fused_diag_matches_dense(name):
    x1, c1, x2, c2, w, mu, var, th, ph, twopi = _setup()
    family = ("mosm", (twopi, True))
    _, dense, diag = fused.resolve_family(family)
    got = diag(c1, x1, (w, mu, var, th, ph))
    K = dense(c1, x1, c1, None, (w, mu, var, th, ph))
    np.testing.assert_allclose(np.asarray(got), np.asarray(jnp.diagonal(K)),
                               rtol=1e-4, atol=1e-6)


def test_trained_inducing_points_get_gradients_under_pallas():
    """Sparse models' Z is TRAINED: the fused Pallas gram's custom VJP
    returns zero input cotangents, so the Kuu/Kuf constructions must trace
    through the differentiable jnp path (config.input_gradients). Without
    that scope the Z gradient is silently zero on TPU while every CPU test
    passes — this test forces Pallas on (interpret) and compares."""
    import mogptk_tpu.gpr as gpr

    rng = np.random.RandomState(0)
    O, n_per = 2, 30
    xs = [np.linspace(0, 5, n_per).reshape(-1, 1) for _ in range(O)]
    ys = [np.sin(1.1 * x + j) + 0.05 * rng.randn(n_per, 1)
          for j, x in enumerate(xs)]
    N, X, Y = gpr.merge_data(xs, ys)

    def z_grad():
        kernel = gpr.MultiOutputSpectralMixtureKernel(1, output_dims=O)
        kernel.mean.assign(0.2 * np.ones((O, 1, 1)))
        kernel.variance.assign(0.5 * np.ones((O, 1, 1)))
        model = gpr.Titsias(kernel, X, Y, Z=6, Z_init="grid", variance=0.1)
        loss_fn = model.make_loss_fn()
        train, fixed = model._split_raws()
        grads = jax.grad(loss_fn)(train, fixed)
        # locate the Z raw's cotangent by shape
        z_shape = model.Z._raw.shape
        return [np.asarray(g) for g, t in zip(grads, train)
                if t.shape == z_shape][0]

    old = gpr.config.pallas
    try:
        gpr.use_pallas(False)
        g_ref = z_grad()
        gpr.use_pallas(True)   # CPU → interpret-mode Pallas kernels
        g_pal = z_grad()
    finally:
        gpr.config.pallas = old
        gpr.config.bump()

    assert np.abs(g_ref).max() > 1e-8, "reference Z gradient degenerate"
    np.testing.assert_allclose(g_pal, g_ref, rtol=1e-6, atol=1e-10)
