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
