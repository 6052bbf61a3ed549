"""Unit tests for constrained parameters and bijectors."""
import numpy as np
import pytest
import jax.numpy as jnp

from mogptk_tpu.gpr import Parameter, Softplus, Sigmoid, config


def test_softplus_roundtrip():
    t = Softplus(lower=0.0)
    y = jnp.asarray([0.01, 0.5, 1.0, 5.0, 100.0])
    np.testing.assert_allclose(np.asarray(t.forward(t.inverse(y))), np.asarray(y), rtol=1e-6, atol=1e-12)


def test_softplus_lower_roundtrip():
    t = Softplus(lower=2.0)
    y = jnp.asarray([2.5, 3.0, 10.0])
    np.testing.assert_allclose(np.asarray(t.forward(t.inverse(y))), np.asarray(y), rtol=1e-6, atol=1e-12)


def test_softplus_upper():
    # negative beta gives an upper bound
    t = Softplus(lower=5.0, beta=-0.1)
    x = jnp.asarray([-3.0, 0.0, 4.0])
    y = t.forward(x)
    assert np.all(np.asarray(y) < 5.0)
    np.testing.assert_allclose(np.asarray(t.forward(t.inverse(y))), np.asarray(y), rtol=1e-6, atol=1e-12)


def test_sigmoid_roundtrip():
    t = Sigmoid(lower=-1.0, upper=3.0)
    y = jnp.asarray([-0.9, 0.0, 1.5, 2.9])
    np.testing.assert_allclose(np.asarray(t.forward(t.inverse(y))), np.asarray(y), rtol=1e-6, atol=1e-12)
    assert np.all(np.asarray(t.forward(jnp.asarray([-100.0, 100.0]))) >= -1.0)


def test_parameter_constrained_value():
    p = Parameter(1.5, lower=0.0)
    np.testing.assert_allclose(p.numpy(), 1.5, rtol=1e-6, atol=1e-12)
    p2 = Parameter([1.0, 2.0], lower=0.5, upper=3.0)
    np.testing.assert_allclose(p2.numpy(), [1.0, 2.0], rtol=1e-6, atol=1e-12)


def test_parameter_assign_clamps():
    p = Parameter(1.0, lower=0.1)
    p.assign(0.01)  # below lower → clamped
    assert p.numpy() >= 0.1 - 1e-9


def test_parameter_shape_check():
    p = Parameter([1.0, 2.0])
    with pytest.raises(ValueError):
        p.assign([1.0, 2.0, 3.0])


def test_parameter_peg():
    a = Parameter(2.0, lower=0.0)
    b = Parameter(1.0, lower=0.0)
    b.peg(a)
    np.testing.assert_allclose(np.asarray(b()), 2.0, rtol=1e-6, atol=1e-12)
    b2 = Parameter(1.0)
    b2.peg(a, transform=lambda x: 3.0 * x)
    np.testing.assert_allclose(np.asarray(b2()), 6.0, rtol=1e-6, atol=1e-12)
    assert not b.train


def test_parameter_fixed():
    p = Parameter(1.0, train=False)
    assert not p.train
    p.train = True
    assert p.train


def test_parameter_prior():
    class NormalPrior:
        def log_prob(self, x):
            return -0.5 * x ** 2

    p = Parameter(2.0, prior=NormalPrior())
    np.testing.assert_allclose(np.asarray(p.log_prior()), -2.0, rtol=1e-6, atol=1e-12)


def test_parameter_trailing_dim_alignment():
    # reference aligns trailing singleton dims on assign (gpr/parameter.py:246-250)
    p = Parameter(np.ones((3, 1)))
    p.assign(np.array([1.0, 2.0, 3.0]))
    np.testing.assert_allclose(p.numpy().reshape(-1), [1.0, 2.0, 3.0])


def test_clone_repegs_to_cloned_target():
    """deepcopy must resolve the peg target through the memo: a clone whose
    parameter pegs to the ORIGINAL model silently tracks it (stale constant
    inside the clone's jit trace)."""
    import mogptk_tpu.gpr as gpr
    k = gpr.MultiOutputSpectralKernel(output_dims=2)
    k.phase.peg(k.mean)
    k2 = k.clone()
    assert k2.phase.pegged_parameter is k2.mean
    assert k2.phase.pegged_parameter is not k.mean
    k.mean.assign(0.7 * np.ones_like(k.mean.numpy()))
    assert not np.allclose(k2.phase.numpy(), k.phase.numpy())


def test_assign_prior_bumps_structure_version():
    """A new prior changes the traced -log p(θ): the jit-cache version must
    bump or a cached loss keeps training without it."""
    from mogptk_tpu.gpr.config import config
    p = Parameter(1.0, lower=0.0)
    v0 = config.structure_version

    class _P:
        def log_prob(self, x):
            return -x
    p.assign(prior=_P())
    assert config.structure_version != v0
