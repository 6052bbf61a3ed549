"""Multi-chip sharding tests on the virtual 8-device CPU mesh: the sharded
training step must compile, execute, and agree numerically with the
single-device step."""
import numpy as np
import pytest
import jax
import optax

import mogptk_tpu.gpr as gpr
from mogptk_tpu.parallel import make_mesh, data_parallel_step, exact_sharded_step


pytestmark = pytest.mark.skipif(len(jax.devices()) < 2, reason="needs multiple devices")


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.shape["data"] == 8


def test_data_parallel_svgp_step_matches_single_device():
    rng = np.random.RandomState(0)
    n = 32
    X = np.linspace(0, 10, n).reshape(-1, 1)
    y = np.sin(X) + 0.05 * rng.randn(n, 1)
    kernel = gpr.SpectralMixtureKernel(Q=2)
    svgp = gpr.SparseHensman(kernel, X, y, Z=4, likelihood=gpr.GaussianLikelihood(0.3))
    opt = optax.adam(1e-2)

    mesh = make_mesh(8)
    step, params, opt_state, X_sh, y_sh = data_parallel_step(svgp, mesh, opt)
    params1, _, loss_sharded = step(params, opt_state, X_sh, y_sh)

    # single-device value of the same loss
    loss_single = svgp.loss()
    np.testing.assert_allclose(float(loss_sharded), loss_single, rtol=1e-8)

    # parameters must move identically to an unsharded optax step
    loss_fn = svgp.make_loss_fn()
    train0, fixed = svgp._split_raws()
    v, g = jax.value_and_grad(loss_fn)(train0, fixed)
    updates, _ = opt.update(g, opt.init(train0), train0)
    expected = jax.tree.map(lambda p, u: p + u, train0, updates)
    for a, b in zip(params1, expected):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-10)


def test_exact_sharded_step_matches_single_device():
    rng = np.random.RandomState(1)
    x0 = np.linspace(0, 5, 16).reshape(-1, 1)
    x1 = np.linspace(0, 5, 16).reshape(-1, 1)
    N, X, Y = gpr.merge_data([x0, x1], [np.sin(x0), np.cos(x1)])
    mosm = gpr.MultiOutputSpectralKernel(output_dims=2)
    exact = gpr.Exact(mosm, X, Y, variance=0.1)
    opt = optax.adam(1e-2)

    mesh = make_mesh(8)
    step, params, opt_state, X_sh, Y_sh = exact_sharded_step(exact, mesh, opt)
    _, _, loss_sharded = step(params, opt_state, X_sh, Y_sh)
    np.testing.assert_allclose(float(loss_sharded), exact.loss(), rtol=1e-8)


def test_multiple_sharded_steps_progress():
    rng = np.random.RandomState(2)
    n = 64
    X = np.linspace(0, 10, n).reshape(-1, 1)
    y = np.sin(X) + 0.05 * rng.randn(n, 1)
    svgp = gpr.SparseHensman(gpr.SquaredExponentialKernel(), X, y, Z=4,
                             likelihood=gpr.GaussianLikelihood(0.3))
    opt = optax.adam(5e-2)
    mesh = make_mesh(8)
    step, params, opt_state, X_sh, y_sh = data_parallel_step(svgp, mesh, opt)
    losses = []
    for _ in range(20):
        params, opt_state, loss = step(params, opt_state, X_sh, y_sh)
        losses.append(float(loss))
    assert losses[-1] < losses[0]


def test_graft_entry_dryrun():
    import __graft_entry__ as g
    fn, args = g.entry()
    out = jax.jit(fn)(*args)
    assert np.isfinite(float(out))
    g.dryrun_multichip(8)


def test_data_parallel_iterative_exact():
    """The iterative (CG/SLQ) exact model composes with mesh sharding: X/y
    row-sharded, parameters replicated, XLA partitions the Gram matvec."""
    rng = np.random.RandomState(0)
    x0 = np.linspace(0, 5, 16).reshape(-1, 1)
    x1 = np.linspace(0, 5, 16).reshape(-1, 1)
    N, X, Y = gpr.merge_data([x0, x1], [np.sin(x0), np.cos(x1)])
    kernel = gpr.MultiOutputSpectralKernel(output_dims=2)
    model = gpr.ExactIterative(kernel, X, Y, variance=0.1, num_probes=8)
    opt = optax.adam(1e-2)
    mesh = make_mesh(8)
    step, params, opt_state, X_sh, Y_sh = data_parallel_step(model, mesh, opt)
    params, opt_state, loss = step(params, opt_state, X_sh, Y_sh)
    np.testing.assert_allclose(float(loss), model.loss(), rtol=1e-6)


def test_nondivisible_n_svgp_masked_padding():
    """N=67 does not divide 8 devices: rows are padded and masked out, and the
    sharded ELBO equals the single-device ELBO exactly."""
    rng = np.random.RandomState(3)
    n = 67
    X = np.linspace(0, 10, n).reshape(-1, 1)
    y = np.sin(X) + 0.05 * rng.randn(n, 1)
    svgp = gpr.SparseHensman(gpr.SpectralMixtureKernel(Q=2), X, y, Z=4,
                             likelihood=gpr.GaussianLikelihood(0.3))
    opt = optax.adam(1e-2)
    mesh = make_mesh(8)
    step, params, opt_state, X_sh, y_sh = data_parallel_step(svgp, mesh, opt)
    assert X_sh.shape[0] == 72  # padded to the next multiple of 8
    params1, _, loss_sharded = step(params, opt_state, X_sh, y_sh)
    np.testing.assert_allclose(float(loss_sharded), svgp.loss(), rtol=1e-8)

    # gradients must be unpolluted by the padded rows: parameters move
    # identically to an unsharded optax step
    loss_fn = svgp.make_loss_fn()
    train0, fixed = svgp._split_raws()
    _, g = jax.value_and_grad(loss_fn)(train0, fixed)
    updates, _ = opt.update(g, opt.init(train0), train0)
    expected = jax.tree.map(lambda p, u: p + u, train0, updates)
    for a, b in zip(params1, expected):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-7, atol=1e-10)


def test_nondivisible_n_exact_masked_padding():
    """Exact LML with masked padding: padded rows are a block-diagonal
    identity extension, adding exactly 0 to quadform and logdet."""
    x0 = np.linspace(0, 5, 34).reshape(-1, 1)
    x1 = np.linspace(0, 5, 33).reshape(-1, 1)
    N, X, Y = gpr.merge_data([x0, x1], [np.sin(x0), np.cos(x1)])
    assert X.shape[0] == 67
    exact = gpr.Exact(gpr.MultiOutputSpectralKernel(output_dims=2), X, Y, variance=0.1)
    opt = optax.adam(1e-2)
    mesh = make_mesh(8)
    step, params, opt_state, X_sh, Y_sh = exact_sharded_step(exact, mesh, opt)
    _, _, loss_sharded = step(params, opt_state, X_sh, Y_sh)
    # the jitter scale (mean of the padded diagonal) differs at ~1e-8 relative
    np.testing.assert_allclose(float(loss_sharded), exact.loss(), rtol=1e-6)


def test_nondivisible_n_iterative_masked():
    """ExactIterative with masked padding: the masked operator's CG/SLQ loss
    stays an estimate of the N=67 LML (probe draws differ at the padded
    shape, so compare against the dense ground truth)."""
    x0 = np.linspace(0, 5, 34).reshape(-1, 1)
    x1 = np.linspace(0, 5, 33).reshape(-1, 1)
    N, X, Y = gpr.merge_data([x0, x1], [np.sin(x0), np.cos(x1)])
    kernel = gpr.MultiOutputSpectralKernel(output_dims=2)
    model = gpr.ExactIterative(kernel, X, Y, variance=0.1, num_probes=64,
                               lanczos_iters=40, max_cg_iters=200)
    dense = gpr.Exact(gpr.MultiOutputSpectralKernel(output_dims=2), X, Y, variance=0.1)
    opt = optax.adam(1e-2)
    mesh = make_mesh(8)
    step, params, opt_state, X_sh, Y_sh = data_parallel_step(model, mesh, opt)
    params1, _, loss_sharded = step(params, opt_state, X_sh, Y_sh)
    np.testing.assert_allclose(float(loss_sharded), dense.loss(), rtol=0.05)
    assert all(bool(np.all(np.isfinite(np.asarray(p)))) for p in params1)


def test_nondivisible_n_rejected_without_mask_support():
    """Models that cannot mask rows reject padding with a clear error."""
    rng = np.random.RandomState(4)
    n = 67
    X = np.linspace(0, 10, n).reshape(-1, 1)
    y = np.sin(X) + 0.05 * rng.randn(n, 1)
    titsias = gpr.Titsias(gpr.SquaredExponentialKernel(), X, y, Z=4)
    mesh = make_mesh(8)
    with pytest.raises(ValueError, match="mask"):
        data_parallel_step(titsias, mesh, optax.adam(1e-2))
