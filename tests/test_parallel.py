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
    params1, _, loss_sharded = step(params, opt_state, X_sh, Y_sh)
    # with the mesh installed the deterministic LML routes through
    # parallel.chol.distributed_lml (panel factorization + slab backward);
    # value AND parameter updates must match the single-device step
    np.testing.assert_allclose(float(loss_sharded), exact.loss(), rtol=1e-8)
    exact.use_gram_sharding(None)
    loss_fn = exact.make_loss_fn()
    train0, fixed = exact._split_raws()
    _, g = jax.value_and_grad(loss_fn)(train0, fixed)
    updates, _ = opt.update(g, opt.init(train0), train0)
    expected = jax.tree.map(lambda p, u: p + u, train0, updates)
    for a, b in zip(params1, expected):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


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


# -- real row-sharded exact inference (ring + Gram sharding constraint) ------

def _mosm_setup(n_per=32):
    x0 = np.linspace(0, 5, n_per).reshape(-1, 1)
    x1 = np.linspace(0, 5, n_per).reshape(-1, 1)
    _, X, Y = gpr.merge_data([x0, x1], [np.sin(x0), np.cos(x1)])
    kernel = gpr.MultiOutputSpectralKernel(output_dims=2)
    return X, Y, kernel


def test_ring_matvec_matches_dense():
    """The shard_map ppermute ring computes exactly (K + diag(noise)) @ V,
    and its output stays row-sharded (each device holds N/P rows)."""
    from mogptk_tpu.parallel import mosm_ring_matvec
    from mogptk_tpu.parallel.sharding import shard_data
    from mogptk_tpu.gpr.multioutput import _mosm_K
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    X, Y, kernel = _mosm_setup(32)  # N=64 over 8 devices
    mesh = make_mesh(8)
    X_sh, Y_sh, _ = shard_data(X, Y, mesh)
    c = X_sh[:, 0].astype(jnp.int32)
    x = X_sh[:, 1:]
    params = kernel._params()
    noise = 0.1 * jnp.ones(64)
    rng = np.random.RandomState(0)
    V = jnp.asarray(rng.randn(64, 4))
    V = jax.device_put(V, NamedSharding(mesh, P("data", None)))

    out = jax.jit(lambda v: mosm_ring_matvec(
        mesh, "data", x, c, noise, params, kernel.twopi, True, False, v))(V)

    K = _mosm_K(c, x, c, None, params, kernel.twopi, True)
    expected = K @ V + noise[:, None] * V
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-10)

    # per-device shard shapes must shrink: N/P rows each
    shapes = sorted(s.data.shape for s in out.addressable_shards)
    assert shapes == [(8, 4)] * 8


def test_ring_lowrank_vjp_matches_dense():
    from mogptk_tpu.parallel import mosm_ring_lowrank_vjp
    from mogptk_tpu.gpr.multioutput import _mosm_K
    import jax.numpy as jnp

    X, Y, kernel = _mosm_setup(32)
    mesh = make_mesh(8)
    c = jnp.asarray(X[:, 0], dtype=jnp.int32)
    x = jnp.asarray(X[:, 1:])
    params = kernel._params()
    rng = np.random.RandomState(1)
    A = jnp.asarray(rng.randn(64, 3))
    B = jnp.asarray(rng.randn(64, 3))

    douts = jax.jit(lambda a, b: mosm_ring_lowrank_vjp(
        mesh, "data", x, c, params, kernel.twopi, True, False, a, b))(A, B)

    _, vjp = jax.vjp(lambda *p: _mosm_K(c, x, c, None, p, kernel.twopi, True), *params)
    expected = vjp(A @ B.T)
    for got, want in zip(douts, expected):
        np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


def test_nondivisible_n_with_data_variance():
    """Padding must also cover per-point data_variance (y_err models): the
    noise diagonal pads the (n_real,) vector to the padded row count."""
    import optax
    rng = np.random.RandomState(0)
    n = 67
    X = np.linspace(0, 10, n).reshape(-1, 1)
    y = np.sin(X) + 0.05 * rng.randn(n, 1)
    y_err = 0.01 + 0.02 * rng.rand(n)
    kernel = gpr.SpectralMixtureKernel(Q=1)
    model = gpr.Exact(kernel, X, y, variance=0.05,
                      data_variance=np.asarray(y_err) ** 2)
    mesh = make_mesh(8)
    step, params, opt_state, X_sh, y_sh = data_parallel_step(
        model, mesh, optax.adam(1e-2))
    _, _, loss_sharded = step(params, opt_state, X_sh, y_sh)
    np.testing.assert_allclose(float(loss_sharded), float(model.loss()),
                               rtol=1e-8)


def test_ring_matvec_family_generic():
    """The ring primitives are family-generic: SM-LMC (the newest fused
    family) through ring_gram_matvec matches the dense product."""
    from mogptk_tpu.parallel.ring import ring_gram_matvec
    from mogptk_tpu.gpr.multioutput import _lmc_sm_K
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    rng = np.random.RandomState(0)
    spectral = [gpr.SpectralKernel(1) for _ in range(2)]
    for k in spectral:
        k.mean.assign(0.1 + 0.2 * rng.rand(1))
        k.variance.assign(0.2 + 0.2 * rng.rand(1))
    kernel = gpr.LinearModelOfCoregionalizationKernel(
        spectral, output_dims=2, Q=2, Rq=2)
    kernel.weight.assign(0.3 + rng.rand(2, 2, 2))
    params = kernel._fused_params()

    n = 64
    x = jnp.asarray(np.sort(rng.rand(n, 1) * 6, axis=0))
    c = jnp.asarray(rng.randint(0, 2, n), dtype=jnp.int32)
    noise = 0.1 * jnp.ones(n)
    V = jnp.asarray(rng.randn(n, 4))
    mesh = make_mesh(8)
    V = jax.device_put(V, NamedSharding(mesh, P("data", None)))

    out = jax.jit(lambda v: ring_gram_matvec(
        mesh, "data", ("lmc_sm", (2, 1)), 2, x, c, noise, params, False, v))(V)
    K = _lmc_sm_K(c, x, c, None, params)
    expected = K @ V + noise[:, None] * V
    np.testing.assert_allclose(np.asarray(out), np.asarray(expected), rtol=1e-10)


def test_iterative_ring_step_matches_dense_lml():
    """Full training step with the ring: loss is a CG/SLQ estimate of the
    same LML the dense model computes."""
    from mogptk_tpu.parallel import iterative_ring_step

    X, Y, kernel = _mosm_setup(32)
    model = gpr.ExactIterative(kernel, X, Y, variance=0.1, num_probes=64,
                               lanczos_iters=40, max_cg_iters=200)
    dense = gpr.Exact(gpr.MultiOutputSpectralKernel(output_dims=2), X, Y, variance=0.1)
    mesh = make_mesh(8)
    step, params, opt_state, X_sh, Y_sh = iterative_ring_step(model, mesh, optax.adam(1e-2))
    params1, _, loss = step(params, opt_state, X_sh, Y_sh)
    np.testing.assert_allclose(float(loss), dense.loss(), rtol=0.05)
    assert all(bool(np.all(np.isfinite(np.asarray(p)))) for p in params1)
    # inputs stay row-sharded through the step
    shapes = sorted(s.data.shape for s in X_sh.addressable_shards)
    assert shapes == [(8, 2)] * 8
    model.use_ring(None)


def test_exact_sharded_gram_is_row_sharded():
    """exact_sharded_step constrains the Gram assembly to row blocks: the
    assembled N×N matrix is physically distributed, N/P rows per device."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from mogptk_tpu.parallel.sharding import shard_data

    X, Y, kernel = _mosm_setup(32)
    exact = gpr.Exact(kernel, X, Y, variance=0.1)
    mesh = make_mesh(8)
    step, params, opt_state, X_sh, Y_sh = exact_sharded_step(exact, mesh, optax.adam(1e-2))
    _, _, loss = step(params, opt_state, X_sh, Y_sh)
    np.testing.assert_allclose(float(loss), exact.loss(), rtol=1e-8)

    # probe the Gram's physical layout under the same constraint
    object.__setattr__(exact, "X", X_sh)
    K = jax.jit(lambda: exact._Kff(add_jitter=True))()
    shapes = sorted(s.data.shape for s in K.addressable_shards)
    assert shapes == [(8, 64)] * 8


def test_distributed_cholesky_matches_dense():
    """Row-sharded right-looking panel factorization over the mesh: matches
    jnp.linalg.cholesky, the output stays row-sharded (O(N^2/P) per-device
    memory), gradients flow, and non-PSD inputs produce NaN rows (jitter
    ladders keep working)."""
    from mogptk_tpu.parallel import distributed_cholesky
    import jax.numpy as jnp
    rng = np.random.RandomState(0)
    n = 64
    A = rng.randn(n, n)
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    # full 8-device mesh: the panel sweeps run under lax.fori_loop, so the
    # traced program no longer grows with the device count
    mesh = make_mesh(8)
    L = jax.jit(lambda K: distributed_cholesky(K, mesh))(K)
    np.testing.assert_allclose(np.asarray(L), np.asarray(jnp.linalg.cholesky(K)),
                               rtol=1e-9, atol=1e-10)
    shapes = sorted(s.data.shape for s in L.addressable_shards)
    assert shapes == [(8, 64)] * 8

    # differentiable (standard chol/solve/dot VJPs through shard_map); the
    # two factorizations read the symmetric input differently, so compare
    # symmetrized gradients (both are valid for symmetric K — cf. the
    # single-chip blocked-Cholesky gradient test)
    g = jax.grad(lambda K: jnp.sum(jnp.log(jnp.diagonal(
        distributed_cholesky(K, mesh)))))(K)
    g_ref = jax.grad(lambda K: jnp.sum(jnp.log(jnp.diagonal(
        jnp.linalg.cholesky(K)))))(K)
    sym = lambda A: 0.5 * (np.asarray(A) + np.asarray(A).T)
    np.testing.assert_allclose(sym(g), sym(g_ref), rtol=1e-8, atol=1e-10)

    # NaN semantics on non-PSD input
    e = np.ones((n, 1)) / np.sqrt(n)
    K_bad = jnp.asarray(np.eye(n) - 1.5 * (e @ e.T))
    L_bad = distributed_cholesky(K_bad, mesh)
    assert bool(jnp.any(jnp.isnan(L_bad)))

    with pytest.raises(ValueError, match="divide"):
        distributed_cholesky(jnp.eye(61), mesh)


def test_distributed_cho_solve_and_lml():
    """Block-substitution solves against the row-sharded factor and the
    distributed LML must match the dense forms; gradients flow through the
    LML (the masked selects solve against the broadcast TRUE diagonal
    block, so no singular-solve garbage poisons autodiff)."""
    from mogptk_tpu.parallel import (distributed_cholesky,
                                     distributed_cho_solve, distributed_lml)
    import jax.numpy as jnp
    import jax.scipy.linalg as jsl
    from mogptk_tpu.ops.linalg import lml_quadform_logdet
    rng = np.random.RandomState(1)
    n = 64
    A = rng.randn(n, n)
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    Bm = jnp.asarray(rng.randn(n, 3))
    mesh = make_mesh(8)   # fori_loop sweeps: trace cost is mesh-independent
    L = distributed_cholesky(K, mesh)
    X = jax.jit(lambda L, B: distributed_cho_solve(L, B, mesh))(L, Bm)
    X_ref = jsl.cho_solve((jnp.linalg.cholesky(K), True), Bm)
    np.testing.assert_allclose(np.asarray(X), np.asarray(X_ref),
                               rtol=1e-9, atol=1e-10)

    y = jnp.asarray(rng.randn(n, 1))
    val = jax.jit(lambda K, y: distributed_lml(K, y, mesh))(K, y)
    ref = lml_quadform_logdet(K, y)
    np.testing.assert_allclose(float(val), float(ref), rtol=1e-10)

    g = jax.grad(lambda K: distributed_lml(K, y, mesh))(K)
    g_ref = jax.grad(lambda K: lml_quadform_logdet(K, y))(K)
    sym = lambda A: 0.5 * (np.asarray(A) + np.asarray(A).T)
    np.testing.assert_allclose(sym(g), sym(g_ref), rtol=1e-7, atol=1e-9)


def test_distributed_lml_stochastic_matches_single_device():
    """The probe-gradient distributed LML: same seed-fixed Rademacher stream
    as ops/linalg.lml_quadform_logdet_stochastic, so value AND gradient
    match the single-device stochastic form bit-for-bit; the backward is
    one low-rank slab GEMM per device (no identity-block solves)."""
    from mogptk_tpu.parallel import distributed_lml_stochastic
    from mogptk_tpu.ops.linalg import lml_quadform_logdet_stochastic
    import jax.numpy as jnp
    rng = np.random.RandomState(2)
    n = 64
    A = rng.randn(n, n)
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    y = jnp.asarray(rng.randn(n, 1))
    mesh = make_mesh(8)

    val = jax.jit(lambda K, y: distributed_lml_stochastic(
        K, y, mesh, num_probes=8, seed=3))(K, y)
    ref = lml_quadform_logdet_stochastic(K, y, 8, 3)
    np.testing.assert_allclose(float(val), float(ref), rtol=1e-12)

    g = jax.grad(lambda K: distributed_lml_stochastic(
        K, y, mesh, num_probes=8, seed=3))(K)
    g_ref = jax.grad(lambda K: lml_quadform_logdet_stochastic(K, y, 8, 3))(K)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref),
                               rtol=1e-9, atol=1e-12)


def test_exact_sharded_probe_gradient_step():
    """Exact(trace_probes=R) through exact_sharded_step: the headline
    probe-gradient configuration now runs fully distributed — loss and
    parameter updates must match the single-device stochastic step."""
    X, Y, kernel = _mosm_setup(32)
    exact = gpr.Exact(kernel, X, Y, variance=0.1, trace_probes=8, seed=5)
    opt = optax.adam(1e-2)
    mesh = make_mesh(8)
    step, params, opt_state, X_sh, Y_sh = exact_sharded_step(exact, mesh, opt)
    params1, _, loss_sharded = step(params, opt_state, X_sh, Y_sh)
    np.testing.assert_allclose(float(loss_sharded), exact.loss(), rtol=1e-8)

    exact.use_gram_sharding(None)
    loss_fn = exact.make_loss_fn()
    train0, fixed = exact._split_raws()
    _, g = jax.value_and_grad(loss_fn)(train0, fixed)
    updates, _ = opt.update(g, opt.init(train0), train0)
    expected = jax.tree.map(lambda p, u: p + u, train0, updates)
    for a, b in zip(params1, expected):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-6, atol=1e-9)


def test_exact_sharded_masked_probe_gradient():
    """Masked/padded rows (N=67 over 8 devices) with probe gradients route
    through the distributed stochastic LML: finite loss, finite updated
    parameters, and the value matches the single-device masked stochastic
    form at the padded shape (same probe stream)."""
    x0 = np.linspace(0, 5, 34).reshape(-1, 1)
    x1 = np.linspace(0, 5, 33).reshape(-1, 1)
    _, X, Y = gpr.merge_data([x0, x1], [np.sin(x0), np.cos(x1)])
    assert X.shape[0] == 67
    exact = gpr.Exact(gpr.MultiOutputSpectralKernel(output_dims=2), X, Y,
                      variance=0.1, trace_probes=8, seed=7)
    opt = optax.adam(1e-2)
    mesh = make_mesh(8)
    step, params, opt_state, X_sh, Y_sh = exact_sharded_step(exact, mesh, opt)
    params1, _, loss_sharded = step(params, opt_state, X_sh, Y_sh)
    assert np.isfinite(float(loss_sharded))
    assert all(bool(np.all(np.isfinite(np.asarray(p)))) for p in params1)
    # deterministic masked LML as ground truth: the stochastic FORWARD value
    # is exact (probes only enter the backward), so the values agree up to
    # the jitter-scale difference of the padded diagonal
    dense = gpr.Exact(gpr.MultiOutputSpectralKernel(output_dims=2), X, Y,
                      variance=0.1)
    np.testing.assert_allclose(float(loss_sharded), dense.loss(), rtol=1e-6)


# -- user-facing use_mesh policy (mogptk_tpu.use_mesh) -----------------------

def _quickstart_model(n=100, pct=0.2, inference=None):
    import mogptk_tpu as mogptk
    mogptk.gpr.config.set_seed(7)
    t = np.linspace(0, 10, n)
    rng = np.random.RandomState(0)
    ys = [np.sin(0.5 * t) + 0.05 * rng.randn(n),
          2.0 * np.sin(0.2 * t) + 0.05 * rng.randn(n)]
    ds = mogptk.DataSet(t, ys, names=["A", "B"])
    for ch in ds:
        ch.transform(mogptk.TransformStandard())
        ch.remove_randomly(pct=pct)
    kwargs = {} if inference is None else {"inference": inference}
    m = mogptk.MOSM(ds, Q=2, **kwargs)
    m.init_parameters("LS")
    return m


@pytest.fixture
def _mesh_off():
    """Always restore the single-device policy, even on test failure."""
    import mogptk_tpu as mogptk
    yield
    mogptk.use_mesh(None)


def test_use_mesh_quickstart_matches_single_device(_mesh_off):
    """The README quick-start runs unchanged (one added line) on the
    8-device mesh: identical losses, predictions, and error; switching the
    mesh off restores the model transparently."""
    import mogptk_tpu as mogptk
    m0 = _quickstart_model()
    m0.train(method="Adam", lr=0.02, iters=25)
    _, mu0, lo0, up0 = m0.predict()
    e0 = m0.error("MAE")

    mogptk.use_mesh()  # <- the one added line
    m1 = _quickstart_model()
    m1.train(method="Adam", lr=0.02, iters=25)
    _, mu1, lo1, up1 = m1.predict()
    e1 = m1.error("MAE")
    lml1 = m1.log_marginal_likelihood()
    # the training data really is sharded over the mesh
    assert len(m1.gpr.X.sharding.device_set) == 8
    mogptk.use_mesh(None)
    e1_off = m1.error("MAE")  # model un-prepares lazily and still answers

    np.testing.assert_allclose(m1.losses, m0.losses, rtol=1e-8)
    for a, b in zip(mu1, mu0):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)
    for a, b in zip(up1, up0):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(e1, e0, rtol=1e-8)
    np.testing.assert_allclose(e1_off, e1, rtol=1e-10)
    assert np.isfinite(lml1)


def test_use_mesh_nondivisible_padded_predict(_mesh_off):
    """Non-divisible N pads + masks: train/predict/error still match the
    single-device run exactly (padded rows contribute nothing, including in
    the posterior)."""
    import mogptk_tpu as mogptk
    m0 = _quickstart_model(n=91, pct=0.1)
    assert m0.gpr.X.shape[0] % 8 != 0
    m0.train(method="Adam", lr=0.02, iters=15)
    _, mu0, _, up0 = m0.predict()

    mogptk.use_mesh()
    m1 = _quickstart_model(n=91, pct=0.1)
    m1.train(method="Adam", lr=0.02, iters=15)
    assert m1.gpr._row_mask is not None
    _, mu1, _, up1 = m1.predict()
    np.testing.assert_allclose(m1.losses, m0.losses, rtol=1e-8)
    for a, b in zip(mu1, mu0):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)
    for a, b in zip(up1, up0):
        np.testing.assert_allclose(a, b, rtol=1e-6, atol=1e-8)


def test_use_mesh_titsias_and_iterative(_mesh_off):
    """The sparse-variational and iterative-exact selectors route through
    the mesh too (data-parallel ELBO / the ppermute ring)."""
    import mogptk_tpu as mogptk

    m0 = _quickstart_model(pct=0.2, inference=mogptk.Titsias(inducing_points=8))
    m0.train(method="Adam", lr=0.01, iters=10)
    m1 = _quickstart_model(pct=0.2,
                           inference=mogptk.Iterative(max_cg_iters=50,
                                                      num_probes=8))
    m1.train(method="Adam", lr=0.01, iters=10)
    _, mu1, _, _ = m1.predict()

    mogptk.use_mesh()
    t0 = _quickstart_model(pct=0.2, inference=mogptk.Titsias(inducing_points=8))
    t0.train(method="Adam", lr=0.01, iters=10)
    i0 = _quickstart_model(pct=0.2,
                           inference=mogptk.Iterative(max_cg_iters=50,
                                                      num_probes=8))
    i0.train(method="Adam", lr=0.01, iters=10)
    assert i0.gpr._ring is not None
    _, mu_i, _, _ = i0.predict()

    np.testing.assert_allclose(t0.losses, m0.losses, rtol=1e-7)
    np.testing.assert_allclose(i0.losses, m1.losses, rtol=1e-7)
    for a, b in zip(mu_i, mu1):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-7)


def test_use_mesh_model_pickles_and_restores_real_rows(_mesh_off):
    """Saving a mesh-prepared model must not crash on the process-local
    Mesh handle, and the padded X/y rows must NOT survive serialization
    (the pad sentinels would resurrect as training data)."""
    import pickle
    import mogptk_tpu as mogptk

    m = _quickstart_model(n=91, pct=0.1)   # 91 does not divide 8 devices
    n_real = int(m.gpr.X.shape[0])
    mogptk.use_mesh()
    m.train(method="Adam", lr=0.02, iters=3)
    assert m.gpr.X.shape[0] % 8 == 0 and m.gpr.X.shape[0] > n_real
    blob = pickle.dumps(m)
    mogptk.use_mesh(None)
    m2 = pickle.loads(blob)
    assert int(m2.gpr.X.shape[0]) == n_real
    assert int(m2.gpr.y.shape[0]) == n_real
    # the restored model trains/predicts single-device
    m2.train(method="Adam", lr=0.02, iters=2)
    _, mu, _, _ = m2.predict()
    assert all(np.isfinite(np.asarray(v)).all() for v in mu)
