"""Iterative (BBMM/CG) exact inference tests: CG/Lanczos building blocks
against dense linear algebra, and ExactIterative against Cholesky-based
Exact on the same model."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mogptk_tpu.gpr as gpr
from mogptk_tpu.ops.iterative import cg_solve, lanczos, slq_logdet, pivoted_cholesky


def _spd(n, seed=0, cond=10.0):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n)
    A = A @ A.T
    return jnp.asarray(A + n * np.eye(n))


def test_cg_matches_direct_solve():
    A = _spd(40)
    B = jnp.asarray(np.random.RandomState(1).randn(40, 3))
    X, res = cg_solve(lambda V: A @ V, B, max_iters=80)
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(np.asarray(A), np.asarray(B)),
                               rtol=1e-5, atol=1e-7)
    assert np.all(np.asarray(res) < 1e-5)


def test_cg_with_preconditioner():
    A = _spd(40)
    d = jnp.diagonal(A)
    B = jnp.asarray(np.random.RandomState(2).randn(40, 2))
    X, res = cg_solve(lambda V: A @ V, B, max_iters=60, M_inv=lambda V: V / d[:, None])
    np.testing.assert_allclose(np.asarray(X), np.linalg.solve(np.asarray(A), np.asarray(B)),
                               rtol=1e-5, atol=1e-7)


def test_slq_logdet_dtype_mismatch():
    """Default f32 probes against an f64 operator (x64 is on in this suite)
    must not trip the scan carry-type check — the recurrence runs in the
    matvec's output dtype."""
    rng = np.random.RandomState(3)
    A_ = rng.randn(40, 40)
    A = jnp.asarray(A_ @ A_.T + 40 * np.eye(40))   # f64 under x64
    est = float(slq_logdet(lambda V: A @ V, 40, num_probes=64,
                           lanczos_iters=30))       # default dtype=float32
    ref = float(np.linalg.slogdet(np.asarray(A))[1])
    assert np.isfinite(est) and abs(est - ref) / abs(ref) < 0.1


def test_slq_logdet_accuracy():
    A = _spd(60)
    sign, logdet = np.linalg.slogdet(np.asarray(A))
    est = float(slq_logdet(lambda V: A @ V, 60, num_probes=30, lanczos_iters=30,
                           key=jax.random.PRNGKey(0), dtype=A.dtype))
    assert abs(est - logdet) / abs(logdet) < 0.05, (est, logdet)


def test_lanczos_tridiagonal_eigs_bound_spectrum():
    A = _spd(50)
    Z = jax.random.rademacher(jax.random.PRNGKey(0), (50, 4), dtype=A.dtype)
    alphas, betas = lanczos(lambda V: A @ V, Z, 20)
    lam_true = np.linalg.eigvalsh(np.asarray(A))
    for r in range(4):
        T = np.diag(np.asarray(alphas[:, r])) + np.diag(np.asarray(betas[:, r]), 1) + np.diag(np.asarray(betas[:, r]), -1)
        lam = np.linalg.eigvalsh(T)
        assert lam.min() >= lam_true.min() - 1e-6
        assert lam.max() <= lam_true.max() + 1e-6


def test_pivoted_cholesky_low_rank():
    A = np.asarray(_spd(30))
    L = pivoted_cholesky(jnp.asarray(np.diag(A)), lambda i: jnp.asarray(A)[i, :], 30, 30)
    np.testing.assert_allclose(np.asarray(L @ L.T), A, rtol=1e-4, atol=1e-6)


def _mosm_model(cls, n_per=24, **kwargs):
    rng = np.random.RandomState(0)
    x0 = np.linspace(0, 6, n_per).reshape(-1, 1)
    x1 = np.linspace(0, 6, n_per).reshape(-1, 1)
    N, X, Y = gpr.merge_data([x0, x1],
                             [np.sin(1.2 * x0) + 0.05 * rng.randn(n_per, 1),
                              np.cos(1.2 * x1) + 0.05 * rng.randn(n_per, 1)])
    kernel = gpr.MultiOutputSpectralMixtureKernel(2, output_dims=2)
    kernel.mean.assign(0.1 + 0.1 * rng.rand(2, 2, 1))
    kernel.variance.assign(0.3 + 0.1 * rng.rand(2, 2, 1))
    return cls(kernel, X, Y, variance=0.1, **kwargs)


def test_iterative_lml_matches_cholesky():
    exact = _mosm_model(gpr.Exact)
    iterative = _mosm_model(gpr.ExactIterative, max_cg_iters=200, cg_tol=1e-10,
                            num_probes=64, lanczos_iters=48)
    lml_chol = float(exact.log_marginal_likelihood())
    lml_iter = float(iterative.log_marginal_likelihood())
    # quadratic form is exact via CG; logdet is stochastic (~1%)
    assert abs(lml_iter - lml_chol) / abs(lml_chol) < 0.05, (lml_iter, lml_chol)


def test_readout_lml_recovers_underbudgeted_value():
    """log_marginal_likelihood_readout (ROADMAP #7): a deliberately
    starved per-step budget gives a biased LML value, but the
    evaluation-grade readout recovers the dense ground truth to <0.5%
    (and strictly improves on the training estimate)."""
    exact = _mosm_model(gpr.Exact)
    starved = _mosm_model(gpr.ExactIterative, max_cg_iters=4, cg_tol=1e-10,
                          num_probes=4, lanczos_iters=4, precond_rank=0)
    truth = float(exact.log_marginal_likelihood())
    budget = float(starved.log_marginal_likelihood())
    readout = float(starved.log_marginal_likelihood_readout(seeds=2))
    assert abs(readout - truth) <= abs(budget - truth)
    assert abs(readout - truth) / abs(truth) < 0.005, (readout, truth, budget)

    # the top-level trainer API reads the converged value by default
    # (readout=False returns the raw budget-limited estimate)
    import mogptk_tpu as mogptk
    t = np.linspace(0, 6, 24)
    ds = mogptk.DataSet(t, [np.sin(1.2 * t), np.cos(1.2 * t)])
    m = mogptk.Model(ds, mogptk.gpr.MultiOutputSpectralMixtureKernel(
        2, output_dims=2), inference=mogptk.Iterative(
            max_cg_iters=4, num_probes=4, lanczos_iters=4, precond_rank=0))
    assert np.isfinite(m.log_marginal_likelihood())
    assert np.isfinite(m.log_marginal_likelihood(readout=False))


def test_iterative_gradients_match_cholesky():
    exact = _mosm_model(gpr.Exact)
    iterative = _mosm_model(gpr.ExactIterative, max_cg_iters=300, cg_tol=1e-12,
                            num_probes=256, lanczos_iters=48)

    def grads(model):
        loss_fn = model.make_loss_fn()
        train, fixed = model._split_raws()
        return jax.grad(loss_fn)(train, fixed)

    g_chol = grads(exact)
    g_iter = grads(iterative)
    # identify comparable leaves by matching shapes in order
    for a, b in zip(g_iter, g_chol):
        a, b = np.asarray(a), np.asarray(b)
        denom = np.abs(b).max() + 1e-3
        assert np.abs(a - b).max() / denom < 0.15, (a, b)


def test_iterative_prediction_matches_cholesky():
    exact = _mosm_model(gpr.Exact)
    iterative = _mosm_model(gpr.ExactIterative, max_cg_iters=200, cg_tol=1e-10)
    Xs = np.concatenate([np.zeros((10, 1)), np.linspace(0, 6, 10).reshape(-1, 1)], axis=1)
    mu_c, var_c = exact.predict_f(Xs)
    mu_i, var_i = iterative.predict_f(Xs)
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_c), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_c), rtol=1e-2, atol=1e-5)


def test_iterative_training_reduces_loss():
    model = _mosm_model(gpr.ExactIterative, num_probes=16)
    loss0 = model.loss()
    losses, _ = gpr.train(model, method="Adam", lr=0.02, iters=40)
    assert losses[-1] < loss0


def test_iterative_rejects_unsupported_kernel():
    X = np.linspace(0, 5, 10).reshape(-1, 1)
    with pytest.raises(ValueError):
        gpr.ExactIterative(gpr.SquaredExponentialKernel(), X, np.sin(X))


def test_trainer_iterative_selector():
    import mogptk_tpu as mogptk
    t = np.linspace(0, 6, 30)
    ds = mogptk.DataSet(t, [np.sin(t), np.cos(t)], names=["A", "B"])
    model = mogptk.MOSM(ds, Q=1, inference=mogptk.Iterative(num_probes=8))
    losses, _ = model.train(method="Adam", lr=0.02, iters=20)
    assert np.isfinite(losses[-1])


def test_iterative_with_preconditioner_matches():
    plain = _mosm_model(gpr.ExactIterative, max_cg_iters=200, cg_tol=1e-10,
                        num_probes=64, lanczos_iters=48)
    pc = _mosm_model(gpr.ExactIterative, max_cg_iters=200, cg_tol=1e-10,
                     num_probes=64, lanczos_iters=48, precond_rank=10)
    np.testing.assert_allclose(float(pc.log_marginal_likelihood()),
                               float(plain.log_marginal_likelihood()), rtol=1e-3)


def test_preconditioner_speeds_convergence():
    """With an ill-conditioned kernel the preconditioned CG residual after a
    small iteration budget must beat plain CG."""
    from mogptk_tpu.ops.iterative import cg_solve, pivoted_cholesky
    rng = np.random.RandomState(0)
    n = 120
    x = np.sort(rng.rand(n)) * 10
    K = np.exp(-0.5 * (x[:, None] - x[None, :]) ** 2 / 4.0) + 1e-3 * np.eye(n)
    K = jnp.asarray(K)
    b = jnp.asarray(rng.randn(n, 1))

    matvec = lambda V: K @ V
    _, res_plain = cg_solve(matvec, b, max_iters=15)

    L = pivoted_cholesky(jnp.diagonal(K), lambda i: K[i, :], n, 20)
    sigma2 = 1e-3
    inner = sigma2 * jnp.eye(20) + L.T @ L
    Li = jnp.linalg.cholesky(inner)
    M_inv = lambda V: (V - L @ jax.scipy.linalg.cho_solve((Li, True), L.T @ V)) / sigma2
    _, res_pc = cg_solve(matvec, b, max_iters=15, M_inv=M_inv)
    assert float(res_pc[0]) < float(res_plain[0]), (float(res_pc[0]), float(res_plain[0]))


def test_cg_diagnostics():
    model = _mosm_model(gpr.ExactIterative, max_cg_iters=150, cg_tol=1e-8)
    r_y, r_z = model.cg_diagnostics()
    assert r_y < 1e-8 and r_z < 1e-8
    # the default preconditioner rank (64, clamped to n) is numerically
    # exact at this tiny n — CG converges in one step regardless of the
    # budget — so the under-converged scenario needs it disabled
    under = _mosm_model(gpr.ExactIterative, max_cg_iters=2, cg_tol=1e-10,
                        precond_rank=0)
    r_y2, _ = under.cg_diagnostics()
    assert r_y2 > r_y


def test_iterative_blocked_prediction_matches_unblocked():
    """The blocked (materialization-free) variance path must agree with the
    dense Cholesky posterior, including when S does not divide the block."""
    exact = _mosm_model(gpr.Exact)
    iterative = _mosm_model(gpr.ExactIterative, max_cg_iters=200, cg_tol=1e-10)
    Xs = np.concatenate([np.zeros((13, 1)), np.linspace(0, 6, 13).reshape(-1, 1)], axis=1)
    mu_c, var_c = exact.predict_f(Xs)
    # 13 points over blocks of 4 → 4 blocks with 3 padded columns
    mu_b, var_b = iterative.predict_f(Xs, block_size=4)
    np.testing.assert_allclose(np.asarray(mu_b), np.asarray(mu_c), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_b), np.asarray(var_c), rtol=1e-2, atol=1e-5)


# -- fused families beyond MOSM (uMOSM / CSM / CONV / MOHSM) ------------------

def _family_kernel(name, rng):
    if name == "umosm":
        k = gpr.UncoupledMultiOutputSpectralKernel(output_dims=2)
        k.weight.assign(np.tril(0.5 + rng.rand(2, 2)))
        k.mean.assign(0.1 + 0.1 * rng.rand(2, 1))
        k.variance.assign(0.3 + 0.1 * rng.rand(2, 1))
        return k
    if name == "csm":
        k = gpr.CrossSpectralKernel(output_dims=2, Rq=2)
        k.mean.assign(0.1 + 0.1 * rng.rand(1))
        k.variance.assign(0.3 + 0.1 * rng.rand(1))
        k.amplitude.assign(0.5 + rng.rand(2, 2))
        return k
    if name == "conv":
        k = gpr.GaussianConvolutionProcessKernel(output_dims=2)
        k.variance.assign(0.3 + 0.1 * rng.rand(2, 1))
        return k
    if name == "lmc_sm":
        spectral = [gpr.SpectralKernel(1) for _ in range(2)]
        for kq in spectral:
            kq.mean.assign(0.1 + 0.1 * rng.rand(1))
            kq.variance.assign(0.3 + 0.1 * rng.rand(1))
        k = gpr.LinearModelOfCoregionalizationKernel(
            spectral, output_dims=2, Q=2, Rq=2)
        k.weight.assign(0.3 + 0.5 * rng.rand(2, 2, 2))
        return k
    if name == "mohsm":
        k = gpr.MultiOutputHarmonizableSpectralKernel(output_dims=2)
        k.mean.assign(0.1 + 0.1 * rng.rand(2, 1))
        # MOHSM keeps reference formula parity and is non-PSD for narrow
        # spectral variances / wide envelopes (see test_api.test_mohsm_model);
        # wide variance + tight envelope lengthscale is its PSD regime here
        # (eigmin ≈ −1e-7 on this grid, well under the 0.1 noise diagonal)
        k.variance.assign(0.9 + 0.2 * rng.rand(2, 1))
        k.lengthscale.assign(0.25 + 0.1 * rng.rand(2))
        return k
    raise ValueError(name)


def _family_models(name, n_per=24):
    rng = np.random.RandomState(0)
    x0 = np.linspace(0, 6, n_per).reshape(-1, 1)
    x1 = np.linspace(0, 6, n_per).reshape(-1, 1)
    _, X, Y = gpr.merge_data([x0, x1],
                             [np.sin(1.2 * x0) + 0.05 * rng.randn(n_per, 1),
                              np.cos(1.2 * x1) + 0.05 * rng.randn(n_per, 1)])
    dense = gpr.Exact(_family_kernel(name, np.random.RandomState(1)), X, Y, variance=0.1)
    it = gpr.ExactIterative(_family_kernel(name, np.random.RandomState(1)), X, Y,
                            variance=0.1, max_cg_iters=300, cg_tol=1e-10,
                            num_probes=128, lanczos_iters=48)
    return dense, it


@pytest.mark.parametrize("name", ["umosm", "csm", "conv", "mohsm", "lmc_sm"])
def test_iterative_family_lml_matches_cholesky(name):
    dense, it = _family_models(name)
    # the SLQ logdet carries probe noise of ~±0.5 nats at this conditioning
    # (verified directly against slogdet of the same operator); the LML is a
    # small difference of large terms, so bound the absolute error
    np.testing.assert_allclose(float(it.loss()), float(dense.loss()),
                               rtol=0.05, atol=0.7)


@pytest.mark.parametrize("name", ["umosm", "csm", "conv", "mohsm", "lmc_sm"])
def test_iterative_family_prediction_matches_cholesky(name):
    dense, it = _family_models(name)
    Xs = np.concatenate([np.zeros((9, 1)), np.linspace(0, 6, 9).reshape(-1, 1)], axis=1)
    mu_c, var_c = dense.predict_f(Xs)
    mu_i, var_i = it.predict_f(Xs, block_size=4)
    np.testing.assert_allclose(np.asarray(mu_i), np.asarray(mu_c), rtol=1e-3, atol=1e-5)
    np.testing.assert_allclose(np.asarray(var_i), np.asarray(var_c), rtol=1e-2, atol=1e-5)


def test_iterative_half_precision():
    """use_half_precision + ExactIterative: bf16 data/params while the CG
    recurrence, Woodbury preconditioner and logdet quadrature run in the
    f32 solve dtype (the fused engines return f32; a bf16 carry crashed the
    scan and jnp.linalg.cholesky rejected the bf16 Woodbury inner)."""
    old_dtype = gpr.config._dtype
    old_x64 = jax.config.jax_enable_x64
    old_pallas = gpr.config.pallas
    try:
        gpr.use_half_precision()
        gpr.use_pallas(True)       # engines return the f32 solve dtype
        jax.clear_caches()
        rng = np.random.RandomState(0)
        n_per = 24
        x0 = np.linspace(0, 6, n_per).reshape(-1, 1)
        _, X, Y = gpr.merge_data(
            [x0, x0], [np.sin(1.2 * x0) + 0.05 * rng.randn(n_per, 1),
                       np.cos(1.2 * x0) + 0.05 * rng.randn(n_per, 1)])
        k = gpr.MultiOutputSpectralKernel(output_dims=2)
        k.mean.assign(0.1 + 0.1 * rng.rand(2, 1))
        it = gpr.ExactIterative(k, X, Y, variance=0.1, max_cg_iters=100,
                                num_probes=32, lanczos_iters=24)
        assert it.X.dtype == jnp.bfloat16
        loss = float(it.loss())
        assert np.isfinite(loss)
        grads = jax.grad(it.make_loss_fn())(*it._split_raws())
        leaves = jax.tree_util.tree_leaves(grads)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        assert all(g.dtype == jnp.bfloat16 for g in leaves)
    finally:
        jax.config.update("jax_enable_x64", old_x64)
        gpr.config._dtype = old_dtype
        gpr.config.pallas = old_pallas
        gpr.config.bump()
        jax.clear_caches()


def test_static_drops_stale_channel_counts():
    """A row mask means X was padded after _channel_counts was computed
    (mesh sharding) — the sorted engines must not see the stale counts."""
    from mogptk_tpu.gpr.iterative import _counts_or_none
    rng = np.random.RandomState(0)
    x0 = np.linspace(0, 6, 20).reshape(-1, 1)
    _, X, Y = gpr.merge_data([x0, x0], [np.sin(x0), np.cos(x0)])
    k = gpr.MultiOutputSpectralKernel(output_dims=2)
    it = gpr.ExactIterative(k, X, Y, variance=0.1)
    assert it._static()[-1] == (20, 20)
    object.__setattr__(it, "_row_mask", jnp.ones(48))
    assert it._static()[-1] is None
    # defense in depth: counts that no longer sum to the row count drop too
    assert _counts_or_none((20, 20), jnp.zeros((48, 1))) is None
    assert _counts_or_none((20, 20), jnp.zeros((40, 1))) == (20, 20)


def test_iterative_family_trains():
    _, it = _family_models("conv")
    loss0 = it.loss()
    losses, _ = gpr.train(it, method="Adam", lr=0.02, iters=30)
    assert losses[-1] < loss0


def test_cg_logdet_quadrature_matches_dense():
    """CG-is-Lanczos: the logdet read off the CG coefficients (with probes
    drawn from the preconditioner and the exact logdet(P) correction) must
    match the dense logdet to statistical tolerance."""
    import numpy as np
    import jax
    import jax.numpy as jnp
    from mogptk_tpu.ops.iterative import cg_solve, cg_logdet_quadrature

    rng = np.random.RandomState(0)
    n, R = 60, 256
    A_ = rng.randn(n, n)
    A = jnp.asarray(A_ @ A_.T / n + 2.0 * np.eye(n))
    exact = float(np.linalg.slogdet(np.asarray(A))[1])

    # no preconditioner: z ~ N(0, I), logdet(P) = 0
    Z = jax.random.normal(jax.random.PRNGKey(1), (n, R), dtype=A.dtype)
    _, _, coeffs = cg_solve(lambda V: A @ V, Z, max_iters=n, tol=1e-12,
                            track_coeffs=True)
    est = float(jnp.mean(cg_logdet_quadrature(coeffs)))
    assert abs(est - exact) / abs(exact) < 0.05, (est, exact)

    # with a diagonal "preconditioner" P = sI: z ~ N(0, sI), add logdet(P)
    s = 3.7
    M_inv = lambda V: V / s
    Zs = jnp.sqrt(s) * jax.random.normal(jax.random.PRNGKey(2), (n, R), A.dtype)
    _, _, coeffs = cg_solve(lambda V: A @ V, Zs, max_iters=n, tol=1e-12,
                            M_inv=M_inv, track_coeffs=True)
    est = n * np.log(s) + float(jnp.mean(cg_logdet_quadrature(coeffs)))
    assert abs(est - exact) / abs(exact) < 0.05, (est, exact)


def test_cg_logdet_quadrature_overiterated_f32():
    """A tolerance below the dtype's reachable residual plus an iteration
    budget far past convergence must not poison the quadrature. Without the
    cg_solve tolerance floor, post-convergence CG coefficients violate the
    Lanczos relation and the tridiagonal grows spurious ~0 Ritz values:
    the round-5 evaluation-grade readout measured -2.2e6 instead of +1320
    at N=16k / 250 iterations on TPU-f32."""
    from mogptk_tpu.ops.iterative import cg_logdet_quadrature

    rng = np.random.RandomState(3)
    n, R = 64, 256
    A_ = rng.randn(n, n).astype(np.float32)
    A = jnp.asarray(A_ @ A_.T / n + 2.0 * np.eye(n, dtype=np.float32),
                    dtype=jnp.float32)
    exact = float(np.linalg.slogdet(np.asarray(A, np.float64))[1])
    Z = jax.random.normal(jax.random.PRNGKey(1), (n, R), dtype=jnp.float32)
    _, _, coeffs = cg_solve(lambda V: (A @ V).astype(jnp.float32), Z,
                            max_iters=8 * n, tol=1e-30, track_coeffs=True)
    est = float(jnp.mean(cg_logdet_quadrature(coeffs)))
    assert abs(est - exact) / abs(exact) < 0.05, (est, exact)


def test_preconditioned_slq_logdet_long_chain_f32():
    """The reorthogonalized preconditioned SLQ must stay at the dense
    logdet even with a Lanczos degree far past what plain (ghost-prone)
    Lanczos tolerates in f32 on an ill-conditioned operator."""
    from mogptk_tpu.ops.iterative import (preconditioned_slq_logdet,
                                          pivoted_cholesky)

    rng = np.random.RandomState(5)
    n = 256
    # ill-conditioned SPD: low-rank structure + small diagonal
    F = rng.randn(n, 24).astype(np.float32)
    A_np = (F @ F.T + 0.01 * np.eye(n)).astype(np.float32)
    A = jnp.asarray(A_np, dtype=jnp.float32)
    exact = float(np.linalg.slogdet(A_np.astype(np.float64))[1])

    sigma2 = 0.01
    L = pivoted_cholesky(jnp.diag(A) - sigma2,
                         lambda i: (A[i, :] - sigma2
                                    * (jnp.arange(n) == i)).astype(jnp.float32),
                         n, 16)
    est = float(preconditioned_slq_logdet(
        lambda V: (A @ V).astype(jnp.float32), L, sigma2, n,
        num_probes=32, lanczos_iters=128, key=jax.random.PRNGKey(0),
        dtype=jnp.float32))
    assert abs(est - exact) / abs(exact) < 0.05, (est, exact)


def test_woodbury_half_powers_exact():
    """P^{1/2} and P^{-1/2} from the Woodbury eigen-split must invert each
    other and reproduce the dense P and its logdet."""
    from mogptk_tpu.ops.iterative import woodbury_half_powers

    rng = np.random.RandomState(7)
    n, r = 96, 8
    L = jnp.asarray(rng.randn(n, r).astype(np.float32))
    sigma2 = 0.37
    P = sigma2 * np.eye(n) + np.asarray(L) @ np.asarray(L).T

    half, neg_half, logdetP = woodbury_half_powers(L, sigma2)
    X = jnp.asarray(rng.randn(n, 5).astype(np.float32))
    # round trip
    np.testing.assert_allclose(np.asarray(half(neg_half(X))),
                               np.asarray(X), rtol=2e-4, atol=2e-4)
    # P^{1/2}(P^{1/2} x) = P x
    np.testing.assert_allclose(np.asarray(half(half(X))),
                               P.astype(np.float32) @ np.asarray(X),
                               rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(logdetP),
                               float(np.linalg.slogdet(P)[1]), rtol=1e-5)
