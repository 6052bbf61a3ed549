"""Linalg op tests: the custom-VJP LML gradient must equal autodiff through
the Cholesky factorization."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl

from mogptk_tpu.ops.linalg import lml_quadform_logdet, jittered_cholesky


def _spd(n, seed=0):
    rng = np.random.RandomState(seed)
    A = rng.randn(n, n)
    return A @ A.T + n * np.eye(n)


def test_lml_value_matches_direct():
    K = jnp.asarray(_spd(12))
    y = jnp.asarray(np.random.RandomState(1).randn(12, 1))
    val = float(lml_quadform_logdet(K, y))
    sign, logdet = np.linalg.slogdet(np.asarray(K))
    expected = -0.5 * logdet - 0.5 * float((y.T @ np.linalg.solve(np.asarray(K), np.asarray(y))).squeeze())
    np.testing.assert_allclose(val, expected, rtol=1e-10)


def test_lml_gradient_matches_autodiff():
    K = jnp.asarray(_spd(10))
    y = jnp.asarray(np.random.RandomState(2).randn(10, 1))

    def via_chol(K, y):
        L = jnp.linalg.cholesky(K)
        alpha = jsl.cho_solve((L, True), y)
        return -jnp.sum(jnp.log(jnp.diagonal(L))) - 0.5 * jnp.sum(y * alpha)

    gK_custom, gy_custom = jax.grad(lml_quadform_logdet, argnums=(0, 1))(K, y)
    gK_ad, gy_ad = jax.grad(via_chol, argnums=(0, 1))(K, y)
    # autodiff through cholesky yields the lower-triangular-projected gradient;
    # the closed form is the symmetric full-matrix gradient. They agree after
    # symmetrization (both are valid VJPs for symmetric K inputs).
    sym = lambda A: 0.5 * (A + A.T)
    np.testing.assert_allclose(np.asarray(sym(gK_custom)), np.asarray(sym(gK_ad)), rtol=1e-8)
    np.testing.assert_allclose(np.asarray(gy_custom), np.asarray(gy_ad), rtol=1e-8)


def test_lml_gradient_through_kernel_params():
    """End-to-end: gradient of the exact LML w.r.t. kernel hyperparameters
    matches finite differences."""
    import mogptk_tpu.gpr as gpr
    X = np.linspace(0, 5, 16).reshape(-1, 1)
    y = np.sin(X)
    kernel = gpr.SquaredExponentialKernel()
    model = gpr.Exact(kernel, X, y, variance=0.1, jitter=0.0)
    loss_fn = model.make_loss_fn()
    train, fixed = model._split_raws()
    v, g = jax.value_and_grad(loss_fn)(train, fixed)
    for k in range(len(train)):
        eps = 1e-6
        t2 = list(train)
        flat = train[k].reshape(-1)
        t2[k] = flat.at[0].add(eps).reshape(train[k].shape)
        num = (float(loss_fn(t2, fixed)) - float(v)) / eps
        ana = float(np.asarray(g[k]).reshape(-1)[0])
        np.testing.assert_allclose(ana, num, rtol=1e-4, atol=1e-7,
                                   err_msg="gradient mismatch for parameter %d" % k)


def test_jittered_cholesky():
    K = jnp.asarray(_spd(8))
    L = jittered_cholesky(K, 1e-8)
    np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(K), rtol=1e-6)


def test_lml_f32_matches_f64():
    """North-star numerics check (BASELINE.md): the f32 LML must track the
    f64 value closely at moderate N."""
    import jax
    import mogptk_tpu.gpr as gpr

    rng = np.random.RandomState(0)
    n = 512
    Xh = np.sort(rng.uniform(0, 50, n)).reshape(-1, 1)
    yh = np.sin(0.5 * Xh) + 0.1 * rng.randn(n, 1)

    def lml(dtype64):
        gpr.config.dtype = jnp.float64 if dtype64 else jnp.float32
        try:
            kernel = gpr.SpectralMixtureKernel(Q=2)
            kernel.mean.assign(np.array([[0.1], [0.3]]))
            kernel.variance.assign(np.array([[0.3], [0.3]]))
            model = gpr.Exact(kernel, Xh, yh, variance=0.1)
            return float(model.log_marginal_likelihood())
        finally:
            gpr.config.dtype = None

    v64 = lml(True)
    v32 = lml(False)
    rel = abs(v32 - v64) / abs(v64)
    assert rel < 1e-4, "f32 LML rel err %g vs f64 (v32=%g v64=%g)" % (rel, v32, v64)


def test_stochastic_trace_gradient_is_unbiased():
    """Probe-trace gradients must converge to the exact closed-form gradient
    as the probe count grows."""
    from mogptk_tpu.ops.linalg import lml_quadform_logdet_stochastic
    K = jnp.asarray(_spd(20))
    y = jnp.asarray(np.random.RandomState(3).randn(20, 1))
    g_exact = jax.grad(lml_quadform_logdet)(K, y)
    g_stoch = jax.grad(lambda K: lml_quadform_logdet_stochastic(K, y, 4096, 0))(K)
    sym = lambda A: 0.5 * (np.asarray(A) + np.asarray(A).T)
    np.testing.assert_allclose(sym(g_stoch), sym(g_exact), rtol=0.1, atol=0.05)
    # value is exact regardless of probes
    np.testing.assert_allclose(float(lml_quadform_logdet_stochastic(K, y, 4, 0)),
                               float(lml_quadform_logdet(K, y)), rtol=1e-10)


def test_exact_with_trace_probes_trains():
    import mogptk_tpu.gpr as gpr
    X = np.linspace(0, 5, 30).reshape(-1, 1)
    y = np.sin(1.5 * X)
    kernel = gpr.SpectralMixtureKernel(Q=2)
    kernel.mean.assign(np.array([[0.2], [0.4]]))
    model = gpr.Exact(kernel, X, y, variance=0.3, trace_probes=8)
    loss0 = model.loss()
    losses, _ = gpr.train(model, method="Adam", lr=0.05, iters=60)
    assert losses[-1] < loss0


def test_jitter_ladder_rescues_indefinite_matrix():
    from mogptk_tpu.ops.linalg import jittered_cholesky
    import mogptk_tpu.gpr as gpr

    # nearly-singular Gram: rank-1 plus a tiny negative eigenvalue so the
    # base jitter (1e-8 relative) is insufficient
    n = 8
    v = np.ones((n, 1))
    K = jnp.asarray(v @ v.T - 1e-4 * np.eye(n))

    L0 = jittered_cholesky(K, jitter=1e-8, ladder=0)
    assert bool(jnp.any(jnp.isnan(L0)))  # reference behavior: NaN factor

    L = jax.jit(lambda K: jittered_cholesky(K, jitter=1e-8, ladder=6))(K)
    assert bool(jnp.all(jnp.isfinite(L)))
    # the escalated factor still reproduces K to the added-jitter tolerance
    assert float(jnp.max(jnp.abs(L @ L.T - K))) < 2e-2

    # PSD input: ladder must not change the factor at all
    Kpsd = K + 1.0 * jnp.eye(n)
    La = jittered_cholesky(Kpsd, jitter=1e-8, ladder=0)
    Lb = jittered_cholesky(Kpsd, jitter=1e-8, ladder=6)
    assert bool(jnp.allclose(La, Lb))

    # config knob routes through gpr models
    gpr.use_jitter_ladder(6)
    try:
        assert gpr.config.jitter_ladder == 6
        Lc = jittered_cholesky(K, jitter=1e-8)
        assert bool(jnp.all(jnp.isfinite(Lc)))
    finally:
        gpr.use_jitter_ladder(0)


def test_jitter_ladder_gradients_match_autodiff():
    """The laddered Cholesky is a custom-VJP op (rung-0 factor reused on the
    happy path; explicit Murray-2016 backward from the final factor). On a
    PSD input its value AND gradients must match the ladder=0 autodiff path,
    for dense dK, the extra_diag vector, and batched K — and a rescued
    indefinite input must yield finite gradients (the 0×NaN poisoning that
    forced the r02 two-factorization design)."""
    from mogptk_tpu.ops.linalg import jittered_cholesky

    rng = np.random.RandomState(3)
    n = 24
    A = rng.randn(n, n)
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    d = jnp.asarray(0.1 + rng.rand(n))
    W = jnp.asarray(rng.randn(n, n))

    def make(ladder):
        def f(K, d):
            L = jittered_cholesky(K, 1e-8, ladder=ladder, extra_diag=d)
            return jnp.sum(jnp.log(jnp.diagonal(L))) + jnp.sum(W * L)
        return f

    v0, g0 = jax.value_and_grad(make(0), argnums=(0, 1))(K, d)
    v1, g1 = jax.value_and_grad(make(3), argnums=(0, 1))(K, d)
    assert float(abs(v0 - v1)) == 0.0
    # only the symmetric part of dK is meaningful for a symmetric input
    s0 = 0.5 * (g0[0] + g0[0].T)
    s1 = 0.5 * (g1[0] + g1[0].T)
    np.testing.assert_allclose(np.asarray(s0), np.asarray(s1),
                               rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g0[1]), np.asarray(g1[1]),
                               rtol=1e-6, atol=1e-8)

    # batched K, no extra vector
    Kb = jnp.stack([K, K + jnp.eye(n)])
    fb = lambda ladder: (lambda Kb: jnp.sum(jnp.log(jnp.diagonal(
        jittered_cholesky(Kb, 1e-8, ladder=ladder), axis1=-2, axis2=-1))))
    gb0 = jax.grad(fb(0))(Kb)
    gb1 = jax.grad(fb(3))(Kb)
    np.testing.assert_allclose(
        np.asarray(0.5 * (gb0 + jnp.swapaxes(gb0, -1, -2))),
        np.asarray(0.5 * (gb1 + jnp.swapaxes(gb1, -1, -2))),
        rtol=1e-6, atol=1e-8)

    # an input that needs rungs: value and grad come out finite
    Kbad = jnp.asarray(A @ A.T - 3.0 * np.eye(n))
    fbad = lambda K: jnp.sum(jnp.log(jnp.abs(jnp.diagonal(
        jittered_cholesky(K, jitter=1e-8, ladder=12)))))
    assert bool(jnp.isfinite(fbad(Kbad)))
    assert bool(jnp.all(jnp.isfinite(jax.grad(fbad)(Kbad))))


def test_half_precision_solves_run_in_f32():
    """use_half_precision keeps params/Gram in bf16 but the factorization
    and LML solve upcast to f32 (ops/linalg._solve_dtype)."""
    import mogptk_tpu.gpr as gpr

    rng = np.random.RandomState(0)
    x = np.sort(rng.uniform(0, 10, 128)).reshape(-1, 1)
    y = (np.sin(x[:, 0]) + 0.05 * rng.randn(128)).reshape(-1, 1)

    def build_and_loss():
        k = gpr.SquaredExponentialKernel()
        k.lengthscale.assign(1.2)
        m = gpr.Exact(k, x, y, variance=0.05)
        loss = m.loss()
        grads = jax.grad(m.make_loss_fn())(*m._split_raws())
        return m, float(loss), grads

    old = gpr.config._dtype
    old_x64 = jax.config.jax_enable_x64
    try:
        gpr.config.dtype = jnp.float32
        _, loss32, _ = build_and_loss()

        gpr.use_half_precision()
        m16, loss16, grads16 = build_and_loss()
        assert m16.X.dtype == jnp.bfloat16
        # value computed through the f32 upcast: close to the f32 loss at a
        # tolerance set by the bf16 Gram entries (~3 decimal digits)
        assert np.isfinite(loss16)
        assert abs(loss16 - loss32) / (1.0 + abs(loss32)) < 0.05
        leaves = jax.tree_util.tree_leaves(grads16)
        assert all(bool(jnp.all(jnp.isfinite(g))) for g in leaves)
        assert all(g.dtype == jnp.bfloat16 for g in leaves)

        # without the upcast a bf16 Cholesky of this 128x128 Gram is garbage:
        # jittered_cholesky must return an f32 factor for bf16 input
        from mogptk_tpu.ops.linalg import jittered_cholesky
        K16 = m16.K(m16.X).astype(jnp.bfloat16)
        L = jittered_cholesky(K16 + 0.05 * jnp.eye(128, dtype=jnp.bfloat16), 1e-6)
        assert L.dtype == jnp.float32
        assert bool(jnp.all(jnp.isfinite(L)))
    finally:
        jax.config.update("jax_enable_x64", old_x64)  # use_half_precision flips it
        gpr.config._dtype = old
        gpr.config.bump()


def test_half_precision_compensated_lml_at_noise_floor():
    """use_half_precision(compensated=True): the Gram round-trips through
    the two-term bf16 split (ops/linalg.split_bf16) — the LML error vs the
    f32 Gram drops from bf16's 8-bit rounding shift to the ~17-bit
    reconstruction floor (VERDICT r2 #8 / ROADMAP #2)."""
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.ops.linalg import split_bf16, merge_bf16

    rng = np.random.RandomState(3)
    n = 512
    x = np.sort(rng.uniform(0, 10, n)).reshape(-1, 1)
    y = (np.sin(1.7 * x[:, 0]) + 0.05 * rng.randn(n)).reshape(-1, 1)

    # the split/merge pair reconstructs ~17 explicit mantissa bits
    K = jnp.asarray(rng.randn(64, 64), jnp.float32)
    hi, lo = split_bf16(K)
    assert hi.dtype == jnp.bfloat16 and lo.dtype == jnp.bfloat16
    err = np.abs(np.asarray(merge_bf16(hi, lo) - K))
    assert err.max() <= 2.0 ** -16 * np.abs(np.asarray(K)).max()

    def lml():
        k = gpr.SquaredExponentialKernel()
        k.lengthscale.assign(0.8)
        return gpr.Exact(k, x, y, variance=0.05).log_marginal_likelihood()

    old = gpr.config._dtype
    old_storage = gpr.config.gram_storage
    old_x64 = jax.config.jax_enable_x64
    try:
        gpr.config.dtype = jnp.float32
        gpr.config.bump()
        ref = float(lml())

        gpr.use_half_precision(compensated=True)
        assert gpr.config.dtype == jnp.float32       # params/compute stay f32
        assert gpr.config.gram_storage == "bf16x2"
        comp = float(lml())

        gpr.use_half_precision()                     # plain bf16 storage
        plain = float(lml())

        err_comp = abs(comp - ref)
        err_plain = abs(plain - ref)
        # compensated storage sits at the reconstruction noise floor;
        # plain bf16's Gram rounding shifts the value orders of magnitude more
        assert err_comp < 1e-3 * (1.0 + abs(ref))
        assert err_comp < 0.05 * max(err_plain, 1e-12)
    finally:
        jax.config.update("jax_enable_x64", old_x64)
        gpr.config._dtype = old
        gpr.config.gram_storage = old_storage
        gpr.config.bump()


def test_set_matmul_precision_roundtrip():
    import mogptk_tpu.gpr as gpr
    old = jax.config.jax_default_matmul_precision
    try:
        gpr.set_matmul_precision("highest")
        assert jax.config.jax_default_matmul_precision == "highest"
        gpr.set_matmul_precision("default")
        assert jax.config.jax_default_matmul_precision == "default"
        with pytest.raises(ValueError):
            gpr.set_matmul_precision("not-a-precision")
    finally:
        jax.config.update("jax_default_matmul_precision", old)


def test_pallas_auto_policy(monkeypatch):
    """Auto (pallas=None) enables the fused kernels on TPU f32/bf16 only;
    explicit use_pallas always wins."""
    import importlib
    import mogptk_tpu.gpr as gpr
    cfg_mod = importlib.import_module("mogptk_tpu.gpr.config")

    old_flag, old_dtype = gpr.config.pallas, gpr.config._dtype
    try:
        gpr.config.pallas = None

        # off-TPU (this suite runs on CPU): auto is off regardless of dtype
        gpr.config._dtype = jnp.float32
        assert gpr.pallas_enabled() is False

        # pretend we are on TPU: f32/bf16 auto-enable, f64 does not
        monkeypatch.setattr(cfg_mod.jax, "default_backend", lambda: "tpu")
        assert gpr.pallas_enabled() is True
        gpr.config._dtype = jnp.bfloat16
        assert gpr.pallas_enabled() is True
        gpr.config._dtype = jnp.float64
        assert gpr.pallas_enabled() is False

        # explicit force wins over auto in both directions
        gpr.config._dtype = jnp.float32
        gpr.use_pallas(False)
        assert gpr.pallas_enabled() is False
        gpr.use_pallas(True)
        assert gpr.pallas_enabled() is True
        gpr.use_pallas(None)
        assert gpr.pallas_enabled() is True
    finally:
        gpr.config.pallas = old_flag
        gpr.config._dtype = old_dtype
        gpr.config.bump()


def test_sensitive_matmul_precision_scoping():
    """The sensitive-product precision is scoped: the solves trace at
    config.sensitive_matmul_precision while matmuls outside stay at the
    global default. Verified via the precision recorded in the jaxpr."""
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.ops.linalg import lml_quadform_logdet_stochastic

    K = jnp.eye(8) * 2.0
    y = jnp.ones((8, 1))
    # the stochastic backward contains an explicit N×R GEMM (A @ Bᵀ)
    grad_fn = jax.grad(lambda K_: lml_quadform_logdet_stochastic(K_, y, 4, 0))

    old = gpr.config.sensitive_matmul_precision
    try:
        gpr.set_sensitive_matmul_precision("highest")
        jaxpr = str(jax.make_jaxpr(grad_fn)(K))
        assert "Precision.HIGHEST" in jaxpr

        # a distinct scoped value must show up verbatim ("HIGH", not the f64
        # default "HIGHEST"), proving the scope — not the global default —
        # sets the dots' precision
        gpr.set_sensitive_matmul_precision("high")
        jax.clear_caches()  # custom_vjp traces cache on (fn, avals)
        jaxpr = str(jax.make_jaxpr(grad_fn)(K))
        assert "Precision.HIGH" in jaxpr and "Precision.HIGHEST" not in jaxpr
    finally:
        gpr.config.sensitive_matmul_precision = old
        gpr.config.bump()


def test_quadform_gemm_precision_scope():
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.gpr.singleoutput import _quadform_gemm

    k = gpr.SquaredExponentialKernel(input_dims=2)
    X = jnp.asarray(np.random.RandomState(0).randn(8, 2))
    old = gpr.config.sensitive_matmul_precision
    try:
        gpr.set_sensitive_matmul_precision("highest")
        jaxpr = str(jax.make_jaxpr(lambda x: _quadform_gemm(k, x, None))(X))
        assert "HIGHEST" in jaxpr.upper()
    finally:
        gpr.config.sensitive_matmul_precision = old
        gpr.config.bump()


class TestBlockedCholesky:
    def test_matches_xla_cholesky(self):
        from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
        for n, B in [(256, 64), (300, 128), (64, 1024), (517, 100)]:
            K = jnp.asarray(_spd(n, seed=n))
            L_ref = np.linalg.cholesky(np.asarray(K))
            L = np.asarray(jax.jit(lambda K, B=B: blocked_cholesky(K, block_size=B))(K))
            np.testing.assert_allclose(L, L_ref, rtol=1e-9, atol=1e-9,
                                       err_msg="n=%d B=%d" % (n, B))
            # strictly lower-triangular output (upper half exactly zero)
            assert np.all(np.triu(L, 1) == 0.0)

    def test_nan_rows_for_non_psd(self):
        """The jitter ladder detects failure via NaNs — the blocked factor
        must NaN on non-PSD input exactly like jnp.linalg.cholesky."""
        from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
        n = 200
        K = jnp.asarray(_spd(n)) - 1e3 * jnp.eye(n)
        L = blocked_cholesky(K, block_size=64)
        assert bool(jnp.any(jnp.isnan(L)))

    def test_gradient_matches_xla_path(self):
        from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
        K = jnp.asarray(_spd(96, seed=7))
        w = jnp.asarray(np.random.RandomState(8).randn(96, 96))

        def f_blocked(K):
            return jnp.sum(w * blocked_cholesky(K, block_size=32))

        def f_xla(K):
            return jnp.sum(w * jnp.linalg.cholesky(K))

        # the two factorizations read the symmetric input differently (the
        # blocked one touches only the lower block column, XLA's only the
        # lower triangle), so their VJPs agree only after symmetrization —
        # both are valid gradients for symmetric K (cf. the LML test above)
        sym = lambda A: 0.5 * (A + A.T)
        g_b = sym(np.asarray(jax.grad(f_blocked)(K)))
        g_x = sym(np.asarray(jax.grad(f_xla)(K)))
        np.testing.assert_allclose(g_b, g_x, rtol=1e-7, atol=1e-9)

    def test_gradient_through_pallas_s_panel_path(self):
        """reverse-mode through the streamed Pallas S-panel accumulation
        (f32, block 512 — the TPU default gate) must work (custom_vjp; a
        bare pallas_call has no transpose rule) and match the jnp path."""
        from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
        n = 1024
        K = jnp.asarray(_spd(n, seed=11), dtype=jnp.float32)
        w = jnp.asarray(np.random.RandomState(12).randn(n, n), jnp.float32)

        def f_pallas(K):
            # update_precision="high" + B=512 + f32 → the Pallas S-panel gate
            return jnp.sum(w * blocked_cholesky(K, block_size=512,
                                                update_precision="high"))

        def f_jnp(K):
            # "highest" disables the Pallas gate → plain jnp branch
            return jnp.sum(w * blocked_cholesky(K, block_size=512,
                                                update_precision="highest"))

        g_p = np.asarray(jax.grad(f_pallas)(K))
        g_j = np.asarray(jax.grad(f_jnp)(K))
        assert np.all(np.isfinite(g_p))
        scale = np.abs(g_j).max()
        np.testing.assert_allclose(g_p, g_j, rtol=2e-3, atol=2e-4 * scale)

    def test_bf16_input_and_diag_shift(self):
        from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
        K = jnp.asarray(_spd(160, seed=11), dtype=jnp.float32)

        # diag_shift factors K + s·I exactly (applied per diagonal panel)
        s = 0.37
        L_shift = blocked_cholesky(K, block_size=64, diag_shift=s)
        L_ref = jnp.linalg.cholesky(K + s * jnp.eye(160, dtype=jnp.float32))
        np.testing.assert_allclose(np.asarray(L_shift), np.asarray(L_ref),
                                   rtol=1e-5, atol=1e-6)

        # bf16 Gram consumed directly: f32 factor out, accurate to the
        # bf16 rounding of the INPUT (no bf16 arithmetic inside)
        L16 = blocked_cholesky(K.astype(jnp.bfloat16), block_size=64,
                               diag_shift=1e-2)
        assert L16.dtype == jnp.float32
        L32 = blocked_cholesky(K, block_size=64, diag_shift=1e-2)
        np.testing.assert_allclose(np.asarray(L16), np.asarray(L32),
                                   rtol=5e-2, atol=5e-2)

    def test_jittered_cholesky_bf16_keeps_jitter(self):
        # the jitter must survive a bf16 Gram: 1+1e-4 rounds to 1 in bf16,
        # so the shift has to be applied in the factor dtype, not on K
        from mogptk_tpu.ops.linalg import jittered_cholesky
        import mogptk_tpu.gpr as gpr
        n = 96
        K = jnp.asarray(_spd(n, seed=13), dtype=jnp.float32)
        old = gpr.config.blocked_cholesky
        try:
            gpr.use_blocked_cholesky(True, block_size=32)
            L16 = jittered_cholesky(K.astype(jnp.bfloat16), jitter=1e-4,
                                    ladder=0)
            assert L16.dtype == jnp.float32
            L32 = jittered_cholesky(K, jitter=1e-4, ladder=0)
            # the 1e-4 relative jitter shifts diag entries by ~1e-4·mean —
            # far below bf16 input rounding, but it must not be DROPPED:
            # K(bf16) alone vs K(bf16)+shift differ measurably at the
            # smallest diagonal of L when K is near-singular; here just
            # assert parity with the f32 path at bf16-input tolerance
            np.testing.assert_allclose(np.asarray(L16), np.asarray(L32),
                                       rtol=5e-2, atol=5e-2)
        finally:
            gpr.config.blocked_cholesky = old
            gpr.config.bump()

    def test_dispatcher_policy_and_lml_parity(self):
        import mogptk_tpu.gpr as gpr
        from mogptk_tpu.ops.linalg import lml_quadform_logdet
        K = jnp.asarray(_spd(128, seed=3))
        y = jnp.asarray(np.random.RandomState(4).randn(128, 1))
        v_xla = float(lml_quadform_logdet(K, y))
        g_xla = np.asarray(jax.grad(lml_quadform_logdet)(K, y))
        old = gpr.config.blocked_cholesky
        try:
            gpr.use_blocked_cholesky(True, block_size=48)
            assert gpr.blocked_cholesky_enabled(128, 2, K.dtype)
            # 1-D/batched shapes never route to the blocked path even when
            # forced on; sub-f32 Grams DO route (per-tile VMEM upcast, f32
            # factor out — ops/blocked_cholesky)
            assert not gpr.blocked_cholesky_enabled(128, 3, K.dtype)
            assert gpr.blocked_cholesky_enabled(128, 2, jnp.bfloat16)
            jax.clear_caches()
            v_blk = float(lml_quadform_logdet(K, y))
            g_blk = np.asarray(jax.grad(lml_quadform_logdet)(K, y))
            np.testing.assert_allclose(v_blk, v_xla, rtol=1e-10)
            np.testing.assert_allclose(g_blk, g_xla, rtol=1e-8, atol=1e-12)

            gpr.use_blocked_cholesky(False)
            assert not gpr.blocked_cholesky_enabled(1 << 20, 2, K.dtype)
            gpr.use_blocked_cholesky(None)  # auto: off on CPU
            assert not gpr.blocked_cholesky_enabled(1 << 20, 2, K.dtype)
        finally:
            gpr.config.blocked_cholesky = old
            gpr.config.bump()
            jax.clear_caches()

    def test_jitter_ladder_with_blocked_factor(self):
        import mogptk_tpu.gpr as gpr
        n = 64
        v = np.ones((n, 1))
        K = jnp.asarray(v @ v.T - 1e-4 * np.eye(n))
        old = gpr.config.blocked_cholesky
        try:
            gpr.use_blocked_cholesky(True, block_size=16)
            jax.clear_caches()
            L = jax.jit(lambda K: jittered_cholesky(K, jitter=1e-8, ladder=6))(K)
            assert bool(jnp.all(jnp.isfinite(L)))
            assert float(jnp.max(jnp.abs(L @ L.T - K))) < 2e-2
        finally:
            gpr.config.blocked_cholesky = old
            gpr.config.bump()
            jax.clear_caches()


class TestBlockedTrisolve:
    def test_matches_solve_triangular(self):
        from mogptk_tpu.ops.blocked_trisolve import blocked_trisolve, blocked_cho_solve
        import jax.scipy.linalg as jsl_
        for n, Bs, r in [(128, 32, 16), (100, 48, 7), (96, 96, 96)]:
            K = jnp.asarray(_spd(n, seed=n + 1))
            L = jnp.linalg.cholesky(K)
            B = jnp.asarray(np.random.RandomState(n).randn(n, r))
            X = np.asarray(blocked_trisolve(L, B, lower=True, block_size=Bs))
            X_ref = np.asarray(jsl_.solve_triangular(L, B, lower=True))
            np.testing.assert_allclose(X, X_ref, rtol=1e-9, atol=1e-10,
                                       err_msg="lower n=%d Bs=%d" % (n, Bs))
            Xu = np.asarray(blocked_trisolve(L.T, B, lower=False, block_size=Bs))
            Xu_ref = np.asarray(jsl_.solve_triangular(L.T, B, lower=False))
            np.testing.assert_allclose(Xu, Xu_ref, rtol=1e-9, atol=1e-10,
                                       err_msg="upper n=%d Bs=%d" % (n, Bs))
            C = np.asarray(blocked_cho_solve(L, B, block_size=Bs))
            C_ref = np.asarray(jsl_.cho_solve((L, True), B))
            np.testing.assert_allclose(C, C_ref, rtol=1e-8, atol=1e-9)

    def test_cho_solve_with_hoisted_panel_inverses(self):
        """Passing lower-sweep panel_inverses to blocked_cho_solve must give
        the same answer: the upper sweep's inverses are DERIVED (transposed,
        reversed), never the lower list reused as-is."""
        from mogptk_tpu.ops.blocked_trisolve import (blocked_trisolve,
                                                     blocked_cho_solve,
                                                     panel_inverses)
        import jax.scipy.linalg as jsl_
        for n, Bs in [(128, 64), (100, 48)]:
            K = jnp.asarray(_spd(n, seed=n + 3))
            L = jnp.linalg.cholesky(K)
            B = jnp.asarray(np.random.RandomState(n).randn(n, 5))
            invs = panel_inverses(L, lower=True, block_size=Bs)
            C = np.asarray(blocked_cho_solve(L, B, invs=invs, block_size=Bs))
            C_ref = np.asarray(jsl_.cho_solve((L, True), B))
            np.testing.assert_allclose(C, C_ref, rtol=1e-8, atol=1e-9,
                                       err_msg="n=%d Bs=%d" % (n, Bs))

    def test_exact_lml_gradient_via_blocked_kinv(self):
        """_lml_bwd's MXU path (blocked K⁻¹) must match the scan path."""
        import mogptk_tpu.gpr as gpr
        from mogptk_tpu.ops.linalg import lml_quadform_logdet
        K = jnp.asarray(_spd(96, seed=11))
        y = jnp.asarray(np.random.RandomState(12).randn(96, 1))
        g_scan = np.asarray(jax.grad(lml_quadform_logdet)(K, y))
        old = gpr.config.blocked_cholesky
        try:
            gpr.use_blocked_cholesky(True, block_size=32)
            jax.clear_caches()
            g_blk = np.asarray(jax.grad(lml_quadform_logdet)(K, y))
        finally:
            gpr.config.blocked_cholesky = old
            gpr.config.bump()
            jax.clear_caches()
        np.testing.assert_allclose(g_blk, g_scan, rtol=1e-8, atol=1e-11)

    def test_dispatcher_routes_wide_solves(self):
        """ops.linalg solve_triangular/cholesky_solve route wide RHS to the
        blocked TRSM when the blocked policy is on, matching XLA exactly."""
        import mogptk_tpu.gpr as gpr
        from mogptk_tpu.ops import linalg as lg
        K = jnp.asarray(_spd(96, seed=21))
        L = jnp.linalg.cholesky(K)
        B = jnp.asarray(np.random.RandomState(22).randn(96, 80))
        refs = {
            "lo": np.asarray(lg.solve_triangular(L, B)),
            "lo_t": np.asarray(lg.solve_triangular(L, B, trans=True)),
            "up": np.asarray(lg.solve_triangular(L.T, B, lower=False)),
            "cho": np.asarray(lg.cholesky_solve(L, B)),
        }
        old = gpr.config.blocked_cholesky
        try:
            gpr.use_blocked_cholesky(True, block_size=32)
            jax.clear_caches()
            np.testing.assert_allclose(np.asarray(lg.solve_triangular(L, B)),
                                       refs["lo"], rtol=1e-9, atol=1e-10)
            np.testing.assert_allclose(
                np.asarray(lg.solve_triangular(L, B, trans=True)),
                refs["lo_t"], rtol=1e-9, atol=1e-10)
            np.testing.assert_allclose(
                np.asarray(lg.solve_triangular(L.T, B, lower=False)),
                refs["up"], rtol=1e-9, atol=1e-10)
            np.testing.assert_allclose(np.asarray(lg.cholesky_solve(L, B)),
                                       refs["cho"], rtol=1e-8, atol=1e-9)
        finally:
            gpr.config.blocked_cholesky = old
            gpr.config.bump()
            jax.clear_caches()

    def test_dispatcher_routes_small_n_wide_rhs(self):
        """R >> n (the sparse models' whitening solve) routes to the blocked
        TRSM even below the factorization min_n gate."""
        import mogptk_tpu.gpr as gpr
        from mogptk_tpu.ops import linalg as lg
        K = jnp.asarray(_spd(300, seed=31))
        L = jnp.linalg.cholesky(K)
        wide = jnp.asarray(np.random.RandomState(32).randn(300, 1300))
        ref = np.asarray(jsl.solve_triangular(L, wide, lower=True))
        old = gpr.config.blocked_cholesky
        try:
            gpr.use_blocked_cholesky(True)   # force (tests run on CPU)
            jax.clear_caches()
            assert lg._blocked_trisolve_worthwhile(L, wide)
            # very narrow RHS (the 1-column alpha solve) keeps the expander
            assert not lg._blocked_trisolve_worthwhile(L, wide[:, :32])
            got = np.asarray(lg.solve_triangular(L, wide))
            np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)
        finally:
            gpr.config.blocked_cholesky = old
            gpr.config.bump()
            jax.clear_caches()

    def test_pallas_s_panel_update_matches_jnp(self):
        """The streamed Pallas accumulation (bf16x3, in-place L reads) must
        match the jnp update path. Runs in interpret mode on CPU; shapes
        chosen to satisfy the alignment gate (B multiple of 512)."""
        from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
        n = 1536
        rng = np.random.RandomState(40)
        A = rng.randn(n, n) / np.sqrt(n)
        K = jnp.asarray((A @ A.T + 3.0 * np.eye(n)).astype(np.float32))
        assert K.dtype == jnp.float32
        # aligned f32 "high" -> pallas path; "highest" -> jnp path
        L_p = np.asarray(blocked_cholesky(K, 512, update_precision="high"))
        L_j = np.asarray(blocked_cholesky(K, 512, update_precision="highest"))
        # bf16x3 vs full-f32: f32-grade agreement
        np.testing.assert_allclose(L_p, L_j, rtol=2e-4, atol=2e-5)
        Kr = np.asarray(L_p @ L_p.T)
        np.testing.assert_allclose(Kr, np.asarray(K), rtol=1e-4, atol=1e-4)


class TestVectorDiagShift:
    def test_blocked_cholesky_vector_diag_shift(self):
        from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
        rng = np.random.RandomState(41)
        n = 160   # forces a padded tail (block 64 -> npad 192)
        A = rng.randn(n, n) / np.sqrt(n)
        K = jnp.asarray(A @ A.T + 2.0 * np.eye(n))
        d = jnp.asarray(0.1 + rng.rand(n))
        L = blocked_cholesky(K, block_size=64, diag_shift=d)
        ref = np.linalg.cholesky(np.asarray(K) + np.diag(np.asarray(d)))
        np.testing.assert_allclose(np.asarray(L), ref, rtol=1e-9, atol=1e-10)

    def test_cholesky_wrapper_vector_diag_shift_both_paths(self):
        import mogptk_tpu.gpr as gpr
        from mogptk_tpu.ops import linalg as lg
        rng = np.random.RandomState(42)
        n = 96
        A = rng.randn(n, n) / np.sqrt(n)
        K = jnp.asarray(A @ A.T + 2.0 * np.eye(n))
        d = jnp.asarray(0.05 + rng.rand(n))
        ref = np.linalg.cholesky(np.asarray(K) + np.diag(np.asarray(d)))
        old = gpr.config.blocked_cholesky
        try:
            for forced in (False, True):
                gpr.use_blocked_cholesky(forced)
                jax.clear_caches()
                got = np.asarray(lg.cholesky(K, diag_shift=d))
                np.testing.assert_allclose(got, ref, rtol=1e-9, atol=1e-10)
        finally:
            gpr.config.blocked_cholesky = old
            gpr.config.bump()
            jax.clear_caches()


class TestPanelInvReuse:
    """cholesky(return_panel_invs=True) hands the blocked factorization's
    diagonal-panel inverses to cholesky_solve, which then skips its own
    panel_inverses pass (~4.5 ms/step at N=16k). The reused-invs solve must
    match the expander solve."""

    def test_panel_invs_roundtrip_blocked(self):
        import mogptk_tpu.gpr as gpr
        from mogptk_tpu.ops import linalg as lg
        rng = np.random.RandomState(7)
        n, r = 256, 9
        A = rng.randn(n, n) / np.sqrt(n)
        K = jnp.asarray(A @ A.T + 2.0 * np.eye(n), jnp.float64)
        Y = jnp.asarray(rng.randn(n, r))
        old = gpr.config.blocked_cholesky
        old_b = gpr.config.blocked_cholesky_block
        try:
            gpr.use_blocked_cholesky(True)
            gpr.config.blocked_cholesky_block = 64
            jax.clear_caches()
            L, invs = lg.cholesky(K, return_panel_invs=True)
            assert invs is not None and len(invs) == n // 64
            got = np.asarray(lg.cholesky_solve(L, Y, invs=invs))
            ref = np.linalg.solve(np.asarray(K), np.asarray(Y))
            np.testing.assert_allclose(got, ref, rtol=1e-8, atol=1e-9)
        finally:
            gpr.config.blocked_cholesky = old
            gpr.config.blocked_cholesky_block = old_b
            gpr.config.bump()
            jax.clear_caches()

    def test_panel_invs_none_when_padded_or_unblocked(self):
        import mogptk_tpu.gpr as gpr
        from mogptk_tpu.ops import linalg as lg
        from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
        rng = np.random.RandomState(8)
        n = 100   # pads to 128 at block 64 -> invs must be None
        A = rng.randn(n, n) / np.sqrt(n)
        K = jnp.asarray(A @ A.T + 2.0 * np.eye(n))
        L, invs = blocked_cholesky(K, block_size=64, return_panel_invs=True)
        assert invs is None
        np.testing.assert_allclose(np.asarray(L @ L.T), np.asarray(K),
                                   rtol=1e-6, atol=1e-8)
        old = gpr.config.blocked_cholesky
        try:
            gpr.use_blocked_cholesky(False)   # expander path: (L, None)
            jax.clear_caches()
            L2, invs2 = lg.cholesky(K, return_panel_invs=True)
            assert invs2 is None
            np.testing.assert_allclose(np.asarray(L2), np.asarray(L),
                                       rtol=1e-5, atol=1e-6)
        finally:
            gpr.config.blocked_cholesky = old
            gpr.config.bump()
            jax.clear_caches()


class TestShiftedLml:
    """The diag-shifted LML variants must equal the unshifted functions on
    the materialized K + diag(d) — values AND all three gradients — since
    they are the same math with the shift moved inside the factorization."""

    def _setup(self, n=96):
        rng = np.random.RandomState(5)
        A = rng.randn(n, n) / np.sqrt(n)
        K = jnp.asarray(A @ A.T + 2.0 * np.eye(n))
        d = jnp.asarray(0.1 + rng.rand(n))
        y = jnp.asarray(rng.randn(n, 1))
        return K, d, y

    def test_deterministic_matches_materialized(self):
        from mogptk_tpu.ops.linalg import (lml_quadform_logdet,
                                           lml_quadform_logdet_shifted)
        K, d, y = self._setup()
        ref = lml_quadform_logdet(K + jnp.diag(d), y)
        got = lml_quadform_logdet_shifted(K, d, y)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)
        gr = jax.grad(lambda K, d, y: lml_quadform_logdet(K + jnp.diag(d), y),
                      argnums=(0, 1, 2))(K, d, y)
        gs = jax.grad(lml_quadform_logdet_shifted, argnums=(0, 1, 2))(K, d, y)
        for a, b in zip(gs, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-12)

    def test_stochastic_matches_materialized(self):
        from mogptk_tpu.ops.linalg import (
            lml_quadform_logdet_stochastic,
            lml_quadform_logdet_stochastic_shifted)
        K, d, y = self._setup()
        ref = lml_quadform_logdet_stochastic(K + jnp.diag(d), y, 8, 3)
        got = lml_quadform_logdet_stochastic_shifted(K, d, y, 8, 3)
        np.testing.assert_allclose(float(got), float(ref), rtol=1e-12)
        gr = jax.grad(lambda K, d, y: lml_quadform_logdet_stochastic(
            K + jnp.diag(d), y, 8, 3), argnums=(0, 1, 2))(K, d, y)
        gs = jax.grad(lambda K, d, y: lml_quadform_logdet_stochastic_shifted(
            K, d, y, 8, 3), argnums=(0, 1, 2))(K, d, y)
        for a, b in zip(gs, gr):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-10, atol=1e-12)

    def test_jittered_cholesky_extra_diag(self):
        from mogptk_tpu.ops.linalg import jittered_cholesky
        K, d, _ = self._setup()
        for ladder in (0, 2):
            ref = jittered_cholesky(K + jnp.diag(d), 1e-8, ladder=ladder)
            got = jittered_cholesky(K, 1e-8, ladder=ladder, extra_diag=d)
            np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                                       rtol=1e-12, atol=1e-14)
        # the extra vector stays differentiable through the ladder
        g = jax.grad(lambda d: jnp.sum(jnp.log(jnp.diagonal(
            jittered_cholesky(K, 1e-8, ladder=2, extra_diag=d)))))(d)
        assert np.all(np.isfinite(np.asarray(g))) and float(jnp.max(jnp.abs(g))) > 0

    def test_ladder_base_scales_rungs_with_extra_diag(self):
        """When the model's relative jitter is folded into extra_diag
        (jitter=None here), ladder rungs must escalate from ladder_base,
        not the hardcoded 1e-8 — otherwise a conditioning failure that a
        jitter-scaled ladder recovers stays NaN."""
        from mogptk_tpu.ops.linalg import jittered_cholesky
        n = 64
        e = np.ones((n, 1)) / np.sqrt(n)
        # eigenvalues: 1 (n-1 times) and −0.1 → needs an absolute shift >0.1,
        # i.e. a relative rung >~0.1; base 1e-8 tops out at 1e-5 over 3 rungs
        K = jnp.asarray(np.eye(n) - 1.1 * (e @ e.T))
        d = jnp.zeros(n)
        L_default = jittered_cholesky(K, None, ladder=3, extra_diag=d)
        assert not bool(jnp.all(jnp.isfinite(L_default)))
        L_scaled = jittered_cholesky(K, None, ladder=3, extra_diag=d,
                                     ladder_base=1e-2)
        assert bool(jnp.all(jnp.isfinite(L_scaled)))


class TestLmlCholFused:
    """The fully fused gram+factorization+probe-backward LML
    (ops/linalg.lml_chol_fused) must match the legacy chain (dense sorted
    gram -> diag add -> lml_quadform_logdet_stochastic) in value AND
    gradients: same seed means the same Rademacher probes, so the two
    computations are the same math with different memory movement."""

    def _data(self, O=3, Q=2, n_per=40):
        import mogptk_tpu.gpr as gpr
        rng = np.random.RandomState(0)
        xs = [np.sort(rng.rand(n_per, 1) * 10, axis=0) for _ in range(O)]
        ys = [np.sin(1.3 * x + i) + 0.05 * rng.randn(n_per, 1)
              for i, x in enumerate(xs)]
        return gpr.merge_data(xs, ys)

    def _check(self, make_kernel, tol=1e-7):
        import mogptk_tpu.gpr as gpr
        N, X, Y = self._data()
        vals, grads = [], []
        for pallas in (True, False):
            gpr.use_pallas(pallas)
            try:
                rngk = np.random.RandomState(1)
                model = gpr.Exact(make_kernel(rngk), X, Y, variance=0.1,
                                  trace_probes=8, seed=3)
                if pallas:
                    assert model._fused_static() is not None
                loss_fn = model.make_loss_fn()
                tr, fx = model._split_raws()
                v, g = jax.value_and_grad(loss_fn)(tr, fx)
                vals.append(float(v))
                grads.append(g)
            finally:
                gpr.use_pallas(None)
        assert abs(vals[0] - vals[1]) <= 1e-8 * max(1.0, abs(vals[1]))
        for a, b in zip(*grads):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=tol, atol=tol)

    def test_fused_matches_legacy_mosm(self):
        import mogptk_tpu.gpr as gpr

        def make(rng):
            k = gpr.MultiOutputSpectralMixtureKernel(2, output_dims=3)
            k.mean.assign(0.05 + 0.3 * rng.rand(3, 2, 1))
            k.variance.assign(0.2 + 0.3 * rng.rand(3, 2, 1))
            return k
        self._check(make)

    def test_fused_matches_legacy_conv(self):
        import mogptk_tpu.gpr as gpr

        def make(rng):
            k = gpr.GaussianConvolutionProcessKernel(output_dims=3)
            k.variance.assign(0.3 + 0.3 * rng.rand(3, 1))
            return k
        self._check(make)

    def test_fused_respects_jitter_ladder_gate(self):
        import mogptk_tpu.gpr as gpr
        N, X, Y = self._data()
        gpr.use_pallas(True)
        old = gpr.config.jitter_ladder
        try:
            k = gpr.MultiOutputSpectralKernel(output_dims=3)
            model = gpr.Exact(k, X, Y, variance=0.1, trace_probes=8)
            assert model._fused_static() is not None
            gpr.use_jitter_ladder(2)
            assert model._fused_static() is None
        finally:
            gpr.config.jitter_ladder = old
            gpr.config.bump()
            gpr.use_pallas(None)


class TestFusedCholeskySolve:
    """Direct interpret-mode coverage of ops/pallas_solve.fused_cho_solve —
    the kernel every TPU blocked-path LML solve routes through
    (ops/linalg.cholesky_solve invs= gate). The CPU-forced suite otherwise
    never reaches it (the gate requires a non-CPU backend), so this calls it
    directly and checks against jsl.cho_solve. Capability reference:
    torch.cholesky_solve at mogptk/gpr/model.py:452."""

    def _case(self, n, Bs, r, seed):
        from mogptk_tpu.ops.pallas_solve import (fused_cho_solve,
                                                 fused_solve_applicable)
        K = jnp.asarray(_spd(n, seed=seed), jnp.float32)
        L = jnp.linalg.cholesky(K)
        B = jnp.asarray(np.random.RandomState(seed + 1).randn(n, r),
                        jnp.float32)
        nb = n // Bs
        invs = [jnp.linalg.inv(L[i * Bs:(i + 1) * Bs, i * Bs:(i + 1) * Bs])
                for i in range(nb)]
        assert fused_solve_applicable(L, B, invs, block_size=Bs)
        X = np.asarray(fused_cho_solve(L, invs, B, block_size=Bs))
        X_ref = np.asarray(jsl.cho_solve((L, True), B))
        scale = np.abs(X_ref).max()
        np.testing.assert_allclose(X, X_ref, atol=3e-5 * max(scale, 1.0),
                                   err_msg="n=%d Bs=%d r=%d" % (n, Bs, r))

    def test_single_panel(self):
        # nb=1: both sweeps are pure diagonal applies (nk=0 everywhere)
        self._case(128, 128, 3, seed=21)

    def test_multi_panel_even_chunks(self):
        # nb=4: panels see nk in {0,1,2,3} — exercises the odd-tail guard
        self._case(512, 128, 17, seed=22)

    def test_multi_panel_odd_chunks(self):
        # nb=3 with a single RHS column (the plain-LML alpha solve shape)
        self._case(384, 128, 1, seed=23)

    def test_gate_rejects_oversized_and_wide(self):
        from mogptk_tpu.ops.pallas_solve import fused_solve_applicable
        L = jnp.zeros((256, 256), jnp.float32)
        invs = [jnp.zeros((128, 128), jnp.float32)] * 2
        assert fused_solve_applicable(L, jnp.zeros((256, 64), jnp.float32),
                                      invs, block_size=128)
        # wide RHS falls through to the blocked substitution
        assert not fused_solve_applicable(
            L, jnp.zeros((256, 65), jnp.float32), invs, block_size=128)
        # resident-RHS VMEM cap: a huge N must be rejected, not compiled
        n_big = 64 * 1024
        L_big = jax.ShapeDtypeStruct((n_big, n_big), jnp.float32)
        invs_big = [jnp.zeros((1024, 1024), jnp.float32)] * (n_big // 1024)
        assert not fused_solve_applicable(
            L_big, jnp.zeros((n_big, 1), jnp.float32), invs_big,
            block_size=1024)


def test_blocked_cholesky_s_tile_non_divisor_rounds_down():
    """A configured S-panel tile that does not divide the block size (e.g.
    384 with B=512) must be rounded to a divisor, not silently truncate the
    Pallas grids into a wrong factor."""
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    K = jnp.asarray(_spd(1024, seed=7), jnp.float32)
    L = np.asarray(blocked_cholesky(K, block_size=512, s_tile=(384, 384)))
    L_ref = np.asarray(jnp.linalg.cholesky(K))
    np.testing.assert_allclose(L, L_ref, rtol=2e-4, atol=2e-4)


def test_blocked_cholesky_alignment_rescue():
    """n a 512-multiple but not a block_size-multiple must factor with a
    smaller dividing block (keeping the in-place path and panel inverses)
    rather than padding them away."""
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    import jax.scipy.linalg as jsl_
    n = 1536  # 3 x 512; not a multiple of 1024
    K = jnp.asarray(_spd(n, seed=9), jnp.float32)
    L, invs = blocked_cholesky(K, block_size=1024, return_panel_invs=True)
    assert invs is not None and len(invs) == 3          # B fell back to 512
    assert invs[0].shape == (512, 512)
    L_ref = np.asarray(jnp.linalg.cholesky(K))
    np.testing.assert_allclose(np.asarray(L), L_ref, rtol=2e-4, atol=2e-4)
    # and the panel inverses solve correctly end to end
    from mogptk_tpu.ops.blocked_trisolve import blocked_cho_solve
    B = jnp.asarray(np.random.RandomState(2).randn(n, 3), jnp.float32)
    X = np.asarray(blocked_cho_solve(L, B, invs=invs, block_size=512))
    X_ref = np.asarray(jsl_.cho_solve((np.asarray(L), True), np.asarray(B)))
    np.testing.assert_allclose(X, X_ref, rtol=3e-4, atol=3e-4)


class TestBandLowerGram:
    """mosm_gram_sorted_lower writes only the tiles the blocked Cholesky
    reads (tile-lower + the band of each diagonal panel); the fused LML
    must be unchanged when it engages."""

    def _params(self, O=2, Q=2, seed=3):
        rng = np.random.RandomState(seed)
        w = jnp.asarray(0.5 + rng.rand(O, Q), jnp.float32)
        mu = jnp.asarray(0.1 + 0.2 * rng.rand(O, Q, 1), jnp.float32)
        var = jnp.asarray(0.2 + 0.3 * rng.rand(O, Q, 1), jnp.float32)
        theta = jnp.asarray(0.1 * rng.rand(O, Q, 1), jnp.float32)
        phi = jnp.asarray(0.1 * rng.rand(O, Q), jnp.float32)
        return w, mu, var, theta, phi

    def test_written_tiles_match_full_gram(self):
        from mogptk_tpu.ops.block_mosm import (mosm_gram_sorted,
                                               mosm_gram_sorted_lower, TILE)
        counts = (TILE, TILE)
        n = sum(counts)
        rng = np.random.RandomState(4)
        x = jnp.asarray(np.sort(rng.rand(n, 1), axis=0), jnp.float32)
        params = self._params()
        band = TILE
        Kl = mosm_gram_sorted_lower(x, counts, *params, 2.0, band=band)
        assert Kl is not None
        Kf = np.asarray(mosm_gram_sorted(x, counts, *params, 2.0))
        Kl = np.asarray(Kl)
        tpc = n // TILE
        bandT = band // TILE
        for ti in range(tpc):
            for tj in range(tpc):
                sl = (slice(ti * TILE, (ti + 1) * TILE),
                      slice(tj * TILE, (tj + 1) * TILE))
                if ti >= tj or ti // bandT == tj // bandT:
                    np.testing.assert_allclose(Kl[sl], Kf[sl], rtol=1e-6,
                                               atol=1e-7,
                                               err_msg="tile %d,%d" % (ti, tj))

    def test_fused_lml_with_lower_gram_matches_full(self, monkeypatch):
        import mogptk_tpu.gpr as gpr
        from mogptk_tpu.ops import block_mosm as bm
        from mogptk_tpu.ops import linalg as lg
        n_per = bm.TILE
        rng = np.random.RandomState(5)
        x0 = np.sort(rng.rand(n_per, 1), axis=0)
        _, X, Y = gpr.merge_data(
            [x0, x0], [np.sin(4 * x0) + 0.05 * rng.randn(n_per, 1),
                       np.cos(4 * x0) + 0.05 * rng.randn(n_per, 1)])
        old_pallas, old_blocked = gpr.config.pallas, gpr.config.blocked_cholesky
        try:
            gpr.use_pallas(True)
            gpr.use_blocked_cholesky(True, block_size=512)

            def build():
                k = gpr.MultiOutputSpectralMixtureKernel(2, output_dims=2)
                k.mean.assign(0.05 + 0.3 * np.random.RandomState(6).rand(2, 2, 1))
                k.variance.assign(0.2 + 0.3 * np.random.RandomState(7).rand(2, 2, 1))
                return gpr.Exact(k, X, Y, variance=0.1, trace_probes=8)

            model = build()
            assert model._fused_static() is not None
            loss_fn = model.make_loss_fn()
            train, fixed = model._split_raws()
            v_lower, g_lower = jax.value_and_grad(loss_fn)(train, fixed)

            # disable the lower variant: same computation via the full gram
            monkeypatch.setattr(bm, "mosm_gram_sorted_lower",
                                lambda *a, **k2: None)
            jax.clear_caches()
            v_full, g_full = jax.value_and_grad(loss_fn)(train, fixed)
        finally:
            gpr.config.pallas = old_pallas
            gpr.config.blocked_cholesky = old_blocked
            gpr.config.bump()
            jax.clear_caches()
        np.testing.assert_allclose(float(v_lower), float(v_full),
                                   rtol=1e-6, atol=1e-6)
        for a, b in zip(jax.tree_util.tree_leaves(g_lower),
                        jax.tree_util.tree_leaves(g_full)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-5, atol=1e-7)


def test_blocked_tri_inverse_and_spd_inverse_from_factor():
    """W = L⁻¹ via the blocked row recursion and K⁻¹ = WᵀW (lower syrk +
    mirror) match dense inverses exactly in f64, and K⁻¹ is symmetric by
    construction."""
    from mogptk_tpu.ops.blocked_trisolve import (blocked_tri_inverse,
                                                 spd_inverse_from_factor)
    rng = np.random.RandomState(0)
    n, Bs = 512, 128
    A = rng.randn(n, n)
    K = A @ A.T + n * np.eye(n)
    L = np.linalg.cholesky(K)
    W = np.asarray(blocked_tri_inverse(jnp.asarray(L), block_size=Bs))
    np.testing.assert_allclose(W, np.linalg.inv(L), atol=1e-10)
    assert np.all(np.triu(W, 1) == 0.0)
    Ki = np.asarray(spd_inverse_from_factor(jnp.asarray(L), block_size=Bs))
    np.testing.assert_allclose(Ki, np.linalg.inv(K), atol=1e-10)
    np.testing.assert_array_equal(Ki, Ki.T)


def test_closed_form_gradient_inverse_from_factor_route():
    """The exact closed-form LML gradient through the blocked
    inverse-from-factor route (n divisible by the effective block, blocked
    policy forced on) matches the XLA double-solve route — multi-block
    (n=2048, B=1024) so the row recursion and syrk really run."""
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.ops.linalg import lml_quadform_logdet_shifted
    rng = np.random.RandomState(1)
    n = 2048
    A = rng.randn(n, n)
    K = jnp.asarray(A @ A.T + n * np.eye(n))
    d = jnp.asarray(0.1 + rng.rand(n))
    y = jnp.asarray(rng.randn(n, 1))

    def lml(K_):
        return lml_quadform_logdet_shifted(K_, d, y)

    try:
        gpr.use_blocked_cholesky(True)
        g1 = jax.grad(lml)(K)
        gpr.use_blocked_cholesky(False)
        g0 = jax.grad(lml)(K)
    finally:
        gpr.use_blocked_cholesky(None)
    scale = float(jnp.abs(g0).max())
    np.testing.assert_allclose(np.asarray(g1), np.asarray(g0),
                               atol=1e-9 * max(scale, 1e-30))


def test_fused_trsm_column_pipeline_matches_base():
    """blocked_cholesky(fused_trsm=True) — the S_diag/below-TRSM/commit
    column pipeline — produces the same factor as the standard S-panel +
    write path, with and without a vector diag shift."""
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    rng = np.random.RandomState(0)
    n = 1536
    A = rng.randn(n, n).astype(np.float32)
    K = jnp.asarray((A @ A.T + n * np.eye(n)).astype(np.float32))
    d = jnp.asarray((0.1 + rng.rand(n)).astype(np.float32))
    for B in (512,):
        L1, invs = blocked_cholesky(K, block_size=B, fused_trsm=True,
                                    return_panel_invs=True, zero_upper=False)
        L0 = blocked_cholesky(K, block_size=B, fused_trsm=False)
        np.testing.assert_allclose(np.tril(np.asarray(L1)), np.asarray(L0),
                                   rtol=0, atol=5e-4)
        assert len(invs) == n // B
        L1s = blocked_cholesky(K, block_size=B, fused_trsm=True,
                               diag_shift=d, zero_upper=False)
        L0s = blocked_cholesky(K, block_size=B, fused_trsm=False,
                               diag_shift=d)
        np.testing.assert_allclose(np.tril(np.asarray(L1s)), np.asarray(L0s),
                                   rtol=0, atol=5e-4)


def test_lml_forwards_fused_trsm_equal():
    """The probe and closed-form LML values/gradients are identical with
    the fused below-TRSM pipeline on and off (blocked policy forced)."""
    import mogptk_tpu.gpr as gpr
    from mogptk_tpu.gpr.config import config
    from mogptk_tpu.ops.linalg import (lml_quadform_logdet_shifted,
                                       lml_quadform_logdet_stochastic_shifted)
    rng = np.random.RandomState(2)
    n = 1024
    A = rng.randn(n, n).astype(np.float32)
    K = jnp.asarray((A @ A.T + n * np.eye(n)).astype(np.float32))
    d = jnp.asarray(np.full(n, 0.3, np.float32))
    y = jnp.asarray(rng.randn(n, 1).astype(np.float32))

    def run():
        v1, g1 = jax.value_and_grad(
            lambda K_: lml_quadform_logdet_shifted(K_, d, y))(K)
        v2 = lml_quadform_logdet_stochastic_shifted(K, d, y, 4, 0)
        return v1, g1, v2

    old_min = config.blocked_cholesky_min_n
    old_fused = config.blocked_cholesky_fused_trsm
    try:
        gpr.use_blocked_cholesky(True)
        config.blocked_cholesky_min_n = 256
        config.blocked_cholesky_fused_trsm = True
        a = run()
        config.blocked_cholesky_fused_trsm = False
        b = run()
    finally:
        config.blocked_cholesky_fused_trsm = old_fused
        config.blocked_cholesky_min_n = old_min
        gpr.use_blocked_cholesky(None)
    np.testing.assert_allclose(float(a[0]), float(b[0]), rtol=1e-6)
    np.testing.assert_allclose(float(a[2]), float(b[2]), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]),
                               rtol=1e-4, atol=1e-8)


def test_syrk_lower_matches_dense():
    """The streamed Pallas syrk (interpret mode on CPU) reproduces the
    block-lower part of W^T W for a lower-triangular W."""
    from mogptk_tpu.ops.blocked_trisolve import syrk_lower

    rng = np.random.RandomState(11)
    n, B = 2048, 1024
    W = jnp.asarray(np.tril(rng.randn(n, n)).astype(np.float32))
    Kl = np.asarray(syrk_lower(W, block=B))
    ref = np.asarray(W).T @ np.asarray(W)
    nb = n // B
    for i in range(nb):
        for j in range(i + 1):
            got = Kl[i * B:(i + 1) * B, j * B:(j + 1) * B]
            want = ref[i * B:(i + 1) * B, j * B:(j + 1) * B]
            np.testing.assert_allclose(got, want, rtol=2e-5,
                                       atol=2e-3 * np.abs(want).max())
