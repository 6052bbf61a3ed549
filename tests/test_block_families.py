"""Generic channel-block engines (ops/block_families.py) parity tests
(interpret mode on CPU): forward, pack-level backward, matvec, and
low-rank VJP must match the jnp formulations for uMOSM, CSM and CONV."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

import mogptk_tpu.ops.block_families as bf
import mogptk_tpu.ops.block_mosm as bm
from mogptk_tpu.gpr.multioutput import _umosm_K, _csm_K, _conv_K, _lmc_sm_K


@pytest.fixture(autouse=True)
def interpret_pallas(monkeypatch):
    orig = pl.pallas_call

    def interp(*args, **kwargs):
        kwargs["interpret"] = True
        return orig(*args, **kwargs)

    monkeypatch.setattr(bf.pl, "pallas_call", interp)
    monkeypatch.setattr(bf, "TILE", 32)
    monkeypatch.setattr(bf, "BWD_TILE", 16)
    yield


def _xc(counts, D, seed):
    rng = np.random.RandomState(seed)
    N = sum(counts)
    x = jnp.asarray(np.sort(rng.rand(N, D) * 5, axis=0), dtype=jnp.float64)
    c = jnp.asarray(np.repeat(np.arange(len(counts)), counts), dtype=jnp.int32)
    return x, c, rng


def _family_setup(name, counts, D=1, seed=0):
    O = len(counts)
    x, c, rng = _xc(counts, D, seed)
    if name == "umosm":
        W = jnp.asarray(np.tril(0.5 + rng.rand(O, O)))
        mu = jnp.asarray(0.1 + rng.rand(O, D))
        var = jnp.asarray(0.2 + rng.rand(O, D))
        th = jnp.asarray(0.1 * rng.randn(O, D))
        ph = jnp.asarray(0.1 * rng.randn(O))
        twopi = float((2 * np.pi) ** (D / 2))
        params = (W, mu, var, th, ph)
        statics = (twopi,)
        # lifted (O,1,D) forms, as the dense fn and fused engine use
        lift = (W, mu[:, None], var[:, None], th[:, None], ph[:, None])
        dense = lambda ps: _umosm_K(c, x, c, x, ps, twopi)
        return x, c, params, statics, lift, dense
    if name == "csm":
        Rq = 3
        amp = jnp.asarray(0.3 + rng.rand(O, Rq))
        mu = jnp.asarray(0.1 + rng.rand(1, D))
        var = jnp.asarray(0.2 + rng.rand(1, D))
        shift = jnp.asarray(0.1 * rng.randn(O, Rq))
        params = (amp, mu, var, shift)
        statics = (Rq, D)
        dense = lambda ps: _csm_K(c, x, c, x, ps)
        return x, c, params, statics, params, dense
    if name == "conv":
        w = jnp.asarray(0.5 + rng.rand(O, 1))
        var = jnp.asarray(0.2 + rng.rand(O, D))
        base = jnp.asarray(0.3 + rng.rand(1, D))
        params = (w, var, base)
        statics = (D,)
        dense = lambda ps: _conv_K(c, x, c, x, ps)
        return x, c, params, statics, params, dense
    if name == "lmc_sm":
        Q, Rq = 2, 2
        W = jnp.asarray(0.3 + rng.rand(O, Q, Rq))
        mag = jnp.asarray(0.5 + rng.rand(Q, 1))
        mu = jnp.asarray(0.1 + rng.rand(Q, D))
        var = jnp.asarray(0.2 + rng.rand(Q, D))
        params = (W, mag, mu, var)
        statics = (Q, D)
        dense = lambda ps: _lmc_sm_K(c, x, c, x, ps)
        return x, c, params, statics, params, dense
    raise ValueError(name)


@pytest.mark.parametrize("name,counts,D", [
    ("umosm", (40, 33, 27), 1),
    ("umosm", (30, 0, 40), 2),
    ("csm", (40, 33), 2),
    ("conv", (40, 33, 27), 1),
    ("conv", (25, 40), 2),
    ("lmc_sm", (40, 33, 27), 1),
    ("lmc_sm", (25, 40), 2),
])
def test_forward_matches_dense(name, counts, D):
    x, c, params, statics, lift, dense = _family_setup(name, counts, D=D)
    pack_params = lift if name == "umosm" else params
    K_blk = bf.family_gram_sorted(name, statics, x, counts, pack_params)
    K_ref = dense(lift)
    np.testing.assert_allclose(np.asarray(K_blk), np.asarray(K_ref),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("name,counts,D", [
    ("umosm", (40, 33), 1),
    ("csm", (40, 27), 1),
    ("conv", (33, 40), 2),
    ("lmc_sm", (40, 27), 1),
])
def test_gradient_matches_dense(name, counts, D):
    x, c, params, statics, lift, dense = _family_setup(name, counts, D=D, seed=3)
    N = sum(counts)
    R = jnp.asarray(np.random.RandomState(4).randn(N, N))
    pack_params = lift if name == "umosm" else params

    def f_blk(ps):
        return jnp.sum(bf.family_gram_sorted(name, statics, x, counts, ps) * R)

    def f_ref(ps):
        return jnp.sum(dense(ps) * R)

    g_blk = jax.grad(f_blk)(pack_params)
    g_ref = jax.grad(f_ref)(lift)
    for a, b in zip(g_blk, g_ref):
        np.testing.assert_allclose(np.asarray(a).reshape(np.asarray(b).shape),
                                   np.asarray(b), rtol=1e-9, atol=1e-11)


@pytest.mark.parametrize("name", ["umosm", "csm", "conv", "lmc_sm"])
def test_matvec_and_lowrank_match_dense(name):
    counts = (40, 33)
    x, c, params, statics, lift, dense = _family_setup(name, counts, seed=5)
    N = sum(counts)
    rng = np.random.RandomState(6)
    V = jnp.asarray(rng.randn(N, 5))
    pack_params = lift if name == "umosm" else params
    K = dense(lift)
    out = bf.family_matvec_sorted(name, statics, x, counts, pack_params, V)
    np.testing.assert_allclose(np.asarray(out), np.asarray(K @ V),
                               rtol=1e-10, atol=1e-10)

    A = jnp.asarray(rng.randn(N, 4))
    B = jnp.asarray(rng.randn(N, 4))
    dparams = bf.family_lowrank_vjp_sorted(name, statics, x, counts,
                                           pack_params, A, B)
    dref = jax.grad(lambda ps: jnp.sum(dense(ps) * (A @ B.T)))(lift)
    for a, b in zip(dparams, dref):
        np.testing.assert_allclose(np.asarray(a).reshape(np.asarray(b).shape),
                                   np.asarray(b), rtol=1e-9, atol=1e-11)


def test_fused_lmc_sm_tile_matches_dense_d2():
    """ops/fused.py's lmc_sm tile (the iterative-engine path, distinct from
    the block-engine spec above) at D=2: tile-with-one-hots, dense, and diag
    must agree."""
    from mogptk_tpu.ops.fused import resolve_family
    rng = np.random.RandomState(7)
    O, Q, Rq, D, n = 3, 2, 2, 2, 20
    W = jnp.asarray(0.3 + rng.rand(O, Q, Rq))
    mag = jnp.asarray(0.5 + rng.rand(Q, 1))
    mu = jnp.asarray(0.1 + rng.rand(Q, D))
    var = jnp.asarray(0.2 + rng.rand(Q, D))
    params = (W, mag, mu, var)
    x1 = jnp.asarray(rng.rand(n, D) * 4)
    x2 = jnp.asarray(rng.rand(n + 4, D) * 4)
    c1 = jnp.asarray(rng.randint(0, O, n), dtype=jnp.int32)
    c2 = jnp.asarray(rng.randint(0, O, n + 4), dtype=jnp.int32)
    tile, dense, diag = resolve_family(("lmc_sm", (Q, D)))
    oh = lambda c: (c[:, None] == jnp.arange(O)[None, :]).astype(x1.dtype)
    K_tile = tile(x1, oh(c1), x2, oh(c2), *params)
    K_dense = dense(c1, x1, c2, x2, params)
    np.testing.assert_allclose(np.asarray(K_tile), np.asarray(K_dense),
                               rtol=1e-12, atol=1e-12)
    K_self = dense(c1, x1, c1, None, params)
    np.testing.assert_allclose(np.asarray(diag(c1, x1, params)),
                               np.asarray(jnp.diagonal(K_self)),
                               rtol=1e-12, atol=1e-12)


@pytest.mark.parametrize("kname", ["umosm", "csm", "conv", "lmc_sm"])
def test_exact_model_routes_to_family_engine(kname, monkeypatch):
    import mogptk_tpu.gpr as gpr

    rng = np.random.RandomState(0)
    xs = [np.sort(rng.uniform(0, 10, n)).reshape(-1, 1) for n in (33, 47)]
    ys = [np.sin(x) + 0.05 * rng.randn(*x.shape) for x in xs]
    N, X, Y = gpr.merge_data(xs, ys)
    if kname == "umosm":
        kernel = gpr.UncoupledMultiOutputSpectralKernel(output_dims=2)
        kernel.mean.assign(0.1 + 0.2 * rng.rand(2, 1))
    elif kname == "csm":
        kernel = gpr.CrossSpectralKernel(output_dims=2, Rq=2)
        kernel.mean.assign(0.1 + 0.2 * rng.rand(1))
    elif kname == "lmc_sm":
        spectral = [gpr.SpectralKernel(1) for _ in range(2)]
        for k in spectral:
            k.mean.assign(0.1 + 0.2 * rng.rand(1))
            k.variance.assign(0.2 + 0.2 * rng.rand(1))
        kernel = gpr.LinearModelOfCoregionalizationKernel(
            spectral, output_dims=2, Q=2, Rq=2)
        kernel.weight.assign(0.3 + rng.rand(2, 2, 2))
    else:
        kernel = gpr.GaussianConvolutionProcessKernel(output_dims=2)
    model = gpr.Exact(kernel, X, Y, variance=0.1)
    assert model._channel_counts == (33, 47)
    loss_generic = float(model.loss())

    calls = {"n": 0}
    orig = bf.family_gram_sorted

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(bf, "family_gram_sorted", spy)
    old = gpr.config.pallas
    try:
        gpr.use_pallas(True)
        jax.clear_caches()
        g = jax.grad(model.make_loss_fn())(*model._split_raws())
        loss_block = float(model.loss())
        assert calls["n"] >= 1, "family block engine was not used"
        np.testing.assert_allclose(loss_block, loss_generic, rtol=1e-9)
        assert all(bool(jnp.all(jnp.isfinite(t)))
                   for t in jax.tree_util.tree_leaves(g))
    finally:
        gpr.config.pallas = old
        gpr.config.bump()
        jax.clear_caches()


def test_iterative_routes_to_family_engine():
    import mogptk_tpu.gpr as gpr

    rng = np.random.RandomState(1)
    xs = [np.sort(rng.uniform(0, 10, n)).reshape(-1, 1) for n in (40, 56)]
    ys = [np.sin(x) + 0.05 * rng.randn(*x.shape) for x in xs]
    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.GaussianConvolutionProcessKernel(output_dims=2)
    model = gpr.ExactIterative(kernel, X, Y, variance=0.1, max_cg_iters=200,
                               cg_tol=1e-10, num_probes=64)
    loss_fn = model.make_loss_fn()
    train, fixed = model._split_raws()
    v_gen, g_gen = jax.value_and_grad(loss_fn)(train, fixed)

    old = gpr.config.pallas
    try:
        gpr.use_pallas(True)
        jax.clear_caches()
        model._jit_cache.clear()
        v_blk, g_blk = jax.value_and_grad(model.make_loss_fn())(train, fixed)
    finally:
        gpr.config.pallas = old
        gpr.config.bump()
        jax.clear_caches()

    np.testing.assert_allclose(float(v_blk), float(v_gen), rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(g_blk),
                    jax.tree_util.tree_leaves(g_gen)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-8)


def test_mohsm_forward_and_grad_match_dense():
    import mogptk_tpu.gpr as gpr
    counts = (40, 33)
    O, D = 2, 1
    x, c, rng = _xc(counts, D, 7)
    w = jnp.asarray(0.5 + rng.rand(O))
    mu = jnp.asarray(0.1 + rng.rand(O, D))
    var = jnp.asarray(0.2 + rng.rand(O, D))
    th = jnp.asarray(0.1 * rng.randn(O, D))
    ph = jnp.asarray(0.1 * rng.randn(O))
    ls = jnp.asarray(0.5 + rng.rand(O))
    center = jnp.asarray(rng.randn(D))
    twopi = float((2 * np.pi) ** D)
    params = (w, mu, var, th, ph, ls, center)

    kernel = gpr.MultiOutputHarmonizableSpectralKernel(output_dims=O, input_dims=D)
    kernel.weight.assign(w); kernel.mean.assign(mu); kernel.variance.assign(var)
    kernel.delay.assign(th); kernel.phase.assign(ph)
    kernel.lengthscale.assign(ls); kernel.center.assign(center)
    K_ref = kernel.K_mo(c, x, c, None)

    K_blk = bf.family_gram_sorted("mohsm", (twopi, D), x, counts, params)
    np.testing.assert_allclose(np.asarray(K_blk), np.asarray(K_ref),
                               rtol=1e-11, atol=1e-12)

    # gradient parity against autodiff through the dense path
    R = jnp.asarray(np.random.RandomState(8).randn(sum(counts), sum(counts)))

    def f_blk(ps):
        return jnp.sum(bf.family_gram_sorted("mohsm", (twopi, D), x, counts, ps) * R)

    g_blk = jax.grad(f_blk)(params)
    # finite-difference spot check on a few leaves instead of rebuilding the
    # bind machinery: K is linear in nothing, so check via jvp consistency
    eps = 1e-6
    for k, name in [(0, "w"), (5, "ls"), (6, "center")]:
        p2 = list(params)
        flat = params[k].reshape(-1)
        p2[k] = flat.at[0].add(eps).reshape(params[k].shape)
        num = (float(f_blk(tuple(p2))) - float(f_blk(params))) / eps
        ana = float(np.asarray(g_blk[k]).reshape(-1)[0])
        np.testing.assert_allclose(ana, num, rtol=2e-4, atol=1e-6, err_msg=name)


def test_mohsm_model_routes_to_family_engine(monkeypatch):
    import mogptk_tpu.gpr as gpr
    rng = np.random.RandomState(0)
    xs = [np.sort(rng.uniform(0, 4, n)).reshape(-1, 1) for n in (30, 40)]
    ys = [np.sin(2 * x) + 0.05 * rng.randn(*x.shape) for x in xs]
    N, X, Y = gpr.merge_data(xs, ys)
    kernel = gpr.MultiOutputHarmonizableSpectralKernel(output_dims=2)
    kernel.mean.assign(0.1 + 0.2 * rng.rand(2, 1))
    model = gpr.Exact(kernel, X, Y, variance=0.1)
    loss_generic = float(model.loss())
    calls = {"n": 0}
    orig = bf.family_gram_sorted

    def spy(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    monkeypatch.setattr(bf, "family_gram_sorted", spy)
    old = gpr.config.pallas
    try:
        gpr.use_pallas(True)
        jax.clear_caches()
        loss_block = float(model.loss())
        assert calls["n"] >= 1
        np.testing.assert_allclose(loss_block, loss_generic, rtol=1e-9)
    finally:
        gpr.config.pallas = old
        gpr.config.bump()
        jax.clear_caches()
