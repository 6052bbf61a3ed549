"""TPU canary: Mosaic-lower and execute every TPU-only code path at small N.

The CPU-forced test suite runs all Pallas kernels in interpret mode, so it
structurally CANNOT catch Mosaic lowering failures (round 3 shipped a kernel
that crashed every TPU exact-GP forward; the driver's bench found it, not a
test). This canary jits one small instance of each TPU-only path on the real
chip and prints pass/fail per cell in about a minute.

Run it after ANY change under mogptk_tpu/ops/ and ALWAYS before the
end-of-round snapshot:

    timeout 590 python benchmarks/tpu_canary.py        # all cells
    python benchmarks/tpu_canary.py exact_probe_mosm   # one cell

Covered: in-place blocked Cholesky (+panel inverses), fused_cho_solve,
blocked trisolve (both sweeps), every fused Gram family forward+VJP
(mosm/umosm/csm/conv/mohsm/lmc_sm) through the probe-LML training step, the
deterministic-gradient step, the SVGP (Titsias) step with the jitter ladder,
and the iterative (CG/SLQ/Pallas-matvec) step.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

FAMILIES = ["mosm", "umosm", "csm", "conv", "mohsm", "lmc_sm"]


def _family_kernel(name, rng, channels=2, q=2, mohsm_psd_safe=False):
    import mogptk_tpu.gpr as gpr
    if name == "mosm":
        k = gpr.MultiOutputSpectralMixtureKernel(q, output_dims=channels)
        k.mean.assign(0.05 + 0.3 * rng.rand(channels, q, 1))
        k.variance.assign(0.2 + 0.3 * rng.rand(channels, q, 1))
        return k
    if name == "umosm":
        k = gpr.UncoupledMultiOutputSpectralKernel(output_dims=channels)
        k.weight.assign(np.tril(0.5 + rng.rand(channels, channels)))
        k.mean.assign(0.1 + 0.1 * rng.rand(channels, 1))
        k.variance.assign(0.3 + 0.1 * rng.rand(channels, 1))
        return k
    if name == "csm":
        k = gpr.CrossSpectralKernel(output_dims=channels, Rq=2)
        k.mean.assign(0.1 + 0.1 * rng.rand(1))
        k.variance.assign(0.3 + 0.1 * rng.rand(1))
        k.amplitude.assign(0.5 + rng.rand(channels, 2))
        return k
    if name == "conv":
        k = gpr.GaussianConvolutionProcessKernel(output_dims=channels)
        k.variance.assign(0.3 + 0.1 * rng.rand(channels, 1))
        return k
    if name == "lmc_sm":
        import mogptk_tpu.gpr as gpr
        spectral = [gpr.SpectralKernel(1) for _ in range(2)]
        for kq in spectral:
            kq.mean.assign(0.1 + 0.1 * rng.rand(1))
            kq.variance.assign(0.3 + 0.1 * rng.rand(1))
        k = gpr.LinearModelOfCoregionalizationKernel(
            spectral, output_dims=channels, Q=2, Rq=2)
        k.weight.assign(0.3 + 0.5 * rng.rand(channels, 2, 2))
        return k
    if name == "mohsm":
        k = gpr.MultiOutputHarmonizableSpectralKernel(
            output_dims=channels, psd_safe=mohsm_psd_safe)
        k.mean.assign(0.1 + 0.1 * rng.rand(channels, 1))
        # PSD regime: wide spectral variance + tight envelope (test_iterative)
        k.variance.assign(0.9 + 0.2 * rng.rand(channels, 1))
        k.lengthscale.assign(0.25 + 0.1 * rng.rand(channels))
        return k
    raise ValueError(name)


def _data(channels, n_per):
    import mogptk_tpu.gpr as gpr
    rng = np.random.RandomState(0)
    xs, ys = [], []
    for j in range(channels):
        x = np.sort(rng.uniform(0.0, 6.0, n_per)).reshape(-1, 1)
        y = (np.sin(1.2 * x[:, 0] + j) + 0.05 * rng.randn(n_per)).reshape(-1, 1)
        xs.append(x)
        ys.append(y)
    return gpr.merge_data(xs, ys)


def _one_step(model):
    """One jitted LML+gradient evaluation; returns the fetched loss."""
    loss_fn = model.make_loss_fn()
    train, fixed = model._split_raws()
    val, grads = jax.jit(jax.value_and_grad(loss_fn))(train, fixed)
    v = float(np.asarray(val))
    leaves = jax.tree_util.tree_leaves(grads)
    gsum = float(sum(np.abs(np.asarray(g)).sum() for g in leaves))
    assert np.isfinite(v), "loss is not finite: %r" % (v,)
    assert np.isfinite(gsum) and gsum > 0, "gradients not finite/zero: %r" % (gsum,)
    return v


def cell_chol_inplace_fused_solve():
    """In-place blocked Cholesky + panel inverses + fused_cho_solve (the
    round-3 crash site) at N=2048, B=1024."""
    from mogptk_tpu.ops.blocked_cholesky import blocked_cholesky
    from mogptk_tpu.ops.pallas_solve import fused_cho_solve
    n, r = 2048, 9
    rng = np.random.RandomState(0)
    A = rng.randn(n, 256).astype(np.float32)
    K = jnp.asarray(A @ A.T) + n * jnp.eye(n, dtype=jnp.float32)
    B = jnp.asarray(rng.randn(n, r).astype(np.float32))

    @jax.jit
    def go(K, B):
        L, invs = blocked_cholesky(K, return_panel_invs=True)
        return fused_cho_solve(L, invs, B)

    X = np.asarray(go(K, B))
    rel = np.abs(np.asarray(K) @ X - np.asarray(B)).max() / np.abs(B).max()
    assert np.isfinite(X).all() and rel < 1e-3, "rel resid %.2e" % rel


def cell_blocked_trisolve():
    """Blocked substitution, lower and transposed-upper sweeps, wide RHS."""
    from mogptk_tpu.ops.blocked_trisolve import blocked_trisolve
    n, r = 2048, 512
    rng = np.random.RandomState(1)
    A = rng.randn(n, 256).astype(np.float32)
    K = jnp.asarray(A @ A.T) + n * jnp.eye(n, dtype=jnp.float32)
    L = jnp.linalg.cholesky(K)
    B = jnp.asarray(rng.randn(n, r).astype(np.float32))

    @jax.jit
    def go(L, B):
        Xl = blocked_trisolve(L, B, lower=True, block_size=512)
        Xu = blocked_trisolve(L.T, Xl, lower=False, block_size=512)
        return Xu

    X = np.asarray(go(L, B))
    rel = np.abs(np.asarray(K) @ X - np.asarray(B)).max() / np.abs(B).max()
    assert np.isfinite(X).all() and rel < 1e-3, "rel resid %.2e" % rel


def _exact_probe_cell(family):
    def cell():
        import mogptk_tpu.gpr as gpr
        N, X, Y = _data(2, 256)
        k = _family_kernel(family, np.random.RandomState(1))
        model = gpr.Exact(k, X, Y, variance=0.1, trace_probes=8)
        assert model._fused_static() is not None, \
            "fused probe-LML gate did not engage for %s" % family
        _one_step(model)
    cell.__doc__ = ("Fused %s Gram forward+VJP through the probe-LML "
                    "training step." % family)
    return cell


def cell_exact_probe_blocked_16k_shape():
    """The headline path shape-alike: MOSM probe step at N=2048 with the
    blocked Cholesky (production-default block size), the band-lower
    sorted Gram, and fused_cho_solve engaged."""
    import mogptk_tpu.gpr as gpr
    old = gpr.config.blocked_cholesky
    try:
        gpr.use_blocked_cholesky(True)
        N, X, Y = _data(4, 512)
        k = _family_kernel("mosm", np.random.RandomState(1), channels=4)
        model = gpr.Exact(k, X, Y, variance=0.1, trace_probes=8)
        _one_step(model)
    finally:
        gpr.config.blocked_cholesky = old
        gpr.config.bump()


def cell_exact_deterministic_grad():
    """Deterministic closed-form-gradient step (blocked K-inverse backward)."""
    import mogptk_tpu.gpr as gpr
    old = gpr.config.blocked_cholesky
    try:
        gpr.use_blocked_cholesky(True)
        N, X, Y = _data(4, 512)
        k = _family_kernel("mosm", np.random.RandomState(1), channels=4)
        model = gpr.Exact(k, X, Y, variance=0.1)
        _one_step(model)
    finally:
        gpr.config.blocked_cholesky = old
        gpr.config.bump()


def cell_svgp_step():
    """Titsias collapsed-bound step with the jitter ladder on (the bench's
    production setting)."""
    import mogptk_tpu.gpr as gpr
    old = gpr.config.jitter_ladder
    try:
        gpr.use_jitter_ladder(3)
        N, X, Y = _data(4, 512)
        k = _family_kernel("mosm", np.random.RandomState(1), channels=4)
        model = gpr.Titsias(k, X, Y, Z=64, Z_init="random", variance=0.1)
        _one_step(model)
    finally:
        gpr.config.jitter_ladder = old
        gpr.config.bump()


def cell_iterative_step():
    """ExactIterative (Pallas Gram matvec + CG + SLQ + low-rank VJP) step."""
    import mogptk_tpu.gpr as gpr
    N, X, Y = _data(4, 512)
    k = _family_kernel("mosm", np.random.RandomState(1), channels=4)
    model = gpr.ExactIterative(k, X, Y, variance=0.1, max_cg_iters=20,
                               cg_tol=1e-4, num_probes=8, lanczos_iters=12,
                               precond_rank=16)
    _one_step(model)


def cell_iterative_readout():
    """Evaluation-grade LML readout: pivoted factor (highest-precision
    dots), hp fused matvec (precision= through the Pallas dot — a distinct
    Mosaic lowering), reorthogonalized SLQ. Checks the value against the
    dense-exact LML (the round-5 incident: plausible-looking readouts sat
    thousands of nats off on TPU only)."""
    import jax
    import jax.numpy as jnp
    import mogptk_tpu.gpr as gpr
    N, X, Y = _data(2, 512)
    k = _family_kernel("mosm", np.random.RandomState(1))
    dense = float(gpr.Exact(k, X, Y, variance=0.1).log_marginal_likelihood())
    m = gpr.ExactIterative(k, X, Y, variance=0.1, max_cg_iters=100,
                           cg_tol=1e-7, num_probes=16, lanczos_iters=48,
                           precond_rank=64)
    read = float(m.log_marginal_likelihood_readout(
        num_probes=16, lanczos_iters=48, precond_rank=256))
    rel = abs(read - dense) / abs(dense)
    assert rel < 0.02, (read, dense, rel)


def build_cells():
    cells = [
        ("chol_inplace_fused_solve", cell_chol_inplace_fused_solve),
        ("blocked_trisolve", cell_blocked_trisolve),
    ]
    cells += [("exact_probe_%s" % f, _exact_probe_cell(f)) for f in FAMILIES]
    cells += [
        ("exact_probe_blocked", cell_exact_probe_blocked_16k_shape),
        ("exact_deterministic_grad", cell_exact_deterministic_grad),
        ("svgp_step", cell_svgp_step),
        ("iterative_step", cell_iterative_step),
        ("iterative_readout", cell_iterative_readout),
    ]
    return cells


def main():
    import mogptk_tpu.gpr as gpr
    gpr.use_pallas(True)
    only = set(sys.argv[1:])
    failed = []
    for name, cell in build_cells():
        if only and name not in only:
            continue
        t0 = time.perf_counter()
        try:
            cell()
            print("PASS  %-28s %6.1fs" % (name, time.perf_counter() - t0),
                  flush=True)
        except Exception as e:
            first = (str(e).strip().splitlines() or [""])[0]
            print("FAIL  %-28s %6.1fs  %s: %s"
                  % (name, time.perf_counter() - t0, type(e).__name__,
                     first[:160]), flush=True)
            failed.append(name)
    if failed:
        print("CANARY FAILED: %s" % ", ".join(failed))
        sys.exit(1)
    print("CANARY OK (%d cells)" % len([n for n, _ in build_cells()
                                        if not only or n in only]))


if __name__ == "__main__":
    main()
