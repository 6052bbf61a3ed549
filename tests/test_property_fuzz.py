"""Property-based fuzzing (self-contained — no `hypothesis` in this image):
randomized kernels, parameters and layouts must satisfy the Gram-matrix
contracts the inference layer relies on (ROADMAP #11).

Properties per draw:
- symmetry: K(X, X) == K(X, X)ᵀ
- diagonal consistency: diag(K(X, X)) == K_diag(X)
- PSD (up to jitter scale): eigmin(K) ≥ −tol·eigmax (MOHSM is excluded —
  legitimately non-PSD for narrow spectral variances, reference parity)
- cross-slice consistency: K(X, X2)[i, j] == K(X1∪X2)[i, N1+j]
- channel-block-engine parity on sorted layouts (where K_sorted exists)
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import mogptk_tpu.gpr as gpr

N_DRAWS = 12


def _rand_single_kernel(rng, D):
    kinds = [
        lambda: gpr.SquaredExponentialKernel(input_dims=D),
        lambda: gpr.ExponentialKernel(input_dims=D),
        lambda: gpr.RationalQuadraticKernel(input_dims=D),
        lambda: gpr.PeriodicKernel(input_dims=D),
        lambda: gpr.MaternKernel(nu=rng.choice([0.5, 1.5, 2.5]), input_dims=D),
        lambda: gpr.SpectralMixtureKernel(Q=int(rng.randint(1, 3)), input_dims=D),
        lambda: gpr.LinearKernel(input_dims=D),
        lambda: gpr.CosineKernel(input_dims=D),
    ]
    k = kinds[rng.randint(len(kinds))]()
    # perturb every parameter within a sane positive range
    for p in k.parameters():
        val = np.asarray(p())
        jitter = np.exp(rng.uniform(-0.7, 0.7, size=val.shape))
        try:
            p.assign(np.abs(val) * jitter + 0.05)
        except Exception:
            pass
    return k


def _rand_mo_kernel(rng, O):
    kinds = [
        lambda: gpr.MultiOutputSpectralMixtureKernel(int(rng.randint(1, 3)), output_dims=O),
        lambda: gpr.MultiOutputSpectralKernel(output_dims=O),
        lambda: gpr.UncoupledMultiOutputSpectralKernel(output_dims=O),
        lambda: gpr.CrossSpectralKernel(output_dims=O, Rq=int(rng.randint(1, 3))),
        lambda: gpr.GaussianConvolutionProcessKernel(output_dims=O),
        lambda: gpr.LinearModelOfCoregionalizationKernel(
            *[gpr.SpectralMixtureKernel(Q=1) for _ in range(2)],
            output_dims=O, Q=2),
        # all-spectral bases: eligible for the fused "lmc_sm" block engine,
        # so the K_sorted parity branch below fuzzes that path too
        lambda: gpr.LinearModelOfCoregionalizationKernel(
            *[gpr.SpectralKernel(1) for _ in range(2)],
            output_dims=O, Q=2, Rq=int(rng.randint(1, 3))),
    ]
    k = kinds[rng.randint(len(kinds))]()
    for p in k.parameters():
        val = np.asarray(p())
        jitter = np.exp(rng.uniform(-0.5, 0.5, size=val.shape))
        try:
            p.assign(np.abs(val) * jitter + 0.05)
        except Exception:
            pass
    return k


@pytest.mark.parametrize("seed", range(N_DRAWS))
def test_single_output_gram_contracts(seed):
    rng = np.random.RandomState(seed)
    D = int(rng.randint(1, 3))
    n = int(rng.randint(8, 40))
    X = jnp.asarray(rng.uniform(-3, 6, (n, D)))
    k = _rand_single_kernel(rng, D)

    K = np.asarray(k.K(X))
    np.testing.assert_allclose(K, K.T, rtol=1e-9, atol=1e-10)
    np.testing.assert_allclose(np.diag(K), np.asarray(k.K_diag(X)),
                               rtol=1e-9, atol=1e-10)
    lam = np.linalg.eigvalsh(K)
    assert lam.min() >= -1e-8 * max(lam.max(), 1.0), \
        "%s not PSD (seed %d): eigmin %g" % (k.name(), seed, lam.min())

    m = int(rng.randint(4, 20))
    X2 = jnp.asarray(rng.uniform(-3, 6, (m, D)))
    Kx = np.asarray(k.K(X, X2))
    Kfull = np.asarray(k.K(jnp.concatenate([X, X2], axis=0)))
    np.testing.assert_allclose(Kx, Kfull[:n, n:], rtol=1e-9, atol=1e-10)


@pytest.mark.parametrize("seed", range(N_DRAWS))
def test_multi_output_gram_contracts(seed):
    rng = np.random.RandomState(100 + seed)
    O = int(rng.randint(2, 4))
    counts = tuple(int(c) for c in rng.randint(5, 25, size=O))
    x = np.sort(rng.uniform(0, 8, sum(counts)))
    X = jnp.asarray(np.column_stack([np.repeat(np.arange(O), counts), x]))
    k = _rand_mo_kernel(rng, O)

    K = np.asarray(k.K(X))
    np.testing.assert_allclose(K, K.T, rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(np.diag(K), np.asarray(k.K_diag(X)),
                               rtol=1e-8, atol=1e-9)
    lam = np.linalg.eigvalsh(K)
    assert lam.min() >= -1e-8 * max(lam.max(), 1.0), \
        "%s not PSD (seed %d): eigmin %g" % (k.name(), seed, lam.min())

    # channel-block engine parity on the sorted layout
    if hasattr(k, "K_sorted"):
        old = gpr.config.pallas
        try:
            gpr.use_pallas(True)
            jax.clear_caches()
            Ks = np.asarray(k.K_sorted(X, counts))
        finally:
            gpr.config.pallas = old
            gpr.config.bump()
            jax.clear_caches()
        np.testing.assert_allclose(Ks, K, rtol=1e-8, atol=1e-9,
                                   err_msg="K_sorted parity: %s" % k.name())
