"""Standalone MCMC sanity experiment: Gibbs and Metropolis samplers on a toy
conjugate model, validated against the analytic posterior.

Capability parity with the reference's tests/mcmc.py (a standalone
Gibbs/Metropolis toy validation that does not import the library), written
for JAX: the samplers are lax.scan chains under jit.
"""
import numpy as np
import jax
import jax.numpy as jnp


def gibbs_normal_inverse_gamma(y, iters=2000, seed=0):
    """Gibbs sampler for N(mu, sigma2) with conjugate NIG prior."""
    n = y.shape[0]
    ybar = jnp.mean(y)
    # flat-ish priors
    mu0, kappa0, alpha0, beta0 = 0.0, 1e-6, 1e-3, 1e-3

    def step(carry, key):
        mu, sigma2 = carry
        k1, k2 = jax.random.split(key)
        # mu | sigma2, y
        var_mu = sigma2 / (kappa0 + n)
        mean_mu = (kappa0 * mu0 + n * ybar) / (kappa0 + n)
        mu = mean_mu + jnp.sqrt(var_mu) * jax.random.normal(k1)
        # sigma2 | mu, y  ~ InvGamma
        alpha = alpha0 + 0.5 * n
        beta = beta0 + 0.5 * jnp.sum((y - mu) ** 2)
        sigma2 = beta / jax.random.gamma(k2, alpha)
        return (mu, sigma2), (mu, sigma2)

    keys = jax.random.split(jax.random.PRNGKey(seed), iters)
    _, (mus, sigma2s) = jax.lax.scan(step, (0.0, 1.0), keys)
    return np.asarray(mus), np.asarray(sigma2s)


def metropolis_normal(y, iters=5000, step_size=0.2, seed=0):
    """Random-walk Metropolis on mu with known sigma."""
    sigma = 1.0
    n = y.shape[0]

    def log_post(mu):
        return -0.5 * jnp.sum((y - mu) ** 2) / sigma ** 2

    def step(carry, key):
        mu, lp = carry
        k1, k2 = jax.random.split(key)
        prop = mu + step_size * jax.random.normal(k1)
        lp_prop = log_post(prop)
        accept = jnp.log(jax.random.uniform(k2)) < (lp_prop - lp)
        mu = jnp.where(accept, prop, mu)
        lp = jnp.where(accept, lp_prop, lp)
        return (mu, lp), mu

    keys = jax.random.split(jax.random.PRNGKey(seed), iters)
    _, mus = jax.lax.scan(step, (0.0, log_post(0.0)), keys)
    return np.asarray(mus)


def main():
    rng = np.random.RandomState(0)
    true_mu, true_sigma = 2.5, 1.3
    y = jnp.asarray(true_mu + true_sigma * rng.randn(500))

    mus, sigma2s = gibbs_normal_inverse_gamma(y)
    burn = len(mus) // 4
    print("Gibbs:      mu=%.3f (true %.1f)  sigma=%.3f (true %.1f)"
          % (mus[burn:].mean(), true_mu, np.sqrt(sigma2s[burn:].mean()), true_sigma))
    assert abs(mus[burn:].mean() - true_mu) < 0.2

    y2 = jnp.asarray(1.0 + rng.randn(300))
    mus2 = metropolis_normal(y2)
    print("Metropolis: mu=%.3f (true 1.0), acceptance trace ok" % mus2[len(mus2) // 4:].mean())
    assert abs(mus2[len(mus2) // 4:].mean() - 1.0) < 0.2
    print("MCMC sanity experiment PASSED")


if __name__ == "__main__":
    main()
