"""Likelihood zoo with Gauss-Hermite quadrature.

Capability parity with mogptk/gpr/likelihood.py (link functions 5-53,
GaussHermiteQuadrature 65-79, Likelihood 81-222, MultiOutputLikelihood
224-310, and the 12 concrete likelihoods 312-869), redesigned for XLA:

- Quadrature is one batched (N,deg) broadcast + a matvec — no host loops.
- MultiOutputLikelihood replaces the reference's per-channel index_put loops
  (gpr/likelihood.py:265-310) with one-hot masked sums over channels using
  domain-safe dummy substitution, so shapes stay static under jit.
- Sampling uses explicit jax.random keys (the reference used torch's global
  RNG).
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.scipy.special import erf, erfinv, gammaln

from .module import Module
from .parameter import Parameter
from .config import config

_pi = np.pi


# -- link functions (reference: mogptk/gpr/likelihood.py:5-53) ---------------

def identity(x):
    """y = x"""
    return x


def square(x):
    """y = x²"""
    return jnp.square(x)


def _weighted_sum(p, weights):
    """Sum per-point terms p (N,1), optionally scaled by per-point weights
    (N,). Weight 0 nulls a row — used to mask mesh-sharding padding out of
    ELBO sums."""
    if weights is None:
        return jnp.sum(p)
    return jnp.sum(p * weights.reshape(-1, 1))


def exp(x):
    """y = eˣ"""
    return jnp.exp(x)


def probit(x):
    """y = √2 · erf⁻¹(2x−1)"""
    return np.sqrt(2.0) * erfinv(2.0 * x - 1.0)


def inv_probit(x):
    """y = ½(1 + erf(x/√2)), jittered away from {0,1}"""
    jitter = 1e-3
    return 0.5 * (1.0 + erf(x / np.sqrt(2.0))) * (1.0 - 2.0 * jitter) + jitter


def sigmoid(x):
    """y = 1/(1+e⁻ˣ)"""
    return 1.0 / (1.0 + jnp.exp(-x))


class GaussHermiteQuadrature:
    """∫F(f)N(f|μ,σ²)df ≈ Σ_k w_k F(μ + σ t_k), batched over data points
    (reference: mogptk/gpr/likelihood.py:65-79)."""

    def __init__(self, deg=20, t_scale=None, w_scale=None):
        t, w = np.polynomial.hermite.hermgauss(deg)
        if t_scale is not None:
            t = t * t_scale
        if w_scale is not None:
            w = w * w_scale
        self._t = t
        self._w = w
        self.deg = deg

    def __call__(self, mu, var, F):
        t = jnp.asarray(self._t, dtype=config.dtype).reshape(1, -1)  # 1xdeg
        w = jnp.asarray(self._w, dtype=config.dtype).reshape(-1, 1)  # degx1
        return F(mu + jnp.sqrt(var) * t) @ w  # Nx1


class Likelihood(Module):
    """Base likelihood (reference: mogptk/gpr/likelihood.py:81-222)."""

    def __init__(self, quadratures=20):
        super().__init__()
        self.quadrature = GaussHermiteQuadrature(deg=quadratures, t_scale=np.sqrt(2), w_scale=1.0 / np.sqrt(np.pi))
        self.output_dims = None

    def validate_y(self, X, y):
        pass

    def log_prob(self, X, y, f):
        """log p(y|f); y is (N,1), f is (N,deg) → (N,deg)."""
        raise NotImplementedError()

    def variational_expectation(self, X, y, mu, var, weights=None):
        """∫ log p(y|f) q(f) df with q = N(mu, var), via GH quadrature
        (reference: gpr/likelihood.py:141-159). `weights` is an optional
        per-point (N,) weight/mask vector — padded rows under mesh sharding
        carry weight 0 so they drop out of the ELBO sum."""
        q = self.quadrature(mu, var, lambda f: self.log_prob(X, y, f))
        return _weighted_sum(q, weights)

    def conditional_mean(self, X, f):
        raise NotImplementedError()

    def conditional_sample(self, X, f, key=None):
        """Sample y ~ p(y|f); f is (n,N,1) or (N,deg)."""
        raise NotImplementedError()

    def predict(self, X, mu, var, ci=None, sigma=None, n=10000, key=None):
        """Predictive mean and optional CI quantiles via MC sampling
        (reference: gpr/likelihood.py:188-222)."""
        mean = self.quadrature(mu, var, lambda f: self.conditional_mean(X, f))
        if ci is None:
            return mean

        if key is None:
            key = config.next_key()
        k1, k2 = jax.random.split(key)
        samples_f = mu[None, :, :] + jnp.sqrt(var)[None, :, :] * jax.random.normal(k1, (n,) + mu.shape, dtype=config.dtype)
        samples_y = self.conditional_sample(X, samples_f, key=k2)  # nxNx1
        if samples_y is None:
            return mean, mean, mean
        samples_y = jnp.sort(samples_y, axis=0)
        lower = int(ci[0] * n + 0.5)
        upper = int(ci[1] * n + 0.5)
        return mean, samples_y[lower, :], samples_y[upper, :]


class MultiOutputLikelihood(Likelihood):
    """Different likelihood per channel; column 0 of X holds channel IDs
    (reference: mogptk/gpr/likelihood.py:224-310).

    All channel likelihoods are evaluated over the full batch on domain-safe
    substituted values, then combined with one-hot masks — static shapes, no
    scatter, jit-safe.
    """

    _SAFE_Y = 0.5  # inside the support of every concrete likelihood

    def __init__(self, *likelihoods):
        super().__init__()
        if isinstance(likelihoods, tuple):
            if len(likelihoods) == 1 and isinstance(likelihoods[0], list):
                likelihoods = likelihoods[0]
            else:
                likelihoods = list(likelihoods)
        elif not isinstance(likelihoods, list):
            likelihoods = [likelihoods]
        if len(likelihoods) == 0:
            raise ValueError("must pass at least one likelihood")
        for likelihood in likelihoods:
            if not issubclass(type(likelihood), Likelihood):
                raise ValueError("must pass likelihoods")
            elif isinstance(likelihood, MultiOutputLikelihood):
                raise ValueError("can not nest MultiOutputLikelihoods")
        self.output_dims = len(likelihoods)
        self.likelihoods = list(likelihoods)

    def name(self):
        return "[%s]" % ",".join(likelihood.name() for likelihood in self.likelihoods)

    def _channel_masks(self, X):
        c = X[:, 0].astype(jnp.int32)
        return [(c == i) for i in range(self.output_dims)]

    def validate_y(self, X, y):
        if self.output_dims == 1:
            self.likelihoods[0].validate_y(X, y)
            return
        c = np.asarray(X[:, 0]).astype(np.int64)
        y_np = np.asarray(y)
        for i in range(self.output_dims):
            self.likelihoods[i].validate_y(X, y_np[c == i, :])

    def log_prob(self, X, y, f):
        masks = self._channel_masks(X)
        out = jnp.zeros(jnp.broadcast_shapes(y.shape, f.shape), dtype=config.dtype)
        for i in range(self.output_dims):
            m = masks[i][:, None]
            y_safe = jnp.where(m, y, self._SAFE_Y)
            out = out + jnp.where(m, self.likelihoods[i].log_prob(X, y_safe, f), 0.0)
        return out

    def variational_expectation(self, X, y, mu, var, weights=None):
        masks = self._channel_masks(X)
        total = jnp.zeros((), dtype=config.dtype)
        for i in range(self.output_dims):
            m = masks[i][:, None]
            y_safe = jnp.where(m, y, self._SAFE_Y)
            q = self.likelihoods[i].quadrature(mu, var, lambda f: self.likelihoods[i].log_prob(X, y_safe, f))
            total = total + _weighted_sum(jnp.where(m, q, 0.0), weights)
        return total

    def conditional_mean(self, X, f):
        masks = self._channel_masks(X)
        out = jnp.zeros(f.shape, dtype=config.dtype)
        for i in range(self.output_dims):
            m = masks[i][:, None]
            out = out + jnp.where(m, self.likelihoods[i].conditional_mean(X, f), 0.0)
        return out

    def conditional_sample(self, X, f, key=None):
        if key is None:
            key = config.next_key()
        masks = self._channel_masks(X)
        out = jnp.zeros(f.shape, dtype=config.dtype)
        for i in range(self.output_dims):
            key, sub = jax.random.split(key)
            s = self.likelihoods[i].conditional_sample(X, f, key=sub)
            if s is None:
                # a channel that cannot sample y|f (e.g. Bernoulli) makes
                # the whole multi-output sample undefined — signal None like
                # the single-output protocol instead of leaking latent f
                # values as y samples
                return None
            # f carries the data axis SECOND for ndim >= 2 ((S, N) from
            # sample_y, (S, N, 1) from the MC predict path)
            m = (masks[i][None, :, None] if f.ndim == 3
                 else masks[i][None, :] if f.ndim == 2 else masks[i])
            out = out + jnp.where(m, s, 0.0)
        return out

    def predict(self, X, mu, var, ci=None, sigma=None, n=10000, key=None):
        masks = self._channel_masks(X)
        if ci is None:
            out = jnp.zeros(mu.shape, dtype=config.dtype)
            for i in range(self.output_dims):
                m = masks[i][:, None]
                # mean only: force sigma=None — a Gaussian sub-likelihood
                # with sigma set returns a (mu, lo, up) tuple that cannot be
                # masked elementwise (Model.predict_y converts sigma -> ci
                # before it reaches here; bounds need the ci branch)
                p = self.likelihoods[i].predict(X, mu, var, ci=None,
                                                sigma=None, n=n, key=key)
                out = out + jnp.where(m, p, 0.0)
            return out
        mean = jnp.zeros(mu.shape, dtype=config.dtype)
        lower = jnp.zeros(mu.shape, dtype=config.dtype)
        upper = jnp.zeros(mu.shape, dtype=config.dtype)
        if key is None:
            key = config.next_key()
        for i in range(self.output_dims):
            key, sub = jax.random.split(key)
            m = masks[i][:, None]
            p, lo, up = self.likelihoods[i].predict(X, mu, var, ci=ci, sigma=sigma, n=n, key=sub)
            mean = mean + jnp.where(m, p, 0.0)
            lower = lower + jnp.where(m, lo, 0.0)
            upper = upper + jnp.where(m, up, 0.0)
        return mean, lower, upper


class GaussianLikelihood(Likelihood):
    """p(y|f) = N(y|f, σ²) with closed-form variational expectation and CI
    (reference: mogptk/gpr/likelihood.py:312-378)."""

    def __init__(self, scale=1.0):
        super().__init__()
        self.scale = Parameter(scale, lower=config.positive_minimum)
        if self.scale.ndim == 1:
            self.output_dims = self.scale.shape[0]

    def _scale_per_point(self, X, like=None, n_axis=0):
        """Per-point noise scale, shaped to broadcast against `like` with the
        data axis at `n_axis` (f is (N,deg) in log_prob, (S,N[,1]) in
        conditional_sample)."""
        s = self.scale()
        if self.output_dims is None or s.ndim != 1:
            return s
        s = s[X[:, 0].astype(jnp.int32)]  # N
        if like is None:
            return s[:, None]
        shape = [1] * like.ndim
        shape[n_axis] = X.shape[0]
        return s.reshape(shape)

    def log_prob(self, X, y, f):
        s = self._scale_per_point(X)
        return -0.5 * (np.log(2.0 * _pi) + 2.0 * jnp.log(s) + ((y - f) / s) ** 2)

    def variational_expectation(self, X, y, mu, var, weights=None):
        # closed form (reference: gpr/likelihood.py:338-343)
        s2 = self._scale_per_point(X) ** 2
        p = -((y - mu) ** 2 + var) / s2
        p = p - np.log(2.0 * _pi) - jnp.log(s2)
        return 0.5 * _weighted_sum(p, weights)

    def conditional_mean(self, X, f):
        return f

    def conditional_sample(self, X, f, key=None):
        if key is None:
            key = config.next_key()
        # conditional_sample's f always carries the data axis SECOND when
        # ndim >= 2 ((S, N) / (S, N, 1)); a value-based heuristic misfired
        # when the sample count happened to equal N
        n_axis = 1 if f.ndim >= 2 else 0
        s = self._scale_per_point(X, like=f, n_axis=n_axis)
        return f + s * jax.random.normal(key, f.shape, dtype=config.dtype)

    def predict(self, X, mu, var, ci=None, sigma=None, n=10000, key=None):
        if ci is None and sigma is None:
            return mu
        s = self._scale_per_point(X)
        var_y = var + s ** 2
        if sigma is None:
            lo = mu + jnp.sqrt(2.0 * var_y) * erfinv(2.0 * ci[0] - 1.0)
            up = mu + jnp.sqrt(2.0 * var_y) * erfinv(2.0 * ci[1] - 1.0)
        else:
            lo = mu - sigma * jnp.sqrt(var_y)
            up = mu + sigma * jnp.sqrt(var_y)
        return mu, lo, up


class StudentTLikelihood(Likelihood):
    """Student's t likelihood (reference: mogptk/gpr/likelihood.py:380-418)."""

    def __init__(self, dof=3, scale=1.0, quadratures=20):
        super().__init__(quadratures)
        self.dof = float(dof)
        self.scale = Parameter(scale, lower=config.positive_minimum)

    def log_prob(self, X, y, f):
        s = self.scale()
        p = -0.5 * (self.dof + 1.0) * jnp.log1p(((y - f) / s) ** 2 / self.dof)
        p += gammaln((self.dof + 1.0) / 2.0) - gammaln(self.dof / 2.0)
        p -= 0.5 * (np.log(self.dof) + np.log(_pi)) + jnp.log(s)
        return p

    def conditional_mean(self, X, f):
        if self.dof <= 1.0:
            return jnp.full(f.shape, np.nan, dtype=config.dtype)
        return f

    def conditional_sample(self, X, f, key=None):
        if key is None:
            key = config.next_key()
        return f + self.scale() * jax.random.t(key, self.dof, f.shape, dtype=config.dtype)


class ExponentialLikelihood(Likelihood):
    """p(y|f) = Exp(y | rate=1/h(f)) (reference: mogptk/gpr/likelihood.py:420-466)."""

    def __init__(self, link=exp, quadratures=20):
        super().__init__(quadratures)
        self.link = link

    def validate_y(self, X, y):
        if np.any(np.asarray(y) < 0.0):
            raise ValueError("y must be positive")

    def log_prob(self, X, y, f):
        if self.link is exp:
            return -y / self.link(f) - f
        return -y / self.link(f) - jnp.log(self.link(f))

    def variational_expectation(self, X, y, mu, var, weights=None):
        if self.link is not exp:
            return super().variational_expectation(X, y, mu, var, weights)
        p = -mu - y * jnp.exp(var / 2.0 - mu)
        return _weighted_sum(p, weights)

    def conditional_mean(self, X, f):
        return self.link(f)

    def conditional_sample(self, X, f, key=None):
        if self.link is not exp:
            raise ValueError("only exponential link function is supported")
        if key is None:
            key = config.next_key()
        return self.link(f) * jax.random.exponential(key, f.shape, dtype=config.dtype)


class LaplaceLikelihood(Likelihood):
    """Laplace likelihood (reference: mogptk/gpr/likelihood.py:468-506)."""

    def __init__(self, scale=1.0, quadratures=20):
        super().__init__(quadratures)
        self.scale = Parameter(scale, lower=config.positive_minimum)

    def log_prob(self, X, y, f):
        return -jnp.log(2.0 * self.scale()) - jnp.abs(y - f) / self.scale()

    def conditional_mean(self, X, f):
        return f

    def conditional_sample(self, X, f, key=None):
        if key is None:
            key = config.next_key()
        return f + self.scale() * jax.random.laplace(key, f.shape, dtype=config.dtype)


class BernoulliLikelihood(Likelihood):
    """Bernoulli likelihood with probit closed-form prediction
    (reference: mogptk/gpr/likelihood.py:508-547)."""

    def __init__(self, link=inv_probit):
        super().__init__()
        self.link = link

    def validate_y(self, X, y):
        y = np.asarray(y)
        if np.any((y != 0.0) & (y != 1.0)):
            raise ValueError("y must have only 0.0 and 1.0 values")

    def log_prob(self, X, y, f):
        p = self.link(f)
        return jnp.log(jnp.where(0.5 <= y, p, 1.0 - p))

    def conditional_mean(self, X, f):
        return self.link(f)

    def conditional_sample(self, X, f, key=None):
        return None

    def predict(self, X, mu, var, ci=None, sigma=None, n=10000, key=None):
        if self.link is not inv_probit:
            return super().predict(X, mu, var, ci=ci, sigma=sigma, n=n, key=key)
        p = self.link(mu / jnp.sqrt(1.0 + var))
        if ci is None and sigma is None:
            return p
        return p, p, p


class BetaLikelihood(Likelihood):
    """Beta likelihood (reference: mogptk/gpr/likelihood.py:549-597)."""

    def __init__(self, scale=1.0, link=inv_probit, quadratures=20):
        super().__init__(quadratures)
        self.link = link
        self.scale = Parameter(scale, lower=config.positive_minimum)

    def validate_y(self, X, y):
        y = np.asarray(y)
        if np.any((y <= 0.0) | (1.0 <= y)):
            raise ValueError("y must be in the range (0.0,1.0)")

    def log_prob(self, X, y, f):
        mixture = self.link(f)
        alpha = mixture * self.scale()
        beta = self.scale() - alpha
        p = (alpha - 1.0) * jnp.log(y)
        p += (beta - 1.0) * jnp.log1p(-y)
        p += gammaln(alpha + beta) - gammaln(alpha) - gammaln(beta)
        return p

    def conditional_mean(self, X, f):
        return self.link(f)

    def conditional_sample(self, X, f, key=None):
        if self.link is not inv_probit:
            raise ValueError("only inverse probit link function is supported")
        if key is None:
            key = config.next_key()
        mixture = self.link(f)
        alpha = mixture * self.scale()
        beta = self.scale() - alpha
        return jax.random.beta(key, alpha, beta, f.shape, dtype=config.dtype)


class GammaLikelihood(Likelihood):
    """Gamma likelihood (reference: mogptk/gpr/likelihood.py:599-654)."""

    def __init__(self, shape=1.0, link=exp, quadratures=20):
        super().__init__(quadratures)
        self.link = link
        self.shape = Parameter(shape, lower=config.positive_minimum)

    def validate_y(self, X, y):
        if np.any(np.asarray(y) <= 0.0):
            raise ValueError("y must be in the range (0.0,inf)")

    def log_prob(self, X, y, f):
        p = -y / self.link(f)
        p += (self.shape() - 1.0) * jnp.log(y)
        p -= gammaln(self.shape())
        if self.link is exp:
            p -= self.shape() * f
        else:
            p -= self.shape() * jnp.log(self.link(f))
        return p

    def variational_expectation(self, X, y, mu, var, weights=None):
        if self.link is not exp:
            return super().variational_expectation(X, y, mu, var, weights)
        p = -self.shape() * mu
        p -= gammaln(self.shape())
        p += (self.shape() - 1.0) * jnp.log(y)
        p -= y * jnp.exp(var / 2.0 - mu)
        return _weighted_sum(p, weights)

    def conditional_mean(self, X, f):
        return self.shape() * self.link(f)

    def conditional_sample(self, X, f, key=None):
        if self.link is not exp:
            raise ValueError("only exponential link function is supported")
        if key is None:
            key = config.next_key()
        return self.link(f) * jax.random.gamma(key, self.shape(), f.shape, dtype=config.dtype)


class PoissonLikelihood(Likelihood):
    """Poisson likelihood (reference: mogptk/gpr/likelihood.py:656-704)."""

    def __init__(self, link=exp, quadratures=20):
        super().__init__(quadratures)
        self.link = link

    def validate_y(self, X, y):
        y = np.asarray(y)
        if np.any(y < 0.0):
            raise ValueError("y must be in the range [0.0,inf)")
        if not np.all(y == y.astype(np.int64)):
            raise ValueError("y must have integer count values")

    def log_prob(self, X, y, f):
        if self.link is exp:
            p = y * f
        else:
            p = y * jnp.log(self.link(f))
        p -= gammaln(y + 1.0)
        p -= self.link(f)
        return p

    def variational_expectation(self, X, y, mu, var, weights=None):
        if self.link is not exp:
            return super().variational_expectation(X, y, mu, var, weights)
        p = y * mu - jnp.exp(var / 2.0 + mu) - gammaln(y + 1.0)
        return _weighted_sum(p, weights)

    def conditional_mean(self, X, f):
        return self.link(f)

    def conditional_sample(self, X, f, key=None):
        if self.link is not exp:
            raise ValueError("only exponential link function is supported")
        if key is None:
            key = config.next_key()
        return jax.random.poisson(key, self.link(f), f.shape).astype(config.dtype)


class WeibullLikelihood(Likelihood):
    """Weibull likelihood (reference: mogptk/gpr/likelihood.py:706-749)."""

    def __init__(self, shape=1.0, link=exp, quadratures=20):
        super().__init__(quadratures)
        self.link = link
        self.shape = Parameter(shape, lower=config.positive_minimum)

    def validate_y(self, X, y):
        if np.any(np.asarray(y) <= 0.0):
            raise ValueError("y must be in the range (0.0,inf)")

    def log_prob(self, X, y, f):
        if self.link is exp:
            p = -self.shape() * f
        else:
            p = -self.shape() * jnp.log(self.link(f))
        p += jnp.log(self.shape()) + (self.shape() - 1.0) * jnp.log(y)
        p -= (y / self.link(f)) ** self.shape()
        return p

    def conditional_mean(self, X, f):
        return self.link(f) * jnp.exp(gammaln(1.0 + 1.0 / self.shape()))

    def conditional_sample(self, X, f, key=None):
        if self.link is not exp:
            raise ValueError("only exponential link function is supported")
        if key is None:
            key = config.next_key()
        u = jax.random.uniform(key, f.shape, dtype=config.dtype, minval=1e-12, maxval=1.0)
        return self.link(f) * (-jnp.log(u)) ** (1.0 / self.shape())


class LogLogisticLikelihood(Likelihood):
    """Log-logistic likelihood (reference: mogptk/gpr/likelihood.py:751-794)."""

    def __init__(self, shape=1.0, link=exp, quadratures=20):
        super().__init__(quadratures)
        self.link = link
        self.shape = Parameter(shape, lower=config.positive_minimum)

    def validate_y(self, X, y):
        if np.any(np.asarray(y) < 0.0):
            raise ValueError("y must be in the range [0.0,inf)")

    def log_prob(self, X, y, f):
        if self.link is exp:
            p = -self.shape() * f
        else:
            p = -self.shape() * jnp.log(self.link(f))
        p -= 2.0 * jnp.log1p((y / self.link(f)) ** self.shape())
        p += jnp.log(self.shape())
        p += (self.shape() - 1.0) * jnp.log(y)
        return p

    def conditional_mean(self, X, f):
        return self.link(f) / jnp.sinc(1.0 / self.shape())

    def conditional_sample(self, X, f, key=None):
        if self.link is not exp:
            raise ValueError("only exponential link function is supported")
        if key is None:
            key = config.next_key()
        # log-logistic = exp(logistic(loc=f, scale=1/shape))
        z = jax.random.logistic(key, f.shape, dtype=config.dtype)
        return jnp.exp(f + z / self.shape())


class LogGaussianLikelihood(Likelihood):
    """Log-Gaussian likelihood (reference: mogptk/gpr/likelihood.py:796-834)."""

    def __init__(self, scale=1.0, quadratures=20):
        super().__init__(quadratures)
        self.scale = Parameter(scale, lower=config.positive_minimum)

    def validate_y(self, X, y):
        if np.any(np.asarray(y) <= 0.0):
            raise ValueError("y must be in the range (0.0,inf)")

    def log_prob(self, X, y, f):
        logy = jnp.log(y)
        p = -0.5 * (np.log(2.0 * _pi) + 2.0 * jnp.log(self.scale()) + ((logy - f) / self.scale()) ** 2)
        return p - logy

    def conditional_mean(self, X, f):
        return jnp.exp(f + 0.5 * self.scale() ** 2)

    def conditional_sample(self, X, f, key=None):
        if key is None:
            key = config.next_key()
        return jnp.exp(f + self.scale() * jax.random.normal(key, f.shape, dtype=config.dtype))


class ChiSquaredLikelihood(Likelihood):
    """Chi-squared likelihood (reference: mogptk/gpr/likelihood.py:836-869)."""

    def __init__(self, link=exp, quadratures=20):
        super().__init__(quadratures)
        self.link = link

    def validate_y(self, X, y):
        if np.any(np.asarray(y) <= 0.0):
            raise ValueError("y must be in the range (0.0,inf)")

    def log_prob(self, X, y, f):
        k = self.link(f)
        return -0.5 * k * np.log(2.0) - gammaln(k / 2.0) + (k / 2.0 - 1.0) * jnp.log(y) - 0.5 * y

    def conditional_mean(self, X, f):
        return self.link(f)

    def conditional_sample(self, X, f, key=None):
        if self.link is not exp:
            raise ValueError("only exponential link function is supported")
        if key is None:
            key = config.next_key()
        # Chi2(k) = Gamma(k/2, scale=2)
        return 2.0 * jax.random.gamma(key, self.link(f) / 2.0, f.shape, dtype=config.dtype)
