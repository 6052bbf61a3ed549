"""Trainable mean functions (capability parity with mogptk/gpr/mean.py:4-151).

MultiOutputMean replaces the reference's per-channel boolean-mask scatter
(gpr/mean.py:103-108) with a one-hot weighted sum — static shapes, jit-safe.
"""
import jax.numpy as jnp

from .module import Module
from .parameter import Parameter
from .config import config


class Mean(Module):
    """Base trainable mean function (reference: mogptk/gpr/mean.py:4-63)."""

    def __call__(self, X):
        X = self._check_input(X)
        return self.mean(X)

    def _check_input(self, X):
        X = jnp.asarray(X, dtype=config.dtype)
        if X.ndim != 2:
            raise ValueError("X should have two dimensions (data_points,input_dims)")
        if X.shape[0] == 0 or X.shape[1] == 0:
            raise ValueError("X must not be empty")
        return X

    def mean(self, X):
        raise NotImplementedError()


class MultiOutputMean(Mean):
    """Different mean per channel; column 0 of X holds channel IDs
    (reference: mogptk/gpr/mean.py:65-108)."""

    def __init__(self, *means):
        super().__init__()
        if len(means) == 1 and isinstance(means[0], list):
            means = means[0]
        else:
            means = list(means)
        if len(means) == 0:
            raise ValueError("must pass at least one mean")
        for mean in means:
            if not issubclass(type(mean), Mean):
                raise ValueError("must pass means")
            elif isinstance(mean, MultiOutputMean):
                raise ValueError("can not nest MultiOutputMeans")
        self.output_dims = len(means)
        self.means = list(means)

    def name(self):
        return "[%s]" % ",".join(mean.name() for mean in self.means)

    def mean(self, X):
        # static-shape one-hot combination (the reference's per-channel row
        # gather is dynamic-shape); each sub-mean sees SAFE inputs on
        # foreign rows — its own first row, broadcast — so a mean that is
        # non-finite off its channel's domain (e.g. log) cannot poison other
        # channels through 0·NaN, in either the forward or the VJP
        c = X[:, 0].astype(jnp.int32)
        x = X[:, 1:]
        out = jnp.zeros((X.shape[0], 1), dtype=config.dtype)
        for i in range(self.output_dims):
            sel = (c == i)[:, None]
            anchor = x[jnp.argmax(sel[:, 0])][None, :]
            x_safe = jnp.where(sel, x, anchor)
            mi = self.means[i].mean(x_safe).reshape(-1, 1)
            out = out + jnp.where(sel, mi, jnp.zeros((), config.dtype))
        return out


class ConstantMean(Mean):
    """m(X) = b (reference: mogptk/gpr/mean.py:110-128)."""

    def __init__(self):
        super().__init__()
        self.bias = Parameter(0.0)

    def mean(self, X):
        return jnp.full((X.shape[0], 1), 1.0, dtype=config.dtype) * self.bias()


class LinearMean(Mean):
    """m(X) = aX + b (reference: mogptk/gpr/mean.py:130-151)."""

    def __init__(self, input_dims=1):
        super().__init__()
        self.bias = Parameter(0.0)
        self.slope = Parameter(jnp.zeros(input_dims))

    def mean(self, X):
        return self.bias() + X @ self.slope().reshape(-1, 1)
