"""Kernel base classes and compositors.

Capability parity with mogptk/gpr/kernel.py (Kernel 5-191, Kernels 193-230,
Add/Mul/Mixture/ARD/ChangePoints 232-377, MultiOutputKernel 381-520), designed
TPU-first:

- `K(X1, X2)` is pure jnp: static shapes, no in-place writes, fully traceable.
- MultiOutputKernel drops the reference's per-channel-pair Python loop with
  boolean-mask indexing (gpr/kernel.py:446-481) — that formulation has
  data-dependent shapes and cannot be compiled by XLA. Instead subclasses
  implement `K_mo(c1, x1, c2, x2)` using per-point parameter gathers +
  broadcast arithmetic so the whole N×M Gram is one fused elementwise pass.
  A generic fallback evaluates `Ksub` for all channel pairs and combines with
  one-hot masks (exact for any Ksub, costs O× more FLOPs on the cheap VPU
  path; closed-form kernels override `K_mo` and pay no overhead).
"""
import copy
import numpy as np
import jax.numpy as jnp

from .module import Module
from .parameter import Parameter
from .config import config


class Kernel(Module):
    """Base kernel (reference: mogptk/gpr/kernel.py:5-191).

    Args:
        input_dims (int): Number of input dimensions.
        active_dims (list of int): Indices of active dimensions.
    """

    def __init__(self, input_dims=None, active_dims=None):
        super().__init__()
        self.input_dims = input_dims
        self.active_dims = active_dims  # property setter validates
        self.output_dims = None

    def __call__(self, X1, X2=None):
        X1, X2 = self._check_input(X1, X2)
        return self.K(X1, X2)

    @property
    def active_dims(self):
        return self._active_dims

    @active_dims.setter
    def active_dims(self, active_dims):
        if active_dims is not None:
            if not isinstance(active_dims, list):
                active_dims = [active_dims]
            if not all(isinstance(item, (int, np.integer)) for item in active_dims):
                raise ValueError("active dimensions must be a list of integers")
            active_dims = np.asarray(active_dims, dtype=np.int32)
            if self.input_dims is not None and self.input_dims != active_dims.shape[0]:
                raise ValueError("input dimensions must match the number of active dimensions")
            self.input_dims = int(active_dims.shape[0])
        object.__setattr__(self, "_active_dims", active_dims)

    def set_active_dims(self, active_dims):
        self.active_dims = active_dims

    def _active_input(self, X1, X2=None):
        if self._active_dims is not None:
            X1 = jnp.take(X1, jnp.asarray(self._active_dims), axis=1)
            if X2 is not None:
                X2 = jnp.take(X2, jnp.asarray(self._active_dims), axis=1)
        return X1, X2

    def _check_input(self, X1, X2=None):
        X1 = jnp.asarray(X1, dtype=config.dtype)
        if X1.ndim != 2:
            raise ValueError("X should have two dimensions (data_points,input_dims)")
        if X1.shape[0] == 0 or X1.shape[1] == 0:
            raise ValueError("X must not be empty")
        if X2 is not None:
            X2 = jnp.asarray(X2, dtype=config.dtype)
            if X2.ndim != 2:
                raise ValueError("X should have two dimensions (data_points,input_dims)")
            if X2.shape[0] == 0:
                raise ValueError("X must not be empty")
            if X1.shape[1] != X2.shape[1]:
                raise ValueError("input dimensions for X1 and X2 must match")
        return X1, X2

    def _check_kernels(self, kernels, length=None):
        if isinstance(kernels, tuple):
            if len(kernels) == 1 and isinstance(kernels[0], list):
                kernels = kernels[0]
            else:
                kernels = list(kernels)
        elif not isinstance(kernels, list):
            kernels = [kernels]
        if len(kernels) == 0:
            raise ValueError("must pass at least one kernel")
        elif length is not None and len(kernels) != length:
            if len(kernels) != 1:
                raise ValueError("must pass %d kernels" % length)
            for _ in range(length - len(kernels)):
                kernels.append(kernels[0].clone())
        for kernel in kernels:
            if not issubclass(type(kernel), Kernel):
                raise ValueError("must pass kernels")
        if any(kernel.input_dims != kernels[0].input_dims for kernel in kernels[1:]):
            raise ValueError("kernels must have same input dimensions")
        output_dims = [kernel.output_dims for kernel in kernels if kernel.output_dims is not None]
        if any(output_dim != output_dims[0] for output_dim in output_dims[1:]):
            raise ValueError("multi-output kernels must have same output dimensions")
        if len(output_dims) != 0:
            # single-output subkernels of a multi-output composite skip the
            # channel-ID column (reference: gpr/kernel.py:105-109)
            for kernel in kernels:
                if kernel.active_dims is None and kernel.output_dims is None:
                    input_dims = kernel.input_dims if kernel.input_dims is not None else 1
                    kernel.active_dims = [input_dim + 1 for input_dim in range(input_dims)]
        return kernels

    def clone(self):
        return copy.deepcopy(self)

    def iterkernels(self):
        yield self

    def K(self, X1, X2=None):
        raise NotImplementedError()

    def K_diag(self, X1):
        return jnp.diagonal(self.K(X1))

    @staticmethod
    def average(X1, X2=None):
        if X2 is None:
            X2 = X1
        return 0.5 * (X1[:, None, :] + X2[None, :, :])

    @staticmethod
    def distance(X1, X2=None):
        if X2 is None:
            X2 = X1
        return X1[:, None, :] - X2[None, :, :]

    @staticmethod
    def squared_distance(X1, X2=None):
        if X2 is None:
            X2 = X1
        return (X1[:, None, :] - X2[None, :, :]) ** 2

    def __add__(self, other):
        return AddKernel(self, other)

    def __mul__(self, other):
        return MulKernel(self, other)


class Kernels(Kernel):
    """Base for kernels composed of a list of kernels
    (reference: mogptk/gpr/kernel.py:193-230)."""

    # associativity class: "sum"/"prod" compositors may be flattened into a
    # like-kind parent; None (e.g. ChangePoints, whose per-kernel regime
    # weights depend on the nesting) must never be
    _assoc = None

    def __init__(self, *kernels):
        super().__init__()
        kernels = self._check_kernels(kernels)
        # flatten nested ASSOCIATIVE compositors of the same kind (an
        # isinstance check against self.__class__ used to flatten a nested
        # ChangePointsKernel, dropping its locations/steepness)
        i = 0
        while i < len(kernels):
            if (self._assoc is not None
                    and getattr(kernels[i], "_assoc", None) == self._assoc
                    and kernels[i].active_dims is None):
                subkernels = list(kernels[i].kernels)
                kernels = kernels[:i] + subkernels + kernels[i + 1:]
                i += len(subkernels) - 1
            i += 1
        self.kernels = list(kernels)
        self.input_dims = kernels[0].input_dims
        output_dims = [kernel.output_dims for kernel in kernels if kernel.output_dims is not None]
        self.output_dims = output_dims[0] if output_dims else None

    def name(self):
        return "[%s]" % ",".join(kernel.name() for kernel in self.kernels)

    def __getitem__(self, key):
        return self.kernels[key]

    def iterkernels(self):
        yield self
        for kernel in self.kernels:
            yield from kernel.iterkernels()


class AddKernel(Kernels):
    """Sum of kernels (reference: mogptk/gpr/kernel.py:232-246)."""

    _assoc = "sum"

    def K(self, X1, X2=None):
        # apply the compositor's OWN active_dims (e.g. the channel-column
        # skip _check_kernels installs on a nested single-output compositor
        # under a multi-output composite) before fanning out
        X1, X2 = self._active_input(X1, X2)
        return sum(kernel.K(X1, X2) for kernel in self.kernels)

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        return sum(kernel.K_diag(X1) for kernel in self.kernels)


class MulKernel(Kernels):
    """Product of kernels (reference: mogptk/gpr/kernel.py:248-262)."""

    _assoc = "prod"

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        out = None
        for kernel in self.kernels:
            k = kernel.K(X1, X2)
            out = k if out is None else out * k
        return out

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        out = None
        for kernel in self.kernels:
            k = kernel.K_diag(X1)
            out = k if out is None else out * k
        return out


class MixtureKernel(AddKernel):
    """Sum of Q clones of a kernel (reference: mogptk/gpr/kernel.py:264-276)."""

    def __init__(self, kernel, Q):
        if not issubclass(type(kernel), Kernel):
            raise ValueError("must pass kernel")
        kernels = self._check_kernels(kernel, Q)
        super().__init__(*kernels)


class AutomaticRelevanceDeterminationKernel(MulKernel):
    """Per-input-dimension product of kernel clones
    (reference: mogptk/gpr/kernel.py:278-292)."""

    def __init__(self, kernel, input_dims):
        if not issubclass(type(kernel), Kernel):
            raise ValueError("must pass kernel")
        kernels = self._check_kernels(kernel, input_dims)
        for i, k in enumerate(kernels):
            k.set_active_dims(i)
        super().__init__(*kernels)


class ChangePointsKernel(Kernels):
    """Sigmoid-weighted regime-switching kernel over a 1-D input domain
    (reference: mogptk/gpr/kernel.py:294-377)."""

    def __init__(self, locations, steepnesses=1.0, *kernels):
        if not isinstance(locations, list):
            locations = [locations]
        if len(kernels) != len(locations) + 1:
            raise ValueError(
                "Must pass one more kernel than the number of locations points. "
                "Got %d kernels and %d locations points." % (len(kernels), len(locations)))
        if isinstance(steepnesses, list) and len(steepnesses) > 1:
            if len(locations) != len(steepnesses):
                raise ValueError(
                    "Must pass as many locations as steepness point(s). "
                    "Got %d locations and %d steepness points." % (len(locations), len(steepnesses)))
        if list(locations) != sorted(locations):
            raise ValueError("'locations' must be sorted ascendingly and 'steepnesses' should be ordered correspondingly.")
        super().__init__(*kernels)

        if self.input_dims != 1:
            raise ValueError("Must pass kernels defined over a 1D input domain.")

        self.locations = Parameter(locations)
        self.steepness = Parameter(steepnesses, lower=config.positive_minimum)

    def _weight_sigmoid(self, X):
        return 1.0 / (1.0 + jnp.exp(-self.steepness() * (X - self.locations())))

    def K(self, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        N1 = X1.shape[0]
        weights_x1 = self._weight_sigmoid(X1)  # N1 x Ncp
        if X2 is None:
            weights_x2 = weights_x1
            N2 = N1
            X2K = None
        else:
            weights_x2 = self._weight_sigmoid(X2)
            N2 = X2.shape[0]
            X2K = X2

        w1 = weights_x1[:, None, :]   # N1 x 1 x Ncp
        w2 = weights_x2[None, :, :]   # 1 x N2 x Ncp
        start_weights = w1 * w2
        end_weights = (1.0 - w1) * (1.0 - w2)

        ones = jnp.ones((N1, N2, 1), dtype=config.dtype)
        start_weights = jnp.concatenate((ones, start_weights), axis=-1)
        end_weights = jnp.concatenate((end_weights, ones), axis=-1)

        kernel_stack = jnp.stack([kernel.K(X1, X2K) for kernel in self.kernels], axis=-1)
        return jnp.sum(start_weights * kernel_stack * end_weights, axis=-1)

    def K_diag(self, X1):
        X1, _ = self._active_input(X1)
        N1 = X1.shape[0]
        weights_x1 = self._weight_sigmoid(X1)
        ones = jnp.ones((N1, 1), dtype=config.dtype)
        start_weights = jnp.concatenate((ones, weights_x1 ** 2), axis=-1)
        end_weights = jnp.concatenate(((1.0 - weights_x1) ** 2, ones), axis=-1)
        kernel_stack = jnp.stack([kernel.K_diag(X1) for kernel in self.kernels], axis=-1)
        return jnp.sum(start_weights * kernel_stack * end_weights, axis=-1)


class MultiOutputKernel(Kernel):
    """Base for multi-output kernels where column 0 of X holds channel IDs
    (reference: mogptk/gpr/kernel.py:381-520).

    TPU-native design: `K` calls `K_mo(c1, x1, c2, x2)` with integer channel
    vectors and channel-stripped inputs. Closed-form subclasses implement
    `K_mo` with per-point parameter gathers (no dynamic shapes, single fused
    pass). Subclasses that only define the per-pair `Ksub` get the generic
    one-hot combination fallback, which is exact but evaluates each pair over
    the full input — acceptable for small numbers of channels.
    """

    def __init__(self, output_dims, input_dims=None, active_dims=None):
        super().__init__(input_dims, active_dims)
        self.output_dims = output_dims

    def _check_input(self, X1, X2=None):
        X1, X2 = super()._check_input(X1, X2)
        # both bounds: a negative ID would silently gather the LAST channel's
        # parameters through JAX's negative indexing
        def _bad(c):
            return (not np.all(c == c.astype(np.int64))
                    or not np.all((0 <= c) & (c < self.output_dims)))

        if _bad(np.asarray(X1[:, 0])):
            raise ValueError("X must have integers in [0, output_dims) for the channel IDs in the first input dimension")
        if X2 is not None and _bad(np.asarray(X2[:, 0])):
            raise ValueError("X must have integers in [0, output_dims) for the channel IDs in the first input dimension")
        return X1, X2

    def _split(self, X):
        c = X[:, 0].astype(jnp.int32)
        return c, X[:, 1:]

    def K(self, X1, X2=None):
        c1, x1 = self._split(X1)
        if X2 is None:
            c2, x2 = c1, None
        else:
            c2, x2 = self._split(X2)
        return self.K_mo(c1, x1, c2, x2)

    def K_diag(self, X1):
        c1, x1 = self._split(X1)
        return self.K_mo_diag(c1, x1)

    def K_mo(self, c1, x1, c2, x2=None):
        """Full Gram over points with channels c1/c2; x2 None means x2 = x1.

        Generic fallback: evaluate Ksub for every channel pair over the full
        inputs and combine with one-hot channel masks. Exact for any Ksub.
        """
        x2e = x1 if x2 is None else x2
        O = self.output_dims
        onehot1 = (c1[:, None] == jnp.arange(O)[None, :]).astype(config.dtype)  # N x O
        onehot2 = (c2[:, None] == jnp.arange(O)[None, :]).astype(config.dtype)  # M x O
        out = jnp.zeros((x1.shape[0], x2e.shape[0]), dtype=config.dtype)
        for i in range(O):
            for j in range(O):
                if x2 is None and j > i:
                    continue
                kij = self.Ksub(i, j, x1, x2e)
                block = onehot1[:, i:i + 1] * kij * onehot2[:, j][None, :]
                out = out + block
                if x2 is None and j < i:
                    out = out + (onehot1[:, j:j + 1] * kij.T * onehot2[:, i][None, :])
        return out

    def K_mo_diag(self, c1, x1):
        O = self.output_dims
        onehot1 = (c1[:, None] == jnp.arange(O)[None, :]).astype(config.dtype)
        out = jnp.zeros((x1.shape[0],), dtype=config.dtype)
        for i in range(O):
            out = out + onehot1[:, i] * self.Ksub_diag(i, x1)
        return out

    def Ksub(self, i, j, X1, X2=None):
        """Kernel matrix between channels i and j
        (reference: mogptk/gpr/kernel.py:497-508)."""
        raise NotImplementedError()

    def Ksub_diag(self, i, X1):
        return jnp.diagonal(self.Ksub(i, i, X1))
