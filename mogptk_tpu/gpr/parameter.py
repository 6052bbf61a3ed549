"""Constrained trainable parameters as functional pytree leaves.

Re-implements the capability of the reference Parameter
(mogptk/gpr/parameter.py:99-346) for JAX: the parameter stores an
*unconstrained* raw array; the constrained value is computed on read through a
bijector (Softplus for one-sided bounds, Sigmoid for two-sided,
gpr/parameter.py:220-230). Unlike the torch version, the raw value is an
immutable jnp array that can be swapped for a tracer during jit via
Module.bind(), making every model loss a pure function of its parameters.
"""
import copy
import numpy as np
import jax
import jax.numpy as jnp

from .config import config


def to_jnp(value, dtype=None):
    if isinstance(value, Parameter):
        value = value.constrained
    if dtype is None:
        dtype = config.dtype
    return jnp.asarray(value, dtype=dtype)


class Transform:
    """Base bijector between unconstrained and constrained space
    (reference: mogptk/gpr/parameter.py:12-28)."""

    def forward(self, x):
        raise NotImplementedError()

    def inverse(self, y):
        raise NotImplementedError()

    def key(self):
        """Hashable structural identity used for jit-cache invalidation."""
        return (self.__class__.__name__,)


class Softplus(Transform):
    """Softplus bijector for a one-sided bound: y = lower + softplus(x; beta).

    beta > 0 gives a lower bound, beta < 0 an upper bound (reference:
    mogptk/gpr/parameter.py:30-59 and to_transform at 220-230).
    """

    def __init__(self, lower=0.0, beta=0.1, threshold=20.0):
        self.beta = beta
        self.lower = lower
        self.threshold = threshold

    def forward(self, x):
        bx = self.beta * x
        # linear extrapolation above the threshold for numerical stability,
        # matching torch.nn.functional.softplus semantics
        sp = jnp.where(bx > self.threshold, x, jnp.log1p(jnp.exp(jnp.minimum(bx, self.threshold))) / self.beta)
        return self.lower + sp

    def inverse(self, y):
        # host-side in numpy: XLA's vectorized exp is only ~1e-8 accurate even
        # in f64, while assign-time inverses should roundtrip exactly
        y = np.asarray(y, dtype=np.float64)
        d = y - np.asarray(self.lower, dtype=np.float64)
        # x = d + log(-expm1(-beta*d))/beta; beta*d > 0 for valid y on either side
        bd = np.maximum(self.beta * d, 1e-300)
        return d + np.log(-np.expm1(-bd)) / self.beta

    def key(self):
        return ("Softplus", float(self.beta),
                np.asarray(self.lower).tobytes() if not np.isscalar(self.lower) else float(self.lower))


class Sigmoid(Transform):
    """Sigmoid bijector for a two-sided bound: y = a + (b-a)·σ(x)
    (reference: mogptk/gpr/parameter.py:61-96)."""

    def __init__(self, lower=0.0, upper=1.0):
        self.lower = lower
        self.upper = upper

    def forward(self, x):
        return self.lower + (self.upper - self.lower) * jax.nn.sigmoid(x)

    def inverse(self, y):
        y = np.asarray(y, dtype=np.float64)
        span = np.asarray(self.upper, dtype=np.float64) - np.asarray(self.lower, dtype=np.float64)
        span = np.where(span == 0.0, 1.0, span)
        t = (y - self.lower) / span
        eps = float(np.finfo(np.float64).eps)
        t = np.clip(t, eps, 1.0 - eps)
        return np.log(t) - np.log1p(-t)

    def key(self):
        def h(v):
            return np.asarray(v).tobytes() if not np.isscalar(v) else float(v)
        return ("Sigmoid", h(self.lower), h(self.upper))


class Parameter:
    """A trainable parameter with optional bound constraints, priors, fixed
    values, and pegging (value tied to another parameter).

    API mirrors the reference (mogptk/gpr/parameter.py:99-346): construction
    takes a value in *constrained* space; `assign` clamps to bounds then stores
    the inverse-transformed raw value; `peg` ties this parameter's value to
    another; `()`/`constrained` read the constrained value.
    """

    def __init__(self, value, name=None, lower=None, upper=None, prior=None, train=True):
        value = to_jnp(value)
        self._name = name
        self._raw = None
        self.lower = None
        self.upper = None
        self.transform = None
        self.prior = prior
        self._train = train
        self.pegged_parameter = None
        self.pegged_transform = None
        self._shape = value.shape
        self.num_parameters = int(np.prod(value.shape)) if value.ndim else 1
        self.assign(value, lower=lower, upper=upper)

    # -- structural identity -------------------------------------------------
    @property
    def name(self):
        return self._name

    @property
    def shape(self):
        return self._shape

    @property
    def ndim(self):
        return len(self._shape)

    @property
    def train(self):
        return self._train

    @train.setter
    def train(self, val):
        if bool(val) != self._train:
            self._train = bool(val)
            config.bump()

    @property
    def pegged(self):
        return self.pegged_parameter is not None

    def structure_key(self):
        tkey = self.transform.key() if self.transform is not None else None
        return (self._shape, tkey, self._train, self.pegged)

    def __repr__(self):
        name = self._name
        if self.pegged:
            name = self.pegged_parameter._name
        if name is None:
            return "{}".format(np.asarray(self.constrained).tolist())
        return "{}={}".format(name, np.asarray(self.constrained).tolist())

    # -- value access ----------------------------------------------------------
    def __call__(self):
        return self.constrained

    @property
    def constrained(self):
        if self.pegged:
            other = self.pegged_parameter.constrained
            if self.pegged_transform is not None:
                other = self.pegged_transform(other)
            return other
        if self.transform is not None:
            return self.transform.forward(self._raw)
        return self._raw

    @property
    def raw(self):
        return self._raw

    def numpy(self):
        return np.asarray(self.constrained)

    @staticmethod
    def to_tensor(value):
        return to_jnp(value)

    @staticmethod
    def to_transform(lower, upper):
        """Bound spec → bijector (reference: mogptk/gpr/parameter.py:220-230)."""
        if lower is not None and upper is not None:
            if np.any(np.asarray(upper) < np.asarray(lower)):
                raise ValueError("lower limit %s must be lower than upper limit %s" % (lower, upper))
            return Sigmoid(lower=lower, upper=upper)
        elif lower is not None:
            return Softplus(lower=lower)
        elif upper is not None:
            return Softplus(lower=upper, beta=-0.1)
        return None

    def assign(self, value=None, name=None, lower=None, upper=None, prior=None, train=None):
        """Assign a new value/bounds/prior; unspecified fields are kept
        (reference: mogptk/gpr/parameter.py:232-319)."""
        if value is not None:
            value = to_jnp(value)
            origshape = value.shape
            # align trailing singleton dims, as the reference does
            while value.ndim < len(self._shape) and self._shape[value.ndim] == 1:
                value = value[..., None]
            while len(self._shape) < value.ndim and value.shape[-1] == 1:
                value = value[..., 0]
            if value.shape != self._shape:
                raise ValueError("parameter shape must match: %s != %s" % (origshape, self._shape))
        else:
            value = self.constrained if self._raw is not None else None
            if value is None:
                raise ValueError("no value to assign")
            value = jax.lax.stop_gradient(value)

        def _coerce_bound(b):
            if b is None:
                return None
            b = np.asarray(b, dtype=np.float64)
            if b.ndim != 0:
                while b.ndim < value.ndim and value.shape[b.ndim] == 1:
                    b = b[..., None]
                while value.ndim < b.ndim and b.shape[-1] == 1:
                    b = b[..., 0]
                if b.shape != value.shape:
                    raise ValueError("bound and value must match shapes: %s != %s" % (b.shape, value.shape))
            return b

        if lower is not None:
            lower = _coerce_bound(lower)
        else:
            lower = self.lower
        if upper is not None:
            upper = _coerce_bound(upper)
        else:
            upper = self.upper

        if name is None:
            name = self._name
        elif self._name is not None:
            idx = self._name.rfind(".")
            if idx != -1:
                name = self._name[: idx + 1] + name
        if prior is None:
            prior = self.prior
        if train is None:
            train = True if self.pegged else self._train

        old_key = self.structure_key() if self._raw is not None else None
        # a new prior OBJECT changes the traced -log p(θ) term but not the
        # structure key — bump explicitly or a cached jit loss would keep
        # training against the old (or no) prior
        prior_changed = prior is not self.prior

        transform = Parameter.to_transform(lower, upper)
        if transform is not None:
            if lower is not None:
                value = jnp.maximum(value, jnp.asarray(lower, dtype=value.dtype))
            if upper is not None:
                value = jnp.minimum(value, jnp.asarray(upper, dtype=value.dtype))
            raw = transform.inverse(value)
        else:
            raw = value

        self._name = name
        self._raw = jnp.asarray(raw, dtype=config.dtype)
        self._shape = self._raw.shape
        self.lower = lower
        self.upper = upper
        self.prior = prior
        self._train = train
        self.transform = transform
        self.pegged_parameter = None
        self.pegged_transform = None

        if old_key != self.structure_key() or prior_changed:
            config.bump()

    def peg(self, other, transform=None):
        """Tie this parameter's value to another parameter, optionally through
        a transform (reference: mogptk/gpr/parameter.py:321-335)."""
        if not isinstance(other, Parameter):
            raise ValueError("parameter must be pegged to other parameter object")
        elif other.pegged:
            raise ValueError("cannot peg parameter to another pegged parameter")
        self.pegged_parameter = other
        self.pegged_transform = transform
        self._train = False
        config.bump()

    def log_prior(self):
        """Log prior density of the current constrained value
        (reference: mogptk/gpr/parameter.py:337-346)."""
        if self.prior is None:
            return 0.0
        return jnp.sum(self.prior.log_prob(self.constrained))

    def clone(self):
        import copy
        return copy.deepcopy(self)

    def __deepcopy__(self, memo):
        new = object.__new__(Parameter)
        new._name = self._name
        new._raw = self._raw
        new._shape = self._shape
        new.lower = self.lower
        new.upper = self.upper
        new.transform = self.transform
        new.prior = self.prior
        new._train = self._train
        memo[id(self)] = new
        # the peg target must be resolved THROUGH the memo: a by-reference
        # copy left clones pegged to the ORIGINAL model's parameters (stale
        # constants inside the clone's jit trace, zero gradients)
        new.pegged_parameter = copy.deepcopy(self.pegged_parameter, memo)
        new.pegged_transform = self.pegged_transform
        new.num_parameters = self.num_parameters
        return new

    # pickle support: jnp arrays are converted to numpy
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_raw"] = np.asarray(self._raw)
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        self._raw = jnp.asarray(state["_raw"], dtype=config.dtype)
