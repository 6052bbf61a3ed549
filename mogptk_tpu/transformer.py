"""Invertible Y-data transformation pipeline.

Capability parity with mogptk/transformer.py:4-153: a Transformer composes a
stack of invertible transforms applied to Y before training and inverted
after prediction. Pure NumPy — this is host-side preprocessing, outside the
XLA compute path.
"""
import copy
import numpy as np


class Transformer:
    """Composition stack of transforms (reference: mogptk/transformer.py:4-31).

    Appending a transform fits it on the already-forward-transformed data so
    that the stack composes left to right.
    """

    def __init__(self, transformers=None):
        if transformers is None:
            transformers = []
        if not isinstance(transformers, list):
            transformers = [transformers]
        if not all(issubclass(type(t), TransformBase) for t in transformers):
            raise ValueError("transformer must derive from TransformBase")
        self.transformers = transformers

    def append(self, t, y, x=None):
        if isinstance(t, type):
            t = t()
        else:
            t = copy.deepcopy(t)
        y = self.forward(y, x)
        t.set_data(y, x)
        self.transformers.append(t)

    def forward(self, y, x=None):
        for t in self.transformers:
            y = t.forward(y, x)
        return y

    def backward(self, y, x=None):
        for t in self.transformers[::-1]:
            y = t.backward(y, x)
        return y


class TransformBase:
    """Base class for transforms; subclasses implement forward/backward
    (reference: mogptk/transformer.py:33-45)."""

    def set_data(self, y, x=None):
        pass

    def forward(self, y, x=None):
        raise NotImplementedError

    def backward(self, y, x=None):
        raise NotImplementedError


class TransformDetrend(TransformBase):
    """Remove a fitted polynomial trend of the given degree
    (reference: mogptk/transformer.py:47-76)."""

    def __init__(self, degree=1, input_dim=0):
        self.degree = degree
        self.dim = input_dim

    def __repr__(self):
        return "TransformDetrend(degree=%g)" % (self.degree,)

    def set_data(self, y, x=None):
        self.coef = np.polyfit(x[:, self.dim], y, self.degree)

    def forward(self, y, x):
        if x is None:
            raise ValueError("must set X for transformation")
        return y - np.polyval(self.coef, x[:, self.dim])

    def backward(self, y, x):
        if x is None:
            raise ValueError("must set X for transformation")
        return y + np.polyval(self.coef, x[:, self.dim])


class TransformLinear(TransformBase):
    """y → (y − bias)/slope (reference: mogptk/transformer.py:78-93)."""

    def __init__(self, bias=0.0, slope=1.0):
        self.bias = bias
        self.slope = slope

    def __repr__(self):
        return "TransformLinear(bias=%g, slope=%g)" % (self.bias, self.slope)

    def forward(self, y, x=None):
        return (y - self.bias) / self.slope

    def backward(self, y, x=None):
        return self.bias + self.slope * y


class TransformNormalize(TransformBase):
    """Normalize Y to [-1, 1] (reference: mogptk/transformer.py:95-113)."""

    def __repr__(self):
        return "TransformNormalize(min=%g, max=%g)" % (self.ymin, self.ymax)

    def set_data(self, y, x=None):
        self.ymin = np.amin(y)
        self.ymax = np.amax(y)

    def forward(self, y, x=None):
        return -1.0 + 2.0 * (y - self.ymin) / (self.ymax - self.ymin)

    def backward(self, y, x=None):
        return (y + 1.0) / 2.0 * (self.ymax - self.ymin) + self.ymin


class TransformLog(TransformBase):
    """Shifted log transform so all values are ≥ 1 before the log
    (reference: mogptk/transformer.py:115-133)."""

    def __repr__(self):
        return "TransformLog(shift=%g, mean=%g)" % (self.shift, self.mean)

    def set_data(self, y, x=None):
        self.shift = 1 - y.min()
        self.mean = np.log(y + self.shift).mean()

    def forward(self, y, x=None):
        return np.log(y + self.shift) - self.mean

    def backward(self, y, x=None):
        return np.exp(y + self.mean) - self.shift


class TransformStandard(TransformBase):
    """Z-score whitening (reference: mogptk/transformer.py:135-153)."""

    def __repr__(self):
        return "TransformStandard(mean=%g, std=%g)" % (self.mean, self.std)

    def set_data(self, y, x=None):
        self.mean = y.mean()
        self.std = y.std()

    def forward(self, y, x=None):
        return (y - self.mean) / self.std

    def backward(self, y, x=None):
        return (y * self.std) + self.mean
