"""Lightweight module base: parameter registration, naming, and jit binding.

The reference builds on torch.nn.Module (mogptk/gpr/kernel.py:5,
gpr/model.py:80). Here a Module is a plain Python object whose Parameters are
collected by attribute walking; `bind()` temporarily swaps every Parameter's
raw array for externally supplied (possibly traced) arrays, turning any method
of the module into a pure function of its parameter pytree — the idiomatic way
to expose an object-oriented API over jax.jit/jax.grad.
"""
from contextlib import contextmanager

from .parameter import Parameter
from .config import config


class Module:
    def __init__(self):
        object.__setattr__(self, "_attr_order", [])

    def name(self):
        return self.__class__.__name__

    def __setattr__(self, name, val):
        if name == "train" and not hasattr(type(self), name):
            # applies to the parameters existing NOW (parameters added later
            # keep their own flag); also stored so reads round-trip
            for p in self.parameters():
                p.train = val
            object.__setattr__(self, name, bool(val))
            return
        if hasattr(self, name) and isinstance(getattr(self, name), Parameter) and not isinstance(val, Parameter):
            raise AttributeError("parameter is read-only, use Parameter.assign()")
        if isinstance(val, Parameter) and val._name is None:
            val._name = "%s.%s" % (self.__class__.__name__, name)
        elif isinstance(val, (list, tuple)) and all(isinstance(item, Module) for item in val) and 0 < len(val):
            for i, item in enumerate(val):
                for p in item.parameters():
                    if p._name is not None and not p._name.startswith("%s[" % self.__class__.__name__):
                        p._name = "%s[%d].%s" % (self.__class__.__name__, i, p._name)
        if not hasattr(self, "_attr_order"):
            object.__setattr__(self, "_attr_order", [])
        if name not in self._attr_order and not name.startswith("_attr_order"):
            self._attr_order.append(name)
        object.__setattr__(self, name, val)

    def _children(self):
        out = []
        for name in getattr(self, "_attr_order", []):
            val = getattr(self, name, None)
            if isinstance(val, (Parameter, Module)):
                out.append(val)
            elif isinstance(val, (list, tuple)):
                out.extend(v for v in val if isinstance(v, (Parameter, Module)))
        return out

    def parameters(self):
        """All Parameters reachable from this module, depth-first in
        registration order, deduplicated (mirrors torch.nn.Module.parameters)."""
        seen = set()
        out = []

        def walk(mod):
            for child in mod._children():
                if isinstance(child, Parameter):
                    if id(child) not in seen:
                        seen.add(id(child))
                        out.append(child)
                else:
                    walk(child)

        walk(self)
        return out

    def structure_key(self):
        return tuple(p.structure_key() for p in self.parameters())

    @contextmanager
    def bind(self, raws):
        """Temporarily set the raw (unconstrained) arrays of all parameters.

        `raws` is a list aligned with self.parameters(). Entries that are None
        keep the current value. Restores previous raws on exit, so traced
        values never leak out of a jit trace.
        """
        params = self.parameters()
        if len(raws) != len(params):
            raise ValueError("bind: expected %d raw arrays, got %d" % (len(params), len(raws)))
        old = [p._raw for p in params]
        try:
            for p, r in zip(params, raws):
                if r is not None:
                    p._raw = r
            yield self
        finally:
            for p, o in zip(params, old):
                p._raw = o

    def raw_state(self):
        """Current raw arrays for all parameters (the full parameter pytree)."""
        return [p._raw for p in self.parameters()]

    def train_mask(self):
        """Static boolean mask over parameters(): True where trainable."""
        return [p.train and not p.pegged for p in self.parameters()]
