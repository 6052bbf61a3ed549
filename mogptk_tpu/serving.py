"""Serialized serving artifacts for trained models.

Production serving wants the posterior WITHOUT the Python model object,
its training data pipeline, or a fresh jit trace per process. This module
exports a trained model's predictive function as a self-contained
`jax.export` StableHLO artifact (trained parameters and training data baked
in as constants) bundled with the host-side metadata needed to reproduce
`Model.predict` exactly: per-channel Y transformers, the rescale_x
offset/scale, and channel names.

The device graph is lowered for BOTH cpu and tpu, with a symbolic query
length, so one artifact serves any batch size on either backend; the first
call per process compiles the (small) predict graph — tracing, Python
model construction, and the training-step compile are all skipped.

The reference has no counterpart (its serving story is `pickle` +
torch runtime, mogptk/model.py:320-336); this subsystem is TPU-native
deployment polish on top of the same capability.

Usage:
    mogptk_tpu.serving.export_predictor(model, "/path/artifact")
    pred = mogptk_tpu.serving.Predictor("/path/artifact")
    mu_list, lower_list, upper_list = pred.predict(X_per_channel)[1:]
"""
import io
import pickle
import zipfile

import numpy as np


_FORMAT_VERSION = 1

# Unpickling executes arbitrary callables by default — a serving process
# loading a third-party .gpx must not be an RCE sink. The metadata pickle
# only ever contains plain containers, numpy arrays, and this package's
# transformer objects; everything else is refused.
_SAFE_MODULES = ("mogptk_tpu", "numpy")
_SAFE_BUILTINS = {"list", "tuple", "dict", "set", "frozenset", "str",
                  "bytes", "int", "float", "complex", "bool", "NoneType",
                  "slice", "range"}


class _RestrictedUnpickler(pickle.Unpickler):
    def find_class(self, module, name):
        if module == "builtins":
            if name not in _SAFE_BUILTINS:
                raise pickle.UnpicklingError(
                    "refusing to unpickle builtins.%s from a .gpx artifact"
                    % name)
        elif not any(module == p or module.startswith(p + ".")
                     for p in _SAFE_MODULES):
            raise pickle.UnpicklingError(
                "refusing to unpickle %s.%s from a .gpx artifact"
                % (module, name))
        return super().find_class(module, name)


def _restricted_loads(data):
    return _RestrictedUnpickler(io.BytesIO(data)).load()


def _device_fn(gpr_model):
    """Pure (n, 1+D)->((n,), (n,)) predictive function with everything but
    the query baked in. Returns y-space mean/variance for Gaussian
    likelihoods (matching Model.predict), latent f mean/variance otherwise
    (recorded in meta so Predictor can refuse CI it cannot compute)."""
    from .gpr.likelihood import GaussianLikelihood

    gaussian = isinstance(gpr_model.likelihood, GaussianLikelihood)

    def fn(xq):
        mu, var = gpr_model.predict_f(xq)
        mu = mu.reshape(-1)
        var = var.reshape(-1)
        if gaussian:
            scale = gpr_model.likelihood.scale()
            if scale.ndim == 0:
                var = var + scale ** 2
            else:
                c = xq[:, 0].astype("int32")
                var = var + scale[c] ** 2
        return mu, var

    return fn, gaussian


def export_predictor(model, filename, platforms=("cpu", "tpu")):
    """Write `<filename>.gpx`: a zip holding the serialized predict graph
    (symbolic query length, multi-platform) plus host-side metadata.

    Pallas Gram kernels do not lower with symbolic shapes, so the export
    traces through the plain-XLA kernel path (`use_pallas(False)` scope) —
    at serving batch sizes the fused kernels buy nothing anyway.
    """
    import jax
    from jax import export as jexport
    from . import gpr as _gpr
    from .gpr.config import config as _cfg

    gm = model.gpr
    fn, gaussian = _device_fn(gm)

    D = gm.X.shape[1]
    (n,) = jexport.symbolic_shape("n")
    spec = jax.ShapeDtypeStruct((n, D), _cfg.dtype)

    old_pallas = _cfg.pallas
    try:
        _gpr.use_pallas(False)
        exported = jexport.export(jax.jit(fn), platforms=list(platforms))(spec)
    finally:
        _cfg.pallas = old_pallas
        _cfg.bump()

    meta = {
        "format_version": _FORMAT_VERSION,
        "gaussian": gaussian,
        "is_multioutput": model.is_multioutput,
        "output_dims": len(model.dataset),
        "names": model.dataset.get_names(),
        "transformers": [ch.Y_transformer for ch in model.dataset],
        "x_offset": getattr(model, "_x_offset", None),
        "x_scale": getattr(model, "_x_scale", None),
        "input_dims": D - (1 if model.is_multioutput else 0),
        "dtype": np.dtype(_cfg.dtype).name,
    }
    path = filename + ".gpx"
    with zipfile.ZipFile(path, "w") as z:
        z.writestr("graph.bin", exported.serialize())
        z.writestr("meta.pkl", pickle.dumps(meta))
    return path


class Predictor:
    """Host-side server for an exported artifact: replicates
    `Model.predict`'s kernel-format packing, rescale_x mapping, CI bounds,
    and inverse data transformations — with no Model, DataSet, or kernel
    object anywhere in the process."""

    def __init__(self, filename):
        from jax import export as jexport
        if not filename.endswith(".gpx"):
            filename += ".gpx"
        with zipfile.ZipFile(filename) as z:
            self._exported = jexport.deserialize(z.read("graph.bin"))
            self.meta = _restricted_loads(z.read("meta.pkl"))
        if self.meta["format_version"] > _FORMAT_VERSION:
            raise ValueError("artifact written by a newer mogptk_tpu")
        self._call = None

    def _to_kernel_format(self, X):
        x = np.concatenate([np.asarray(Xj, dtype=np.float64).reshape(len(Xj), -1)
                            for Xj in X], axis=0)
        if self.meta["x_offset"] is not None:
            x = x - self.meta["x_offset"]
        if self.meta["x_scale"] is not None:
            x = x / self.meta["x_scale"]
        if self.meta["is_multioutput"]:
            chan = np.concatenate(
                [j * np.ones(len(X[j])) for j in range(len(X))]).reshape(-1, 1)
            x = np.concatenate([chan, x], axis=1)
        return x.astype(self.meta["dtype"])

    def predict(self, X, sigma=2):
        """Per-channel (X, mu, lower, upper) in DATA units, matching
        Model.predict(X, sigma=sigma) for Gaussian likelihoods."""
        if not isinstance(X, (list, tuple)):
            X = [X] * self.meta["output_dims"]
        if len(X) != self.meta["output_dims"]:
            raise ValueError("expected %d channels of query points"
                             % self.meta["output_dims"])
        if sigma is not None and not self.meta["gaussian"]:
            raise ValueError(
                "artifact holds latent f moments (non-Gaussian likelihood); "
                "call predict(X, sigma=None) for the latent mean/variance")
        x = self._to_kernel_format(X)
        if self._call is None:
            import jax
            self._call = jax.jit(self._exported.call)
        mu, var = self._call(x)
        mu = np.asarray(mu, dtype=np.float64)
        var = np.maximum(np.asarray(var, dtype=np.float64), 0.0)

        if sigma is None:
            lower = upper = None
        else:
            half = float(sigma) * np.sqrt(var)
            lower, upper = mu - half, mu + half

        i = 0
        Mu, Lower, Upper = [], [], []
        for j, Xj in enumerate(X):
            nj = len(Xj)
            tr = self.meta["transformers"][j]
            xj = np.asarray(Xj, dtype=np.float64).reshape(nj, -1)
            Mu.append(tr.backward(mu[i:i + nj], xj))
            if sigma is not None:
                Lower.append(tr.backward(lower[i:i + nj], xj))
                Upper.append(tr.backward(upper[i:i + nj], xj))
            i += nj
        if sigma is None:
            Lower = Upper = [None] * len(Mu)
        if self.meta["output_dims"] == 1:   # match Model.predict's unwrapping
            return X[0], Mu[0], Lower[0], Upper[0]
        return X, Mu, Lower, Upper


# -- training-step executable artifacts (cold-start shipping) ----------------

def export_training_cache(model, artifact_dir, method="Adam", **train_kwargs):
    """Compile `model`'s training step into `artifact_dir` as a portable
    executable cache, without running a step.

    jax.export ships StableHLO, which every consumer still has to COMPILE —
    at the N=16k headline size that compile is ~6 minutes through a remote
    TPU backend (benchmarks/cold_start.py). What removes it is XLA's
    persistent compilation cache: this helper points the cache at
    `artifact_dir` and runs the same lower+compile `Model.train` would, so
    the directory afterwards holds the serialized TPU executable(s). Ship
    the directory next to the model checkpoint; a consumer process calls
    `prime_from_artifact(dir)` before training and starts in tens of
    seconds instead of minutes (measured 396 s cold -> 43 s primed).

    The cache keys on program + compiler version + topology: an artifact
    built on the same chip generation/jax version is a hit, anything else
    is a silent (correct, just slow) miss.

    Returns seconds spent compiling (≈0 if `artifact_dir` already holds
    the executable)."""
    gpr_model = getattr(model, "gpr", model)
    from .gpr import precompile as gpr_precompile
    return gpr_precompile(gpr_model, method=method, cache_dir=artifact_dir,
                          **train_kwargs)


def prime_from_artifact(artifact_dir):
    """Point XLA's persistent compilation cache at a directory produced by
    `export_training_cache` (or any prior cached run). Call before the
    first jit use in the process."""
    import jax
    jax.config.update("jax_compilation_cache_dir", artifact_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
