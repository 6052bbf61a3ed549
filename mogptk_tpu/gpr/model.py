"""GP inference models: Exact, Snelson (FITC), OpperArchambeau, Titsias,
SparseHensman/Hensman (SVGP).

Capability parity with mogptk/gpr/model.py (Model 80-401, Exact 403-483,
Snelson 485-576, OpperArchambeau 578-666, Titsias 668-765, SparseHensman
767-869, Hensman 871-886), redesigned for XLA:

- Every model's negative-log-marginal-likelihood / ELBO is a pure function of
  the parameter pytree (via Module.bind), so one jit captures kernel
  evaluation, Cholesky, solves, and the gradient in a single compiled program.
- The Cholesky uses the reference's relative-jitter strategy; under jit a
  failed factorization yields NaN rather than raising, and the training loop
  detects NaN host-side and raises CholeskyException with the same diagnostics
  (parameter dump + Gram heatmap, reference gpr/model.py:242-255).
"""
import functools
import sys
import numpy as np
import jax
import jax.numpy as jnp

from .module import Module
from .parameter import Parameter
from .kernel import Kernel, MultiOutputKernel
from .mean import Mean
from .likelihood import Likelihood, MultiOutputLikelihood, GaussianLikelihood
from .config import (config, sensitive_matmul_scope, pallas_enabled,
                     input_gradients)
from ..ops.linalg import (jittered_cholesky, cholesky_solve, solve_triangular,
                          lml_quadform_logdet, lml_quadform_logdet_stochastic,
                          lml_quadform_logdet_shifted,
                          lml_quadform_logdet_stochastic_shifted,
                          lml_chol_fused)


def _init_grid(N, X):
    """Grid-distributed inducing points (reference: gpr/model.py:11-21)."""
    X = np.asarray(X)
    n = int(round(np.power(N, 1.0 / X.shape[1])))
    # integer check on the ROUNDED root: 1000**(1/3) = 9.999999999999998
    # would otherwise spuriously reject valid counts
    if n ** X.shape[1] != N:
        raise ValueError("number of inducing points must equal N = n^%d" % X.shape[1])
    axes = [np.linspace(X[:, i].min(), X[:, i].max(), n) for i in range(X.shape[1])]
    grid = np.meshgrid(*axes, indexing="ij")
    return np.stack([g.flatten() for g in grid], axis=1)


def _init_random(N, X):
    """Halton-sequence inducing points (reference: gpr/model.py:23-29)."""
    from scipy.stats import qmc
    X = np.asarray(X)
    sampler = qmc.Halton(d=X.shape[1])
    samples = sampler.random(n=N)
    lo = X.min(axis=0)
    hi = X.max(axis=0)
    return lo + (hi - lo) * samples


def _init_density(N, X):
    """KDE-resampled inducing points (reference: gpr/model.py:31-34)."""
    from scipy.stats import gaussian_kde
    X = np.asarray(X)
    kernel = gaussian_kde(X.T, bw_method="scott")
    return kernel.resample(N).T


def init_inducing_points(Z, X, method="grid", output_dims=None):
    """Initialize inducing point locations (reference: gpr/model.py:36-69).

    Args:
        Z (int or list of int): Number of inducing points (per channel if a list).
        X: Input data; first column holds channel IDs when output_dims is set.
        method: 'grid', 'random', or 'density'.
        output_dims: Number of output dimensions for multi-output data.
    """
    _init = _init_grid
    if method == "random":
        _init = _init_random
    elif method == "density":
        _init = _init_density

    X = np.asarray(X)
    if output_dims is not None:
        if isinstance(Z, int) or (all(isinstance(z, int) for z in Z) and len(Z) == output_dims):
            if isinstance(Z, int):
                Z = [Z] * output_dims
            M = Z
            Z = np.zeros((sum(M), X.shape[1]))
            for j in range(len(M)):
                m0 = sum(M[:j])
                m = M[j]
                Z[m0:m0 + m, 0] = j
                Z[m0:m0 + m, 1:] = _init(m, X[X[:, 0] == j, 1:])
    elif isinstance(Z, int):
        Z = _init(Z, X)
    return jnp.asarray(Z, dtype=config.dtype)


def _sensitive(fn):
    """Trace fn's matmuls at the scoped sensitive-product precision
    (config.sensitive_matmul_precision). The variational objectives subtract
    Qff-style terms from Kff — on TPU, default bf16-pass f32 matmuls lose the
    digits that cancellation needs (the f32 sparse-GP NaNs of ROADMAP #10);
    the M×M algebra here is tiny so full precision costs nothing measurable."""
    @functools.wraps(fn)
    def wrapped(*args, **kwargs):
        with sensitive_matmul_scope():
            return fn(*args, **kwargs)
    return wrapped


class CholeskyException(Exception):
    """Carries the offending Gram matrix and model for post-mortem analysis
    (reference: gpr/model.py:71-78)."""

    def __init__(self, message, K, model):
        self.message = message
        self.K = K
        self.model = model

    def __str__(self):
        return self.message


class Model(Module):
    """Base GP model (reference: mogptk/gpr/model.py:80-401).

    Attributes:
        kernel, likelihood, mean: component modules.
        X, y: training data as device arrays.
    """

    # models that can null padded data rows out of their objective (set by
    # subclasses); mesh sharding pads N up to a device-count multiple and
    # relies on this to keep the loss exact
    supports_row_mask = False

    def __init__(self, kernel, X, y, likelihood=None, jitter=1e-8, mean=None):
        super().__init__()
        if likelihood is None:
            likelihood = GaussianLikelihood(1.0)

        if not issubclass(type(kernel), Kernel):
            raise ValueError("kernel must derive from mogptk_tpu.gpr.Kernel")
        X, y = self._check_input(X, y)
        if mean is not None:
            if not issubclass(type(mean), Mean):
                raise ValueError("mean must derive from mogptk_tpu.gpr.Mean")
            mu = mean(X).reshape(-1, 1)
            if mu.shape != y.shape:
                raise ValueError("mean and y data must match shapes: %s != %s" % (mu.shape, y.shape))

        if issubclass(type(likelihood), MultiOutputLikelihood) and likelihood.output_dims != kernel.output_dims:
            raise ValueError("kernel and likelihood must have matching output dimensions")
        likelihood.validate_y(X, y)

        # jitter floor by significant digits of dtype (reference: gpr/model.py:106-110)
        if config.dtype == jnp.float32 or config.dtype == jnp.bfloat16:
            jitter = max(jitter, 1e-6)
        else:
            jitter = max(jitter, 1e-15)

        self.kernel = kernel
        self.likelihood = likelihood
        self.mean = mean
        self.X = X
        self.y = y
        self.jitter = jitter
        self.input_dims = X.shape[1]
        object.__setattr__(self, "_jit_cache", {})
        # per-point 0/1 weights; padded rows carry 0 (set transiently by the
        # sharded training step, mogptk_tpu/parallel/sharding.py)
        object.__setattr__(self, "_row_mask", None)
        # static per-channel counts when the (concrete) training X is
        # channel-sorted, as merge_data produces: unlocks the channel-block
        # Gram engine (ops/block_mosm.py) for kernels that implement
        # K_sorted. None for unsorted or single-output data.
        counts = None
        if getattr(kernel, "output_dims", None) is not None and hasattr(kernel, "K_sorted"):
            from ..ops.block_mosm import sorted_channel_counts
            counts = sorted_channel_counts(np.asarray(X), kernel.output_dims)
        object.__setattr__(self, "_channel_counts", counts)

    # pickle support: drop the jit cache, move arrays to host
    def __getstate__(self):
        state = self.__dict__.copy()
        state["_jit_cache"] = {}
        # mesh-bound handles are process-local and not picklable. A
        # mesh-PREPARED model (use_mesh) additionally carries X/y padded to
        # the device count — serialize only the real rows, or the pad
        # sentinels would resurrect as training data on load.
        prepared = state.pop("_mesh_prepared", None)
        for key in ("_gram_sharding", "_gram_mesh", "_ring", "_row_mask"):
            state.pop(key, None)
        for key in ("X", "y", "data_variance"):
            if key in state and state[key] is not None:
                state[key] = np.asarray(state[key])
        if prepared is not None:
            n0 = prepared[2]
            for key in ("X", "y"):
                if state.get(key) is not None:
                    state[key] = state[key][:n0]
        return state

    def __setstate__(self, state):
        self.__dict__.update(state)
        for key in ("X", "y", "data_variance"):
            if getattr(self, key, None) is not None:
                object.__setattr__(self, key, jnp.asarray(getattr(self, key), dtype=config.dtype))

    # -- data plumbing -------------------------------------------------------
    def _check_input(self, X, y=None):
        X = jnp.asarray(X, dtype=config.dtype)
        if X.ndim == 0:
            X = X.reshape(1, 1)
        elif X.ndim == 1:
            X = X.reshape(-1, 1)
        elif X.ndim != 2:
            raise ValueError("X must have dimensions (data_points,input_dims) with input_dims optional")
        if X.shape[0] == 0 or X.shape[1] == 0:
            raise ValueError("X must not be empty")

        if y is not None:
            y = jnp.asarray(y, dtype=config.dtype)
            if y.ndim == 0:
                y = y.reshape(1, 1)
            elif y.ndim == 1:
                y = y.reshape(-1, 1)
            elif y.ndim != 2 or y.shape[1] != 1:
                raise ValueError("y must have one dimension (data_points,)")
            if X.shape[0] != y.shape[0]:
                raise ValueError("number of data points for X and y must match")
            return X, y
        else:
            if X.shape[1] != self.input_dims:
                raise ValueError("X must have %s input dimensions" % self.input_dims)
            return X

    def _index_channel(self, value, X):
        """Per-point gather of a per-channel quantity (reference: gpr/model.py:183-186)."""
        if self.kernel.output_dims is not None and 0 < value.ndim and value.shape[0] == self.kernel.output_dims:
            return value[X[:, 0].astype(jnp.int32)]
        return value

    def _residual_y(self, X=None, y=None):
        X = self.X if X is None else X
        y = self.y if y is None else y
        if self.mean is not None:
            return y - self.mean(X).reshape(-1, 1)
        return y

    def _cholesky(self, K, add_jitter=False):
        return jittered_cholesky(K, self.jitter if add_jitter else None)

    # -- objective -----------------------------------------------------------
    def log_marginal_likelihood(self):
        raise NotImplementedError()

    def log_prior(self):
        return sum([p.log_prior() for p in self.parameters()])

    def forward(self):
        return -self.log_marginal_likelihood() - self.log_prior()

    # -- jit infrastructure ----------------------------------------------------
    def _cache_get(self, name, builder):
        key = (name, config.structure_version)
        fn = self._jit_cache.get(key)
        if fn is None:
            # evict only STALE-version entries: clearing everything made
            # alternating loss()/predict_f() rebuild (and recompile) the
            # other program on every switch
            for k in [k for k in self._jit_cache
                      if k[1] != config.structure_version]:
                del self._jit_cache[k]
            fn = builder()
            self._jit_cache[key] = fn
        return fn

    def _split_raws(self):
        params = self.parameters()
        mask = self.train_mask()
        train = [p._raw for p, m in zip(params, mask) if m]
        fixed = [p._raw for p, m in zip(params, mask) if not m]
        return train, fixed

    def _merge_raws(self, train, fixed):
        mask = self.train_mask()
        it_t, it_f = iter(train), iter(fixed)
        return [next(it_t) if m else next(it_f) for m in mask]

    def set_train_raws(self, train):
        """Write optimized raw values back into the Parameter objects."""
        params = self.parameters()
        mask = self.train_mask()
        it = iter(train)
        for p, m in zip(params, mask):
            if m:
                p._raw = next(it)

    def make_loss_fn(self):
        """Pure loss(train_raws, fixed_raws) suitable for jax.jit/grad."""
        def loss_fn(train, fixed):
            raws = self._merge_raws(train, fixed)
            with self.bind(raws):
                return self.forward()
        return loss_fn

    def make_flat_loss_fn(self):
        """Single-leaf variant of make_loss_fn: (loss(vec, fixed), flatten,
        unflatten) with all trainable raws packed into ONE 1-D vector.

        Optimizers update one fused kernel instead of ~n_params tiny
        per-leaf ones: with ~30 scalar hyperparameters the per-leaf
        Adam update is ~a hundred micro-dispatches per step — measurable
        against a 50 ms training step. Raws share config.dtype
        (parameter.py assigns with dtype=config.dtype), so the pack is
        exact; unflatten restores the original list structure."""
        train0, _ = self._split_raws()
        shapes = [tuple(p.shape) for p in train0]
        sizes = [int(np.prod(s)) for s in shapes]
        splits = list(np.cumsum(sizes[:-1]))

        def flatten(train):
            if not train:
                return jnp.zeros((0,), config.dtype)
            return jnp.concatenate([jnp.ravel(p) for p in train])

        def unflatten(vec):
            parts = jnp.split(vec, splits) if splits else [vec]
            return [p.reshape(s) for p, s in zip(parts, shapes)]

        base = self.make_loss_fn()

        def loss_flat(vec, fixed):
            return base(unflatten(vec), fixed)

        return loss_flat, flatten, unflatten

    def compile(self):
        """Warm the jit cache (API parity with reference gpr/model.py:127-129)."""
        self.loss()

    def _sync_mesh(self):
        """Align this model's data/parameter sharding with the globally
        active mesh (mogptk_tpu.use_mesh); no-op when nothing changed.
        Called from the non-traced public entry points (loss/train/predict)
        — never from inside a jitted computation."""
        from ..parallel.sharding import sync_model_mesh
        sync_model_mesh(self)

    def loss(self):
        """Current loss value, computed under jit (reference: gpr/model.py:279-292)."""
        self._sync_mesh()
        fn = self._cache_get("loss", lambda: jax.jit(self.make_loss_fn()))
        train, fixed = self._split_raws()
        val = fn(train, fixed)
        self.check_numerics(val)
        return float(val)

    def check_numerics(self, loss_val):
        """On a NaN/Inf loss, reproduce the reference's Cholesky failure
        diagnostics (gpr/model.py:242-255): dump parameters, plot the Gram
        matrix, raise CholeskyException."""
        if np.isfinite(np.asarray(loss_val)):
            return
        try:
            K = np.asarray(self.kernel.K(self.X))
        except Exception:
            K = None
        print("ERROR: loss is not finite", file=sys.__stdout__)
        if K is not None:
            if np.isnan(K).any():
                print("ERROR: kernel matrix has NaNs!", file=sys.__stdout__)
            if np.isinf(K).any():
                print("ERROR: kernel matrix has infinities!", file=sys.__stdout__)
        self.print_parameters()
        if K is not None:
            from .plot import plot_gram
            try:
                plot_gram(K)
            except Exception:
                pass
        raise CholeskyException("loss is not finite (Cholesky or kernel failure)", K, self)

    # -- introspection -----------------------------------------------------------
    def print_parameters(self, file=None):
        """Print parameters and their values (reference: gpr/model.py:188-240)."""
        def param_range(lower, upper, train=True, pegged=False):
            if lower is not None:
                lower = np.asarray(lower)
                lower = lower.item() if lower.size == 1 else lower.tolist()
            if upper is not None:
                upper = np.asarray(upper)
                upper = upper.item() if upper.size == 1 else upper.tolist()
            if pegged:
                return "pegged"
            elif not train:
                return "fixed"
            if lower is None and upper is None:
                return "(-inf, inf)"
            elif lower is None:
                return "(-inf, %s]" % upper
            elif upper is None:
                return "[%s, inf)" % lower
            return "[%s, %s]" % (lower, upper)

        if file is None:
            try:
                get_ipython  # noqa: F821 — only defined inside IPython
                from IPython.display import display, HTML
                table = '<table><tr><th style="text-align:left">Name</th><th>Range</th><th>Value</th></tr>'
                for p in self.parameters():
                    table += ('<tr><td style="text-align:left">%s</td><td>%s</td><td>%s</td></tr>'
                              % (p._name, param_range(p.lower, p.upper, p.train, p.pegged), p.numpy()))
                table += "</table>"
                display(HTML(table))
                return
            except (NameError, ImportError):
                pass

        vals = [["Name", "Range", "Value"]]
        for p in self.parameters():
            vals.append([str(p._name), param_range(p.lower, p.upper, p.train, p.pegged), p.numpy().tolist()])
        nameWidth = max(len(val[0]) for val in vals)
        for val in vals:
            print("%-*s  %s" % (nameWidth, val[0], val[2]), file=file)

    def num_parameters(self):
        return sum(p.num_parameters for p in self.parameters() if p.train)

    # -- prediction ---------------------------------------------------------------
    def K(self, X1, X2=None):
        """Kernel matrix as NumPy (reference: gpr/model.py:294-306)."""
        return np.asarray(self.kernel(X1, X2))

    @_sensitive
    def predict_f(self, X, full=False):
        raise NotImplementedError()

    def predict_y(self, X, ci=None, sigma=None, n=10000, key=None):
        """Predictive posterior over y (reference: gpr/model.py:322-344)."""
        self._sync_mesh()
        X = self._check_input(X)
        mu, var = self.predict_f(X)
        if ci is None and sigma is not None:
            p = 0.5 * (1.0 + float(jax.scipy.special.erf(jnp.asarray(sigma / np.sqrt(2.0)))))
            ci = [1.0 - p, p]
        return self.likelihood.predict(X, mu, var, ci, sigma=sigma, n=n, key=key)

    def sample_f(self, Z, n=None, prior=False, key=None):
        """Sample f at Z from the prior or posterior (reference: gpr/model.py:346-376)."""
        self._sync_mesh()
        Z = self._check_input(Z)
        S = 1 if n is None else n
        if prior:
            mu = self.mean(Z) if self.mean is not None else jnp.zeros((Z.shape[0], 1), dtype=config.dtype)
            var = self.kernel(Z)
        else:
            mu, var = self.predict_f(Z, full=True)
        eye = jnp.eye(var.shape[0], dtype=config.dtype)
        var = var + self.jitter * jnp.mean(jnp.diagonal(var)) * eye
        from ..ops.linalg import cholesky as _chol
        L = _chol(var)  # routed: MXU-blocked at sampling-grid sizes ≥ min_n
        if key is None:
            key = config.next_key()
        eps = jax.random.normal(key, (var.shape[0], S), dtype=config.dtype)
        samples = mu.reshape(-1, 1) + L @ eps  # NxS
        samples = samples.T  # SxN
        if n is None:
            samples = samples.squeeze(0)
        return samples

    def sample_y(self, Z, n=None, key=None):
        """Sample y at Z (reference: gpr/model.py:378-401)."""
        Z = self._check_input(Z)
        S = 1 if n is None else n
        if key is None:
            key = config.next_key()
        k1, k2 = jax.random.split(key)
        samples_f = self.sample_f(Z, n=S, key=k1)
        samples_y = self.likelihood.conditional_sample(Z, samples_f, key=k2)
        if n is None and samples_y is not None:
            samples_y = samples_y.squeeze()
        return samples_y


class Exact(Model):
    """Exact GP regression with Gaussian likelihood:
    y ~ N(0, K + σ²I) (reference: mogptk/gpr/model.py:403-483).

    Supports per-channel trained noise and fixed per-point data variances.
    """

    def __init__(self, kernel, X, y, variance=1.0, data_variance=None, jitter=1e-8, mean=None,
                 trace_probes=None, seed=0):
        if data_variance is not None:
            data_variance = jnp.asarray(data_variance, dtype=config.dtype).reshape(-1)
            # count rows the way _check_input will (1-D X is one point per
            # entry) — a skipped check here let _noise_diag's mesh-padding
            # branch silently zero-pad a too-short vector
            n_points = (np.asarray(X).shape[0] if np.asarray(X).ndim >= 1
                        else 1)
            if data_variance.shape[0] != n_points:
                raise ValueError("data variance must have shape (data_points,)")

        variance = jnp.asarray(variance, dtype=config.dtype)
        channels = 1
        if kernel.output_dims is not None:
            channels = kernel.output_dims
        if 1 < variance.ndim or (variance.ndim == 1 and variance.shape[0] != channels):
            raise ValueError("variance must be float or have shape (channels,)")

        super().__init__(kernel, X, y, GaussianLikelihood(jnp.sqrt(variance)), jitter, mean)
        self.data_variance = data_variance
        # trace_probes: None → exact closed-form ∂LML/∂K (deterministic);
        # int R → Hutchinson probe-trace gradients (unbiased, var O(1/R)),
        # which cut the backward to two R-column triangular solves
        self.trace_probes = trace_probes
        self.seed = seed
        self.log_marginal_likelihood_constant = 0.5 * self.X.shape[0] * np.log(2.0 * np.pi)

    def _fused_static(self):
        """Static id for the fully fused Cholesky-LML path
        (ops/linalg.lml_chol_fused), or None when any precondition fails:
        channel-sorted data with a block-engine family, Pallas on, probe
        gradients, no row mask / Gram sharding constraint / jitter ladder
        (the ladder retries factorizations of a materialized Gram) / Gram
        storage format (the format only means anything for a materialized
        Gram, so the round-trip in _Kff must see it)."""
        counts = getattr(self, "_channel_counts", None)
        if (not self.trace_probes or counts is None or not pallas_enabled()
                or getattr(self, "_gram_sharding", None) is not None
                or config.jitter_ladder > 0
                or config.gram_storage is not None):
            return None
        from .iterative import _family_of
        from ..ops.block_families import has_block_family
        try:
            family = _family_of(self.kernel)
        except ValueError:
            return None
        if family[0] != "mosm" and not has_block_family(family[0]):
            return None
        return (family, counts, int(self.trace_probes), self.seed)

    def _noise_diag(self, add_jitter=False):
        """The (N,) diagonal added to the Gram: per-channel likelihood noise,
        optional per-point data variance, optional relative jitter from the
        kernel's cheap closed-form diagonal (no N×N identity materialized)."""
        noise = self._index_channel(self.likelihood.scale() ** 2, self.X)
        diag = jnp.broadcast_to(jnp.asarray(noise, dtype=config.dtype).reshape(-1),
                                (self.X.shape[0],))
        if self.data_variance is not None:
            dv = self.data_variance
            if dv.shape[0] != diag.shape[0]:
                # X padded for mesh sharding after construction; padded rows
                # are masked out of the objective, 0 variance is fine
                dv = jnp.pad(dv, (0, diag.shape[0] - dv.shape[0]))
            diag = diag + dv
        if add_jitter:
            kdiag = self.kernel.K_diag(self.X)
            diag = diag + self.jitter * jnp.mean(kdiag + diag)
        return diag

    def _Kff(self, add_jitter=False, with_noise=True):
        counts = getattr(self, "_channel_counts", None)
        if counts is not None and (
                getattr(self, "_row_mask", None) is not None
                or int(sum(counts)) != self.X.shape[0]
                or getattr(self, "_gram_sharding", None) is not None):
            # stale counts: X was padded after they were computed (mesh
            # sharding sets a row mask and swaps in the padded X), or the
            # Gram carries a row-block sharding constraint — a monolithic
            # pallas_call has no GSPMD partitioning rule, so the sorted
            # engine would defeat (or break) the sharding
            counts = None
        if counts is not None and pallas_enabled():
            # channel-sorted data + a kernel with a channel-block engine:
            # scalar pair stats per block, ~2x the generic Pallas Gram.
            # No remat: the engine's custom VJP keeps O(params) residuals.
            kern_K = lambda X: self.kernel.K_sorted(X, counts)
            checkpoint = False
        else:
            kern_K = lambda X: self.kernel.K(X)
            # remat the jnp Gram assembly: the backward pass recomputes the
            # fused elementwise chain instead of keeping O(Q·D) N×N
            # residents in HBM (trades ~1 extra Gram evaluation for several
            # GB at N=16k). When the kernel itself routes to a custom-VJP
            # Pallas gram, rematerializing would only schedule a dead
            # forward recompute.
            checkpoint = not (pallas_enabled()
                              and getattr(self.kernel, "gram_has_custom_vjp", False))
        Kff = jax.checkpoint(kern_K)(self.X) if checkpoint else kern_K(self.X)
        if config.gram_storage == "bf16x2" and Kff.dtype == jnp.float32:
            # error-compensated half-precision storage (use_half_precision(
            # compensated=True)): the Gram round-trips through the two-term
            # bf16 split it would be held in between uses, so the LML
            # reflects the storage format's actual (~17-bit) floor rather
            # than silently reading a never-stored f32 Gram
            from ..ops.linalg import split_bf16, merge_bf16
            Kff = merge_bf16(*split_bf16(Kff))
        gram_sharding = getattr(self, "_gram_sharding", None)
        if gram_sharding is not None:
            # row-block the assembly (and, by propagation, its VJP) over the
            # mesh; set by parallel.sharding.exact_sharded_step
            Kff = jax.lax.with_sharding_constraint(Kff, gram_sharding)
        if not with_noise:
            # raw Gram for diag-shifted consumers (the noise diagonal rides
            # the factorization as a vector diag_shift): the Gram stays an
            # opaque engine output, which the blocked Cholesky's Pallas
            # S-panels can read without the ~40 ms/step per-pallas_call
            # re-materialization a fusible diagonal-add producer incurs at
            # N=16k (benchmarks/exact_fwd_decomp.py; an optimization_barrier
            # does not prevent it)
            return Kff
        diag = self._noise_diag(add_jitter)
        n = self.X.shape[0]
        # masked broadcast-add, NOT .at[idx, idx].add: XLA:TPU lowers the
        # index scatter to a ~22 ms pass at N=16k, while iota==iota + where
        # fuses into one elementwise sweep over K (~2.7 ms at 1 GB)
        r = jax.lax.broadcasted_iota(jnp.int32, (n, n), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (n, n), 1)
        d = diag.astype(Kff.dtype)[:, None]
        return Kff + jnp.where(r == c, d, jnp.zeros((), Kff.dtype))

    supports_row_mask = True

    def use_gram_sharding(self, mesh, axis="data"):
        """Row-block-shard the Gram assembly over a mesh (set by
        parallel.sharding.exact_sharded_step). Call with mesh=None to go
        back to single-device; either way the jit cache is invalidated so
        previously traced programs don't silently disagree.

        With a mesh installed the LML also routes through
        parallel.chol.distributed_lml (deterministic gradient) or
        distributed_lml_stochastic (probe gradients), masked/padded rows
        included — factorization, solves, AND the backward all run with
        O(N²/P) per-device memory (nothing gathers the full Gram)."""
        from jax.sharding import NamedSharding, PartitionSpec
        object.__setattr__(self, "_gram_sharding",
                           None if mesh is None
                           else NamedSharding(mesh, PartitionSpec(axis, None)))
        object.__setattr__(self, "_gram_mesh",
                           None if mesh is None else (mesh, axis))
        self._jit_cache.clear()

    @staticmethod
    def _masked_gram(Kff, y, mask):
        """Rewrite (K, y) so padded rows become independent unit-variance
        zeros — a block-diagonal extension that adds exactly 0 to both the
        quadratic form and the log-determinant. Returns (K', y', const)."""
        m = mask.reshape(-1)
        npad = Kff.shape[0]
        r = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 0)
        c = jax.lax.broadcasted_iota(jnp.int32, (npad, npad), 1)
        # one fused sweep: scale out masked rows/cols and put 1 on the
        # padded diagonal (scatter form costs ~22 ms at N=16k on TPU)
        Kff = (Kff * (m[:, None] * m[None, :])
               + jnp.where(r == c, (1.0 - m).astype(Kff.dtype)[:, None],
                           jnp.zeros((), Kff.dtype)))
        return Kff, y * m[:, None], 0.5 * jnp.sum(m) * np.log(2.0 * np.pi)

    def log_marginal_likelihood(self):
        """LML via Cholesky (reference: gpr/model.py:438-453), with the
        closed-form ∂LML/∂K custom VJP (ops/linalg.py) replacing autodiff
        through the factorization."""
        mask = getattr(self, "_row_mask", None)
        if mask is None and self.trace_probes and self._fused_static() is not None:
            # hot single-chip path: gram + noise-diag + factorization + probe
            # backward in ONE custom VJP (ops/linalg.lml_chol_fused) — the
            # noisy Gram and the dense N×N cotangent never exist in HBM
            static = self._fused_static()
            _, x = self.kernel._split(self.X)
            from .iterative import _fused_kernel_params
            params = _fused_kernel_params(self.kernel)
            diag = self._noise_diag(add_jitter=True)
            y = self._residual_y()
            val = lml_chol_fused(static, x, diag, y, params)
            return val - self.log_marginal_likelihood_constant
        y = self._residual_y()
        gram_mesh = getattr(self, "_gram_mesh", None)
        if (gram_mesh is not None
                and self.X.shape[0] % gram_mesh[0].shape[gram_mesh[1]] == 0):
            # mesh-sharded LML: distributed panel Cholesky + block-
            # substitution solves + slab backward (closed-form K⁻¹ slabs for
            # the deterministic gradient, the low-rank probe pair for
            # trace_probes) — the full Gram never exists on any single
            # device, for masked/padded configurations included (the masked
            # Gram rewrite below is elementwise, so GSPMD keeps it
            # row-sharded). exact_sharded_step therefore never gathers.
            from ..parallel.chol import (distributed_lml,
                                         distributed_lml_stochastic)
            mesh, axis = gram_mesh
            Kff = self._Kff(add_jitter=True)
            const = self.log_marginal_likelihood_constant
            if mask is not None:
                Kff, y, const = self._masked_gram(Kff, y, mask)
            if self.trace_probes:
                val = distributed_lml_stochastic(
                    Kff, y, mesh, axis, int(self.trace_probes), self.seed)
            else:
                val = distributed_lml(Kff, y, mesh, axis)
            return val - const
        if mask is None:
            # the noise (+relative jitter) diagonal rides the factorization
            # as a vector diag_shift — the noisy Gram is never materialized,
            # and the raw Gram stays an opaque engine output (see _Kff)
            Kff = self._Kff(with_noise=False)
            diag = self._noise_diag(add_jitter=True)
            if self.trace_probes:
                val = lml_quadform_logdet_stochastic_shifted(
                    Kff, diag, y, int(self.trace_probes), self.seed)
            else:
                val = lml_quadform_logdet_shifted(Kff, diag, y)
            return val - self.log_marginal_likelihood_constant
        else:
            Kff, y, const = self._masked_gram(
                self._Kff(add_jitter=True), y, mask)
        if self.trace_probes:
            val = lml_quadform_logdet_stochastic(Kff, y, int(self.trace_probes), self.seed)
        else:
            val = lml_quadform_logdet(Kff, y)
        return val - const

    @_sensitive
    def predict_f(self, X, full=False):
        """Posterior mean/variance at X (reference: gpr/model.py:455-483)."""
        self._sync_mesh()
        X = self._check_input(X)
        fn = self._cache_get("predict_f_full" if full else "predict_f",
                             lambda: jax.jit(self._make_predict_f(), static_argnames=("full",)))
        train, fixed = self._split_raws()
        return fn(train, fixed, X, full=full)

    def _make_predict_f(self):
        def predict(train, fixed, X, full=False):
            raws = self._merge_raws(train, fixed)
            with self.bind(raws):
                y = self._residual_y()
                mask = getattr(self, "_row_mask", None)
                if mask is not None:
                    # mesh-padded training rows (use_mesh with non-divisible
                    # N): rewrite K to the block-diagonal identity extension
                    # and zero the padded cross-covariance rows/targets —
                    # the fake observations then contribute exactly nothing
                    # to the posterior
                    Kff, y, _ = self._masked_gram(
                        self._Kff(add_jitter=True), y, mask)
                    Kfs = (self.kernel.K(self.X, X)
                           * mask.reshape(-1, 1).astype(config.dtype))
                    Lff = jittered_cholesky(Kff, ladder_base=self.jitter)
                    v = solve_triangular(Lff, Kfs)  # NxM
                    mu = Kfs.T @ cholesky_solve(Lff, y)  # Mx1
                    if self.mean is not None:
                        mu = mu + self.mean(X).reshape(-1, 1)
                    if full:
                        Kss = self.kernel.K(X)
                        var = Kss - v.T @ v
                    else:
                        Kss_diag = self.kernel.K_diag(X)
                        var = (Kss_diag - jnp.sum(v * v, axis=0)).reshape(-1, 1)
                    return mu, var
                # factor K + noise diag (+ relative jitter) with the vector
                # riding the factorization — the noisy Gram never exists in
                # HBM and the raw Gram stays an opaque engine output (_Kff)
                Kff = self._Kff(with_noise=False)
                Kfs = self.kernel.K(self.X, X)  # NxM
                Lff = jittered_cholesky(
                    Kff, extra_diag=self._noise_diag(add_jitter=True),
                    ladder_base=self.jitter)
                v = solve_triangular(Lff, Kfs)  # NxM
                mu = Kfs.T @ cholesky_solve(Lff, y)  # Mx1
                if self.mean is not None:
                    mu = mu + self.mean(X).reshape(-1, 1)
                if full:
                    Kss = self.kernel.K(X)
                    var = Kss - v.T @ v
                else:
                    Kss_diag = self.kernel.K_diag(X)
                    var = (Kss_diag - jnp.sum(v * v, axis=0)).reshape(-1, 1)
                return mu, var
        return predict


class Snelson(Model):
    """Sparse GP with FITC-style inducing points, Snelson & Ghahramani 2005
    (reference: mogptk/gpr/model.py:485-576)."""

    def __init__(self, kernel, X, y, Z=10, Z_init="grid", variance=1.0, jitter=1e-8, mean=None):
        variance = jnp.asarray(variance, dtype=config.dtype).squeeze()
        if 1 < variance.ndim or (variance.ndim == 1 and variance.shape[0] != kernel.output_dims):
            raise ValueError("variance must be float or have shape (channels,)")

        super().__init__(kernel, X, y, GaussianLikelihood(jnp.sqrt(variance)), jitter, mean)

        Z = init_inducing_points(Z, self.X, method=Z_init, output_dims=kernel.output_dims)
        Z = self._check_input(Z)
        self.log_marginal_likelihood_constant = 0.5 * self.X.shape[0] * np.log(2.0 * np.pi)
        self.Z = Parameter(Z, name="induction_points")
        if kernel.output_dims is not None:
            self.Z.num_parameters -= self.Z().shape[0]

    @_sensitive
    def _common(self):
        y = self._residual_y()
        Kff_diag = self.kernel.K_diag(self.X)
        # Z is trained: the fused Pallas grams drop input cotangents, so
        # these Grams must trace through the differentiable jnp path
        with input_gradients():
            Kuf = self.kernel.K(self.Z(), self.X)
            Kuu = self.kernel.K(self.Z())
        Luu = self._cholesky(Kuu, add_jitter=True)
        v = solve_triangular(Luu, Kuf)  # MxN; Kuu^(-1/2)·Kuf
        noise = self._index_channel(self.likelihood.scale() ** 2, self.X)
        noise = jnp.broadcast_to(jnp.asarray(noise, dtype=config.dtype).reshape(-1), (self.X.shape[0],))
        g = Kff_diag - jnp.sum(v * v, axis=0) + noise  # N; diag(Kff−Qff)+σ²
        eye = jnp.eye(self.Z().shape[0], dtype=config.dtype)
        vG = v / g[None, :]  # MxN
        L = self._cholesky(vG @ v.T + eye)
        return y, Luu, v, g, vG, L

    def log_marginal_likelihood(self):
        """FITC LML (reference: gpr/model.py:517-540)."""
        y, Luu, v, g, vG, L = self._common()
        c = solve_triangular(L, vG @ y)  # Mx1
        p = -self.log_marginal_likelihood_constant
        p = p - jnp.sum(jnp.log(jnp.diagonal(L)))
        p = p - 0.5 * jnp.sum(jnp.log(g))
        p = p - 0.5 * jnp.sum(y * (y / g[:, None]))
        p = p + 0.5 * jnp.sum(c * c)
        return p

    @_sensitive
    def predict_f(self, X, full=False):
        """FITC posterior (reference: gpr/model.py:542-576). The reference's
        full-covariance branch references undefined variables (gpr/model.py:571,
        a known defect); here the intended expression is implemented."""
        self._sync_mesh()
        X = self._check_input(X)
        y, Luu, v, g, vG, L = self._common()
        Kus = self.kernel.K(self.Z(), X)
        a = solve_triangular(Luu, Kus)  # MxS
        b = solve_triangular(L, a)      # MxS
        c = solve_triangular(L, vG @ y)
        mu = b.T @ c
        if self.mean is not None:
            mu = mu + self.mean(X).reshape(-1, 1)
        if full:
            Kss = self.kernel.K(X)
            var = Kss - a.T @ a + b.T @ b
        else:
            Kss_diag = self.kernel.K_diag(X)
            var = (Kss_diag - jnp.sum(a * a, axis=0) + jnp.sum(b * b, axis=0)).reshape(-1, 1)
        return mu, var


class OpperArchambeau(Model):
    """Variational GP for non-Gaussian likelihoods, Opper & Archambeau 2009
    (reference: mogptk/gpr/model.py:578-666)."""

    def __init__(self, kernel, X, y, likelihood=None, jitter=1e-8, mean=None):
        if likelihood is None:
            likelihood = GaussianLikelihood(1.0)
        super().__init__(kernel, X, y, likelihood, jitter, mean)
        n = self.X.shape[0]
        self.q_nu = Parameter(jnp.zeros((n, 1)))
        self.q_lambda = Parameter(jnp.ones((n, 1)), lower=config.positive_minimum)

    @_sensitive
    def elbo(self):
        """ELBO (reference: gpr/model.py:602-639)."""
        y = self._residual_y()
        q_nu = self.q_nu()
        q_lambda = self.q_lambda()
        n = q_nu.shape[0]
        eye = jnp.eye(n, dtype=config.dtype)

        Kff = self.kernel.K(self.X)
        L = self._cholesky(q_lambda * q_lambda.T * Kff + eye)
        invL = solve_triangular(L, eye)

        qf_mu = Kff @ q_nu
        qf_var_diag = 1.0 / q_lambda ** 2 - jnp.diagonal(
            (invL.T @ invL) / q_lambda / q_lambda.T).reshape(-1, 1)

        kl = jnp.sum(q_nu * qf_mu)
        kl += jnp.sum(jnp.log(jnp.diagonal(L) ** 2))
        kl += jnp.sum(invL ** 2)
        kl -= n

        # NOTE: y is already the mean-residual (_residual_y) and qf_mu is the
        # variational mean of the ZERO-MEAN GP part, so no mean subtraction
        # happens here. The reference subtracts mean(X) from qf_mu too
        # (gpr/model.py:630-632), which makes q fit the RAW y and biases
        # predictions by +mean — a reference defect intentionally fixed
        # (see PARITY.md).
        var_exp = self.likelihood.variational_expectation(self.X, y, qf_mu, qf_var_diag)
        return var_exp - 0.5 * kl

    def log_marginal_likelihood(self):
        return self.elbo()

    @_sensitive
    def predict_f(self, X, full=False):
        """Posterior (reference: gpr/model.py:645-666)."""
        self._sync_mesh()
        X = self._check_input(X)
        Kff = self.kernel.K(self.X)
        Kfs = self.kernel.K(self.X, X)
        L = self._cholesky(Kff + jnp.diag((1.0 / self.q_lambda() ** 2).reshape(-1)))
        a = solve_triangular(L, Kfs)
        mu = Kfs.T @ self.q_nu()
        if self.mean is not None:
            mu = mu + self.mean(X).reshape(-1, 1)
        if full:
            Kss = self.kernel.K(X)
            var = Kss - a.T @ a
        else:
            Kss_diag = self.kernel.K_diag(X)
            var = (Kss_diag - jnp.sum(a * a, axis=0)).reshape(-1, 1)
        return mu, var


class Titsias(Model):
    """Collapsed sparse variational GP, Titsias 2009
    (reference: mogptk/gpr/model.py:668-765)."""

    def __init__(self, kernel, X, y, Z, Z_init="grid", variance=1.0, jitter=1e-8, mean=None):
        variance = jnp.asarray(variance, dtype=config.dtype)
        if variance.ndim != 0:
            # the collapsed bound's algebra treats sigma2 as a scalar
            # (Q/sigma2 on an (M,M) matrix, N·log(scale)); a per-channel
            # vector would fail with an obscure broadcast error at trace time
            raise ValueError("Titsias requires a scalar variance")
        super().__init__(kernel, X, y, GaussianLikelihood(jnp.sqrt(variance)), jitter, mean)
        Z = init_inducing_points(Z, self.X, method=Z_init, output_dims=kernel.output_dims)
        Z = self._check_input(Z)
        self.log_marginal_likelihood_constant = 0.5 * self.X.shape[0] * np.log(2.0 * np.pi)
        self.Z = Parameter(Z, name="induction_points")
        if kernel.output_dims is not None:
            self.Z.num_parameters -= self.Z().shape[0]

    @_sensitive
    def elbo(self):
        """Collapsed ELBO (reference: gpr/model.py:700-724)."""
        y = self._residual_y()
        sigma2 = self.likelihood.scale() ** 2
        Kff_diag = self.kernel.K_diag(self.X)
        # trained Z: input-differentiable Gram path (config.input_gradients;
        # the fused MOSM kernel emits x cotangents in-kernel under this scope)
        with input_gradients():
            Kuf = self.kernel.K(self.Z(), self.X)
            Kuu = self.kernel.K(self.Z())
        eye = jnp.eye(self.Z().shape[0], dtype=config.dtype)

        Luu = self._cholesky(Kuu, add_jitter=True)
        v = solve_triangular(Luu, Kuf)  # MxN
        # the one wide (M,N,M) GEMM: "high" (≈f32 accumulation) rather than
        # the scoped "highest" — CPU-f32 reproduces the trace cancellation
        # fine, and highest costs ~3 ms/step at M=1024, N=16k (bwd included)
        Q = jnp.matmul(v, v.T, precision="high")
        L = self._cholesky(Q / sigma2 + eye)
        c = solve_triangular(L, v @ y) / sigma2

        p = -self.log_marginal_likelihood_constant
        p = p - jnp.sum(jnp.log(jnp.diagonal(L)))
        p = p - self.X.shape[0] * jnp.log(self.likelihood.scale())
        p = p - 0.5 * jnp.sum(y * y) / sigma2
        p = p + 0.5 * jnp.sum(c * c)
        p = p - 0.5 * (jnp.sum(Kff_diag) - jnp.trace(Q)) / sigma2
        return p

    def log_marginal_likelihood(self):
        return self.elbo()

    @_sensitive
    def predict_f(self, X, full=False):
        """Posterior via the matrix-inversion-lemma-stable form
        (reference: gpr/model.py:730-765)."""
        self._sync_mesh()
        X = self._check_input(X)
        y = self._residual_y()
        sigma2 = self.likelihood.scale() ** 2
        Kus = self.kernel.K(self.Z(), X)
        Kuf = self.kernel.K(self.Z(), self.X)
        Kuu = self.kernel.K(self.Z())
        eye = jnp.eye(self.Z().shape[0], dtype=config.dtype)

        Luu = self._cholesky(Kuu, add_jitter=True)
        v = solve_triangular(Luu, Kuf)
        L = self._cholesky(jnp.matmul(v, v.T, precision="high") / sigma2 + eye)

        a = solve_triangular(Luu, Kus)
        b = solve_triangular(L, a)
        c = solve_triangular(L, v @ y) / sigma2

        mu = b.T @ c
        if self.mean is not None:
            mu = mu + self.mean(X).reshape(-1, 1)
        if full:
            Kss = self.kernel.K(X)
            var = Kss - a.T @ a + b.T @ b
        else:
            Kss_diag = self.kernel.K_diag(X)
            var = (Kss_diag - jnp.sum(a * a, axis=0) + jnp.sum(b * b, axis=0)).reshape(-1, 1)
        return mu, var


class SparseHensman(Model):
    """Sparse variational GP with whitened q(u), Hensman et al. 2015
    (reference: mogptk/gpr/model.py:767-869).

    q(u) ~ N(L·μ_q, L·Σ_q·Lᵀ) with LLᵀ = Kuu, so p(u) is whitened to N(0,I).
    """

    supports_row_mask = True  # sparse case only; elbo() raises otherwise

    def __init__(self, kernel, X, y, Z=None, Z_init="grid", likelihood=None, jitter=1e-8, mean=None):
        if likelihood is None:
            likelihood = GaussianLikelihood(1.0)
        super().__init__(kernel, X, y, likelihood, jitter, mean)

        n = self.X.shape[0]
        self.is_sparse = Z is not None
        if self.is_sparse:
            Z = init_inducing_points(Z, self.X, method=Z_init, output_dims=kernel.output_dims)
            Z = self._check_input(Z)
            n = Z.shape[0]

        self.log_marginal_likelihood_constant = 0.5 * self.X.shape[0] * np.log(2.0 * np.pi)
        self.q_mu = Parameter(jnp.zeros((n, 1)))
        self.q_sqrt = Parameter(jnp.eye(n))
        self.q_sqrt.num_parameters = int((n * n + n) / 2)
        if self.is_sparse:
            self.Z = Parameter(Z, name="induction_points")
            if kernel.output_dims is not None:
                self.Z.num_parameters -= self.Z().shape[0]
        else:
            self.Z = Parameter(self.X, name="induction_points", train=False)

    def kl_gaussian(self, q_mu, q_sqrt):
        """KL(q(u) ‖ N(0,I)) in whitened space (reference: gpr/model.py:808-814).

        Note: the reference uses only diag(q_sqrt)² for the trace term, but
        tr(CCᵀ) for a lower-triangular C is the sum of ALL squared entries;
        the reference's version is not a valid lower bound. The intended math
        is implemented here (logdet still depends only on the diagonal).
        """
        C = jnp.tril(q_sqrt)
        kl = jnp.sum(q_mu * q_mu)
        kl -= jnp.sum(jnp.log(jnp.diagonal(C) ** 2))
        kl += jnp.sum(C * C)
        kl -= q_mu.shape[0]
        return 0.5 * kl

    @_sensitive
    def elbo(self):
        """SVGP ELBO (reference: gpr/model.py:816-837)."""
        y = self._residual_y()
        mask = getattr(self, "_row_mask", None)
        if mask is not None and not self.is_sparse:
            raise ValueError("row masking requires inducing points (q(u) is "
                             "tied to the data points in the non-sparse case)")
        if self.is_sparse:
            qf_mu, qf_var_diag = self._predict_f(self.X, full=False)
        else:
            Kff = self.kernel.K(self.X)
            Lff = self._cholesky(Kff, add_jitter=True)
            # y is the mean-residual and Lff @ q_mu is the zero-mean GP
            # part: subtracting mean(X) here (as the reference does,
            # gpr/model.py:826-828) double-counts the mean and biases
            # predictions — fixed, see PARITY.md; the sparse branch above
            # already handles the mean correctly via _predict_f
            qf_mu = Lff @ self.q_mu()
            qf_sqrt = Lff @ jnp.tril(self.q_sqrt())
            qf_var_diag = jnp.sum(qf_sqrt * qf_sqrt, axis=1).reshape(-1, 1)

        var_exp = self.likelihood.variational_expectation(self.X, y, qf_mu, qf_var_diag,
                                                          weights=mask)
        kl = self.kl_gaussian(self.q_mu(), self.q_sqrt())
        return var_exp - kl

    def log_marginal_likelihood(self):
        return self.elbo()

    @_sensitive
    def _predict_f(self, X, full=False):
        """Whitened posterior (reference: gpr/model.py:843-859)."""
        # elbo() evaluates this at X=self.X with TRAINED Z — input-
        # differentiable Gram path required (config.input_gradients; the
        # fused MOSM kernel emits x cotangents in-kernel under this scope)
        with input_gradients():
            Kuu = self.kernel.K(self.Z())
            Kus = self.kernel.K(self.Z(), X)
        Luu = self._cholesky(Kuu, add_jitter=True)
        a = solve_triangular(Luu, Kus)  # MxS
        # wide (M,M,S) GEMM at "high" (see Titsias.elbo precision note)
        b = jnp.matmul(jnp.tril(self.q_sqrt()).T, a, precision="high")
        mu = Kus.T @ solve_triangular(Luu.T, self.q_mu(), lower=False)
        if full:
            Kss = self.kernel.K(X)
            var = Kss - a.T @ a + b.T @ b
        else:
            Kss_diag = self.kernel.K_diag(X)
            var = (Kss_diag - jnp.sum(a * a, axis=0) + jnp.sum(b * b, axis=0)).reshape(-1, 1)
        return mu, var

    @_sensitive
    def predict_f(self, X, full=False):
        self._sync_mesh()
        X = self._check_input(X)
        mu, var = self._predict_f(X, full=full)
        if self.mean is not None:
            mu = mu + self.mean(X).reshape(-1, 1)
        return mu, var


class Hensman(SparseHensman):
    """Non-sparse special case of SparseHensman: inducing points = data points
    (reference: mogptk/gpr/model.py:871-886)."""

    def __init__(self, kernel, X, y, likelihood=None, jitter=1e-8, mean=None):
        super().__init__(kernel, X, y, None, "grid", likelihood, jitter, mean)
