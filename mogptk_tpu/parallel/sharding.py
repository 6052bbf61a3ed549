"""Multi-chip sharding for GP training over a jax.sharding.Mesh.

The reference is strictly single-device (SURVEY.md §2: no distributed
execution of any kind), so this subsystem is designed TPU-first rather than
ported. The parallelism axes that exist in a GP workload map onto the mesh as:

- data parallelism (dp): shard the N training points. For SVGP/variational
  models the ELBO is a sum over points — each device computes its local
  variational expectation and XLA inserts the psum; gradients all-reduce over
  ICI. This is the production-scaling path (N can be millions with SVGP).
- sequence/Gram parallelism (sp analog): for exact inference the O(N²·Q·D)
  Gram assembly — the reference's hot loop #2 (gpr/kernel.py:446-481) — is
  sharded by row-blocks; the Cholesky runs on the gathered matrix (XLA
  inserts the all-gather over ICI).
- model parallelism (tp analog): per-channel/per-component parameter tables
  are tiny; inducing-point blocks (M×M) may be sharded for very large M.

All entry points use jit + NamedSharding (GSPMD): annotate in/out shardings,
let XLA insert collectives.
"""
import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..gpr.config import config


def make_mesh(n_devices=None, axis="data"):
    """Build a 1-D device mesh over available devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


# -- global mesh policy (user-facing multi-chip: mogptk_tpu.use_mesh) --------

_active_mesh = None
_active_axis = "data"


def use_mesh(n="all", axis="data"):
    """Turn multi-chip execution on (or off) for the standard Model API.

    One line scales the README quick-start across chips — every later
    `Model.train()` / `predict()` / `error()` / `log_marginal_likelihood()`
    call routes through the mesh machinery appropriate to its inference
    scheme (the reference's `Model.train`, mogptk/model.py:441-579, is
    strictly single-device):

    - variational models (Titsias/Snelson/Hensman/OpperArchambeau): the
      training data is row-sharded and parameters replicated; the ELBO is a
      sum over points so GSPMD partitions the per-point work and
      all-reduces over ICI (data parallelism).
    - `Exact`: additionally the N×N Gram carries a row-block sharding and
      the LML routes through the distributed panel Cholesky + solves
      (parallel/chol.py) — O(N²/P) memory per device, nothing ever gathers
      the full Gram.
    - `Iterative` (ExactIterative): every Gram application runs as the
      shard_map ppermute ring (parallel/ring.py) — O(N/P) per device.

    Args:
        n: "all" (default) for every visible device, an int for the first n
           devices, or None/False to go back to single-device execution.
        axis: mesh axis name.

    Models are re-sharded lazily at their next API call; switching the mesh
    off restores their original (unpadded, single-device) state. When N is
    not divisible by the device count the data is padded and masked out of
    the objective exactly — models that cannot mask (non-sparse Hensman,
    Titsias/Snelson/OpperArchambeau) require divisible N.

    Returns the active jax.sharding.Mesh (or None)."""
    global _active_mesh, _active_axis
    if n is None or n is False:
        _active_mesh = None
    else:
        _active_mesh = make_mesh(None if n in ("all", True) else int(n), axis)
        _active_axis = axis
    config.bump()  # invalidate per-model jit caches
    return _active_mesh


def active_mesh():
    """The (mesh, axis) installed by use_mesh, or (None, "data")."""
    return _active_mesh, _active_axis


def sync_model_mesh(model):
    """Align a gpr model's data/parameter sharding with the active global
    mesh. Called from the public entry points (train/loss/predict); no-op
    when nothing changed. Idempotent and reversible: use_mesh(None) restores
    the original unpadded single-device state at the model's next call."""
    mesh, axis = _active_mesh, _active_axis
    cur = getattr(model, "_mesh_prepared", None)
    if cur is None and mesh is None:
        return
    if cur is not None and cur[0] is mesh:
        return
    if cur is not None:
        _unprepare_model(model, cur)
    if mesh is not None:
        _prepare_model(model, mesh, axis)


def _prepare_model(model, mesh, axis):
    from ..gpr.model import Exact
    from ..gpr.iterative import ExactIterative

    n0 = int(model.X.shape[0])
    X_sh, y_sh, n_real = shard_data(model.X, model.y, mesh, axis)
    mask = None
    if n_real != X_sh.shape[0]:
        if not getattr(model, "supports_row_mask", False):
            raise ValueError(
                "use_mesh: N=%d does not divide the %d-device mesh and %s "
                "cannot mask padded rows out of its objective; use a "
                "divisible number of training points or devices"
                % (n_real, mesh.shape[axis], type(model).__name__))
        mask = jnp.concatenate([
            jnp.ones((n_real,), dtype=config.dtype),
            jnp.zeros((X_sh.shape[0] - n_real,), dtype=config.dtype)])
        mask = jax.device_put(mask, NamedSharding(mesh, P(axis)))
    object.__setattr__(model, "X", X_sh)
    object.__setattr__(model, "y", y_sh)
    object.__setattr__(model, "_row_mask", mask)
    if isinstance(model, Exact):
        model.use_gram_sharding(mesh, axis)
    elif isinstance(model, ExactIterative):
        model.use_ring(mesh, axis)
    replicated = NamedSharding(mesh, P())
    for p in model.parameters():
        p._raw = jax.device_put(p._raw, replicated)
    model._jit_cache.clear()
    object.__setattr__(model, "_mesh_prepared", (mesh, axis, n0))


def _unprepare_model(model, cur):
    from ..gpr.model import Exact
    from ..gpr.iterative import ExactIterative

    _, _, n_real = cur
    X = jnp.asarray(np.asarray(model.X)[:n_real])
    y = jnp.asarray(np.asarray(model.y)[:n_real])
    object.__setattr__(model, "X", X)
    object.__setattr__(model, "y", y)
    object.__setattr__(model, "_row_mask", None)
    if isinstance(model, Exact):
        model.use_gram_sharding(None)
    elif isinstance(model, ExactIterative):
        model.use_ring(None)
    for p in model.parameters():
        p._raw = jnp.asarray(np.asarray(p._raw))
    model._jit_cache.clear()
    object.__setattr__(model, "_mesh_prepared", None)


def _pad_to_multiple(arr, mult, axis=0, pad_value=0.0):
    n = arr.shape[axis]
    rem = (-n) % mult
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return jnp.pad(arr, pad, constant_values=pad_value), n


def shard_data(X, y, mesh, axis="data"):
    """Place (X, y) row-sharded over the mesh, padding N to a multiple of the
    device count. Returns (X_sh, y_sh, n_real).

    Padded y rows carry 0.5 — a value in every likelihood's support (so no
    log(0) infinities leak through the masked terms); the training step masks
    them out of the objective entirely."""
    n_dev = mesh.shape[axis]
    X, n_real = _pad_to_multiple(jnp.asarray(X, dtype=config.dtype), n_dev)
    y, _ = _pad_to_multiple(jnp.asarray(y, dtype=config.dtype), n_dev, pad_value=0.5)
    sh = NamedSharding(mesh, P(axis, None))
    return jax.device_put(X, sh), jax.device_put(y, sh), n_real


def data_parallel_step(model, mesh, optimizer, axis="data"):
    """Build a jitted data-parallel SVGP/variational training step.

    The model's training inputs (model.X, model.y) are row-sharded over the
    mesh; parameters are replicated. The ELBO's variational expectation is a
    masked sum over points, so XLA partitions the Gauss-Hermite quadrature
    and kernel cross-blocks by data rows and all-reduces the scalar.

    Returns (step, params0, opt_state0, X_sh, y_sh):
        step(params, opt_state, X_sh, y_sh) -> (params, opt_state, loss)
    """
    X_sh, y_sh, n_real = shard_data(model.X, model.y, mesh, axis)
    mask = None
    if n_real != X_sh.shape[0]:
        if not getattr(model, "supports_row_mask", False):
            raise ValueError(
                "N=%d does not divide the %d-device mesh and %s cannot mask "
                "padded rows out of its objective" %
                (n_real, mesh.shape[axis], type(model).__name__))
        mask = jnp.concatenate([
            jnp.ones((n_real,), dtype=config.dtype),
            jnp.zeros((X_sh.shape[0] - n_real,), dtype=config.dtype)])
        mask = jax.device_put(mask, NamedSharding(mesh, P(axis)))

    params0, fixed = model._split_raws()
    replicated = NamedSharding(mesh, P())
    params0 = [jax.device_put(p, replicated) for p in params0]
    fixed_sh = [jax.device_put(p, replicated) for p in fixed]

    def loss_fn(params, X, y):
        raws = model._merge_raws(params, fixed_sh)
        with model.bind(raws):
            old_X, old_y = model.X, model.y
            old_mask = getattr(model, "_row_mask", None)
            try:
                object.__setattr__(model, "X", X)
                object.__setattr__(model, "y", y)
                object.__setattr__(model, "_row_mask", mask)
                return model.forward()
            finally:
                object.__setattr__(model, "X", old_X)
                object.__setattr__(model, "y", old_y)
                object.__setattr__(model, "_row_mask", old_mask)

    opt_state0 = optimizer.init(params0)

    import optax

    @jax.jit
    def step(params, opt_state, X, y):
        value, grads = jax.value_and_grad(loss_fn)(params, X, y)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    return step, params0, opt_state0, X_sh, y_sh


def exact_sharded_step(model, mesh, optimizer, axis="data"):
    """Exact-GP LML+grad step with the Gram sharded by rows end to end.

    X is row-sharded and the N×N Gram carries an explicit row-block sharding
    constraint (each device assembles and back-propagates through only its
    N/devices × N rows). The factorization, solves, and backward also run
    distributed — parallel.chol.distributed_lml for the deterministic
    gradient, distributed_lml_stochastic for probe gradients, with
    masked/padded (non-divisible N) configurations handled by an
    elementwise Gram rewrite that GSPMD keeps row-sharded — so per-device
    memory is O(N²/P) throughout and nothing ever gathers the full Gram.
    For fully-distributed O(N/P)-memory inference use `iterative_ring_step`.
    """
    from ..gpr.model import Exact
    if isinstance(model, Exact):
        model.use_gram_sharding(mesh, axis)
    return data_parallel_step(model, mesh, optimizer, axis)


def iterative_ring_step(model, mesh, optimizer, axis="data"):
    """Fully row-sharded exact iterative training step.

    Every Gram application (CG, SLQ, and the low-rank backward) runs as a
    shard_map ppermute ring over row blocks (parallel/ring.py): each device
    owns N/devices rows of (X, y), no device ever holds more than an
    (N/P, N/P) block of K-related state, and N scales linearly with the
    device count. This is the multi-chip scaling path for exact inference.
    """
    from ..gpr.iterative import ExactIterative
    if not isinstance(model, ExactIterative):
        raise ValueError("iterative_ring_step requires an ExactIterative model")
    model.use_ring(mesh, axis)
    return data_parallel_step(model, mesh, optimizer, axis)
