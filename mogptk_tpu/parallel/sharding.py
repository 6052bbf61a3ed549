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
