"""Optimizer-driven training for GPR models.

The reference trains with a per-iteration Python loop dispatching torch ops
(mogptk/model.py:441-579, gpr/model.py:279-292). Here the whole optimizer
step — kernel eval, Cholesky, gradient, optax update — is one jitted program,
and multiple steps are batched with lax.scan so the host dispatches once per
chunk instead of once per iteration. Supports Adam/SGD/AdaGrad/LBFGS like the
reference (mogptk/model.py:541-566).
"""
import time
import numpy as np
import jax
import jax.numpy as jnp
import optax

from .config import config


def _make_optimizer(method, lr, **kwargs):
    # default learning rates follow the torch optimizers the reference uses
    # (mogptk/model.py:541-561): Adam 1e-3, SGD/AdaGrad 1e-2
    method_l = method.lower().replace("-", "")
    if method_l == "adam":
        return optax.adam(1e-3 if lr is None else lr, **kwargs), False
    elif method_l == "sgd":
        return optax.sgd(1e-2 if lr is None else lr, **kwargs), False
    elif method_l == "adagrad":
        return optax.adagrad(1e-2 if lr is None else lr, **kwargs), False
    elif method_l == "lbfgs":
        # lr is driven by the line search; other options pass through
        return optax.lbfgs(**kwargs), True
    raise ValueError("optimizer method %s unknown; use Adam, SGD, AdaGrad, or LBFGS" % method)


def _default_chunk(iters, verbose, has_callback):
    return max(1, min(iters, 100 if not verbose and not has_callback else 10))


def _build_lbfgs_step(model, optimizer):
    # single-leaf parameter vector (model.make_flat_loss_fn): the optimizer
    # update and LBFGS history contractions run as a couple of fused
    # kernels instead of ~n_params micro-dispatches per step
    loss_flat, flatten, unflatten = model.make_flat_loss_fn()
    train_list, fixed = model._split_raws()
    train0 = flatten(train_list)

    def fun(params):
        return loss_flat(params, fixed)

    value_and_grad = optax.value_and_grad_from_state(fun)

    @jax.jit
    def step(params, opt_state):
        value, grad = value_and_grad(params, state=opt_state)
        updates, opt_state = optimizer.update(
            grad, opt_state, params, value=value, grad=grad, value_fn=fun)
        params = optax.apply_updates(params, updates)
        return params, opt_state, value

    return step, train0, unflatten


def _build_chunk_runner(model, optimizer):
    """Returns (train0, make_chunk) where make_chunk(length) is the jitted
    length-step scan program. train() and precompile() both build through
    here so the primed program is IDENTICAL to the one training runs (the
    persistent compilation cache keys on the lowered HLO)."""
    # single-leaf parameter vector (model.make_flat_loss_fn): one fused
    # optimizer-update kernel per step instead of ~n_params tiny ones
    loss_flat, flatten, unflatten = model.make_flat_loss_fn()
    train_list, fixed = model._split_raws()
    train0 = flatten(train_list)
    vg = jax.value_and_grad(loss_flat, argnums=0)

    def one_step(carry, _):
        params, opt_state = carry
        value, grads = vg(params, fixed)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return (params, opt_state), value

    def make_chunk(length):
        @jax.jit
        def run_chunk(params, opt_state):
            (params, opt_state), values = jax.lax.scan(
                one_step, (params, opt_state), None, length=length)
            return params, opt_state, values
        return run_chunk

    return train0, make_chunk, unflatten


def precompile(model, method="Adam", lr=None, iters=500, verbose=False,
               has_callback=True, chunk=None, cache_dir=None, **kwargs):
    """Compile the training-step program `train()` would run — without
    executing a single step — so the one-time XLA compile lands in the
    persistent compilation cache and every later `train()` (any process)
    starts in seconds.

    The full N=16k exact training step takes tens of minutes to compile
    through this image's remote-compile path (ROADMAP #4); priming moves
    that wait into a disposable warm-up run. Pass the SAME method/lr/
    chunk/verbose arguments the later train() will use (the cache keys on
    the exact program). `has_callback` mirrors whether train() will be
    called with a callback (the top-level Model.train always does — it
    changes the default chunk). `cache_dir` configures
    jax_compilation_cache_dir when given.

    Returns seconds spent compiling (≈0 when already cached)."""
    if cache_dir is not None:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    model._sync_mesh()  # align with the use_mesh policy before lowering
    optimizer, is_lbfgs = _make_optimizer(method, lr, **kwargs)
    t0 = time.time()
    if is_lbfgs:
        step, train0, _ = _build_lbfgs_step(model, optimizer)
        step.lower(train0, optimizer.init(train0)).compile()
    else:
        if chunk is None:
            chunk = _default_chunk(int(iters), verbose, has_callback)
        train0, make_chunk, _ = _build_chunk_runner(model, optimizer)
        if train0.shape[0] == 0:
            return 0.0
        make_chunk(int(chunk)).lower(train0, optimizer.init(train0)).compile()
    return time.time() - t0


def train(model, method="Adam", lr=None, iters=500, verbose=False, callback=None,
          chunk=None, **kwargs):
    """Train a gpr model in place; returns (losses, elapsed_seconds).

    Args:
        model: a mogptk_tpu.gpr.Model.
        method: 'Adam', 'SGD', 'AdaGrad', or 'LBFGS'.
        lr: Learning rate (ignored for LBFGS which uses a line search).
        iters: Number of optimizer steps.
        verbose: Print progress.
        callback: Called with (iteration, loss) after each chunk boundary.
        chunk: Steps fused per compiled scan (defaults to a heuristic).
    """
    iters = int(iters)
    if iters < 0:
        raise ValueError("iters must be non-negative")
    model._sync_mesh()  # shard data/params when a use_mesh policy is active
    optimizer, is_lbfgs = _make_optimizer(method, lr, **kwargs)

    train0, _ = model._split_raws()
    if len(train0) == 0 or iters == 0:
        return np.zeros(0), 0.0

    if chunk is None:
        chunk = _default_chunk(iters, verbose, callback is not None)
    chunk = int(chunk)
    if chunk < 1:
        raise ValueError("chunk must be >= 1")

    if is_lbfgs:
        step, train0, unflatten = _build_lbfgs_step(model, optimizer)
        params = train0
        opt_state = optimizer.init(params)
        losses = []
        start = time.time()
        for i in range(iters):
            params, opt_state, value = step(params, opt_state)
            losses.append(float(value))
            if verbose and (i % max(1, iters // 20) == 0 or i == iters - 1):
                print("  iter %5d/%d  loss %.6g" % (i + 1, iters, losses[-1]))
            if callback is not None:
                # sync the optimized raws first: callbacks read the MODEL
                # (per-iteration error tracking predicts with current params)
                model.set_train_raws(unflatten(params))
                callback(i, losses[-1])
        elapsed = time.time() - start
        model.set_train_raws(unflatten(params))
        model.check_numerics(losses[-1])
        return np.asarray(losses), elapsed

    train0, make_chunk, unflatten = _build_chunk_runner(model, optimizer)
    run_chunk = make_chunk(chunk)

    params = train0
    opt_state = optimizer.init(params)
    losses = []
    start = time.time()
    done = 0
    while done < iters:
        n = min(chunk, iters - done)
        if n < chunk:
            # tail smaller than chunk: a shorter scan of the same step
            params, opt_state, values = make_chunk(n)(params, opt_state)
        else:
            params, opt_state, values = run_chunk(params, opt_state)
        values = np.asarray(values)
        losses.extend(values.tolist())
        done += n
        if verbose:
            print("  iter %5d/%d  loss %.6g" % (done, iters, losses[-1]))
        if callback is not None:
            # sync the optimized raws first: callbacks read the MODEL
            # (per-iteration error tracking predicts with current params)
            model.set_train_raws(unflatten(params))
            callback(done - 1, losses[-1])
    elapsed = time.time() - start
    model.set_train_raws(unflatten(params))
    model.check_numerics(losses[-1])
    return np.asarray(losses), elapsed
