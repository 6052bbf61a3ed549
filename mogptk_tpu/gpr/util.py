"""Channel pack/unpack between per-channel lists and the single
(N, 1+input_dims) channel-ID format (capability parity with
mogptk/gpr/util.py:10-50)."""
import numpy as np
import jax.numpy as jnp

from .config import config


def merge_data(xs, ys=None):
    """Stack per-channel (x, y) lists into channel-ID format.

    Returns (N, X) or (N, X, Y) where N is the per-channel point count list
    and X has the channel ID in column 0 (reference: gpr/util.py:10-32).
    """
    if not isinstance(xs, list) or (ys is not None and not isinstance(ys, list)):
        raise ValueError("input must be a list of channels")
    output_dims = len(xs)
    if ys is not None and len(ys) != output_dims:
        raise ValueError("inputs must have the same number of output dimensions")
    xs = [np.asarray(x).reshape(len(np.asarray(x)), -1) for x in xs]
    N = [x.shape[0] for x in xs]
    if ys is not None:
        ys = [np.asarray(y).reshape(-1, 1) for y in ys]
        if not all(y.shape[0] == N[i] for i, y in enumerate(ys)):
            raise ValueError("inputs must have the same number of data points per output dimension")

    X = np.zeros((sum(N), 1 + xs[0].shape[1]))
    if ys is not None:
        Y = np.zeros((sum(N), 1))
    n = 0
    for channel, x in enumerate(xs):
        X[n:n + N[channel], 0] = channel
        X[n:n + N[channel], 1:] = x
        if ys is not None:
            Y[n:n + N[channel], :] = ys[channel]
        n += N[channel]
    X = jnp.asarray(X, dtype=config.dtype)
    if ys is not None:
        return N, X, jnp.asarray(Y, dtype=config.dtype)
    return N, X


def split_data(N, *Xs):
    """Split channel-ID-format arrays back into per-channel lists
    (reference: gpr/util.py:34-50)."""
    if not all(np.asarray(X).ndim == 2 for X in Xs):
        raise ValueError("inputs must have shape (data_points,dimensions)")
    if not all(np.asarray(X).shape[0] == sum(N) for X in Xs):
        raise ValueError("inputs must have number of data points that correspond to N")

    data = []
    for X in Xs:
        n = 0
        xs = []
        for channel in range(len(N)):
            xs.append(X[n:n + N[channel], :])
            n += N[channel]
        data.append(xs)
    if len(data) == 1:
        return data[0]
    return tuple(data)
