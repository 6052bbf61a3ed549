"""Dense linear-algebra primitives for the GP compute path.

The reference delegates to torch.linalg (cholesky/cholesky_solve/
solve_triangular at mogptk/gpr/model.py:246,452,470). Here the same
capability maps onto XLA's blocked TPU implementations via jax.
`jittered_cholesky` reproduces the reference's relative-jitter strategy
(gpr/model.py:242-255): jitter is scaled by the mean of the diagonal. Under
jit, a failed factorization produces NaNs instead of raising; callers detect
NaN losses host-side and raise CholeskyException with diagnostics.
"""
import jax.numpy as jnp
import jax.scipy.linalg as jsl


def jittered_cholesky(K, jitter=None):
    """Cholesky factor of K with optional relative jitter added to the diagonal.

    jitter is relative: `jitter * mean(diag(K))` is added, matching the
    reference (mogptk/gpr/model.py:242-244).
    """
    if jitter is not None and jitter != 0.0:
        n = K.shape[-1]
        K = K + (jitter * jnp.mean(jnp.diagonal(K, axis1=-2, axis2=-1), axis=-1)[..., None, None]) * jnp.eye(n, dtype=K.dtype)
    return jnp.linalg.cholesky(K)


def solve_triangular(L, B, lower=True, trans=False):
    return jsl.solve_triangular(L, B, lower=lower, trans=1 if trans else 0)


def trisolve_lower(L, B):
    return jsl.solve_triangular(L, B, lower=True)


def cholesky_solve(L, B):
    """Solve K x = B given the lower Cholesky factor L of K."""
    return jsl.cho_solve((L, True), B)
