"""Distributed Cholesky factorization over a device mesh (ROADMAP #6).

Right-looking panel factorization with the matrix row-sharded over a 1-D
mesh: device d owns the (N/P, N) row slab of K and produces the matching
slab of L, so per-device memory is O(N²/P) — the factorization no longer
gathers the full matrix anywhere (the caveat `exact_sharded_step`
documents for the single-device Cholesky).

Per panel step k (one column block of width B = N/P):
  1. the k-th diagonal block is selected with a masked psum (non-owners
     contribute zeros) and factored REDUNDANTLY on every device — a B×B
     Cholesky per step costs P·B³ total, a 1/P-fraction of the N³/3 bulk;
  2. every device forms its panel block L_dk = S_dk · L_kk⁻ᵀ with one GEMM
     against the explicit triangular inverse (the same TRSM-via-inverse the
     single-chip ops/blocked_cholesky.py uses) — for the owner the identity
     S_kk L_kk⁻ᵀ = L_kk makes the same formula produce the diagonal block;
  3. the panel column is all_gathered ((N, B) per step — Σ_k N·B = N²
     total ICI traffic) and each device applies the trailing update to its
     slab's remaining columns with one MXU GEMM.

The Python loop over the P panels is a static unroll (P ≤ mesh size), so
every slice is static-shaped and each step's GEMM is a single
MXU-saturating dot, exactly like the single-chip blocked factorization.

The reference is single-device only (SURVEY.md §2); this is the TPU-native
mesh analog of its torch.linalg.cholesky call (mogptk/gpr/model.py:246).
"""
import jax
import jax.numpy as jnp
import jax.scipy.linalg as jsl
from jax.sharding import PartitionSpec as P


def distributed_cholesky(K, mesh, axis="data", panel_precision="highest",
                         update_precision="high"):
    """Lower-Cholesky factor of an (N, N) SPD matrix, row-sharded over
    `mesh[axis]`; returns L row-sharded the same way (upper half zero).

    N must be a multiple of the device count (pad via
    parallel.sharding shard helpers if needed). Semantics match
    jnp.linalg.cholesky: NaN rows where the matrix is not positive
    definite, so jitter ladders keep working.
    """
    n_dev = mesh.shape[axis]
    n = K.shape[-1]
    if K.ndim != 2 or K.shape[0] != n:
        raise ValueError("distributed_cholesky expects a square 2-D matrix")
    if n % n_dev != 0:
        raise ValueError("N=%d must divide the %d-device mesh" % (n, n_dev))
    B = n // n_dev

    def local(K_loc):
        d = jax.lax.axis_index(axis)
        S = K_loc                                   # (B, N) row slab
        L = jnp.zeros_like(K_loc)
        eye = jnp.eye(B, dtype=K_loc.dtype)
        for k in range(n_dev):
            c0 = k * B
            diag = jax.lax.dynamic_slice(S, (0, c0), (B, B))
            own = (d == k)
            Skk = jax.lax.psum(jnp.where(own, diag, jnp.zeros_like(diag)),
                               axis)
            with jax.default_matmul_precision(panel_precision):
                Lkk = jnp.linalg.cholesky(Skk)
                invT = jsl.solve_triangular(Lkk, eye, lower=True).T
            # S_dk · L_kk⁻ᵀ: the panel block for d > k, and L_kk itself for
            # the owner (S_kk L_kk⁻ᵀ = L_kk); finalized rows (d < k) zero out
            Ldk = jnp.where(d >= k,
                            jax.lax.dot(diag, invT, precision="high"),
                            jnp.zeros_like(diag))
            L = jax.lax.dynamic_update_slice(L, Ldk, (0, c0))
            if k == n_dev - 1:
                break
            panel = jax.lax.all_gather(Ldk, axis)   # (P, B, B)
            trail = panel.reshape(n_dev * B, B)[c0 + B:]  # (N−(k+1)B, B)
            upd = jax.lax.dot_general(
                Ldk, trail, (((1,), (1,)), ((), ())),
                precision=update_precision)          # (B, N−(k+1)B)
            upd = jnp.where(d > k, upd, jnp.zeros_like(upd))
            S = jax.lax.dynamic_update_slice(
                S, jax.lax.dynamic_slice(S, (0, c0 + B), upd.shape) - upd,
                (0, c0 + B))
        return L

    f = jax.shard_map(local, mesh=mesh, in_specs=(P(axis, None),),
                      out_specs=P(axis, None))
    return f(K)
