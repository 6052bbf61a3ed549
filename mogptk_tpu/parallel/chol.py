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


def distributed_cho_solve(L, B, mesh, axis="data"):
    """K⁻¹B given the row-sharded factor from distributed_cholesky.

    Block substitution across the mesh: the forward sweep broadcasts each
    solved block with a masked psum ((B, R) per step); the backward sweep
    with Lᵀ needs column block k of L, whose pieces L_mk live on their row
    owners — each device contributes L_mkᵀ x_m locally and one psum forms
    the off-diagonal term, so Lᵀ is never materialized or transposed across
    the mesh. Total ICI traffic 2·N·R. Returns K⁻¹B replicated.
    """
    n_dev = mesh.shape[axis]
    n = L.shape[-1]
    Bn = n // n_dev

    def local(L_loc, rhs):
        return _cho_solve_local(L_loc, rhs, axis, n_dev, Bn)

    f = jax.shard_map(local, mesh=mesh, in_specs=(P(axis, None), P()),
                      out_specs=P())
    return f(L, B)


def _cho_solve_local(L_loc, rhs, axis, n_dev, Bn):
    """The per-device body of distributed_cho_solve — reusable inside other
    shard_map contexts (e.g. the distributed LML backward)."""
    if True:
        d = jax.lax.axis_index(axis)

        def true_diag(k):
            # the owner's L_kk, broadcast: every device then solves against
            # a valid triangular block (a non-owner's local slice would be
            # off-diagonal — singular solves produce inf/NaN garbage that
            # poisons autodiff even behind the masked select)
            blk = jax.lax.dynamic_slice(L_loc, (0, k * Bn), (Bn, Bn))
            return jax.lax.psum(jnp.where(d == k, blk, jnp.zeros_like(blk)),
                                axis)

        # forward: L z = rhs
        z = jnp.zeros_like(rhs)
        for k in range(n_dev):
            c0 = k * Bn
            Dk = true_diag(k)
            # my slab's prefix product is only meaningful on the owner; the
            # replicated z is zero beyond block k−1
            pref = jax.lax.dot(L_loc[:, :c0], z[:c0],
                               precision="high") if k else jnp.zeros(
                                   (Bn, rhs.shape[1]), rhs.dtype)
            bk = jax.lax.dynamic_slice(rhs, (c0, 0), (Bn, rhs.shape[1]))
            zk = jsl.solve_triangular(Dk, bk - pref, lower=True)
            zk = jax.lax.psum(jnp.where(d == k, zk, jnp.zeros_like(zk)),
                              axis)
            z = jax.lax.dynamic_update_slice(z, zk, (c0, 0))
        # backward: Lᵀ x = z;  (Lᵀ x)_k = L_kkᵀ x_k + Σ_{m>k} L_mkᵀ x_m,
        # where L_mk is row-owner m's column block k — computed locally and
        # psum'd, so Lᵀ is never materialized across the mesh
        x = jnp.zeros_like(rhs)
        for k in range(n_dev - 1, -1, -1):
            c0 = k * Bn
            Dk = true_diag(k)
            mine = jax.lax.dot_general(
                jax.lax.dynamic_slice(L_loc, (0, c0), (Bn, Bn)),
                jax.lax.dynamic_slice(x, (d * Bn, jnp.asarray(0, d.dtype)),
                                      (Bn, rhs.shape[1])),
                (((0,), (0,)), ((), ())), precision="high")   # L_dkᵀ x_d
            off = jax.lax.psum(jnp.where(d > k, mine, jnp.zeros_like(mine)),
                               axis)
            zk = jax.lax.dynamic_slice(z, (c0, 0), (Bn, rhs.shape[1]))
            xk = jsl.solve_triangular(Dk, zk - off, lower=True, trans="T")
            xk = jax.lax.psum(jnp.where(d == k, xk, jnp.zeros_like(xk)),
                              axis)
            x = jax.lax.dynamic_update_slice(x, xk, (c0, 0))
        return x


def _lml_value(K, y, mesh, axis):
    L = distributed_cholesky(K, mesh, axis)
    alpha = distributed_cho_solve(L, y, mesh, axis)
    n_dev = mesh.shape[axis]
    Bn = K.shape[-1] // n_dev

    def local_logdet(L_loc):
        d = jax.lax.axis_index(axis)
        diag = jnp.diagonal(jax.lax.dynamic_slice(
            L_loc, (jnp.asarray(0, d.dtype), d * Bn), (Bn, Bn)))
        return jax.lax.psum(jnp.sum(jnp.log(diag)), axis)

    logdet = jax.shard_map(local_logdet, mesh=mesh, in_specs=(P(axis, None),),
                           out_specs=P())(L)
    return -logdet - 0.5 * jnp.sum(y * alpha), L, alpha


def distributed_lml(K, y, mesh, axis="data"):
    """−Σ log diag(L) − ½ yᵀK⁻¹y with K row-sharded over the mesh: the
    factorization runs distributed (O(N²/P) per device), the solves use the
    block-substitution sweeps above, and the log-determinant is a psum of
    each slab's local diagonal. The counterpart of
    ops/linalg.lml_quadform_logdet for mesh-resident Grams.

    Gradients use the closed-form custom VJP dK = ½g(ααᵀ − K⁻¹), with each
    device computing only ITS ROW SLAB of K⁻¹ (P block-substitution solves
    against identity column blocks inside one shard_map) — autodiff through
    the unrolled panel loop would otherwise keep O(P) slab residuals =
    O(N²) per device in the backward. The dK cotangent comes back
    row-sharded over the mesh."""
    import functools

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def _lml(K, y):
        return _lml_value(K, y, mesh, axis)[0]

    def _fwd(K, y):
        val, L, alpha = _lml_value(K, y, mesh, axis)
        return val, (L, alpha)

    def _bwd(res, g):
        L, alpha = res
        n_dev = mesh.shape[axis]
        n = L.shape[-1]
        Bn = n // n_dev

        def local(L_loc, alpha_rep):
            d = jax.lax.axis_index(axis)
            # my row slab of K⁻¹ (symmetric: rows d = (K⁻¹ E_d)ᵀ): run the
            # P identity-block solves; each device keeps only its own
            inv_slab = jnp.zeros((Bn, n), L_loc.dtype)
            rows = jnp.arange(n)
            for k in range(n_dev):
                Ek = (rows[:, None] == (k * Bn + jnp.arange(Bn))[None, :]
                      ).astype(L_loc.dtype)                     # (N, Bn)
                Xk = _cho_solve_local(L_loc, Ek, axis, n_dev, Bn)  # (N, Bn)
                inv_slab = jnp.where(d == k, Xk.T, inv_slab)
            a_slab = jax.lax.dynamic_slice(
                alpha_rep, (d * Bn, jnp.asarray(0, d.dtype)),
                (Bn, alpha_rep.shape[1]))
            dK_slab = 0.5 * (jax.lax.dot(a_slab, alpha_rep.T,
                                         precision="high")
                             - inv_slab)
            return dK_slab

        dK = jax.shard_map(local, mesh=mesh, in_specs=(P(axis, None), P()),
                           out_specs=P(axis, None))(L, alpha)
        return g * dK, -g * alpha

    _lml.defvjp(_fwd, _bwd)
    return _lml(K, y)
