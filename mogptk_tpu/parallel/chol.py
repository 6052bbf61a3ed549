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
     slab with one MXU GEMM.

Every sweep in this module runs its P panel steps under `lax.fori_loop`,
so the traced program is ONE panel body regardless of the mesh size — the
r02 Python unrolls grew the program O(P) (and the LML backward O(P²)),
which both hit the remote-compile wall at real N and forced trimming the
CPU tests to a 4-device mesh. The price of the loop form is fixed-shape
bodies: the trailing update and substitution prefix GEMMs run at the full
slab width with a mask zeroing the already-finalized region (≤2× the
triangular-flow flops on work that is a 1/P-fraction of the total).

The reference is single-device only (SURVEY.md §2); this is the TPU-native
mesh analog of its torch.linalg.cholesky call (mogptk/gpr/model.py:246).
"""
import functools

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
        eye = jnp.eye(B, dtype=K_loc.dtype)
        col = jax.lax.iota(jnp.int32, n)

        def panel_step(k, carry):
            S, L = carry
            c0 = jnp.asarray(k, jnp.int32) * B
            diag = jax.lax.dynamic_slice(S, (jnp.int32(0), c0), (B, B))
            Skk = jax.lax.psum(jnp.where(d == k, diag, jnp.zeros_like(diag)),
                               axis)
            with jax.default_matmul_precision(panel_precision):
                Lkk = jnp.linalg.cholesky(Skk)
                invT = jsl.solve_triangular(Lkk, eye, lower=True).T
            # S_dk · L_kk⁻ᵀ: the panel block for d > k, and L_kk itself for
            # the owner (S_kk L_kk⁻ᵀ = L_kk); finalized rows (d < k) zero out
            Ldk = jnp.where(d >= k,
                            jax.lax.dot(diag, invT, precision="high"),
                            jnp.zeros_like(diag))
            L = jax.lax.dynamic_update_slice(L, Ldk, (jnp.int32(0), c0))
            # trailing update over the full slab width (fixed shape for the
            # fori_loop); the mask confines it to columns beyond the panel
            # and to not-yet-finalized rows
            panel = jax.lax.all_gather(Ldk, axis).reshape(n, B)   # (N, B)
            upd = jax.lax.dot_general(
                Ldk, panel, (((1,), (1,)), ((), ())),
                precision=update_precision)                        # (B, N)
            live = (d > k) & (col >= c0 + B)[None, :]
            S = S - jnp.where(live, upd, jnp.zeros_like(upd))
            return S, L

        _, L = jax.lax.fori_loop(
            0, n_dev, panel_step, (K_loc, jnp.zeros_like(K_loc)))
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
    d = jax.lax.axis_index(axis)
    R = rhs.shape[1]

    def true_diag(k):
        # the owner's L_kk, broadcast: every device then solves against
        # a valid triangular block (a non-owner's local slice would be
        # off-diagonal — singular solves produce inf/NaN garbage that
        # poisons autodiff even behind the masked select)
        blk = jax.lax.dynamic_slice(
            L_loc, (jnp.int32(0), jnp.asarray(k, jnp.int32) * Bn), (Bn, Bn))
        return jax.lax.psum(jnp.where(d == k, blk, jnp.zeros_like(blk)),
                            axis)

    # forward: L z = rhs. The replicated z is zero at blocks ≥ k, so the
    # owner's full-width slab product IS its block-prefix product (fixed
    # shape for the fori_loop); non-owners' products are psum-masked away.
    def fwd_step(k, z):
        c0 = jnp.asarray(k, jnp.int32) * Bn
        Dk = true_diag(k)
        pref = jax.lax.dot(L_loc, z, precision="high")            # (Bn, R)
        bk = jax.lax.dynamic_slice(rhs, (c0, jnp.int32(0)), (Bn, R))
        zk = jsl.solve_triangular(Dk, bk - pref, lower=True)
        zk = jax.lax.psum(jnp.where(d == k, zk, jnp.zeros_like(zk)), axis)
        return jax.lax.dynamic_update_slice(z, zk, (c0, jnp.int32(0)))

    z = jax.lax.fori_loop(0, n_dev, fwd_step, jnp.zeros_like(rhs))

    # backward: Lᵀ x = z;  (Lᵀ x)_k = L_kkᵀ x_k + Σ_{m>k} L_mkᵀ x_m,
    # where L_mk is row-owner m's column block k — computed locally and
    # psum'd, so Lᵀ is never materialized across the mesh
    def bwd_step(i, x):
        k = n_dev - 1 - jnp.asarray(i, jnp.int32)
        c0 = k * Bn
        Dk = true_diag(k)
        mine = jax.lax.dot_general(
            jax.lax.dynamic_slice(L_loc, (jnp.int32(0), c0), (Bn, Bn)),
            jax.lax.dynamic_slice(x, (d.astype(jnp.int32) * Bn,
                                      jnp.int32(0)), (Bn, R)),
            (((0,), (0,)), ((), ())), precision="high")   # L_dkᵀ x_d
        off = jax.lax.psum(jnp.where(d > k, mine, jnp.zeros_like(mine)),
                           axis)
        zk = jax.lax.dynamic_slice(z, (c0, jnp.int32(0)), (Bn, R))
        xk = jsl.solve_triangular(Dk, zk - off, lower=True, trans="T")
        xk = jax.lax.psum(jnp.where(d == k, xk, jnp.zeros_like(xk)), axis)
        return jax.lax.dynamic_update_slice(x, xk, (c0, jnp.int32(0)))

    return jax.lax.fori_loop(0, n_dev, bwd_step, jnp.zeros_like(rhs))


def _logdet_from_factor(L, mesh, axis):
    """Σ log diag(L) as a psum of each slab's local diagonal block."""
    n_dev = mesh.shape[axis]
    Bn = L.shape[-1] // n_dev

    def local_logdet(L_loc):
        d = jax.lax.axis_index(axis)
        diag = jnp.diagonal(jax.lax.dynamic_slice(
            L_loc, (jnp.asarray(0, d.dtype), d * Bn), (Bn, Bn)))
        return jax.lax.psum(jnp.sum(jnp.log(diag)), axis)

    return jax.shard_map(local_logdet, mesh=mesh, in_specs=(P(axis, None),),
                         out_specs=P())(L)


def _lml_value(K, y, mesh, axis):
    L = distributed_cholesky(K, mesh, axis)
    alpha = distributed_cho_solve(L, y, mesh, axis)
    logdet = _logdet_from_factor(L, mesh, axis)
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
    the panel loop would otherwise keep O(P) slab residuals = O(N²) per
    device in the backward. The dK cotangent comes back row-sharded over
    the mesh."""

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
            rows = jnp.arange(n)

            def inv_step(k, inv_slab):
                k = jnp.asarray(k, jnp.int32)
                Ek = (rows[:, None] == (k * Bn + jnp.arange(Bn))[None, :]
                      ).astype(L_loc.dtype)                        # (N, Bn)
                Xk = _cho_solve_local(L_loc, Ek, axis, n_dev, Bn)  # (N, Bn)
                return jnp.where(d == k, Xk.T, inv_slab)

            # the slab is device-varying (each keeps only its own block
            # rows), so the loop carry must start with that vma type
            init = jax.lax.pcast(jnp.zeros((Bn, n), L_loc.dtype), (axis,),
                                 to="varying")
            inv_slab = jax.lax.fori_loop(0, n_dev, inv_step, init)
            a_slab = jax.lax.dynamic_slice(
                alpha_rep, (d.astype(jnp.int32) * Bn, jnp.int32(0)),
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


def distributed_lml_stochastic(K, y, mesh, axis="data", num_probes=16,
                               seed=0):
    """distributed_lml with Hutchinson probe-trace gradients — the mesh
    counterpart of ops/linalg.lml_quadform_logdet_stochastic (same estimator
    and probe stream: seed-fixed Rademacher Z solved WITH y in one batched
    block-substitution sweep, so values AND gradients match the
    single-device stochastic LML bit-for-bit at identical parameters).

    The backward is dK = ½g(ααᵀ − R⁻¹ U Zᵀ) = A Bᵀ with A, B (N, R+1)
    replicated; each device emits its row slab with ONE (N/P, R+1)×(R+1, N)
    GEMM — no identity-block solves at all, so the probe path's backward is
    ~N²R/P flops per device versus the deterministic path's N³/P. This is
    what makes the headline probe-gradient configuration (trace_probes=16)
    fully distributable with O(N²/P) per-device memory.
    """

    @functools.partial(jax.custom_vjp, nondiff_argnums=())
    def _lml(K, y):
        return _stoch_value(K, y)[0]

    def _stoch_value(K, y):
        L = distributed_cholesky(K, mesh, axis)
        n = K.shape[-1]
        Z = jax.random.rademacher(jax.random.PRNGKey(seed), (n, num_probes),
                                  dtype=L.dtype)
        AU = distributed_cho_solve(L, jnp.concatenate([y, Z], axis=1),
                                   mesh, axis)
        alpha, U = AU[:, :y.shape[1]], AU[:, y.shape[1]:]
        logdet = _logdet_from_factor(L, mesh, axis)
        return -logdet - 0.5 * jnp.sum(y * alpha), alpha, U, Z

    def _fwd(K, y):
        val, alpha, U, Z = _stoch_value(K, y)
        return val, (alpha, U, Z)

    def _bwd(res, g):
        alpha, U, Z = res
        # same low-rank pair as ops/linalg._stoch_lowrank
        A = (0.5 * g) * jnp.concatenate([alpha, -U / num_probes], axis=1)
        Bm = jnp.concatenate([alpha, Z], axis=1)
        n_dev = mesh.shape[axis]
        Bn = alpha.shape[0] // n_dev

        def local(A_rep, B_rep):
            d = jax.lax.axis_index(axis)
            A_slab = jax.lax.dynamic_slice(
                A_rep, (d.astype(jnp.int32) * Bn, jnp.int32(0)),
                (Bn, A_rep.shape[1]))
            return jax.lax.dot_general(
                A_slab, B_rep, (((1,), (1,)), ((), ())), precision="high")

        dK = jax.shard_map(local, mesh=mesh, in_specs=(P(), P()),
                           out_specs=P(axis, None))(A, Bm)
        return dK, -g * alpha

    _lml.defvjp(_fwd, _bwd)
    return _lml(K, y)
