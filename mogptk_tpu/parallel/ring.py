"""Ring-scheduled distributed Gram products over a device mesh.

The iterative exact-GP engine (gpr/iterative.py) reduces all O(N²) work to
two primitives: K @ V and the low-rank parameter cotangent for dK = A Bᵀ.
Here both are distributed over a 1-D mesh with a shard_map ppermute ring:

- every device owns N/P rows of (x, c, V);
- at ring step s, device i holds column block (i−s) mod P and computes the
  (N/P, N/P) block product K(rows_i, block) @ V_block, accumulating into its
  local output rows;
- the column block (x, c, V) then rotates to the next device over ICI.

Per-device memory is O(N/P) — the Gram is never materialized anywhere (the
block product itself runs through the fused Pallas kernels on TPU, or a
dense (N/P, N/P) block off-TPU) — so N scales linearly with devices. Works
for every fused kernel family (ops/fused.py). This is the multi-chip design
SURVEY.md §7 calls for; the reference is single-device only (SURVEY.md §2).
"""
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from ..ops.fused import resolve_family, fused_gram_matvec, fused_gram_lowrank_vjp


def _ring_perm(n_dev):
    # cyclic shift: device i sends to i+1, so after P steps every device has
    # seen every column block exactly once
    return [(i, (i + 1) % n_dev) for i in range(n_dev)]


def ring_gram_matvec(mesh, axis, family, O, x, c, noise_diag, params,
                     use_pallas, V):
    """Distributed (K + diag(noise)) @ V with rows of K sharded over `axis`.

    x (N,D), c (N,) int, noise_diag (N,), V (N,R) — all row-sharded (or
    shardable) over the mesh; N must be a multiple of the device count
    (callers pad via parallel.sharding.shard_data). Returns K@V row-sharded.
    """
    n_dev = mesh.shape[axis]
    perm = _ring_perm(n_dev)

    def block_product(x1, c1, x2, c2, Vb):
        if use_pallas:
            return fused_gram_matvec(family, O, x1, c1, x2, c2, params, Vb)
        _, dense, _ = resolve_family(family)
        return dense(c1, x1, c2, x2, params) @ Vb

    def local(x_loc, c_loc, noise_loc, V_loc):
        # local diagonal block first, then n_dev−1 rotations (rotating
        # before each off-local product): the last rotation of the naive
        # n_dev-step loop only fed a discarded carry — one wasted round of
        # ICI transfers per K application
        def step(_, carry):
            acc, xb, cb, Vb = carry
            xb = jax.lax.ppermute(xb, axis, perm)
            cb = jax.lax.ppermute(cb, axis, perm)
            Vb = jax.lax.ppermute(Vb, axis, perm)
            acc = acc + block_product(x_loc, c_loc, xb, cb, Vb)
            return acc, xb, cb, Vb

        acc0 = (noise_loc[:, None] * V_loc
                + block_product(x_loc, c_loc, x_loc, c_loc, V_loc))
        acc, _, _, _ = jax.lax.fori_loop(0, n_dev - 1, step,
                                         (acc0, x_loc, c_loc, V_loc))
        return acc

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis), P(axis), P(axis, None)),
                      out_specs=P(axis, None))
    return f(x, c, noise_diag, V)


def ring_gram_lowrank_vjp(mesh, axis, family, O, x, c, params, use_pallas,
                          A, B):
    """Distributed parameter cotangents for dK = A Bᵀ (A, B row-sharded).

    Each device accumulates the VJP of its row block against the rotating
    column blocks of B, then the parameter-shaped partials psum over the
    mesh. dK is never materialized beyond one (N/P, N/P) block per device.
    Returns a tuple matching `params`.
    """
    n_dev = mesh.shape[axis]
    perm = _ring_perm(n_dev)

    def block_vjp(x1, c1, x2, c2, Ab, Bb):
        if use_pallas:
            return fused_gram_lowrank_vjp(family, O, x1, c1, x2, c2, params,
                                          Ab, Bb)
        _, dense, _ = resolve_family(family)
        # pcast the (replicated) parameters so the cotangents stay LOCAL
        # partials — otherwise JAX's vma-typed autodiff auto-psums the
        # cotangent of every replicated input, and the explicit psum below
        # would double-count (the Pallas branch has no autodiff and always
        # yields the local partial, so both branches must agree)
        pv = lambda a: jax.lax.pcast(a, axis, to="varying")
        _, vjp = jax.vjp(lambda ps: dense(c1, x1, c2, x2, ps),
                         tuple(pv(p) for p in params))
        (d,) = vjp(Ab @ Bb.T)
        return d

    def local(x_loc, c_loc, A_loc, B_loc):
        # local diagonal block outside the loop, n_dev−1 rotations inside
        # (rotate first, then accumulate) — saves one discarded ppermute
        # round; the carry starts from the local partials, so no explicit
        # zeros (whose closed-over Auto-mesh avals were illegal to broadcast
        # inside the Manual shard_map context anyway)
        def step(_, carry):
            acc, xb, cb, Bb = carry
            xb = jax.lax.ppermute(xb, axis, perm)
            cb = jax.lax.ppermute(cb, axis, perm)
            Bb = jax.lax.ppermute(Bb, axis, perm)
            d = block_vjp(x_loc, c_loc, xb, cb, A_loc, Bb)
            acc = tuple(a + g for a, g in zip(acc, d))
            return acc, xb, cb, Bb

        acc0 = block_vjp(x_loc, c_loc, x_loc, c_loc, A_loc, B_loc)
        acc, _, _, _ = jax.lax.fori_loop(0, n_dev - 1, step,
                                         (tuple(acc0), x_loc, c_loc, B_loc))
        return tuple(jax.lax.psum(a, axis) for a in acc)

    f = jax.shard_map(local, mesh=mesh,
                      in_specs=(P(axis, None), P(axis), P(axis, None), P(axis, None)),
                      out_specs=tuple(P() for _ in params))
    return f(x, c, A, B)


# -- MOSM-specific wrappers (back-compat with the original MOSM-only API) ----

def mosm_ring_matvec(mesh, axis, x, c, noise_diag, params, twopi,
                     phase_inside, use_pallas, V):
    O = params[0].shape[0]
    return ring_gram_matvec(mesh, axis, ("mosm", (twopi, phase_inside)), O,
                            x, c, noise_diag, params, use_pallas, V)


def mosm_ring_lowrank_vjp(mesh, axis, x, c, params, twopi, phase_inside,
                          use_pallas, A, B):
    O = params[0].shape[0]
    return ring_gram_lowrank_vjp(mesh, axis, ("mosm", (twopi, phase_inside)),
                                 O, x, c, params, use_pallas, A, B)
