"""Fused narrow-RHS Cholesky solve: both substitution sweeps in ONE kernel.

The blocked XLA substitution (ops/blocked_trisolve.py) is the right shape
for wide RHS (the exact-gradient K⁻¹ scan), but the LML's (1+R)-column
solve is traversal-bound: 2·nb sequential panel steps, each a pair of tiny
GEMMs the scheduler separates with launch gaps, plus a full N² transpose
materialization for the upper sweep (`blocked_trisolve(L.T, ...)`). At
N=16k/R=17 that measures ~6 ms against a ~1.5 ms HBM floor (read the lower
triangle twice).

This kernel runs the forward AND the transposed backward sweep as one
pallas_call over grid (2·nb,): the RHS block stays resident in VMEM across
all panels (it IS the output block, constant index map), L's (B, B) blocks
stream in through double-buffered manual DMAs from an untiled ANY-space
operand, and the upper sweep contracts the same lower blocks along the
other axis — Lᵀ never exists. The (B, B) panel inverses produced by the
factorization (blocked_cholesky(..., return_panel_invs=True)) arrive
stacked and are DMA'd per panel, so each panel apply is one MXU GEMM.

GEMMs run as manual bf16x3 (the "high" recipe), matching the blocked
substitution's update precision.

NOT differentiable (pallas_call has no transpose rule) — callers are the
custom-VJP LML forwards (ops/linalg._chol_lml*, lml_chol_fused), whose
hand-written backwards never differentiate through the solve. Capability
reference: torch.cholesky_solve at mogptk/gpr/model.py:452.
"""
import functools
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _bf16x3(a, b, dims):
    ah = a.astype(jnp.bfloat16)
    al = (a - ah.astype(jnp.float32)).astype(jnp.bfloat16)
    bh = b.astype(jnp.bfloat16)
    bl = (b - bh.astype(jnp.float32)).astype(jnp.bfloat16)
    dot = functools.partial(jax.lax.dot_general, dimension_numbers=(dims, ((), ())),
                            preferred_element_type=jnp.float32,
                            precision=jax.lax.Precision.DEFAULT)
    return dot(ah, bh) + dot(ah, bl) + dot(al, bh)


def _solve_kernel(l_any, invs_any, b_ref, x_ref, inv_v, c0, c1, sem_i, sem_c,
                  *, nb, B):
    step = pl.program_id(0)
    fwd = step < nb
    i = jnp.where(fwd, step, 2 * nb - 1 - step)
    # Every dynamic start below is (block index) * B — but Mosaic's
    # divisibility analysis cannot see through a jnp.where, so each start is
    # (a) built by selecting the INDEX first and multiplying by B after, and
    # (b) annotated with pl.multiple_of. Without these the kernel fails to
    # lower ("Failed to prove that a tile index ... is divisible by 8").
    r0 = pl.multiple_of(i * B, B)

    pltpu.make_async_copy(invs_any.at[i], inv_v, sem_i).start()

    # t-th off-diagonal block of this panel's sweep: forward reads row
    # blocks (i, t); the transposed backward reads column blocks (i+1+t, i)
    nk = jnp.where(fwd, i, nb - 1 - i)

    def src(t):
        k = jnp.where(fwd, t, i + 1 + t)
        rb = pl.multiple_of(jnp.where(fwd, i, k) * B, B)
        cb = pl.multiple_of(jnp.where(fwd, k, i) * B, B)
        return l_any.at[pl.ds(rb, B), pl.ds(cb, B)], k

    def start(t, buf, slot):
        ref, _ = src(t)
        pltpu.make_async_copy(ref, buf, sem_c.at[slot]).start()

    def wait(t, buf, slot):
        ref, _ = src(t)
        pltpu.make_async_copy(ref, buf, sem_c.at[slot]).wait()

    def part(t, buf):
        _, k = src(t)
        # clamp: the loop's last odd chunk may be a select-dropped dead
        # read (t == nk), where the backward sweep's k = i+1+nk can equal
        # nb — one block past x_ref. XLA's dynamic_slice clamps OOB starts
        # (so interpret-mode tests pass) but a Mosaic VMEM read does not:
        # unclamped, chained executions crash the TPU worker.
        k = jnp.minimum(k, nb - 1)
        xk = x_ref[pl.ds(pl.multiple_of(k * B, B), B), :]
        return jnp.where(fwd, _bf16x3(buf[:, :], xk, (((1,), (0,)))),
                         _bf16x3(buf[:, :], xk, (((0,), (0,)))))

    @pl.when(nk > 0)
    def _():
        start(0, c0, 0)

    @pl.when(nk > 1)
    def _():
        start(1, c1, 1)

    acc0 = jnp.where(fwd, b_ref[pl.ds(r0, B), :], x_ref[pl.ds(r0, B), :])

    def body(p, acc):
        t0 = 2 * p
        t1 = t0 + 1
        wait(t0, c0, 0)         # t0 < nk always holds inside the loop
        acc = acc - part(t0, c0)        # read c0 BEFORE refilling it

        @pl.when(t0 + 2 < nk)
        def _():
            start(t0 + 2, c0, 0)

        # the odd chunk may not exist on the last pair: its wait and the
        # next start are guarded; the stale-buffer GEMM is select-dropped
        @pl.when(t1 < nk)
        def _():
            wait(t1, c1, 1)

        acc1 = acc - part(t1, c1)

        @pl.when(t1 + 2 < nk)
        def _():
            start(t1 + 2, c1, 1)

        return jnp.where(t1 < nk, acc1, acc)

    # pairs of chunks per iteration (double buffer); dynamic trip count
    acc = jax.lax.fori_loop(0, (nk + 1) // 2, body, acc0)

    pltpu.make_async_copy(invs_any.at[i], inv_v, sem_i).wait()
    inv = inv_v[:, :]
    res = jnp.where(fwd, _bf16x3(inv, acc, (((1,), (0,)))),
                    _bf16x3(inv, acc, (((0,), (0,)))))   # (Lᵀ)ii⁻¹ = invᵀ
    x_ref[pl.ds(r0, B), :] = res


def _vmem_limit(n, Bs, r):
    """Scoped-VMEM budget: f32 scratch (panel inverse + two chunk buffers),
    double-buffered resident RHS/output blocks (lane-padded to 128), and the
    in-kernel bf16 hi/lo split temps of one (Bs, Bs) chunk — Mosaic
    stack-allocates those, and omitting them OOM'd the N=2048/B=1024 shape
    (needed 22.65M against a 20M budget). Returned WITH the 25% margin."""
    vmem = (4 * 3 * Bs * Bs                      # inv + two chunk buffers
            + 4 * 2 * 2 * n * max(r, 128)        # b and x resident, 2-buffered
            + 2 * 2 * Bs * Bs)                   # bf16 hi/lo chunk temps
    return vmem + (vmem >> 2)


def fused_cho_solve(L, invs, B_rhs, block_size=1024):
    """K⁻¹ B given the lower factor L and its stacked panel inverses, as one
    two-sweep pallas kernel. Requires f32, N % block_size == 0, and 2-D
    B_rhs; intended for narrow RHS (the LML's 1+R columns).

    NOT differentiable: the in-place custom-VJP LML forwards (ops/linalg)
    never differentiate through the solve. Differentiating through it (e.g.
    autodiff through cholesky(return_panel_invs=True) + cholesky_solve(
    invs=...)) raises a descriptive error instead of Pallas' opaque
    missing-transpose trace; use blocked_cho_solve for that."""
    invs_stacked = invs if isinstance(invs, jnp.ndarray) else jnp.stack(invs)
    return _fused_cho_solve_nd(L, invs_stacked, B_rhs, int(block_size))


@functools.partial(jax.custom_vjp, nondiff_argnums=(3,))
def _fused_cho_solve_nd(L, invs_stacked, B_rhs, block_size):
    return _fused_cho_solve_impl(L, invs_stacked, B_rhs, block_size)


def _fcs_fwd(L, invs_stacked, B_rhs, block_size):
    return _fused_cho_solve_impl(L, invs_stacked, B_rhs, block_size), None


def _fcs_bwd(block_size, res, g):
    raise NotImplementedError(
        "fused_cho_solve (the TPU fused two-sweep Cholesky solve) is not "
        "differentiable: pallas_call has no transpose rule and its callers "
        "(the custom-VJP LML forwards) never need one. To differentiate "
        "through a panel-inverse cho_solve, use "
        "ops.blocked_trisolve.blocked_cho_solve, or call "
        "ops.linalg.cholesky_solve on CPU where it routes there.")


_fused_cho_solve_nd.defvjp(_fcs_fwd, _fcs_bwd)


def _fused_cho_solve_impl(L, invs_stacked, B_rhs, block_size):
    n = L.shape[0]
    Bs = int(block_size)
    nb = n // Bs
    return pl.pallas_call(
        functools.partial(_solve_kernel, nb=nb, B=Bs),
        out_shape=jax.ShapeDtypeStruct(B_rhs.shape, jnp.float32),
        grid=(2 * nb,),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),            # L, manual DMA
            pl.BlockSpec(memory_space=pl.ANY),            # stacked inverses
            pl.BlockSpec(B_rhs.shape, lambda s: (0, 0)),  # RHS, resident
        ],
        out_specs=pl.BlockSpec(B_rhs.shape, lambda s: (0, 0)),
        scratch_shapes=[
            pltpu.VMEM((Bs, Bs), jnp.float32),
            pltpu.VMEM((Bs, Bs), jnp.float32),
            pltpu.VMEM((Bs, Bs), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=_vmem_limit(n, Bs, B_rhs.shape[1])),
        interpret=jax.default_backend() == "cpu",
    )(L, invs_stacked, B_rhs.astype(jnp.float32))


def fused_solve_applicable(L, B_rhs, invs, block_size=1024):
    """Gate: f32 square factor, panel-aligned N, narrow 2-D RHS, inverses
    available with matching panel size, and the resident RHS+output fit in
    VMEM (they are lane-padded to 128 columns, so the budget grows ~2 KB per
    row; past ~40k rows the kernel could not compile — fall back to the
    blocked substitution instead)."""
    if not (invs is not None and L.ndim == 2 and B_rhs.ndim == 2
            and L.dtype == jnp.float32
            and L.shape[0] == L.shape[1]
            and L.shape[0] % block_size == 0
            and L.shape[0] // block_size == len(invs)
            and invs[0].shape[-1] == block_size
            and B_rhs.shape[1] <= 64):
        return False
    return (_vmem_limit(L.shape[0], block_size, B_rhs.shape[1])
            <= 100 * 1024 * 1024)
