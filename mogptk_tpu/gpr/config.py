"""Global configuration for dtype, device policy, and RNG.

Mirrors the capability surface of the reference config (mogptk/gpr/config.py:3-73)
but is designed for JAX/XLA: dtype is resolved at trace time (static), device
placement uses JAX's default-device mechanism, and randomness is explicit via a
process-level PRNG key that callers can override.
"""
import contextlib as _contextlib

import jax
import jax.numpy as jnp


class Config:
    """Process-global configuration singleton.

    Attributes:
        positive_minimum: Lower bound used for positive-constrained parameters.
        seed: Seed for the process-level PRNG key used when no key is passed.
    """

    def __init__(self):
        self._dtype = None  # None → auto: float64 iff x64 is enabled
        self.positive_minimum = 1e-8
        self.seed = 0
        self._key = None
        # Bumped whenever any Parameter's *structure* changes (transform,
        # trainability, pegging). Models use this to invalidate jit caches.
        self.structure_version = 0
        # Pallas kernels for the hot Gram ops: None = auto (enabled on TPU
        # backends when the dtype is f32/bf16 — the kernels are f32/bf16-only),
        # True/False to force either way.
        self.pallas = None
        # Cholesky retry rungs (10× jitter each) when a factorization NaNs.
        # 0 = off (reference behavior: fail with CholeskyException diagnostics).
        self.jitter_ladder = 0
        # Blocked left-looking Cholesky (ops/blocked_cholesky.py): None =
        # auto (enabled on TPU backends for 2-D f32 matrices of at least
        # blocked_cholesky_min_n rows — measured ~3× XLA's expander at
        # N=16k), True/False to force either way.
        self.blocked_cholesky = None
        # 512 over 1024: measured faster at N=16k both in isolation
        # (benchmarks/chol_bsweep.py: 38.7 vs 40.7 ms) and through the
        # fused LML forward (42.3 vs 44.8 ms, round 4) — the TRSM-GEMM
        # FLOPs halve and panels shrink, outweighing the doubled panel
        # count's launch overhead.
        self.blocked_cholesky_block = 512
        self.blocked_cholesky_min_n = 4096
        # (row tile, k chunk) of the S-panel accumulation kernel. Hardware
        # sweeps (benchmarks/chol_stile.py) measure the N=16k factor flat
        # in both dims (44.9-47.3 ms: the kernel is MXU-bound at ~80% of
        # the bf16x3 bound and the block re-fetch DMA hides under it);
        # (512, 512) was the repeatable best. The kernel states its own
        # Mosaic VMEM budget (ops/blocked_cholesky._s_panel_impl).
        self.blocked_cholesky_s_tile = (512, 512)
        # Precision of the blocked Cholesky's trailing accumulation GEMM
        # (the N³/3 bulk). "high" = bf16x3 passes, ~f32-quality
        # accumulation at ~2.7× the speed of "highest".
        self.blocked_cholesky_update_precision = "high"
        # Streamed Pallas syrk for the closed-form backward's K⁻¹ = WᵀW
        # (ops/blocked_trisolve.syrk_lower; TPU, f32, 1024 | n,
        # update_precision "high" only — the kernel IS the bf16x3 recipe).
        # OFF: measured SLOWER than the per-pair XLA dot loop at N=16k
        # (closed_decomp kinv512: 126 ms with a rectangular (i,j,k) grid,
        # 104 ms after folding the grid to lower-triangle pairs only, vs
        # 91 ms for the XLA loop) — the k chunks below each pair's start
        # still DMA uselessly (~2× read traffic) and XLA's own schedule of
        # the 528 pair dots overlaps better. Kill switch for A/B.
        self.pallas_syrk = False
        # Fused below-TRSM column pipeline inside the custom-VJP LML
        # forwards (ops/blocked_cholesky fused_trsm): S_below never exists
        # in HBM and the TRSM rides the streamed accumulation kernel's
        # epilogue. OFF by default: the A/B at the production config
        # (N=16k, B=512, vector shift — benchmarks/hot_decomp.py cholprod
        # vs cholprodbase) measured the fused pipeline 42.84 ms vs 38.25 ms
        # for the unfused in-place flow — the separate diagonal-S kernel
        # re-pays left-column reads and the VMEM-resident accumulation
        # pipelines worse than the auto-pipelined S-panel kernel (the third
        # hand-fused attempt to measure slower; see ROADMAP #1). The switch
        # turns it on for A/B.
        self.blocked_cholesky_fused_trsm = False
        # Matmul precision for the cancellation-sensitive products only
        # (factorizations/triangular solves in ops/linalg.py and the
        # GEMM-identity squared distance): XLA:TPU's default bf16-pass f32
        # matmuls lose ~5 decimal digits exactly where the GP algebra
        # subtracts large like terms. Scoped here so the rest of the step
        # (Gram assembly, optimizer) keeps full-speed default matmuls.
        # None = follow the global default.
        self.sensitive_matmul_precision = "highest"
        # Gram STORAGE format, orthogonal to the compute dtype. None =
        # store in config.dtype. "bf16x2" = error-compensated two-term
        # split (hi + lo bfloat16, ops/linalg.split_bf16): the Exact Gram
        # round-trips through the split form before factorization, so the
        # LML matches the f32 Gram to the ~17-bit reconstruction floor
        # instead of bf16's 8-bit shift. See use_half_precision(
        # compensated=True) for when this is (and is not) worth it.
        self.gram_storage = None

    @property
    def dtype(self):
        if self._dtype is not None:
            return self._dtype
        return jnp.float64 if jax.config.jax_enable_x64 else jnp.float32

    @dtype.setter
    def dtype(self, value):
        self._dtype = value

    @property
    def device(self):
        # respect use_cpu()/use_gpu(): jax_default_device is where jitted
        # computation actually lands; fall back to the priority backend
        dev = jax.config.jax_default_device
        if dev is not None:
            return dev
        devs = jax.devices()
        return devs[0] if devs else None

    def bump(self):
        self.structure_version += 1

    def next_key(self):
        """Return a fresh PRNG key derived from the process-level key."""
        if self._key is None:
            self._key = jax.random.PRNGKey(self.seed)
        self._key, sub = jax.random.split(self._key)
        return sub

    def numpy_rng(self):
        """Process-level numpy Generator (the analog of the reference's
        seedable global torch RNG) used for host-side random initialization."""
        if getattr(self, "_np_rng", None) is None:
            import numpy as _np
            self._np_rng = _np.random.default_rng(self.seed)
        return self._np_rng

    def set_seed(self, seed):
        self.seed = seed
        self._key = jax.random.PRNGKey(seed)
        import numpy as _np
        self._np_rng = _np.random.default_rng(seed)


config = Config()


def set_seed(seed):
    """Seed all package randomness — JAX PRNG keys, the host-side numpy
    generator used by data removal / random init (the analog of the
    reference's `torch.manual_seed`, documentation.md "Reproducibility")."""
    config.set_seed(seed)


def use_half_precision(compensated=False):
    """Use bfloat16 (TPU-native half precision) for parameters and Gram
    STORAGE — half the HBM, so the largest single-chip exact-Cholesky N
    grows ~15% (peak 6 bytes/entry instead of 8). The numerics are NOT
    bf16: the fused Gram engines compute tiles in f32 and cast only the
    HBM write (ops/block_mosm._compute_dtype — bf16 τ-chains would lose
    the cosine phase), the blocked Cholesky consumes bf16 tiles with
    in-VMEM upcast and returns an f32 factor, jitter rides the factor-
    dtype diag_shift (a 1e-8 bump would round away in bf16), and every
    solve/matvec runs f32 (ops/linalg._solve_dtype).

    compensated=True instead keeps f32 parameters/compute and stores the
    Gram as an error-compensated two-term bfloat16 split (hi + lo;
    ops/linalg.split_bf16): the LML lands at the ~17-bit reconstruction
    floor instead of shifting by bf16's 8-bit Gram rounding (measured
    925 → 311 at N=16k in plain bf16 mode; see ROADMAP #2).

    Honest accounting before choosing either mode: the split form costs
    4 bytes/entry — the same as f32 with *less* precision (8+8 explicit
    mantissa bits vs 24) — and the in-place blocked Cholesky
    (ops/blocked_cholesky.py) already factorizes a dead-temp f32 Gram at
    4 bytes/entry peak with NO accuracy loss, strictly dominating both
    bf16 modes for the LML/training path. Plain bf16 (2 bytes/entry)
    remains useful only where the raw Gram must PERSIST (checkpointed or
    user-held Grams, halved ICI bytes when shipping Gram shards) and a
    shifted LML is acceptable; compensated mode is for the same
    persistence cases when it is not. benchmarks/half_precision.py
    measures all three."""
    jax.config.update("jax_enable_x64", False)
    if compensated:
        config.dtype = jnp.float32
        config.gram_storage = "bf16x2"
    else:
        config.dtype = jnp.bfloat16
        config.gram_storage = None
    config.bump()


def use_single_precision():
    """Use float32 data type for computations (TPU MXU native)."""
    jax.config.update("jax_enable_x64", False)
    config.dtype = jnp.float32
    config.gram_storage = None
    config.bump()


def use_double_precision():
    """Use float64 data type for computations.

    Matches the reference default (mogptk/gpr/config.py:4). On TPU float64 is
    emulated and slow; prefer float32 there unless validating numerics.
    """
    jax.config.update("jax_enable_x64", True)
    config.dtype = jnp.float64
    config.gram_storage = None
    config.bump()


def _compute_platform():
    """The platform jitted computation actually lands on: the explicit
    use_cpu()/use_gpu() override (jax_default_device — which
    jax.default_backend() IGNORES) or the priority backend. The TPU-only
    auto policies (Pallas Gram, blocked Cholesky) consult this so
    use_cpu() on a TPU image does not trace TPU kernels into a CPU
    executable."""
    dev = jax.config.jax_default_device
    if dev is not None:
        return dev.platform
    return jax.default_backend()


def use_cpu(n=None):
    """Run computations on the CPU (mirrors mogptk/gpr/config.py:32-39)."""
    cpus = jax.devices("cpu")
    jax.config.update("jax_default_device", cpus[n or 0])
    config.bump()


def use_gpu(n=None):
    """Run computations on an accelerator if available (gpr/config.py:41-52).

    On this framework the accelerator is a TPU; the name is kept for API
    compatibility with the reference.
    """
    try:
        devs = jax.devices("tpu")
    except RuntimeError:
        try:
            devs = jax.devices("gpu")
        except RuntimeError:
            devs = jax.devices()
    jax.config.update("jax_default_device", devs[n or 0])
    config.bump()


use_tpu = use_gpu


def print_gpu_information():
    """Print accelerator information (mirrors gpr/config.py:54-67)."""
    for i, dev in enumerate(jax.devices()):
        print("%d  %s (%s)" % (i, dev.device_kind, dev.platform))


print_tpu_information = print_gpu_information


def set_positive_minimum(val):
    """Set the minimum value for positive-constrained parameters
    (mirrors gpr/config.py:69-73)."""
    config.positive_minimum = val
    config.bump()


def use_pallas(enable=True):
    """Force the fused Pallas Gram kernels on or off; use_pallas(None)
    restores the auto policy (enabled on TPU for f32/bf16 dtypes)."""
    config.pallas = enable
    config.bump()


def pallas_enabled():
    """Resolve the Pallas-Gram policy.

    Explicit use_pallas(True/False) always wins. The auto default (None)
    enables the fused kernels on TPU backends whenever the dtype is
    f32/bf16: on TPU they bound backward memory (tile-local VJP, no N×N
    autodiff residuals) and power the materialization-free iterative engine.
    Off-TPU, or under f64 (the kernels are f32/bf16-only), auto is off and
    the fused jnp chain is used instead.
    """
    if config.pallas is not None:
        return bool(config.pallas)
    if config.dtype not in (jnp.float32, jnp.bfloat16):
        return False
    return _compute_platform() == "tpu"


@_contextlib.contextmanager
def input_gradients():
    """Scope marking kernel INPUTS as differentiable.

    The fused Pallas Grams' custom VJPs return ZERO input cotangents — a
    correct shortcut for constant training data, but silently wrong when
    the inputs are TRAINED (sparse models' inducing points Z: without this
    scope, Z would freeze on TPU while every test on CPU — where Pallas is
    off — passes). Inside the scope, K_mo falls back to the jnp
    formulation, whose autodiff carries dK/dX. The sparse models wrap
    their Kuu/Kuf/Kus constructions; those Grams are (M,N)-sized, far off
    the N×N scale where the fused kernels matter.
    """
    config._input_grads = getattr(config, "_input_grads", 0) + 1
    try:
        yield
    finally:
        config._input_grads -= 1


def input_grads_active():
    """True inside an input_gradients() scope (trace-time, structural)."""
    return getattr(config, "_input_grads", 0) > 0


def use_compilation_cache(directory="/tmp/jax_cache"):
    """Persist compiled XLA executables across processes.

    Remote TPU compilation of a large training step can take tens of
    minutes (10-45 min observed for the full N=16k exact step through this
    image's tunneled backend); with the cache, every later process that
    builds the same model/shape starts in seconds. Call once before the
    first training step; benchmarks and bench.py do this themselves.
    """
    jax.config.update("jax_compilation_cache_dir", directory)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def use_blocked_cholesky(enable=True, block_size=None, update_precision=None,
                         min_n=None):
    """Force the MXU-blocked left-looking Cholesky on or off;
    use_blocked_cholesky(None) restores the auto policy (enabled on TPU for
    2-D f32 factorizations of at least `min_n` rows). See
    ops/blocked_cholesky.py for the design and measured numbers."""
    config.blocked_cholesky = enable
    if block_size is not None:
        config.blocked_cholesky_block = int(block_size)
    if update_precision is not None:
        config.blocked_cholesky_update_precision = update_precision
    if min_n is not None:
        config.blocked_cholesky_min_n = int(min_n)
    config.bump()


def blocked_cholesky_enabled(n, ndim=2, dtype=None):
    """Resolve the blocked-Cholesky policy for an (n, n) factorization."""
    if ndim != 2:
        return False
    if dtype is not None and dtype not in (jnp.float32, jnp.float64,
                                           jnp.bfloat16, jnp.float16):
        # sub-f32 Grams are accepted: blocked_cholesky upcasts per-tile in
        # VMEM (the factor comes out f32), so the f32 copy of a bf16 Gram
        # is never materialized in HBM
        return False
    if config.blocked_cholesky is not None:
        return bool(config.blocked_cholesky)
    return n >= config.blocked_cholesky_min_n and _compute_platform() == "tpu"


def set_matmul_precision(precision="highest"):
    """Set XLA's matmul precision ("default" | "high" | "highest").

    XLA:TPU computes nominal-f32 matmuls with bfloat16 multiply passes by
    default — fine for neural nets, fatal for cancellation-sensitive GP
    algebra: the GEMM-identity quadform and the blocked triangular solves
    lose ~5 decimal digits, and f32 sparse training walks off a numerical
    cliff that CPU-f32 never sees (abalone Titsias M=500 NaN'd on TPU while
    the identical program survived 200 iterations on CPU). "highest" forces
    full-f32 multi-pass MXU matmuls: measured 5x faster than falling back to
    f64 on the same model. Affects TPU only; CPU/GPU f32 matmuls are always
    true f32."""
    jax.config.update("jax_default_matmul_precision", precision)
    config.bump()


def set_sensitive_matmul_precision(precision="highest"):
    """Set the matmul precision used ONLY for the cancellation-sensitive
    products: Cholesky factorizations, triangular solves (ops/linalg.py) and
    the GEMM-identity squared distance (gpr/singleoutput.py). This is the
    scoped alternative to `set_matmul_precision` — f32 robustness on TPU
    without paying the full-step "highest" tax. Pass None to follow the
    global default.

    Call before building/tracing models: JAX caches traced functions on
    (function, shapes), so a change after tracing also needs
    jax.clear_caches() to take effect on already-seen shapes."""
    config.sensitive_matmul_precision = precision
    config.bump()
    jax.clear_caches()


def sensitive_matmul_scope():
    """Context manager applying the sensitive-product matmul precision
    (no-op when config.sensitive_matmul_precision is None)."""
    if config.sensitive_matmul_precision is None:
        return _contextlib.nullcontext()
    return jax.default_matmul_precision(config.sensitive_matmul_precision)


def use_jitter_ladder(rungs=3):
    """Retry NaN'd Cholesky factorizations with up to `rungs` 10×-escalated
    jitters (0 disables). Extension beyond the reference: keeps f32 training
    alive when trained inducing points degrade Kuu conditioning."""
    config.jitter_ladder = int(rungs)
    config.bump()


def use_debug(nans=True, jit=True):
    """Enable runtime numerical debugging: jax_debug_nans raises on the first
    NaN-producing op (the TPU-native analog of the reference's runtime
    NaN/Inf diagnostics, SURVEY.md §5); pass jit=False to also disable jit
    for step-through debugging."""
    jax.config.update("jax_debug_nans", bool(nans))
    jax.config.update("jax_disable_jit", not jit)
