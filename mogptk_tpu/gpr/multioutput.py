"""Multi-output kernels — the library's raison d'être.

Capability parity with mogptk/gpr/multioutput.py (8 kernels, lines 5-553),
redesigned TPU-first. The reference assembles the Gram matrix channel-pair by
channel-pair in a Python loop with boolean-mask writes (gpr/kernel.py:446-481)
— data-dependent shapes that XLA cannot compile. Here each kernel computes
tiny cross-channel parameter tables of shape (O,O,...) — the exact algebra of
the reference's Ksub cross terms (e.g. gpr/multioutput.py:103-117) — then
produces the full (N,M) Gram in one fused broadcast/gather pass driven by
per-point channel IDs. The cross formulas reduce exactly to the diagonal
formulas at i==j, so no branch is needed and shapes stay static.
"""
import numpy as np
import jax
import jax.numpy as jnp

from .kernel import Kernel, MultiOutputKernel
from .parameter import Parameter
from .config import config, pallas_enabled, input_grads_active

_pi = np.pi


class IndependentMultiOutputKernel(MultiOutputKernel):
    """Block-diagonal kernel: one subkernel per channel, no cross-channel
    correlation (reference: mogptk/gpr/multioutput.py:5-39)."""

    def __init__(self, *kernels, output_dims=None):
        if output_dims is None:
            output_dims = len(kernels)
        super().__init__(output_dims)
        self.kernels = self._check_kernels(kernels, output_dims)

    def __getitem__(self, key):
        return self.kernels[key]

    def name(self):
        return "%s[%s]" % (self.__class__.__name__, ",".join(k.name() for k in self.kernels))

    def K_mo(self, c1, x1, c2, x2=None):
        x2e = x1 if x2 is None else x2
        # Only diagonal blocks are nonzero: mask each channel's subkernel over
        # the full input. O× elementwise overhead versus the reference's
        # per-block loop, but fully fused and static-shaped. x2 is forwarded
        # AS IS (None means the Gram path — WhiteKernel returns zeros for any
        # materialized X2, so passing x2e here dropped its noise block).
        out = jnp.zeros((x1.shape[0], x2e.shape[0]), dtype=config.dtype)
        for i in range(self.output_dims):
            m1 = (c1 == i).astype(config.dtype)[:, None]
            m2 = (c2 == i).astype(config.dtype)[None, :]
            out = out + m1 * self.kernels[i].K(x1, x2) * m2
        return out

    def K_mo_diag(self, c1, x1):
        out = jnp.zeros((x1.shape[0],), dtype=config.dtype)
        for i in range(self.output_dims):
            m1 = (c1 == i).astype(config.dtype)
            out = out + m1 * self.kernels[i].K_diag(x1)
        return out

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        if i == j:
            return self.kernels[i].K(X1, X2)
        if X2 is None:
            X2 = X1
        return jnp.zeros((X1.shape[0], X2.shape[0]), dtype=config.dtype)

    def Ksub_diag(self, i, X1):
        X1, _ = self._active_input(X1)
        return self.kernels[i].K_diag(X1)


def _mosm_K(c1, x1, c2, x2, params, twopi, phase_inside_2pi=True, cross_weight=None, alpha_extra=None):
    """Evaluate the MOSM Gram from per-point parameter gathers.

    TPU-native formulation. Two layout/memory rules drive the shape of this
    code:
    1. Every large intermediate is (N, M) with the small Q and D axes
       unrolled in Python — a materialized (N, M, Q) array gets its minor
       dim padded to 128 lanes on TPU (64x HBM blowup for Q=2).
    2. Parameters enter through 1-D per-point gathers (N,)/(M,) followed by
       rank-broadcast arithmetic, never (N, M)-shaped gathers: the whole
       cross-spectral algebra (Σij, μij, wij — reference mogptk/gpr/
       multioutput.py:103-117) then fuses into a single elementwise pass
       over the Gram tile, and under jax.checkpoint the only saved
       residuals are the 1-D gathers. The cross formulas reduce exactly to
       the diagonal formulas at i==j, so one branch-free pass covers the
       whole Gram.

    params = (w, mu, var, theta, phi) with shapes (O,Q), (O,Q,D), (O,Q,D),
    (O,Q,D), (O,Q). `cross_weight` (N,M) replaces the wi·wj factor for uMOSM.
    """
    w, mu, var, theta, phi = params
    x2e = x1 if x2 is None else x2
    Qn = mu.shape[1]
    D = mu.shape[2]

    K = None
    for q in range(Qn):
        expo_acc = None   # Σ_d (τ+θΔ)²·Σij
        ang_acc = None    # Σ_d (τ+θΔ)·μij
        mag_acc = None    # Σ_d (μi−μj)²/(Σi+Σj)
        var_prod = None   # Π_d Σij
        for d in range(D):
            v1 = var[c1, q, d][:, None]     # Nx1
            v2 = var[c2, q, d][None, :]     # 1xM
            m1 = mu[c1, q, d][:, None]
            m2 = mu[c2, q, d][None, :]
            taud = x1[:, d][:, None] - x2e[:, d][None, :]            # NxM
            td = taud + (theta[c1, q, d][:, None] - theta[c2, q, d][None, :])

            inv = 1.0 / (v1 + v2)                                    # NxM
            diffm = m1 - m2
            mean_nm = inv * (v1 * m2 + v2 * m1)                      # = μi at i==j
            var_nm = 2.0 * v1 * inv * v2                             # = Σi at i==j

            e = td * td * var_nm
            a_ = td * mean_nm
            g = diffm * diffm * inv                                  # = 0 at i==j
            expo_acc = e if expo_acc is None else expo_acc + e
            ang_acc = a_ if ang_acc is None else ang_acc + a_
            mag_acc = g if mag_acc is None else mag_acc + g
            var_prod = var_nm if var_prod is None else var_prod * var_nm

        if cross_weight is None:
            w1w2 = w[c1, q][:, None] * w[c2, q][None, :]             # NxM
        else:
            w1w2 = cross_weight
        alpha = w1w2 * jnp.exp(-_pi ** 2 * mag_acc) * twopi * jnp.sqrt(var_prod)
        if alpha_extra is not None:
            alpha = alpha * alpha_extra
        pdiff = phi[c1, q][:, None] - phi[c2, q][None, :]
        if phase_inside_2pi:
            cos = jnp.cos(2.0 * _pi * (ang_acc + pdiff))
        else:
            cos = jnp.cos(2.0 * _pi * ang_acc + pdiff)
        Kq = alpha * jnp.exp(-0.5 * expo_acc) * cos
        K = Kq if K is None else K + Kq
    return K                                                         # NxM


def _umosm_cross_weight(W, c1, c2):
    """uMOSM cross-channel magnitude Wtril·Wtrilᵀ gathered per point pair as
    an (N,O)·(O,O)·(O,M) matmul chain on the MXU — no (N,M)-shaped gather."""
    import jax as _jax
    O = W.shape[0]
    # the WWᵀ product itself must be full precision too — a default bf16
    # pass would bake the ~4e-3 rounding the 'highest' gathers below exist
    # to avoid
    mag = _jax.lax.dot(jnp.tril(W), jnp.tril(W).T, precision="highest")  # OxO
    onehot1 = (c1[:, None] == jnp.arange(O)[None, :]).astype(mag.dtype)
    onehot2 = (c2[:, None] == jnp.arange(O)[None, :]).astype(mag.dtype)
    # full-precision selection: XLA:TPU's default bf16 matmul passes would
    # round the WWᵀ VALUES (~4e-3 rel) through the one-hot gather
    inner = _jax.lax.dot(mag, onehot2.T, precision="highest")
    return _jax.lax.dot(onehot1, inner, precision="highest")  # NxM


def _umosm_K(c1, x1, c2, x2, params, twopi):
    """uMOSM Gram as a pure function of params = (W, mu, var, theta, phi)
    (reference math: mogptk/gpr/multioutput.py:212-293; phase sits outside
    the 2π factor there)."""
    W, mu, var, theta, phi = params
    cw = _umosm_cross_weight(W, c1, c1 if c2 is None else c2)
    return _mosm_K(c1, x1, c2, x2, (None, mu, var, theta, phi), twopi,
                   phase_inside_2pi=False, cross_weight=cw)


def _csm_K(c1, x1, c2, x2, params):
    """CSM Gram as a pure function of params = (amp (O,Rq), mu (1,D),
    var (1,D), shift (O,Rq)) (reference math: mogptk/gpr/multioutput.py:
    397-454). All large temps are (N,M); Rq and D unrolled."""
    amp, mu, var, shift = params
    x2e = x1 if x2 is None else x2
    c2e = c1 if c2 is None else c2
    Rq = amp.shape[1]
    expo_acc = None
    ang_acc = None
    for d in range(x1.shape[1]):
        taud = x1[:, None, d] - x2e[None, :, d]        # NxM
        e = taud * taud * var[0, d]
        a_ = taud * mu[0, d]
        expo_acc = e if expo_acc is None else expo_acc + e
        ang_acc = a_ if ang_acc is None else ang_acc + a_
    expo = jnp.exp(-0.5 * expo_acc)                    # NxM
    K = None
    for r in range(Rq):
        amplitude = jnp.sqrt(amp[c1, r][:, None] * amp[c2e, r][None, :])  # NxM
        sh = shift[c1, r][:, None] - shift[c2e, r][None, :]               # NxM
        Kr = amplitude * expo * jnp.cos(2.0 * _pi * (ang_acc + sh))
        K = Kr if K is None else K + Kr
    return K


def _lmc_sm_K(c1, x1, c2, x2, params):
    """LMC-over-SpectralKernels (SM-LMC) Gram as a pure function of
    params = (W (O,Q,Rq), mag (Q,1), mu (Q,D), var (Q,D)): K_ij =
    Σ_q (W_i,q·W_j,q) σ²_q Σ_d exp(−2π²τ_d²Σ_qd) cos(2πμ_qd τ_d)
    (reference math: mogptk/gpr/multioutput.py:456-502 composed with
    gpr/singleoutput.py:520-561's per-dim sum). All large temps are (N,M);
    Q and D unrolled."""
    W, mag, mu, var = params
    x2e = x1 if x2 is None else x2
    c2e = c1 if c2 is None else c2
    Q = W.shape[1]
    K = None
    for q in range(Q):
        Bq = W[c1, q, :] @ W[c2e, q, :].T                  # NxM
        acc = None
        for d in range(x1.shape[1]):
            taud = x1[:, None, d] - x2e[None, :, d]        # NxM
            t = (jnp.exp(-2.0 * _pi ** 2 * taud * taud * var[q, d])
                 * jnp.cos(2.0 * _pi * taud * mu[q, d]))
            acc = t if acc is None else acc + t
        Kq = (mag[q, 0] * Bq) * acc
        K = Kq if K is None else K + Kq
    return K


def _conv_K(c1, x1, c2, x2, params):
    """CONV Gram as a pure function of params = (w (O,1), var (O,D),
    base (1,D)) (reference math: mogptk/gpr/multioutput.py:504-553)."""
    w, var, base = params
    x2e = x1 if x2 is None else x2
    c2e = c1 if c2 is None else c2
    w1 = w[c1, 0]                                       # N
    w2 = w[c2e, 0]                                      # M
    expo_acc = None
    prod_var = None
    for d in range(x1.shape[1]):
        taud2 = (x1[:, None, d] - x2e[None, :, d]) ** 2  # NxM
        vd = var[c1, d][:, None] + var[c2e, d][None, :] + base[0, d]  # NxM
        e = taud2 / vd
        expo_acc = e if expo_acc is None else expo_acc + e
        prod_var = vd if prod_var is None else prod_var * vd
    magnitude = w1[:, None] * w2[None, :] * jnp.sqrt(jnp.prod(base) / prod_var)
    return magnitude * jnp.exp(-0.5 * expo_acc)


def _mohsm_K(c1, x1, c2, x2, params, twopi):
    """MOHSM Gram as a pure function of the MOSM-lifted params
    (w (O,1), mu/var/theta (O,1,D), phi (O,1), ls (O,1), center (1,D)):
    MOSM Q=1 with the phase outside 2π, times the nonstationary envelope
    (√l_ij)^D · exp(−½‖(x+x')/2 − center‖²·l_ij) with the pair scalar
    l_ij = 2l_i²l_j²/(l_i²+l_j²) (reference: mogptk/gpr/multioutput.py:
    295-395, cross math :369-378)."""
    w, mu, var, theta, phi, ls, center = params
    x2e = x1 if x2 is None else x2
    c2e = c1 if c2 is None else c2
    D = x1.shape[1]
    l2 = ls[:, 0] ** 2                      # O
    l1 = l2[c1][:, None]                    # Nx1
    l2m = l2[c2e][None, :]                  # 1xM
    l_nm = 2.0 * l1 * l2m / (l1 + l2m)      # NxM; = li² at i==j
    dist2 = None
    for d in range(D):
        avgd = 0.5 * (x1[:, d][:, None] + x2e[:, d][None, :]) - center[0, d]
        e = avgd * avgd
        dist2 = e if dist2 is None else dist2 + e
    alpha_extra = jnp.power(jnp.sqrt(l_nm), float(D)) * jnp.exp(-0.5 * dist2 * l_nm)
    return _mosm_K(c1, x1, c2, x2, (w, mu, var, theta, phi), twopi,
                   phase_inside_2pi=False, alpha_extra=alpha_extra)


class MultiOutputSpectralKernel(MultiOutputKernel):
    """Multi-output spectral kernel (MOSM, Q=1), Parra & Tobar 2017
    (reference: mogptk/gpr/multioutput.py:41-123)."""

    def __init__(self, output_dims, input_dims=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.weight = Parameter(jnp.ones(output_dims), lower=config.positive_minimum)
        self.mean = Parameter(jnp.zeros((output_dims, input_dims)), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((output_dims, input_dims)), lower=config.positive_minimum)
        self.delay = Parameter(jnp.zeros((output_dims, input_dims)))
        self.phase = Parameter(jnp.zeros(output_dims))
        if output_dims == 1:
            self.delay.train = False
            self.phase.train = False
        self.twopi = np.power(2.0 * np.pi, float(input_dims) / 2.0)

    def _params(self):
        return (self.weight()[:, None], self.mean()[:, None, :],
                self.variance()[:, None, :], self.delay()[:, None, :],
                self.phase()[:, None])

    # under pallas, K_mo routes to a custom-VJP gram whose residuals are
    # O(params) — Exact._Kff skips the (then-pointless) remat
    gram_has_custom_vjp = True

    def K_mo(self, c1, x1, c2, x2=None):
        if pallas_enabled():
            from ..ops.pallas_mosm import mosm_gram
            w, mu, var, th, ph = self._params()
            # inside input_gradients() (trained inducing inputs) the fused
            # backward also emits x cotangents in-kernel
            return mosm_gram(x1, c1, x1 if x2 is None else x2, c2,
                             w, mu, var, th, ph, self.twopi, True,
                             input_grads_active())
        return _mosm_K(c1, x1, c2, x2, self._params(), self.twopi, phase_inside_2pi=True)

    def K_sorted(self, X, counts):
        """Square Gram for channel-sorted X with static per-channel counts
        (ops/block_mosm.py): scalar pair stats per block, ~2x the generic
        Pallas Gram. _params() already lifts the Q=1 shapes."""
        from ..ops.block_mosm import mosm_gram_sorted
        c1, x1 = self._split(X)
        w, mu, var, th, ph = self._params()
        return mosm_gram_sorted(x1, counts, w, mu, var, th, ph,
                                self.twopi, True)

    def K_mo_diag(self, c1, x1):
        variance = self.variance()  # OxD
        alpha = self.weight() ** 2 * self.twopi * jnp.sqrt(jnp.prod(variance, axis=-1))  # O
        return alpha[c1]

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return _mosm_K(c1, X1, c2, X2, self._params(), self.twopi, phase_inside_2pi=True)


class MultiOutputSpectralMixtureKernel(MultiOutputKernel):
    """Multi-output spectral mixture kernel (MOSM with Q components),
    Parra & Tobar 2017 (reference: mogptk/gpr/multioutput.py:125-210)."""

    def __init__(self, Q, output_dims, input_dims=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.Q = Q
        self.weight = Parameter(jnp.ones((output_dims, Q)), lower=config.positive_minimum)
        self.mean = Parameter(jnp.zeros((output_dims, Q, input_dims)), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((output_dims, Q, input_dims)), lower=config.positive_minimum)
        self.delay = Parameter(jnp.zeros((output_dims, Q, input_dims)))
        self.phase = Parameter(jnp.zeros((output_dims, Q)))
        if output_dims == 1:
            self.delay.train = False
            self.phase.train = False
        self.twopi = np.power(2.0 * np.pi, float(input_dims) / 2.0)

    def _params(self):
        return (self.weight(), self.mean(), self.variance(),
                self.delay(), self.phase())

    # under pallas, K_mo routes to a custom-VJP gram whose residuals are
    # O(params) — Exact._Kff skips the (then-pointless) remat
    gram_has_custom_vjp = True

    def K_mo(self, c1, x1, c2, x2=None):
        if pallas_enabled():
            from ..ops.pallas_mosm import mosm_gram
            w, mu, var, th, ph = self._params()
            # inside input_gradients() (trained inducing inputs) the fused
            # backward also emits x cotangents in-kernel
            return mosm_gram(x1, c1, x1 if x2 is None else x2, c2,
                             w, mu, var, th, ph, self.twopi, True,
                             input_grads_active())
        return _mosm_K(c1, x1, c2, x2, self._params(), self.twopi, phase_inside_2pi=True)

    def K_sorted(self, X, counts):
        """Square Gram for channel-sorted X with static per-channel counts
        (ops/block_mosm.py): scalar pair stats per block, ~2x the generic
        Pallas Gram."""
        from ..ops.block_mosm import mosm_gram_sorted
        c1, x1 = self._split(X)
        w, mu, var, th, ph = self._params()
        return mosm_gram_sorted(x1, counts, w, mu, var, th, ph,
                                self.twopi, True)

    def K_mo_diag(self, c1, x1):
        variance = self.variance()  # OxQxD
        alpha = self.weight() ** 2 * self.twopi * jnp.sqrt(jnp.prod(variance, axis=-1))  # OxQ
        return jnp.sum(alpha, axis=-1)[c1]

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return _mosm_K(c1, X1, c2, X2, self._params(), self.twopi, phase_inside_2pi=True)


class UncoupledMultiOutputSpectralKernel(MultiOutputKernel):
    """uMOSM: MOSM with a trained lower-triangular cross-channel weight
    (reference: mogptk/gpr/multioutput.py:212-293)."""

    def __init__(self, output_dims, input_dims=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.weight = Parameter(jnp.tril(jnp.ones((output_dims, output_dims))))
        self.weight.num_parameters = int((output_dims * output_dims + output_dims) / 2)
        self.mean = Parameter(jnp.zeros((output_dims, input_dims)), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((output_dims, input_dims)), lower=config.positive_minimum)
        self.delay = Parameter(jnp.zeros((output_dims, input_dims)))
        self.phase = Parameter(jnp.zeros(output_dims))
        if output_dims == 1:
            self.delay.train = False
            self.phase.train = False
        self.twopi = np.power(2.0 * np.pi, float(input_dims) / 2.0)

    def _params(self):
        return (None, self.mean()[:, None, :], self.variance()[:, None, :],
                self.delay()[:, None, :], self.phase()[:, None])

    def _cross_weight(self, c1, c2):
        return _umosm_cross_weight(self.weight(), c1, c2)

    def K_sorted(self, X, counts):
        """Square Gram for channel-sorted X via the generic channel-block
        engine (ops/block_families.py)."""
        from ..ops.block_families import family_gram_sorted
        c1, x1 = self._split(X)
        params = (self.weight(),) + self._params()[1:]
        return family_gram_sorted("umosm", (self.twopi,), x1, counts, params)

    def K_mo(self, c1, x1, c2, x2=None):
        # reference places the phase outside the 2π factor for uMOSM
        # (gpr/multioutput.py:285)
        return _mosm_K(c1, x1, c2, x2, self._params(), self.twopi,
                       phase_inside_2pi=False, cross_weight=self._cross_weight(c1, c2))

    def K_mo_diag(self, c1, x1):
        W = jnp.tril(self.weight())
        magnitude = jnp.diagonal(W @ W.T)  # O
        variance = self.variance()
        alpha = magnitude * self.twopi * jnp.sqrt(jnp.prod(variance, axis=-1))
        return alpha[c1]

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return _mosm_K(c1, X1, c2, X2, self._params(), self.twopi,
                       phase_inside_2pi=False, cross_weight=self._cross_weight(c1, c2))


class MultiOutputHarmonizableSpectralKernel(MultiOutputKernel):
    """MOHSM: nonstationary harmonizable spectral kernel, Altamirano 2021
    (reference: mogptk/gpr/multioutput.py:295-395).

    `psd_safe=True` (off by default — the default keeps exact formula
    parity with the reference) caps the envelope precision at the
    locally-stationary PSD bound, making the kernel usable for narrow
    spectral variances over wide X ranges where the reference formula
    produces an indefinite Gram (see _effective_l2)."""

    def __init__(self, output_dims, input_dims=1, active_dims=None,
                 psd_safe=False):
        super().__init__(output_dims, input_dims, active_dims)
        self.psd_safe = bool(psd_safe)
        self.weight = Parameter(jnp.ones(output_dims), lower=config.positive_minimum)
        self.mean = Parameter(jnp.zeros((output_dims, input_dims)), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((output_dims, input_dims)), lower=config.positive_minimum)
        self.lengthscale = Parameter(jnp.ones(output_dims), lower=config.positive_minimum)
        self.center = Parameter(jnp.zeros(input_dims))
        self.delay = Parameter(jnp.zeros((output_dims, input_dims)))
        self.phase = Parameter(jnp.zeros(output_dims))
        if output_dims == 1:
            self.delay.train = False
            self.phase.train = False
        self.twopi = np.power(2.0 * np.pi, float(input_dims))

    def _params(self):
        return (self.weight()[:, None], self.mean()[:, None, :],
                self.variance()[:, None, :], self.delay()[:, None, :],
                self.phase()[:, None])

    def _effective_l2(self):
        """Envelope precision l² per channel, under the opt-in PSD-safe cap.

        A MOHSM channel block is a locally-stationary (Silverman 1957)
        product exp(−½l²s²)·exp(−½Σ_d τ_d²)·cos(·) per input dim, with
        s = (x+x')/2 − c and τ = x−x'. In (x, x') coordinates the cross
        factor is exp(2C·xx') with 2C = Σ_d − l²/4, which is a PSD kernel
        iff C ≥ 0 — so the block is PSD iff l² ≤ 4Σ_d for every dim (the
        cosine is a unitary modulation and cannot rescue it). Cross-channel
        blocks substitute the pair scalars l_nm = 2l_i²l_j²/(l_i²+l_j²)
        ≤ 2·min(l_i², l_j²) and Σ_nm = 2Σ_iΣ_j/(Σ_i+Σ_j) ≥ min(Σ_i, Σ_j),
        so capping each channel at l_i² ≤ 2·min_d Σ_id keeps every pair
        block inside its own bound.

        psd_safe applies the cap as the smooth saturation c·tanh(l²/c):
        ≈ l² (to second order) while the constraint is slack, asymptotically
        c when it binds — differentiable everywhere, so training simply
        slides along the boundary instead of NaN-ing the Cholesky the way
        the reference formula does (mogptk/gpr/multioutput.py:295-395 has
        no equivalent)."""
        l2 = self.lengthscale() ** 2
        if not getattr(self, "psd_safe", False):
            return l2
        cap = 2.0 * jnp.min(self.variance(), axis=-1)
        return cap * jnp.tanh(l2 / cap)

    def _fused_params(self):
        """Pure-function parameter tuple for _mohsm_K / the fused engines."""
        return self._params() + (jnp.sqrt(self._effective_l2()).reshape(-1, 1),
                                 self.center().reshape(1, -1))

    def K_sorted(self, X, counts):
        """Square Gram for channel-sorted X via the generic channel-block
        engine (ops/block_families.py): the nonstationary cross
        lengthscale l_ij is a pair scalar; the mean-position envelope runs
        in-tile."""
        from ..ops.block_families import family_gram_sorted
        c1, x1 = self._split(X)
        return family_gram_sorted("mohsm", (self.twopi, self.input_dims),
                                  x1, counts, self._fused_params())

    def K_mo(self, c1, x1, c2, x2=None):
        # all large temps kept (N,M); per-point gathers (see _mohsm_K)
        return _mohsm_K(c1, x1, c2, x2, self._fused_params(), self.twopi)

    def K_mo_diag(self, c1, x1):
        variance = self.variance()
        l2 = self._effective_l2()  # O
        alpha = (self.weight() ** 2 * self.twopi * jnp.sqrt(jnp.prod(variance, axis=-1))
                 * jnp.power(jnp.sqrt(l2), float(self.input_dims)))
        dist2 = jnp.sum((x1 - self.center()) ** 2, axis=-1)
        return alpha[c1] * jnp.exp(-0.5 * dist2 * l2[c1])

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return self.K_mo(c1, X1, c2, X2)


class CrossSpectralKernel(MultiOutputKernel):
    """Cross-spectral kernel (CSM) with Rq phase-shifted subcomponents,
    Ulrich et al. 2015 (reference: mogptk/gpr/multioutput.py:397-454)."""

    def __init__(self, output_dims, input_dims=1, Rq=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.Rq = Rq
        self.amplitude = Parameter(jnp.ones((output_dims, Rq)), lower=config.positive_minimum)
        self.mean = Parameter(jnp.zeros(input_dims), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)
        self.shift = Parameter(jnp.zeros((output_dims, Rq)))

    def _fused_params(self):
        """Pure-function parameter tuple for _csm_K / the fused engine."""
        return (self.amplitude(), self.mean().reshape(1, -1),
                self.variance().reshape(1, -1), self.shift())

    def K_sorted(self, X, counts):
        """Square Gram for channel-sorted X via the generic channel-block
        engine (ops/block_families.py)."""
        from ..ops.block_families import family_gram_sorted
        c1, x1 = self._split(X)
        return family_gram_sorted("csm", (self.Rq, self.input_dims), x1,
                                  counts, self._fused_params())

    def K_mo(self, c1, x1, c2, x2=None):
        # all large temps kept (N,M); Rq and D unrolled (TPU lane padding)
        return _csm_K(c1, x1, c2, x2, self._fused_params())

    def K_mo_diag(self, c1, x1):
        return jnp.sum(self.amplitude(), axis=-1)[c1]

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return self.K_mo(c1, X1, c2, X2)


class LinearModelOfCoregionalizationKernel(MultiOutputKernel):
    """LMC: K_ij = Σ_q (Σ_r w_iqr·w_jqr)·k_q(x,x'), Goovaerts 1997
    (reference: mogptk/gpr/multioutput.py:456-502).

    TPU design: each base kernel is evaluated once over the full input (the
    bases are channel-independent), and the coregionalization weights enter as
    a per-point-pair contraction einsum('nqr,mqr->nmq') on the MXU — strictly
    fewer FLOPs than the reference's per-pair block loop.
    """

    def __init__(self, *kernels, output_dims, input_dims=1, Q=None, Rq=1):
        super().__init__(output_dims, input_dims)
        if Q is None:
            Q = len(kernels)
        kernels = self._check_kernels(kernels, Q)
        self.kernels = kernels
        self.Q = Q
        self.Rq = Rq
        self.weight = Parameter(jnp.ones((output_dims, Q, Rq)), lower=config.positive_minimum)

    def __getitem__(self, key):
        return self.kernels[key]

    def name(self):
        return "%s[%s]" % (self.__class__.__name__, ",".join(k.name() for k in self.kernels))

    def _all_spectral(self):
        """True when every base kernel is a plain SpectralKernel over all of
        THIS kernel's input dims — the SM-LMC case, eligible for the fused
        "lmc_sm" engines (ops/fused.py, ops/block_families.py). The
        input_dims match matters: the fused tiles loop d over
        self.input_dims with (Q,D)-stacked base params, so a base kernel
        declaring a different width would silently change the Gram."""
        from .singleoutput import SpectralKernel
        return all(type(k) is SpectralKernel and k.active_dims is None
                   and k.input_dims == self.input_dims
                   for k in self.kernels)

    def _fused_params(self):
        """Pure-function parameter tuple for _lmc_sm_K / the fused engine:
        (W (O,Q,Rq), mag (Q,1), mu (Q,D), var (Q,D)). Only valid when
        _all_spectral()."""
        mag = jnp.stack([k.magnitude() for k in self.kernels]).reshape(-1, 1)
        mu = jnp.stack([k.mean() for k in self.kernels])
        var = jnp.stack([k.variance() for k in self.kernels])
        return (self.weight(), mag, mu, var)

    def K_sorted(self, X, counts):
        """Square Gram for channel-sorted X via the generic channel-block
        engine when the bases are all spectral (SM-LMC); otherwise the
        generic multi-output assembly."""
        if not self._all_spectral():
            # generic assembly; remat like _Kff's unsorted branch would (the
            # sorted caller skips its own checkpoint assuming a custom-VJP
            # engine, which this fallback is not)
            return jax.checkpoint(self.K)(X)
        from ..ops.block_families import family_gram_sorted
        c1, x1 = self._split(X)
        return family_gram_sorted("lmc_sm", (self.Q, self.input_dims),
                                  x1, counts, self._fused_params())

    def K_mo(self, c1, x1, c2, x2=None):
        # per-component (N,M) MXU matmuls; avoids a materialized (N,M,Q)
        # einsum output whose minor dim would be lane-padded on TPU. x2 is
        # forwarded AS IS: None is the Gram path (WhiteKernel bases return
        # zeros for any materialized X2)
        w = self.weight()                                   # OxQxR
        K = None
        for q, kernel in enumerate(self.kernels):
            Bq = w[c1, q, :] @ w[c2, q, :].T                # NxM
            Kq = Bq * kernel.K(x1, x2)
            K = Kq if K is None else K + Kq
        return K

    def K_mo_diag(self, c1, x1):
        w1 = self.weight()[c1]                              # NxQxR
        B = jnp.sum(w1 * w1, axis=-1)                       # NxQ
        Ks = jnp.stack([k.K_diag(x1) for k in self.kernels], axis=-1)  # NxQ
        return jnp.sum(B * Ks, axis=-1)

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        magnitude = jnp.sum(self.weight()[i] * self.weight()[j], axis=-1)  # Q
        # per-q accumulation keeps all temps (N, M) — stacking on a minor Q
        # axis would lane-pad Q to 128 on TPU
        K = None
        for q, k in enumerate(self.kernels):
            Kq = magnitude[q] * k.K(X1, X2)
            K = Kq if K is None else K + Kq
        return K

    def Ksub_diag(self, i, X1):
        X1, _ = self._active_input(X1)
        magnitude = jnp.sum(self.weight()[i] ** 2, axis=-1)
        Ks = jnp.stack([k.K_diag(X1) for k in self.kernels], axis=-1)
        return jnp.tensordot(Ks, magnitude, axes=1)


class GaussianConvolutionProcessKernel(MultiOutputKernel):
    """Gaussian convolution process kernel (CONV), Álvarez & Lawrence 2009
    (reference: mogptk/gpr/multioutput.py:504-553)."""

    def __init__(self, output_dims, input_dims=1, active_dims=None):
        super().__init__(output_dims, input_dims, active_dims)
        self.weight = Parameter(jnp.ones(output_dims), lower=config.positive_minimum)
        self.variance = Parameter(jnp.ones((output_dims, input_dims)), lower=0.0)
        self.base_variance = Parameter(jnp.ones(input_dims), lower=config.positive_minimum)

    def _fused_params(self):
        """Pure-function parameter tuple for _conv_K / the fused engine."""
        return (self.weight().reshape(-1, 1), self.variance(),
                self.base_variance().reshape(1, -1))

    def K_sorted(self, X, counts):
        """Square Gram for channel-sorted X via the generic channel-block
        engine (ops/block_families.py)."""
        from ..ops.block_families import family_gram_sorted
        c1, x1 = self._split(X)
        return family_gram_sorted("conv", (self.input_dims,), x1, counts,
                                  self._fused_params())

    def K_mo(self, c1, x1, c2, x2=None):
        # all large temps kept (N,M); D unrolled (TPU lane padding)
        return _conv_K(c1, x1, c2, x2, self._fused_params())

    def K_mo_diag(self, c1, x1):
        variances = 2.0 * self.variance() + self.base_variance()  # OxD
        magnitude = self.weight() ** 2 * jnp.sqrt(
            jnp.prod(self.base_variance()) / jnp.prod(variances, axis=-1))  # O
        return magnitude[c1]

    def Ksub(self, i, j, X1, X2=None):
        X1, X2 = self._active_input(X1, X2)
        c1 = jnp.full((X1.shape[0],), i, dtype=jnp.int32)
        c2 = jnp.full((X1.shape[0] if X2 is None else X2.shape[0],), j, dtype=jnp.int32)
        return self.K_mo(c1, X1, c2, X2)
