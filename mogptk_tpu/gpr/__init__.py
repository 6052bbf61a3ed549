"""GPR core: config, parameters, kernels, means, likelihoods, and inference
models (capability parity with mogptk/gpr/__init__.py:1-10)."""
from .config import (Config, config, use_half_precision, use_single_precision, use_pallas, pallas_enabled, use_debug, use_jitter_ladder, set_matmul_precision,
                     use_blocked_cholesky, blocked_cholesky_enabled,
                     use_compilation_cache, input_gradients, input_grads_active,
                     set_sensitive_matmul_precision, sensitive_matmul_scope,
                     use_double_precision, use_cpu, use_gpu, use_tpu,
                     print_gpu_information, print_tpu_information,
                     set_positive_minimum, set_seed)
from .parameter import Parameter, Transform, Softplus, Sigmoid
from .module import Module
from .plot import plot_gram
from .mean import Mean, MultiOutputMean, ConstantMean, LinearMean
from .likelihood import (identity, square, exp, probit, inv_probit, sigmoid,
                         GaussHermiteQuadrature, Likelihood,
                         MultiOutputLikelihood, GaussianLikelihood,
                         StudentTLikelihood, ExponentialLikelihood,
                         LaplaceLikelihood, BernoulliLikelihood,
                         BetaLikelihood, GammaLikelihood, PoissonLikelihood,
                         WeibullLikelihood, LogLogisticLikelihood,
                         LogGaussianLikelihood, ChiSquaredLikelihood)
from .kernel import (Kernel, Kernels, AddKernel, MulKernel, MixtureKernel,
                     AutomaticRelevanceDeterminationKernel, ChangePointsKernel,
                     MultiOutputKernel)
from .singleoutput import (WhiteKernel, ConstantKernel, LinearKernel,
                           PolynomialKernel, FunctionKernel, ExponentialKernel,
                           SquaredExponentialKernel, RationalQuadraticKernel,
                           PeriodicKernel, LocallyPeriodicKernel, CosineKernel,
                           SincKernel, SpectralKernel, SpectralMixtureKernel,
                           MaternKernel)
from .multioutput import (IndependentMultiOutputKernel,
                          MultiOutputSpectralKernel,
                          MultiOutputSpectralMixtureKernel,
                          UncoupledMultiOutputSpectralKernel,
                          MultiOutputHarmonizableSpectralKernel,
                          CrossSpectralKernel,
                          LinearModelOfCoregionalizationKernel,
                          GaussianConvolutionProcessKernel)
from .model import (Model, Exact, Snelson, OpperArchambeau, Titsias,
                    SparseHensman, Hensman, CholeskyException,
                    init_inducing_points)
from .iterative import ExactIterative
from .util import merge_data, split_data
from .training import train, precompile
