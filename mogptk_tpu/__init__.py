"""mogptk_tpu — a TPU-native multi-output Gaussian process toolkit.

A from-scratch JAX/XLA/Pallas framework with the capabilities of MOGPTK
(GAMES-UChile/mogptk): multi-channel time-series data management, single- and
multi-output spectral kernels, exact and sparse/variational inference, a
likelihood zoo with Gauss-Hermite quadrature, spectral parameter
initialization, training, prediction, metrics, and plotting.

The namespace is flattened like the reference (mogptk/__init__.py:4-18).
"""
from . import gpr
from .gpr import (config, use_half_precision, use_single_precision,
                  use_double_precision, use_cpu, use_gpu, use_tpu,
                  print_gpu_information, set_positive_minimum, set_seed)
# The reference's star-import chain leaks the commonly used kernel /
# likelihood classes and CholeskyException into the top-level `mogptk`
# namespace (mogptk/__init__.py:4-18 pulls each models/*.py module's
# imports); user notebooks address them as e.g. mogptk.SpectralMixtureKernel,
# so re-export the same names deliberately here.
from .gpr import (CholeskyException, GaussianLikelihood, Kernels,
                  MixtureKernel, SpectralKernel, SpectralMixtureKernel,
                  IndependentMultiOutputKernel, MultiOutputSpectralKernel,
                  MultiOutputSpectralMixtureKernel, CrossSpectralKernel,
                  LinearModelOfCoregionalizationKernel,
                  GaussianConvolutionProcessKernel,
                  MultiOutputHarmonizableSpectralKernel)
from .transformer import (Transformer, TransformBase, TransformDetrend,
                          TransformLinear, TransformNormalize, TransformLog,
                          TransformStandard)
from .util import (mean_absolute_error, mean_absolute_percentage_error,
                   symmetric_mean_absolute_percentage_error,
                   mean_squared_error, root_mean_squared_error, error,
                   plot_spectrum)
from .data import Data, LoadFunction, LoadSplitData
from .dataset import DataSet, LoadCSV, LoadDataFrame
from .init import BNSE
from .model import (Model, Exact, Snelson, OpperArchambeau, Titsias, Hensman,
                    Iterative, LoadModel, kernels)
from .models import SM, MOSM, CSM, SM_LMC, CONV, MOHSM
from . import serving
from . import parallel
from .parallel import use_mesh, active_mesh

__version__ = "0.5.1"
