"""linna-tpu: TPU-native likelihood-emulation Bayesian inference framework.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of chto/linna (LINNA,
arXiv:2203.05583): iteratively sample training points, evaluate an expensive
theory model in parallel on hosts, train an MLP emulator of the theory data
vector on the TPU mesh, and run ensemble MCMC (affine-invariant stretch and
slice moves) plus gradient samplers (HMC/NUTS through the emulator's
autodiff) fully jit-compiled on device, refocusing training data on the
posterior each round.
"""

from . import priors, transforms, nn, losses  # noqa: F401
from . import config, data, likelihood, linear_model, pool, sample_gen, train  # noqa: F401
from . import driver, ops  # noqa: F401
from . import parallel, samplers  # noqa: F401
from .orchestrator import (  # noqa: F401
    ml_sampler,
    ml_sampler_core,
    retrieve_ensemble_params,
    retrieve_model,
    retrieve_model_exist,
    retrieve_model_wrapper,
)

__version__ = "0.1.0"
