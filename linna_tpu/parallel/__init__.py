"""Device-mesh parallelism for training and sampling.

The reference's parallelism was host-level: an MPI task farm for theory
evaluations and per-walker likelihoods (reference linna/util.py:100-257) and
a scaffolded-but-inactive torch DDP trainer (linna/predictor_gpu.py:264-267).
Here the equivalent axes live on the TPU mesh:

- ``data`` axis: data-parallel training batches and MCMC walker sharding —
  gradients all-reduce over ICI via GSPMD-inserted psums;
- ``model`` axis: Megatron-style tensor parallelism over the emulator trunk
  width (column/row-parallel alternation through the residual stack) —
  **experimental, dryrun/test-only**: LINNA's emulators fit on one chip, so
  no production path routes through it (see dtrain.py's docstring).

Everything is expressed as ``NamedSharding`` annotations on a single ``jit``;
XLA inserts the collectives.
"""

from .mesh import (  # noqa: F401
    make_mesh,
    make_ensemble_mesh,
    member_sharding,
    param_shardings,
    shard_params,
    batch_sharding,
    replicated,
)
from .dtrain import make_sharded_train_step, make_sharded_epoch  # noqa: F401
from .ensemble import EnsembleTrainer  # noqa: F401
