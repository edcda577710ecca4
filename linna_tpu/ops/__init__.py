"""Pallas TPU kernels for the hot paths.

The reference's native tier was PyTorch's C++/MKL-DNN kernels plus a
TorchScript inference JIT (reference linna/nn.py:119-132,
linna/predictor_gpu.py:480-490).  The TPU-native equivalent is XLA for the
bulk of the graph plus hand-written Pallas kernels where fusion beyond XLA's
pays: the whole emulator MLP in one kernel with weights resident in VMEM, and
the full MCMC likelihood (prior transform -> MLP -> data-space map -> chi^2 +
ln prior) fused so only one scalar per walker ever leaves the chip.
"""

from .fused import fused_apply, fused_log_prob, pallas_available  # noqa: F401
