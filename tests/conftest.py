"""Test harness: run everything on CPU with 8 virtual devices so multi-chip
sharding paths are exercised without TPU hardware (mirrors the driver's
``dryrun_multichip`` environment)."""

import os

# Must be set before jax initializes its backends.  Force CPU even when the
# shell presets JAX_PLATFORMS (e.g. to a tunneled TPU) — unit tests must be
# hermetic and fast; TPU execution is covered by bench.py/__graft_entry__.py.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ.setdefault("JAX_ENABLE_X64", "0")

# The container's sitecustomize registers a tunneled TPU backend and forces
# jax_platforms="axon,cpu" regardless of the env var — override it back to
# CPU before any computation runs.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
