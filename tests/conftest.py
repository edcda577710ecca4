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

# Disable JAX's persistent compilation cache for the whole test session
# (subprocess tests inherit this; orchestrator._enable_compile_cache honors
# "0").  Long test sessions that READ cached executables segfault inside
# jaxlib's ``backend.deserialize_executable`` (observed twice at different
# tests, ~40 min in, identical stack through compilation_cache.py
# get_executable_and_time; entries were zstd-intact and a 300-executable
# write+read probe passes, so it is a deserialization bug for specific
# program/backend states, not file corruption).  Tests never need cross-run
# compile reuse; production paths (bench.py, bench_full.py — short-lived
# processes) keep the cache and have not reproduced the crash.
os.environ["LINNA_COMPILE_CACHE"] = "0"
os.environ.pop("JAX_COMPILATION_CACHE_DIR", None)

# No background compile warming in tests: with the persistent cache off it
# cannot help, and every tiny pipeline test would otherwise spawn a thread
# compiling extra programs concurrently with the suite (tests/test_precompile
# covers the warmer explicitly, overriding this).
os.environ.setdefault("LINNA_PRECOMPILE", "0")

# The container's sitecustomize registers a tunneled TPU backend and forces
# jax_platforms="axon,cpu" regardless of the env var — override it back to
# CPU before any computation runs.
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
