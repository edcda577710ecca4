"""Multi-host (TPU pod slice) process management.

The reference's cluster layer was Slurm choreography: an sbatch task farm for
theory evaluations plus a co-allocated GPU node reached via ``srun --overlap``
(reference jobscript/example_sampler.job, linna/gpuscript.py,
linna/main.py:200-252).  On a TPU pod slice the equivalent is a single SPMD
program launched once per host: ``jax.distributed.initialize`` wires the
hosts together, every host sees the global device mesh, and XLA collectives
ride ICI — no job-level choreography at all.

This module is the thin host-role layer the orchestrator needs on a pod:

- :func:`initialize` — safe wrapper over ``jax.distributed.initialize``
  (no-op for single-process runs, idempotent);
- :func:`is_primary` — "process 0" gate for filesystem artifacts (HDF5
  chains, checkpoints, transforms), the pod analogue of the reference's
  ``pool.is_master()`` master-rank gating (linna/util.py:1178);
- :func:`primary_only` — decorator applying that gate;
- :func:`barrier` — all-host synchronization point so non-primary hosts
  don't race ahead of primary-written artifacts (replaces the reference's
  file-polling busy-waits, linna/main.py:243-245, with a collective).

See docs/MULTIHOST.md for the launch recipe and examples/pod_launch.py for a
runnable entry point.
"""

from __future__ import annotations

import functools
import os
from typing import Callable, Optional

import jax

__all__ = ["initialize", "is_primary", "primary_only", "barrier", "process_count"]

_initialized = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize JAX's multi-host runtime.

    On Cloud TPU pod slices all three arguments are discovered from the TPU
    metadata server and may be omitted; pass them explicitly for manual
    clusters (``coordinator_address="host0:8476"``).  A no-op when the
    process is already initialized or when running single-process (no
    coordinator configured and not on a multi-host TPU environment).
    """
    global _initialized
    if _initialized or jax.process_count() > 1:
        _initialized = True
        return
    # a pod = more than one worker hostname (single-host TPU environments
    # also export TPU_WORKER_HOSTNAMES, with one entry)
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_pod = ("," in hostnames) or (
        "MEGASCALE_COORDINATOR_ADDRESS" in os.environ
    )
    if coordinator_address is None and not on_pod:
        return  # single-process run; nothing to do
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError as e:
        # backend already initialized (e.g. a single-host run that touched
        # jax before calling this): proceed single-process rather than die
        import warnings

        warnings.warn(f"multihost.initialize skipped: {e}")
        return
    _initialized = True


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    """True on the artifact-writing host (process 0).  All hosts run the
    same SPMD compute; only the primary touches HDF5 chains, checkpoints and
    sample files, mirroring the reference's master-rank file writes."""
    return jax.process_index() == 0


def primary_only(fn: Callable) -> Callable:
    """Run ``fn`` only on process 0 (returns None elsewhere)."""

    @functools.wraps(fn)
    def wrapper(*args, **kwargs):
        if not is_primary():
            return None
        return fn(*args, **kwargs)

    return wrapper


def barrier(name: str = "barrier") -> None:
    """Block until every host reaches this point.

    Implemented as a tiny psum over all devices — the collective cannot
    complete until every process has dispatched it, giving a cross-host
    rendezvous without a side channel (the TPU-native replacement for the
    reference's sentinel-file busy-waits, linna/main.py:243-252)."""
    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)
