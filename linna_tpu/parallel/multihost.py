"""Multi-host (TPU pod slice) process management.

The reference's cluster layer was Slurm choreography: an sbatch task farm for
theory evaluations plus a co-allocated GPU node reached via ``srun --overlap``
(reference jobscript/example_sampler.job, linna/gpuscript.py,
linna/main.py:200-252).  On a TPU pod slice the equivalent is a single SPMD
program launched once per host: ``jax.distributed.initialize`` wires the
hosts together, every host sees the global device mesh, and XLA collectives
ride ICI — no job-level choreography at all.

Execution model (docs/MULTIHOST.md): **every host runs the same Python
program**.  All hosts dispatch every global-mesh computation (training
epochs, sampler chunks, allgathers) so the collectives line up; host-side
control flow stays identical because every decision is made from
:func:`fetch`-ed values, which are bitwise-identical on all hosts.  Only the
primary process touches the filesystem (HDF5 chains, checkpoints, sample
files) — the pod analogue of the reference's master-rank gating
(linna/util.py:1178) — and :func:`barrier` separates write phases from the
reads of the next phase on the shared filesystem.

This module is that thin host-role layer:

- :func:`initialize` — safe wrapper over ``jax.distributed.initialize``.
  Decides whether to initialize **from environment/arguments alone**, before
  touching any JAX API: calling e.g. ``jax.process_count()`` first would
  itself initialize the local backend and make the real initialization
  impossible (the round-2 defect).
- :func:`is_primary` / :func:`primary_only` — "process 0" write gate.
- :func:`barrier` — all-host synchronization point (replaces the reference's
  sentinel-file busy-waits, linna/main.py:243-252, with a collective).
- :func:`fetch` — device values -> identical host numpy on every process
  (allgather when the value is sharded across hosts).
"""

from __future__ import annotations

import functools
import os
from typing import Any, Callable, Optional

import numpy as np

__all__ = [
    "initialize",
    "is_primary",
    "primary_only",
    "barrier",
    "fetch",
    "broadcast",
    "primary_flag",
    "broadcast_from_primary",
    "process_count",
]

_initialized = False

# Manual-cluster configuration (used by examples/pod_launch.py and the
# two-process tests); on Cloud TPU pods jax auto-discovers all three.
ENV_COORDINATOR = "LINNA_COORDINATOR_ADDRESS"
ENV_NUM_PROCESSES = "LINNA_NUM_PROCESSES"
ENV_PROCESS_ID = "LINNA_PROCESS_ID"


def _env_config():
    coord = os.environ.get(ENV_COORDINATOR)
    nproc = os.environ.get(ENV_NUM_PROCESSES)
    pid = os.environ.get(ENV_PROCESS_ID)
    return (
        coord,
        int(nproc) if nproc is not None else None,
        int(pid) if pid is not None else None,
    )


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> bool:
    """Initialize JAX's multi-host runtime; returns True if multi-process.

    The decision to initialize is made purely from the arguments and the
    environment — **no JAX API is called first** (``jax.process_count()``
    et al. initialize the local backend as a side effect, after which
    ``jax.distributed.initialize`` raises; the failed round-2 version did
    exactly that and always fell into single-process mode on a pod).

    Sources, in precedence order:

    1. explicit arguments;
    2. ``LINNA_COORDINATOR_ADDRESS`` / ``LINNA_NUM_PROCESSES`` /
       ``LINNA_PROCESS_ID`` (manual clusters, tests);
    3. Cloud TPU pod metadata (``TPU_WORKER_HOSTNAMES`` with >1 entry, or
       megascale coordination env) — jax discovers the details itself.

    A no-op (returns False) for plain single-process runs.  Idempotent.
    """
    global _initialized
    if _initialized:
        import jax

        return jax.process_count() > 1

    env_coord, env_nproc, env_pid = _env_config()
    coordinator_address = coordinator_address or env_coord
    num_processes = num_processes if num_processes is not None else env_nproc
    process_id = process_id if process_id is not None else env_pid

    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_pod = ("," in hostnames) or ("MEGASCALE_COORDINATOR_ADDRESS" in os.environ)
    if coordinator_address is None and not on_pod:
        if num_processes is not None or process_id is not None:
            # half-configured manual cluster: running single-process here
            # would silently degrade (this host writes artifacts as its own
            # "primary" while the others wait for it at the coordinator) —
            # fail loudly instead
            raise ValueError(
                f"{ENV_NUM_PROCESSES}/{ENV_PROCESS_ID} are set but "
                f"{ENV_COORDINATOR} is not; a manual cluster needs all three"
            )
        return False  # single-process run; nothing to do

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return jax.process_count() > 1


def process_count() -> int:
    import jax

    return jax.process_count()


def is_primary() -> bool:
    """True on the artifact-writing host (process 0).  All hosts run the
    same SPMD compute; only the primary touches HDF5 chains, checkpoints and
    sample files, mirroring the reference's master-rank file writes."""
    import jax

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

    Implemented via a global-device sync — the collective cannot complete
    until every process has dispatched it, giving a cross-host rendezvous
    without a side channel (the TPU-native replacement for the reference's
    sentinel-file busy-waits, linna/main.py:243-252)."""
    import jax

    if jax.process_count() == 1:
        return
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices(name)


def broadcast(x: Any) -> Any:
    """Primary's host value -> every process (numpy out).

    For host-side decisions that must be identical everywhere but whose
    natural source is process 0 alone (e.g. "does the chain file already
    hold steps?" — another host may race the primary's filesystem writes).
    Single-process: identity."""
    import jax

    if jax.process_count() == 1:
        return x
    from jax.experimental import multihost_utils

    return multihost_utils.broadcast_one_to_all(x)


def broadcast_from_primary(load_fn: Callable[[], Any]) -> Any:
    """Evaluate ``load_fn`` on the primary only; every process gets the
    result **bit-exactly**.

    The one sanctioned way to turn a file on the primary's filesystem into
    state every pod host computes with: the primary loads, the payload ships
    to all hosts, and no other process ever touches the file — so a lagging
    or torn shared-filesystem view on a non-primary host can neither crash a
    read nor put that host in numerically different state (it would dispatch
    different sharded programs and hang the pod).  Used for sampler resume
    state, preconditioners and per-member learning rates.

    Ships a pickled byte buffer rather than the object through
    :func:`broadcast`: ``broadcast_one_to_all`` needs an identical array
    structure pre-declared on every host (impossible for data-dependent
    dicts) and canonicalizes dtypes through device arrays — float64 values
    silently truncate to float32 under JAX's default x64-disabled config.
    Bytes preserve structure and precision exactly.  In-job IPC between
    processes of one SPMD program, not an on-disk format (artifacts stay
    pickle-free).  Payloads are bounded by the int32 byte-length broadcast
    (2 GiB).  Single-process: plain ``load_fn()``."""
    import jax

    if jax.process_count() == 1:
        return load_fn()
    import pickle

    from jax.experimental import multihost_utils

    if is_primary():
        payload = np.frombuffer(
            pickle.dumps(load_fn(), protocol=pickle.HIGHEST_PROTOCOL), np.uint8
        )
    else:
        payload = np.zeros(0, np.uint8)
    nbytes = int(
        multihost_utils.broadcast_one_to_all(np.asarray(len(payload), np.int32))
    )
    buf = np.zeros(nbytes, np.uint8)
    buf[: len(payload)] = payload  # non-primary contributes zeros, discarded
    buf = np.asarray(multihost_utils.broadcast_one_to_all(buf))
    return pickle.loads(buf.tobytes())


def primary_flag(value: bool) -> bool:
    """Primary's boolean (typically a filesystem gate) -> every process.

    Per-host ``os.path.isfile`` decisions ahead of collective work must
    agree across hosts or the SPMD programs diverge — one host dispatches a
    global-mesh computation the others never join (NFS attribute caches can
    lag the primary's writes).  Evaluate the condition locally, pass it
    through here, and branch on the returned primary view.
    Single-process: identity."""
    return bool(np.asarray(broadcast(np.int32(bool(value)))))


def fetch(x: Any) -> Any:
    """Device value(s) -> host numpy, **identical on every process**.

    Host-side control flow (convergence tests, Supervisor decisions,
    checkpoint writes) must see the same numbers on every host or the SPMD
    programs diverge.  For values sharded across processes this is an
    allgather collective — every host must call it at the same point.
    Accepts pytrees; single-process it is a plain ``np.asarray``."""
    import jax

    def needs_gather(a):
        return (
            isinstance(a, jax.Array)
            and not a.is_fully_addressable
            and not a.is_fully_replicated
        )

    if any(needs_gather(a) for a in jax.tree.leaves(x)):
        from jax.experimental import multihost_utils

        def one(a):
            if needs_gather(a):
                # tiled=True: a global (cross-process) array comes back as
                # the full logical value, identical on every process
                return np.asarray(multihost_utils.process_allgather(a, tiled=True))
            return np.asarray(a)

        return jax.tree.map(one, x)

    # fully-addressable: jax.device_get starts every leaf's device->host
    # copy before blocking, so an N-leaf tree costs ~one round trip instead
    # of N sequential ones (a per-leaf np.asarray loop measured ~0.4 s per
    # tree on a tunneled device)
    return jax.tree.map(np.asarray, jax.device_get(x))
