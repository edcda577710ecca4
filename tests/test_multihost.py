"""Multi-host helpers (parallel/multihost.py): single-process semantics —
the same program that runs on a pod must degrade to a no-op locally
(docs/MULTIHOST.md testing contract, level 1)."""

from linna_tpu.parallel import multihost as MH


def test_initialize_is_noop_single_process():
    MH.initialize()  # must not raise or try to reach a coordinator
    assert MH.process_count() == 1


def test_is_primary_single_process():
    assert MH.is_primary()


def test_primary_only_runs_on_primary():
    calls = []

    @MH.primary_only
    def record(x):
        calls.append(x)
        return x

    assert record(7) == 7
    assert calls == [7]


def test_barrier_returns_single_process():
    MH.barrier("test")


def test_broadcast_from_primary_single_process():
    """Single-process: plain load_fn() — same object, full f64 precision,
    arbitrary structure (the pod path pins bit-exactness in
    tests/_mh2_worker.py)."""
    import numpy as np

    val = {"a": np.array([1.0 + 1e-12], np.float64), "b": ("x", 3)}
    out = MH.broadcast_from_primary(lambda: val)
    assert out is val  # no serialization round-trip single-process
