"""Host pool layer (pool.py): serial/multiprocess maps, the MPI master/worker
protocol against a fake communicator (no mpi4py ranks needed), the
``noduplicate`` function-broadcast optimization
(reference linna/util.py:100-289), and one pipeline run through a real
``MultiprocessPool``."""

import os
from collections import deque

import numpy as np

from linna_tpu.pool import MPIPool, MultiprocessPool, SerialPool, make_pool
from linna_tpu.sample_gen import NNSampler, _TheoryTask


def _square(x):
    return x * x


def _identity_theory(task, outdir):
    """Picklable theory callable: returns the parameter vector."""
    i, x = task
    return np.asarray(x, np.float64).copy()


# ----------------------------------------------------------- fake MPI plumbing


class _FakeStatus:
    def __init__(self):
        self._source = None
        self._tag = None

    def Get_source(self):
        return self._source

    def Get_tag(self):
        return self._tag


class _FakeMPI:
    ANY_SOURCE = -1
    ANY_TAG = -1
    Status = _FakeStatus


class _FakeMasterComm:
    """Single-process master-side communicator: ``send`` executes the worker
    protocol inline (per-worker ``old_func`` state for noduplicate) and
    queues replies that ``recv`` then drains — enough to drive ``MPIPool.map``
    / ``bcast`` / ``noduplicate_close`` without MPI."""

    def __init__(self, size=3):
        self._size = size
        self._replies = deque()
        self._worker_func = {w: None for w in range(1, size)}
        self.func_transmissions = 0
        self.bcast_calls = []
        self.shutdown = set()

    def Get_rank(self):
        return 0

    def Get_size(self):
        return self._size

    def send(self, payload, dest, tag):
        if payload is None:
            self.shutdown.add(dest)
            return
        func, idx, arg = payload
        if func == MPIPool._RESET:
            self._worker_func[dest] = None
            return
        if func == "__bcast__":
            f, a = arg
            self.bcast_calls.append((dest, f(a)))
            return
        if func == MPIPool._REUSE:
            func = self._worker_func[dest]
        else:
            self._worker_func[dest] = func
            self.func_transmissions += 1
        try:
            result = func(arg)
        except Exception as e:  # same contract as MPIPool.wait
            from linna_tpu.pool import _TaskError

            result = _TaskError(repr(e))
        self._replies.append((dest, (idx, result)))

    def recv(self, source=None, tag=None, status=None):
        w, r = self._replies.popleft()
        if status is not None:
            status._source, status._tag = w, 0
        return r


class _FakeWorkerComm:
    """Worker-side communicator: ``recv`` replays a scripted payload list,
    ``send`` records results — drives ``MPIPool.wait`` directly."""

    def __init__(self, script, size=2, rank=1):
        self._script = deque(script)
        self._size = size
        self._rank = rank
        self.sent = []

    def Get_rank(self):
        return self._rank

    def Get_size(self):
        return self._size

    def recv(self, source=None, tag=None, status=None):
        tag_, payload = self._script.popleft()
        if status is not None:
            status._source, status._tag = 0, tag_
        return payload

    def send(self, result, dest, tag):
        self.sent.append((dest, tag, result))


# -------------------------------------------------------------------- serial


def test_serial_pool_map_order():
    p = SerialPool()
    assert p.is_master()
    assert p.map(_square, [1, 2, 3, 4]) == [1, 4, 9, 16]
    p.bcast(_square, 1)
    p.noduplicate_close()
    p.close()


def test_make_pool_kinds():
    assert isinstance(make_pool("serial"), SerialPool)
    p = make_pool("multiprocess", processes=2)
    assert isinstance(p, MultiprocessPool)
    p.close()
    try:
        make_pool("nope")
    except ValueError:
        pass
    else:
        raise AssertionError("unknown pool kind must raise")


# --------------------------------------------------------------- multiprocess


def test_multiprocess_pool_map_order_and_theory_task():
    p = MultiprocessPool(processes=2)
    try:
        assert p.is_master()
        assert p.map(_square, list(range(20))) == [i * i for i in range(20)]
        # the pipeline's picklable theory wrapper round-trips through workers
        tasks = [((i, np.full(3, float(i))), "/tmp") for i in range(6)]
        out = p.map(_TheoryTask(_identity_theory), tasks)
        np.testing.assert_array_equal(
            np.asarray(out), np.stack([np.full(3, float(i)) for i in range(6)])
        )
    finally:
        p.close()


def test_multiprocess_pool_unpicklable_callable_error():
    """Lambdas/closures worked under the old fork start method but cannot
    cross a forkserver/spawn boundary — the failure must name the contract,
    not surface as a bare pickling traceback mid-pipeline."""
    import pytest

    p = MultiprocessPool(processes=2)
    try:
        with pytest.raises(RuntimeError, match="picklable"):
            p.map(lambda x: x, [1, 2, 3])
    finally:
        p.close()


# ----------------------------------------------------------------------- MPI


def test_mpi_pool_map_order_more_tasks_than_workers():
    comm = _FakeMasterComm(size=3)  # 2 workers
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    out = pool.map(_square, list(range(11)))
    assert out == [i * i for i in range(11)]
    # every task shipped its function (noduplicate off)
    assert comm.func_transmissions == 11


def test_mpi_pool_noduplicate_sends_function_once_per_worker():
    comm = _FakeMasterComm(size=4)  # 3 workers
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    pool.noduplicate = True
    out = pool.map(_square, list(range(30)))
    assert out == [i * i for i in range(30)]
    # the function crossed the wire exactly once per worker
    # (reference linna/util.py:143-158)
    assert comm.func_transmissions == 3
    pool.noduplicate_close()
    assert pool.noduplicate is False
    assert pool._workers_have_func == set()
    # after the reset, a new map ships the function again
    pool.noduplicate = True
    pool.map(_square, [1, 2, 3])
    assert comm.func_transmissions == 6


def test_mpi_pool_bcast_runs_on_every_worker():
    comm = _FakeMasterComm(size=3)
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    pool.bcast(_square, 5)
    assert comm.bcast_calls == [(1, 25), (2, 25)]


def test_mpi_pool_close_shuts_workers_down():
    comm = _FakeMasterComm(size=3)
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    pool.close()
    assert comm.shutdown == {1, 2}


def test_mpi_worker_wait_loop_protocol():
    """The worker loop executes tasks, reuses the cached function for
    noduplicate sentinels, resets it, runs bcasts, and exits on None
    (reference linna/util.py:200-240)."""
    side = []

    def bcast_fn(a):
        side.append(a)

    script = [
        (0, (_square, 7, 3)),                      # plain task, index 7
        (0, (MPIPool._REUSE, 8, 4)),               # reuse cached _square
        (0, ("__bcast__", 0, (bcast_fn, "hi"))),   # run-everywhere
        (0, (MPIPool._RESET, 0, None)),            # forget cached function
        (0, (_square, 9, 5)),                      # fresh function again
        (0, None),                                 # shutdown
    ]
    comm = _FakeWorkerComm(script)
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    assert not pool.is_master()
    pool.wait()
    assert comm.sent == [(0, 0, (7, 9)), (0, 0, (8, 16)), (0, 0, (9, 25))]
    assert side == ["hi"]


def _bcast_boom(a):
    raise ValueError("bcast boom")


def test_mpi_worker_survives_bcast_exception(capsys):
    """A raising bcast callback must not kill the worker loop: bcast has no
    reply channel, so a dead worker surfaces only as the master's next map()
    hanging in recv — the exact hang class _TaskError exists to prevent."""
    script = [
        (0, ("__bcast__", 0, (_bcast_boom, None))),  # raises on the worker
        (0, (_square, 0, 3)),                        # worker must still run this
        (0, None),
    ]
    comm = _FakeWorkerComm(script)
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    pool.wait()  # must not raise
    assert comm.sent == [(0, 0, (0, 9))]
    assert "bcast callback failed" in capsys.readouterr().err


def _raise_on_three(x):
    if x == 3:
        raise ValueError("boom on 3")
    return x * x


def test_mpi_worker_exception_propagates_to_master():
    """A worker exception is shipped back and re-raised on the master — the
    reference's worker died silently and map() deadlocked in recv."""
    import pytest

    comm = _FakeMasterComm(size=3)
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    with pytest.raises(RuntimeError, match="boom on 3"):
        pool.map(_raise_on_three, list(range(6)))


def test_mpi_worker_wait_ships_exception_not_crash():
    script = [
        (0, (_raise_on_three, 0, 3)),
        (0, (_raise_on_three, 1, 2)),
        (0, None),
    ]
    comm = _FakeWorkerComm(script)
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    pool.wait()  # must not raise
    from linna_tpu.pool import _TaskError

    (d0, t0, (i0, r0)), (d1, t1, (i1, r1)) = comm.sent
    assert i0 == 0 and isinstance(r0, _TaskError) and "boom" in r0.message
    assert (i1, r1) == (1, 4)


def _cube(x):
    return x * x * x


def test_mpi_noduplicate_invalidates_on_function_change():
    """map() with a DIFFERENT callable resends it — the reference silently
    ran the stale cached function unless noduplicate_close intervened."""
    comm = _FakeMasterComm(size=3)  # 2 workers
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    pool.noduplicate = True
    assert pool.map(_square, [1, 2, 3, 4]) == [1, 4, 9, 16]
    assert comm.func_transmissions == 2
    # same function object: no resend
    assert pool.map(_square, [5, 6]) == [25, 36]
    assert comm.func_transmissions == 2
    # different function: resent, and the results are from the NEW function
    assert pool.map(_cube, [2, 3]) == [8, 27]
    assert comm.func_transmissions == 4


def test_mpi_pool_task_index_not_used_as_tag():
    """Task indices beyond MPI_TAG_UB (32767) must work: the index rides in
    the payload, every send uses a fixed tag."""
    comm = _FakeMasterComm(size=3)
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    n = 33000
    out = pool.map(_square, list(range(n)))
    assert out[32768] == 32768 * 32768 and out[-1] == (n - 1) ** 2


# -------------------------------------------------- pipeline through the pool


def test_generate_training_data_through_multiprocess_pool(tmp_path):
    nn = NNSampler(str(tmp_path), np.array([[-1.0, 1.0]] * 3))
    x = np.arange(12, dtype=np.float64).reshape(4, 3)
    pool = MultiprocessPool(processes=2)
    try:
        y = nn.generate_training_data(
            zip(range(len(x)), x), _identity_theory, pool=pool,
            args=[str(tmp_path / "scratch")],
        )
    finally:
        pool.close()
    np.testing.assert_array_equal(y, x)


def test_pipeline_end_to_end_with_multiprocess_pool(tmp_path):
    """One full ml_sampler_core iteration fanned through a real 2-process
    pool (VERDICT r1 item 5)."""
    from linna_tpu import ml_sampler_core

    outdir = str(tmp_path / "out")
    pool = MultiprocessPool(processes=2)
    try:
        chain, logp = ml_sampler_core(
            ntrainArr=[20], nvalArr=[5], nkeepArr=[1], ntimesArr=[2],
            ntautolArr=[0.5], meanshiftArr=[100], stdshiftArr=[100],
            outdir=outdir,
            theory=_identity_theory,
            priors=[{"param": "a", "dist": "flat", "arg1": -2.0, "arg2": 2.0}] * 2,
            data=np.array([0.1, 0.5]), cov=np.diag([0.3, 0.2]),
            init=np.zeros(2), pool=pool, nwalkers=4, temperatureArr=[1.0],
            params={"trainingoption": 1, "num_epochs": 6, "batch_size": 8,
                    "nensemble": 1},
            method="emcee", seed=11,
        )
    finally:
        pool.close()
    assert chain.shape[1] == 2
    assert np.all(np.isfinite(chain))
    assert os.path.isfile(os.path.join(outdir, "iter_0", "train_samples_y.npy"))


def test_multiprocess_pool_constructed_after_jax_compute():
    """Pool construction after JAX work must not fork a multithreaded parent
    (VERDICT r2 item 6): the forkserver/spawn context keeps workers clean."""
    import jax
    import jax.numpy as jnp

    x = jnp.ones((16, 16))
    jax.block_until_ready(x @ x)  # JAX threads are live in this process now
    p = MultiprocessPool(processes=2)
    try:
        assert p.map(_square, [1, 2, 3]) == [1, 4, 9]
    finally:
        p.close()


def test_mpi_pool_map_usable_after_worker_error():
    """After a worker error, map() drains the other workers' in-flight
    replies before raising — otherwise the NEXT map() on the pool consumes a
    stale (idx, result) pair and returns silently wrong results."""
    import pytest

    comm = _FakeMasterComm(size=3)
    pool = MPIPool(comm=comm, mpi=_FakeMPI)
    with pytest.raises(RuntimeError, match="boom on 3"):
        pool.map(_raise_on_three, list(range(6)))
    assert not comm._replies  # no stale replies left queued
    assert pool.map(_square, [1, 2, 3, 4]) == [1, 4, 9, 16]
