"""Trainer tests: loss decreases, checkpoints resume, supervisor state machine
(reference linna/predictor_gpu.py)."""

import os

import numpy as np
import numpy.testing as npt
import jax.numpy as jnp

from linna_tpu import losses as L
from linna_tpu import nn as N
from linna_tpu import transforms as T
from linna_tpu.train import EarlyStopping, Trainer
from linna_tpu.utils import checkpoint as C


def _problem(seed=0, ntrain=64, nval=16, ndim=2, ndata=3):
    rng = np.random.default_rng(seed)
    data = rng.normal(1.0, 0.1, ndata)
    cov = np.eye(ndata) * 0.01
    sigma = np.sqrt(np.diag(cov))

    def theory(x):
        return np.stack(
            [x[:, 0], x[:, 0] * x[:, 1], x[:, 1] ** 2], axis=1
        ) * 0.1 + data

    train_x = rng.uniform(-1, 1, (ntrain, ndim))
    val_x = rng.uniform(-1, 1, (nval, ndim))
    train_y = theory(train_x)
    val_y = theory(val_x)
    xt = T.fit_x_transform(train_x)
    yt = T.fit_y_transform(train_y / sigma)
    ts = T.TransformSet(xt, yt, T.YTransformData(jnp.asarray(sigma, jnp.float32)))
    state = L.build_loss_state(data, cov, ts)
    return ts, state, train_x, train_y, val_x, val_y


def test_training_reduces_loss(tmp_path):
    ts, state, tx, ty, vx, vy = _problem()
    spec = N.make_model_spec("chto_simple", 2, 3)
    tr = Trainer(spec, ts, state, outdir=str(tmp_path))
    train_losses, val_metrics = tr.train(
        tx, ty, vx, vy, num_epochs=40, batch_size=16, auto_lr=True
    )
    assert len(val_metrics) == 40
    assert val_metrics[-1][0] < val_metrics[0][0]
    assert os.path.isfile(tmp_path / "best.ckpt.npz")
    assert os.path.isfile(tmp_path / "last.ckpt.npz")
    assert os.path.isfile(tmp_path / "lr.npy")


def test_checkpoint_resume(tmp_path):
    ts, state, tx, ty, vx, vy = _problem(seed=1)
    spec = N.make_model_spec("chto_simple", 2, 3)
    tr = Trainer(spec, ts, state, outdir=str(tmp_path))
    tr.train(tx, ty, vx, vy, num_epochs=10, batch_size=16)
    best = tr.best_val_loss

    tr2 = Trainer(spec, ts, state, outdir=str(tmp_path))
    assert tr2.load_best()
    # loaded params produce predictions identical to saved trainer's best
    p1 = np.asarray(tr2.predict(jnp.asarray(vx[:4], jnp.float32)))
    assert np.all(np.isfinite(p1))
    assert tr2.best_val_loss <= best + 1e-12


def test_predict_shapes():
    ts, state, tx, ty, vx, vy = _problem(seed=2)
    spec = N.make_model_spec("chto_simple", 2, 3)
    tr = Trainer(spec, ts, state)
    single = tr.predict(jnp.asarray(tx[0], jnp.float32))
    batch = tr.predict(jnp.asarray(tx[:5], jnp.float32))
    assert single.shape == (3,)
    assert batch.shape == (5, 3)
    npt.assert_allclose(np.asarray(batch[0]), np.asarray(single), rtol=1e-6)


def test_early_stopping_patience():
    es = EarlyStopping(patience=10, nqueue=6)
    assert es.step(1.0, 1.0) == 0
    # improvements keep it happy
    for i in range(5):
        assert es.step(0.9 - i * 0.1, 1.0) == 0
    # stagnation: at 90% of patience it requests an lr cut (action 1)
    actions = [es.step(5.0, 1.0) for _ in range(9)]
    assert 1 in actions


def test_early_stopping_stops():
    es = EarlyStopping(patience=5, nqueue=4)
    es.step(1.0, 1.0)
    stopped = False
    for _ in range(600):
        if es.step(2.0, 1.0) == 2:
            stopped = True
            break
    assert stopped


def test_early_stopping_overfit_detector():
    es = EarlyStopping(patience=500, nqueue=8)
    es.step(1.0, 1.0)
    # val rising while train falling -> eventually action 3 (grow wd)
    actions = []
    for i in range(12):
        actions.append(es.step(1.0 + 0.1 * i, 1.0 - 0.05 * i))
    assert 3 in actions


def test_checkpoint_roundtrip(tmp_path):
    tree = {"a": jnp.arange(6, dtype=jnp.float32).reshape(2, 3), "b": {"c": jnp.ones(4)}}
    path = str(tmp_path / "x.npz")
    C.save_checkpoint(path, tree, meta={"epoch": 3})
    loaded, _, meta = C.load_checkpoint(path, tree)
    npt.assert_array_equal(np.asarray(loaded["a"]), np.asarray(tree["a"]))
    assert meta["epoch"] == 3


def test_load_best_survives_donation(tmp_path):
    """load_best hands out a copy: self.params is donated into the jitted
    epoch, which must not invalidate the stored in-memory best (regression:
    'Array has been deleted' after a recovery reload)."""
    import jax.numpy as jnp
    from linna_tpu import losses as L, nn as N, transforms as T
    from linna_tpu.train import Trainer

    rng = np.random.default_rng(0)
    tx = rng.uniform(-1, 1, (40, 2)); ty = tx.copy()
    vx = tx[:10]; vy = ty[:10]
    x_t = T.fit_x_transform(tx, None)
    y_d = T.YTransformData(jnp.ones(2))
    y_t = T.fit_y_transform(ty, ypositive=False)
    ts = T.TransformSet(x_t, y_t, y_d)
    ls = L.build_loss_state(np.zeros(2), np.eye(2), ts)
    tr = Trainer(N.make_model_spec("chto_simple", 2, 2), ts, ls,
                 outdir=str(tmp_path), seed=0)
    tr.train(tx, ty, vx, vy, num_epochs=5, batch_size=10, auto_lr=False)
    assert tr.load_best()          # from memory
    tr.train(tx, ty, vx, vy, num_epochs=5, batch_size=10, auto_lr=False)
    assert tr.load_best()
    # the stored best must still be readable after donation-heavy epochs
    import jax

    leaves = [np.asarray(l) for l in jax.tree_util.tree_leaves(tr.params)]
    assert all(np.all(np.isfinite(l)) for l in leaves)


def test_supervisor_decision_machine():
    """Direct unit test of the Supervisor's pathology decisions (the
    reference's recovery heuristics, linna/predictor_gpu.py:319-401)."""
    import numpy as np

    from linna_tpu.train import Supervisor

    # flat-start: 10+ epochs of flat validation inside the first 120 -> reinit
    sup = Supervisor(lr=1e-3)
    action = "none"
    for ep in range(30):
        vm = np.array([1.0 + 1e-6 * ep, 0.0, 0.0])
        action = sup.step(ep, vm, loss=1.0, min_eig=1.0)
        if action != "none":
            break
    assert action == "reinit"
    # the first restart fires at exactly epoch 10, where the reference's
    # `epoch > 10` gate keeps the lr (linna/predictor_gpu.py:327-333)
    assert sup.lr == 1e-3
    # a later flat restart (epoch > 10) halves it
    for ep in range(11, 30):
        action = sup.step(ep, np.array([1.0, 0.0, 0.0]), 1.0, 1.0)
        if action == "reinit":
            break
    assert action == "reinit" and sup.lr == 5e-4

    # NaN validation -> reload best
    sup = Supervisor(lr=1e-3)
    sup.step(0, np.array([1.0, 0, 0]), 1.0, 1.0)
    assert sup.step(1, np.array([np.nan, 0, 0]), 1.0, 1.0) == "reload"

    # 5x loss spike -> reload, metric clamped to the previous value
    sup = Supervisor(lr=1e-3)
    sup.step(0, np.array([1.0, 0, 0]), 1.0, 1.0)
    vm = np.array([50.0, 0, 0])
    assert sup.step(1, vm, 1.0, 1.0) == "reload"
    assert vm[0] == 1.0  # clamped (linna/predictor_gpu.py:369-371)

    # suppressed epochs (post-intervention within a chunk) take no action
    sup = Supervisor(lr=1e-3)
    sup.step(0, np.array([1.0, 0, 0]), 1.0, 1.0)
    assert sup.step(1, np.array([np.nan, 0, 0]), 1.0, 1.0, suppressed=True) == "none"

    # output collapse (rank-deficient predictions, val far above best) -> reinit
    sup = Supervisor(lr=1e-3)
    sup.best_val_loss = 1.0
    for ep in range(9):
        sup.step(ep, np.array([3.0, 0, 0]), 1.0, 1.0)
    assert sup.step(10, np.array([3.0, 0, 0]), 1.0, min_eig=1e-9) == "reinit"


def test_periodic_saves_write_only_dirty_best(tmp_path):
    """Periodic (non-forced) disk saves write ONLY a dirty best.ckpt, without
    the AdamW moments (2/3 of the bytes; never loaded back — resume is
    best-params + fresh optimizer).  last.ckpt + optimizer state ride the
    final forced save only, and a clean-best interval writes nothing."""
    ts, state, tx, ty, vx, vy = _problem(seed=3)
    spec = N.make_model_spec("chto_simple", 2, 3)
    tr = Trainer(spec, ts, state, outdir=str(tmp_path))
    tr.train(tx, ty, vx, vy, num_epochs=5, batch_size=16, auto_lr=False)
    last_stat = os.stat(tmp_path / "last.ckpt.npz")

    # mid-run (non-forced) save with a dirty best: best written (no opt),
    # last.ckpt untouched
    tr._last_disk_save = -(10**9)
    tr._best_dirty = True
    tr._save(2, False)
    assert os.stat(tmp_path / "last.ckpt.npz").st_mtime_ns == last_stat.st_mtime_ns
    with np.load(tmp_path / "best.ckpt.npz") as z:
        assert not any(k.startswith("opt/") for k in z.files)
    # optimizer-less checkpoints still load cleanly
    params, opt, meta = C.load_checkpoint(
        str(tmp_path / "best.ckpt.npz"), tr.params
    )
    assert opt is None and "best_val_loss" in meta

    # clean best: a periodic save writes nothing at all
    best_stat = os.stat(tmp_path / "best.ckpt.npz")
    tr._last_disk_save = -(10**9)
    tr._save(3, False)
    assert os.stat(tmp_path / "best.ckpt.npz").st_mtime_ns == best_stat.st_mtime_ns
    assert os.stat(tmp_path / "last.ckpt.npz").st_mtime_ns == last_stat.st_mtime_ns

    # forced (final) save carries last.ckpt + the optimizer state
    tr._last_disk_save = -(10**9)
    tr._save(4, False, force=True)
    with np.load(tmp_path / "last.ckpt.npz") as z:
        assert any(k.startswith("opt/") for k in z.files)


def test_dispatch_schedule_shape():
    """DispatchSchedule (VERDICT r4 items 5+7): guard-sized chunks through
    the flat-start window, doubling back to the configured max after quiet
    chunks, reset on intervention."""
    from linna_tpu.train import DispatchSchedule

    s = DispatchSchedule(50)
    # flat-start window: capped at guard regardless of quiet
    assert s.k_at(0, 4500) == 10
    assert s.k_at(119, 4500) == 10
    # one guard chunk after an intervention, then straight back to max (a
    # gradual ramp measured worse in chronically spiky phases — see k_at)
    s.quiet = 0
    assert s.k_at(200, 4500) == 10
    s.quiet = 1
    assert s.k_at(200, 4500) == 50
    s.quiet = 50
    assert s.k_at(200, 4500) == 50
    # intervention resets to the guard chunk
    s.observe(True)
    assert s.quiet == 0 and s.k_at(200, 4500) == 10
    s.observe(False)
    assert s.k_at(200, 4500) == 50
    # remainder clipping
    assert s.k_at(4495, 4500) == 5
    # quiet path covers the run exactly with few distinct lengths
    ks = s.quiet_path_lengths(4500)
    assert sum(ks) == 4500
    assert set(ks) <= {10, 50, (4500 - 120) % 50 or 50}
    # max <= guard degenerates to the old fixed chunking
    s2 = DispatchSchedule(5)
    assert s2.quiet_path_lengths(23) == [5, 5, 5, 5, 3]


def test_nan_recovery_within_guard_epochs(tmp_path):
    """VERDICT r4 item 7: with epochs_per_dispatch=50, a NaN at epoch 37
    (inside the flat-start guard window) is detected and recovered within
    <=10 epochs — the schedule caps the dispatch chunk at the guard size in
    the pathology-prone regime, so the reference's per-epoch recovery
    cadence (linna/predictor_gpu.py:339-373) is matched to within one guard
    chunk instead of one 50-epoch chunk."""
    import jax

    from linna_tpu.train import Trainer

    ts, state, tx, ty, vx, vy = _problem(seed=3)
    spec = N.make_model_spec("chto_simple", 2, 3)
    tr = Trainer(spec, ts, state, outdir=str(tmp_path))

    NAN_EPOCH = 37
    chunks = []  # (start_epoch, k) of every dispatched chunk
    epoch_counter = {"i": 0}
    real = type(tr)._epochs_tracked

    jrng = np.random.default_rng(42)

    def fake(params, opt_state, key, *args):
        k = args[4]
        start = epoch_counter["i"]
        chunks.append((start, k))
        out = real(tr, params, opt_state, key, *args)
        params, opt_state, losses_k, vms_k, eigs_k, bv, bp = out
        vms_k = np.asarray(vms_k, np.float64)
        # jitter the val metric so the (trigger-happy on this tiny smooth
        # problem) flat-start detector stays quiet and the NaN is the only
        # pathology in the run
        vms_k[:, 0] *= 1.0 + 0.05 * jrng.standard_normal(vms_k.shape[0])
        if start <= NAN_EPOCH < start + k:
            vms_k[NAN_EPOCH - start, 0] = np.nan
        vms_k = jnp.asarray(vms_k, jnp.float32)
        epoch_counter["i"] = start + k
        return params, opt_state, losses_k, vms_k, eigs_k, bv, bp

    tr._epochs_tracked = fake
    reloads = []
    from linna_tpu import train as TR

    class SpySup(TR.Supervisor):
        def step(self, ep, vm, loss, min_eig, suppressed=False):
            a = super().step(ep, vm, loss, min_eig, suppressed)
            if a == "reload":
                reloads.append(ep)
            return a

    import unittest.mock as mock

    with mock.patch.object(TR, "Supervisor", SpySup):
        tr.train(
            tx, ty, vx, vy, num_epochs=160, batch_size=16, auto_lr=False,
            epochs_per_dispatch=50, initfrombest=False,
        )
    # every dispatched chunk inside the flat-start window obeyed the guard
    for start, k in chunks:
        if start < 120:
            assert k <= 10, (start, k)
    # the reload fired on the NaN epoch itself, and the correction landed at
    # that chunk's boundary — at most guard-1 executed epochs later (the
    # speculatively dispatched next chunk is discarded, not kept)
    assert reloads and reloads[0] == NAN_EPOCH, reloads
    start, k = next((s0, k0) for s0, k0 in chunks if s0 <= NAN_EPOCH < s0 + k0)
    assert (start + k - 1) - NAN_EPOCH <= 10, (start, k, NAN_EPOCH)


def test_speculative_dispatch_matches_serial(tmp_path):
    """The speculative double-buffer (VERDICT r4 item 5) is a pure latency
    optimization: on an intervention-free run the accepted speculative
    chunks replay the exact key stream and state of serial dispatch, so the
    trained params are bitwise identical with the flag on or off."""
    import jax

    from linna_tpu.train import Trainer

    from linna_tpu import train as TR

    ts, state, tx, ty, vx, vy = _problem(seed=5)
    spec = N.make_model_spec("chto_simple", 2, 3)

    # neutralize the Supervisor: this tiny smooth problem trips the
    # flat-start reinit, and post-intervention streams differ by design
    # (the discarded speculative chunk burns a key split) — here we pin the
    # intervention-free contract
    class QuietSup(TR.Supervisor):
        def step(self, ep, vm, loss, min_eig, suppressed=False):
            return "none"

    results = {}
    for flag in (True, False):
        tr = Trainer(spec, ts, state, outdir=str(tmp_path / f"s{flag}"))
        tr.speculative_dispatch = flag
        import unittest.mock as mock

        with mock.patch.object(TR, "Supervisor", QuietSup):
            tr.train(
                tx, ty, vx, vy, num_epochs=45, batch_size=16, auto_lr=False,
                initfrombest=False,
            )
        results[flag] = jax.tree.map(np.asarray, tr.params)
    for a, b in zip(
        jax.tree_util.tree_leaves(results[True]),
        jax.tree_util.tree_leaves(results[False]),
    ):
        np.testing.assert_array_equal(a, b)
