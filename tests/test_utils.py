"""Aux subsystems: metrics/logging helpers, phase tracing, diagnostic plots
(reference linna/nnutils.py; SURVEY §5.1/5.5)."""

import json
import os

import numpy as np

from linna_tpu.utils import (
    Params,
    PhaseTimer,
    RunningAverage,
    device_profile,
    save_dict_to_json,
    set_logger,
)
from linna_tpu.utils import plots


def test_params_roundtrip(tmp_path):
    p = tmp_path / "p.json"
    p.write_text('{"learning_rate": 0.1, "epochs": 5}')
    params = Params(str(p))
    assert params.learning_rate == 0.1
    params.learning_rate = 0.5
    params.save(str(p))
    assert Params(str(p)).dict == {"learning_rate": 0.5, "epochs": 5}


def test_running_average():
    ra = RunningAverage()
    ra.update(2)
    ra.update(4)
    assert ra() == 3


def test_save_dict_to_json_and_logger(tmp_path):
    path = tmp_path / "m.json"
    save_dict_to_json({"a": np.float32(1.5), "b": 2}, str(path))
    assert json.loads(path.read_text()) == {"a": 1.5, "b": 2.0}
    set_logger(str(tmp_path / "train.log"))  # must not raise


def test_phase_timer_persists_and_accumulates(tmp_path):
    t = PhaseTimer(str(tmp_path))
    with t.phase("train", iteration=0) as rec:
        rec["detail"] = {"sub": 1.0}  # bodies may attach meta to the record
    with t.phase("train", iteration=1):
        pass
    with t.phase("mcmc"):
        pass
    trace = json.loads((tmp_path / "trace.json").read_text())
    assert [r["phase"] for r in trace] == ["train", "train", "mcmc"]
    assert trace[0]["detail"] == {"sub": 1.0}
    assert trace[0]["seconds"] >= 0.0
    assert set(t.summary()) == {"train", "mcmc"}
    # resume: a fresh timer appends rather than truncates
    t2 = PhaseTimer(str(tmp_path))
    with t2.phase("mcmc"):
        pass
    assert len(json.loads((tmp_path / "trace.json").read_text())) == 4


def test_phase_timer_survives_corrupt_trace(tmp_path):
    """A trace.json truncated by a mid-write kill must not crash the
    resumed pipeline: the corrupt history is dropped (with a marker) and
    tracing continues."""
    (tmp_path / "trace.json").write_text('[{"phase": "train", "seco')
    t = PhaseTimer(str(tmp_path))
    with t.phase("mcmc"):
        pass
    trace = json.loads((tmp_path / "trace.json").read_text())
    assert trace[-1]["phase"] == "mcmc"
    assert any(r["phase"] == "_corrupt_trace_dropped" for r in trace)


def test_device_profile_noop_without_env(monkeypatch):
    monkeypatch.delenv("LINNA_PROFILE", raising=False)
    with device_profile("x"):
        pass


def test_plots_write_files(tmp_path):
    lr_path = str(tmp_path / "lr.png")
    plots.plot_lr_range(np.geomspace(1e-4, 1e-2, 20), np.random.rand(20), lr_path)
    prog_path = str(tmp_path / "prog.png")
    plots.plot_training_progress(
        np.random.rand(50), np.random.rand(10, 3), prog_path, batches_per_epoch=5
    )
    assert os.path.isfile(lr_path) and os.path.isfile(prog_path)


def test_pipeline_writes_trace_and_plots(tmp_path):
    """End-to-end: the orchestrator must leave trace.json and the training
    diagnostics behind (artifact contract incl. reference's plot names)."""
    from linna_tpu import ml_sampler_core

    outdir = str(tmp_path / "out")
    ml_sampler_core(
        ntrainArr=[25], nvalArr=[6], nkeepArr=[1], ntimesArr=[2],
        ntautolArr=[0.5], meanshiftArr=[100], stdshiftArr=[100],
        outdir=outdir,
        theory=lambda x, o: np.asarray(x[1], np.float64).copy(),
        priors=[{"param": "a", "dist": "flat", "arg1": -2.0, "arg2": 2.0}] * 2,
        data=np.array([0.1, 0.5]), cov=np.diag([0.3, 0.2]),
        init=np.zeros(2), pool=None, nwalkers=4, temperatureArr=[1.0],
        params={"trainingoption": 1, "num_epochs": 8, "batch_size": 8},
        method="emcee", seed=5,
    )
    trace = json.loads(open(os.path.join(outdir, "trace.json")).read())
    phases = {r["phase"] for r in trace}
    assert {"generate_training_point", "train_emulator", "mcmc"} <= phases
    # the train record must explain its own wall: data-prep seconds plus the
    # trainer's internal sub-phase breakdown and epoch count
    trec = next(r for r in trace if r["phase"] == "train_emulator")
    assert "stack_fit_s" in trec
    tkey = "trainer" if "trainer" in trec else "trainer_m0"
    assert {"auto_lr", "dispatch", "wait_fetch", "supervisor", "save"} <= set(
        trec[tkey]
    )
    assert trec.get("epochs_run", trec.get("epochs_run_m0")) == 8
    assert os.path.isfile(os.path.join(outdir, "iter_0", "lr_tunning.png"))
    assert os.path.isfile(os.path.join(outdir, "iter_0", "trainniing.png"))


def test_pipeline_train_subprocess_mode(tmp_path):
    """params['train_subprocess'] routes training through the
    'python -m linna_tpu.train_entry' process (reference train_gpu.py
    handoff) and the pipeline completes identically."""
    from linna_tpu import ml_sampler_core

    outdir = str(tmp_path / "out")
    chain, logp = ml_sampler_core(
        ntrainArr=[25], nvalArr=[6], nkeepArr=[1], ntimesArr=[2],
        ntautolArr=[0.5], meanshiftArr=[100], stdshiftArr=[100],
        outdir=outdir,
        theory=lambda x, o: np.asarray(x[1], np.float64).copy(),
        priors=[{"param": "a", "dist": "flat", "arg1": -2.0, "arg2": 2.0}] * 2,
        data=np.array([0.1, 0.5]), cov=np.diag([0.3, 0.2]),
        init=np.zeros(2), pool=None, nwalkers=4, temperatureArr=[1.0],
        params={"trainingoption": 1, "num_epochs": 8, "batch_size": 8,
                "train_subprocess": True},
        method="emcee", seed=5,
    )
    assert len(chain) > 0
    # the returned log-probs are the SAME cut rows as the chain (the
    # reference returned the full-chain array next to the cut chain)
    assert len(logp) == len(chain)
    it0 = os.path.join(outdir, "iter_0")
    assert os.path.isfile(os.path.join(it0, "train_request.json"))
    assert os.path.isfile(os.path.join(it0, "finish.json"))
    assert os.path.isfile(os.path.join(it0, "best.ckpt.npz"))


def test_checkpoint_bf16_leaves_roundtrip(tmp_path):
    """bf16 leaves (AdamW moments under compute_dtype) survive the npz
    checkpoint: npz has no record of ml_dtypes types — raw |V2 bytes written
    naively can never be reinterpreted by np.load — so save widens to f32
    (exact) and load casts back via the template dtype (exact)."""
    import jax.numpy as jnp

    from linna_tpu.utils import checkpoint as ckpt

    params = {"w": jnp.arange(6, dtype=jnp.float32).reshape(2, 3)}
    opt = {"mu": jnp.asarray([[0.5, -1.25], [2.0, 0.125]], jnp.bfloat16)}
    path = str(tmp_path / "c.ckpt.npz")
    ckpt.save_checkpoint(path, params, opt, {"epoch": 3})
    with np.load(path) as z:
        assert z["opt/mu"].dtype == np.float32  # npz-representable on disk
    p2, o2, meta = ckpt.load_checkpoint(path, params, opt)
    assert o2["mu"].dtype == jnp.bfloat16
    np.testing.assert_array_equal(
        np.asarray(o2["mu"], np.float32), np.asarray(opt["mu"], np.float32)
    )
    assert meta["epoch"] == 3


def test_check_map_count_branches(tmp_path):
    """The shared vm.max_map_count guard (utils.runtime): warn-only by
    default, sysctl write strictly opt-in (ADVICE r4), one code path for
    production startup and the test harness (VERDICT r4 item 8)."""
    import pytest

    from linna_tpu.utils.runtime import check_map_count

    p = tmp_path / "max_map_count"
    p.write_text("65530")
    # default: warn, do NOT touch the system setting
    with pytest.warns(UserWarning, match="max_map_count"):
        assert check_map_count(path=str(p), allow_write=False) == 65530
    assert p.read_text() == "65530"
    # opt-in (LINNA_RAISE_MAP_COUNT=1 → allow_write): raise the limit
    assert check_map_count(path=str(p), allow_write=True) == 1048576
    assert int(p.read_text()) == 1048576
    # healthy limit: returned unchanged, silent
    import warnings as _w

    with _w.catch_warnings():
        _w.simplefilter("error")
        assert check_map_count(path=str(p), allow_write=False) == 1048576
    # unreadable (non-Linux / masked procfs): None, silent
    assert check_map_count(path=str(tmp_path / "missing")) is None
