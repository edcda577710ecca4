"""Genuine two-process multi-host test (VERDICT r2 item 1).

Launches two real OS processes that wire up via ``jax.distributed.initialize``
(coordinator on localhost, 4 virtual CPU devices each → one 8-device global
mesh) and run the SAME SPMD program (tests/_mh2_worker.py): the production
``train_emulator`` → ``EnsembleTrainer`` path on the cross-process
('ens','data') mesh, emulator retrieval from the shared filesystem, and a
walker-sharded ``run_ensemble`` chunk — then the same again with per-process
output directories to prove only process 0 writes artifacts
(reference master-rank gating, linna/util.py:1178)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.filterwarnings("ignore")
def test_two_process_spmd_pipeline(tmp_path):
    shared = tmp_path / "shared"
    shared.mkdir()
    gate_base = str(tmp_path / "gate_p")

    # pre-seed the shared iteration directory with training samples (the
    # shared filesystem every pod host mounts)
    rng = np.random.default_rng(0)
    NDIM, NDATA = 3, 4
    w = rng.standard_normal((NDIM, NDATA))
    tx = rng.uniform(-1, 1, (64, NDIM))
    vx = rng.uniform(-1, 1, (16, NDIM))
    np.savetxt(shared / "train_samples_x.txt", tx)
    np.save(shared / "train_samples_y.npy", tx @ w)
    np.savetxt(shared / "val_samples_x.txt", vx)
    np.save(shared / "val_samples_y.npy", vx @ w)

    port = _free_port()
    worker = os.path.join(os.path.dirname(__file__), "_mh2_worker.py")
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env_base = {
        **os.environ,
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "LINNA_COORDINATOR_ADDRESS": f"localhost:{port}",
        "LINNA_NUM_PROCESSES": "2",
        # short-lived workers get the persistent compile cache (overrides
        # the conftest's session-wide cache-off): repeat suite runs then
        # skip the ~2 min of per-process mesh compiles (see _mh2_worker.py)
        "LINNA_COMPILE_CACHE": "/tmp/linna_test_mh2_cache",
    }
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(shared), gate_base],
            env={**env_base, "LINNA_PROCESS_ID": str(k)},
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for k in range(2)
    ]
    outs = []
    for k, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(f"process {k} timed out (deadlocked collective?)")
        outs.append(out)
    for k, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {k} failed:\n{out[-4000:]}"
        assert f"WORKER-OK p{k}" in out

    # shared phase artifacts exist exactly once
    for f in ["finish.json", "transforms.npz", "best.ckpt.npz", "lr.npy",
              "chemcee_256.h5", os.path.join("ens_1", "best.ckpt.npz")]:
        assert os.path.exists(shared / f), f

    # write gate: the primary's private dir has artifacts, the non-primary's
    # has NO files at all
    p0_files = [
        p for p in __import__("pathlib").Path(gate_base + "0").rglob("*") if p.is_file()
    ]
    assert p0_files, "primary must have written phase-2 artifacts"
    gate1 = __import__("pathlib").Path(gate_base + "1")
    p1_files = [p for p in gate1.rglob("*") if p.is_file()] if gate1.exists() else []
    assert p1_files == [], f"non-primary wrote files: {p1_files}"


@pytest.mark.slow
@pytest.mark.filterwarnings("ignore")
def test_pod_launch_example_two_processes(tmp_path):
    """The SHIPPED pod entry point (examples/pod_launch.py), not a test
    worker: two real processes run the full driver pipeline (training-point
    generation -> EnsembleTrainer on the cross-process mesh -> walker-sharded
    emcee) SPMD over one 8-device global mesh against a shared outdir."""
    inputs = tmp_path / "inputs"
    inputs.mkdir()
    means = np.array([0.3, -0.2])
    np.savetxt(inputs / "data.txt", np.stack([np.arange(2), means], 1))
    np.savetxt(
        inputs / "cov_triplet.txt",
        np.array([[0, 0, 0.0, 0.3], [1, 1, 0.25, 0.25]]),
    )
    outdir = tmp_path / "out"
    # nwalkers=16 is a multiple of 2*8 global devices -> the sampler chunk
    # runs walker-sharded across both processes
    (tmp_path / "run.yaml").write_text(
        f"outdir: {outdir}\n"
        "theory: identity\n"
        f"base_dir: {inputs}\n"
        "data_file: data.txt\ncov_file: cov_triplet.txt\n"
        "nwalkers: 16\nnnmodel: chto_v2\ntrainingoption: 1\n"
        "num_epochs: 30\nbatch_size: 16\nntrainArr: [60]\nnvalArr: [15]\n"
        "nkeepArr: [2]\nntimesArr: [2]\nntautolArr: [0.5]\n"
        "meanshiftArr: [100]\nstdshiftArr: [100]\ntemperatureArr: [1.0]\n"
        "seed: 7\n"
        "sampled_params:\n"
        "  - {param: x0, dist: flat, arg1: -2.0, arg2: 2.0}\n"
        "  - {param: x1, dist: flat, arg1: -2.0, arg2: 2.0}\n"
    )
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pod_launch = os.path.join(repo_root, "examples", "pod_launch.py")
    port = _free_port()
    env_base = {
        **os.environ,
        "PYTHONPATH": repo_root + os.pathsep + os.environ.get("PYTHONPATH", ""),
        "JAX_PLATFORMS": "cpu",
        "XLA_FLAGS": "--xla_force_host_platform_device_count=4",
        "LINNA_COORDINATOR_ADDRESS": f"localhost:{port}",
        "LINNA_NUM_PROCESSES": "2",
        # short-lived workers get the persistent compile cache (overrides
        # the conftest's session-wide cache-off): repeat suite runs then
        # skip the ~2 min of per-process mesh compiles (see _mh2_worker.py)
        "LINNA_COMPILE_CACHE": "/tmp/linna_test_mh2_cache",
    }
    # bootstrap pins the platform via jax.config BEFORE pod_launch runs
    # (belt and braces against environments whose site hooks re-point
    # JAX_PLATFORMS), then executes the example unmodified
    boot = (
        "import sys, jax, runpy; jax.config.update('jax_platforms', 'cpu'); "
        f"sys.argv = [{pod_launch!r}, 'emcee', {str(tmp_path / 'run.yaml')!r}, "
        f"{str(tmp_path)!r}]; runpy.run_path({pod_launch!r}, run_name='__main__')"
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-c", boot],
            env={**env_base, "LINNA_PROCESS_ID": str(k)},
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
        )
        for k in range(2)
    ]
    outs = []
    for k, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=900)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise AssertionError(f"process {k} timed out (deadlocked collective?)")
        outs.append(out)
    for k, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {k} failed:\n{out[-4000:]}"
        assert f"process {k}/2" in out
        assert f"process {k} driver finished rc=0" in out
    # the pipeline's shared artifacts exist (written once, by the primary)
    assert (outdir / "time.npy").exists()
    assert (outdir / "iter_0" / "chemcee_256.h5").exists()
    assert (outdir / "iter_0" / "finish.json").exists()
