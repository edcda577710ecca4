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
