"""Mesh-parallel ensemble training (parallel/ensemble.py): the stacked
vmapped trainer must be interchangeable with the serial Trainer — same
per-member LR picks, same best checkpoints (to float tolerance), same
artifact layout — while advancing all members in one sharded device program
(the activation of the DDP the reference scaffolded,
reference linna/predictor_gpu.py:264-267)."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from linna_tpu import losses as L
from linna_tpu import nn as N
from linna_tpu import transforms as T
from linna_tpu.parallel.ensemble import EnsembleTrainer
from linna_tpu.parallel.mesh import make_ensemble_mesh
from linna_tpu.train import Trainer
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


def test_mesh_axes():
    # 8 virtual devices (conftest): K=4 -> 4x2, K=1 -> 1x8, K=3 -> 1x8
    m4 = make_ensemble_mesh(4)
    assert dict(zip(m4.axis_names, m4.devices.shape)) == {"ens": 4, "data": 2}
    m1 = make_ensemble_mesh(1)
    assert dict(zip(m1.axis_names, m1.devices.shape)) == {"ens": 1, "data": 8}
    m3 = make_ensemble_mesh(3)
    assert dict(zip(m3.axis_names, m3.devices.shape)) == {"ens": 1, "data": 8}


def test_ensemble_matches_serial_members(tmp_path):
    """Per-member best checkpoints from the sharded stacked trainer equal the
    serial Trainer's to float tolerance (VERDICT r1 item 2 'done' check)."""
    ts, state, tx, ty, vx, vy = _problem()
    spec = N.make_model_spec("chto_simple", 2, 3)
    K = 2
    seeds = [1234 + 1000 * k for k in range(K)]
    serial_dirs = [str(tmp_path / f"serial_{k}") for k in range(K)]
    ens_dirs = [str(tmp_path / f"ens_{k}") for k in range(K)]

    for k in range(K):
        tr = Trainer(spec, ts, state, outdir=serial_dirs[k], seed=seeds[k])
        tr.train(tx, ty, vx, vy, num_epochs=40, batch_size=16)

    et = EnsembleTrainer(spec, ts, state, ens_dirs, seeds)
    et.train(tx, ty, vx, vy, num_epochs=40, batch_size=16)

    template = N.init_model(jax.random.key(0), spec)
    for k in range(K):
        lr_s = float(np.load(os.path.join(serial_dirs[k], "lr.npy")))
        lr_e = float(np.load(os.path.join(ens_dirs[k], "lr.npy")))
        assert lr_s == lr_e, f"member {k} LR pick diverged"
        ps, _, ms = C.load_checkpoint(
            os.path.join(serial_dirs[k], "best.ckpt.npz"), template
        )
        pe, _, me = C.load_checkpoint(
            os.path.join(ens_dirs[k], "best.ckpt.npz"), template
        )
        np.testing.assert_allclose(
            ms["best_val_loss"], me["best_val_loss"], rtol=1e-4
        )
        for a, b in zip(jax.tree.leaves(ps), jax.tree.leaves(pe)):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), atol=5e-5, rtol=1e-3
            )


def test_ensemble_members_sharded_over_mesh():
    """Stacked member params actually live on the 'ens' mesh axis."""
    ts, state, tx, ty, vx, vy = _problem(seed=1)
    spec = N.make_model_spec("chto_simple", 2, 3)
    et = EnsembleTrainer(spec, ts, state, ["/tmp/unused0", "/tmp/unused1"],
                         [1, 2], mesh=make_ensemble_mesh(2))
    leaf = et.params["layer1"]["w"]
    assert leaf.shape[0] == 2
    spec_sh = leaf.sharding.spec
    assert spec_sh[0] == "ens"


def test_ensemble_resume_from_best(tmp_path):
    """Second train() call resumes member params from the per-member best
    checkpoints (initfrombest contract, linna/predictor_gpu.py:247-250)."""
    ts, state, tx, ty, vx, vy = _problem(seed=2)
    spec = N.make_model_spec("chto_simple", 2, 3)
    dirs = [str(tmp_path / f"m{k}") for k in range(2)]
    et = EnsembleTrainer(spec, ts, state, dirs, [7, 1007])
    et.train(tx, ty, vx, vy, num_epochs=10, batch_size=16)
    first_best = et.best_val_loss.copy()
    assert np.all(np.isfinite(first_best))

    et2 = EnsembleTrainer(spec, ts, state, dirs, [7, 1007])
    et2.train(tx, ty, vx, vy, num_epochs=10, batch_size=16)
    # resumed best can only improve
    assert np.all(et2.best_val_loss <= first_best + 1e-9)


def test_orchestrator_routes_ensemble_through_mesh(tmp_path):
    """train_emulator uses the mesh path under multi-device backends and
    produces the same artifact layout as the serial path."""
    from linna_tpu import orchestrator as O
    from linna_tpu import data as D

    rng = np.random.default_rng(3)
    outdir = str(tmp_path / "iter_0")
    os.makedirs(outdir)
    tx = rng.uniform(-1, 1, (30, 2))
    ty = np.stack([tx[:, 0], tx[:, 1]], axis=1) + 1.0
    np.savetxt(D.sample_x_path(outdir, "train"), tx)
    np.save(D.sample_y_path(outdir, "train"), ty)
    np.savetxt(D.sample_x_path(outdir, "val"), tx[:8])
    np.save(D.sample_y_path(outdir, "val"), ty[:8])

    data = np.ones(2)
    cov = np.eye(2) * 0.1
    O.train_emulator(
        outdir, [outdir], data, cov, np.sqrt(np.diag(cov)), None, False,
        "chto_simple", {"num_epochs": 10, "batch_size": 16, "nensemble": 2},
    )
    assert os.path.isfile(os.path.join(outdir, "best.ckpt.npz"))
    assert os.path.isfile(os.path.join(outdir, "ens_1", "best.ckpt.npz"))
    assert os.path.isfile(os.path.join(outdir, "finish.json"))
    # retrieval sees both members
    trainer = O.retrieve_model(outdir, 2, 2, "chto_simple")
    members = O.retrieve_ensemble_params(outdir, trainer)
    assert len(members) == 2
