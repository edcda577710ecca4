"""PCA+polynomial LinearModel (reference linna/nn.py:200-298) and the
user-facing model-retrieval wrappers."""

import jax
import jax.numpy as jnp
import numpy as np

from linna_tpu import linear_model as LM


def test_polynomial_powers_matches_sklearn_convention():
    p = LM.polynomial_powers(2, 2)
    # degree-0, x0, x1, x0^2, x0*x1, x1^2
    want = np.array([[0, 0], [1, 0], [0, 1], [2, 0], [1, 1], [0, 2]])
    np.testing.assert_array_equal(p, want)


def test_linear_model_recovers_polynomial():
    """An exactly-quadratic map must be fit to machine precision."""
    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (400, 3))
    # y_i = linear combos of quadratic features, 5 outputs of rank 2
    basis = rng.standard_normal((2, 5))
    latent = np.stack([x[:, 0] * x[:, 1] + 0.5 * x[:, 2], x[:, 2] ** 2 - x[:, 0]], 1)
    y = latent @ basis + 3.0
    model = LM.fit_linear_model(x, y, norder=2)
    pred = np.asarray(model(jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(pred, y, rtol=2e-3, atol=2e-3)


def test_linear_model_single_input_and_grad():
    rng = np.random.default_rng(1)
    x = rng.uniform(-1, 1, (100, 2))
    y = np.stack([x[:, 0] ** 2, x[:, 1]], 1)
    model = LM.fit_linear_model(x, y, norder=2)
    single = model(jnp.asarray([0.3, -0.4], jnp.float32))
    assert single.shape == (2,)
    g = jax.jacobian(lambda z: model(z))(jnp.asarray([0.3, -0.4], jnp.float32))
    assert np.all(np.isfinite(np.asarray(g)))
    # d(x0^2)/dx0 = 2*x0 = 0.6
    np.testing.assert_allclose(float(g[0, 0]), 0.6, atol=0.02)


def test_linear_model_npc_auto_and_roundtrip(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.uniform(-1, 1, (200, 2))
    y = np.stack([x[:, 0], 2 * x[:, 0], x[:, 1]], 1)  # rank 2
    model = LM.fit_linear_model(x, y, norder=1)
    assert model.vec.shape[0] <= 3
    path = str(tmp_path / "lm.npz")
    LM.save_linear_model(path, model)
    model2 = LM.load_linear_model(path)
    xt = jnp.asarray(x[:5], jnp.float32)
    np.testing.assert_allclose(
        np.asarray(model(xt)), np.asarray(model2(xt)), rtol=1e-6
    )


def test_nn_linearmodel_composition():
    """LinearModel plugs into apply_model as the additive pre-model
    (reference ChtoModelv2's optional linearmodel, linna/nn.py:104-108)."""
    from linna_tpu import nn as N

    rng = np.random.default_rng(3)
    x = rng.uniform(-1, 1, (50, 2)).astype(np.float32)
    y = np.stack([x[:, 0], x[:, 1]], 1)
    lm = LM.fit_linear_model(x, y, norder=1)
    spec = N.make_model_spec("chto_v2", 2, 2)
    params = N.init_model(jax.random.key(0), spec)
    out_with = N.apply_model(spec, params, jnp.asarray(x), linearmodel=lm)
    out_without = N.apply_model(spec, params, jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(out_with - out_without), np.asarray(lm(jnp.asarray(x))), rtol=1e-4, atol=1e-5
    )


def test_orchestrator_linearmodel_hook(tmp_path):
    """params["linearmodel"] wires the fitted PCA+polynomial pre-model
    through training AND sampling (the reference's orchestrator-unreachable
    ChtoModelv2 linearmodel slot, linna/nn.py:104-108 / util.py:1464)."""
    import os

    from linna_tpu import ml_sampler_core
    from linna_tpu.orchestrator import (
        LINEAR_MODEL_FILE, retrieve_model, retrieve_model_wrapper,
    )

    ndim = 2
    cov = np.diag([0.4, 0.3])
    means = np.array([0.2, -0.1])
    priors = [
        {"param": f"l{i}", "dist": "flat", "arg1": -2.0, "arg2": 2.0}
        for i in range(ndim)
    ]
    outdir = str(tmp_path / "out")
    chain, logp = ml_sampler_core(
        ntrainArr=[40], nvalArr=[10], nkeepArr=[1], ntimesArr=[2],
        ntautolArr=[0.5], meanshiftArr=[100], stdshiftArr=[100],
        outdir=outdir, theory=lambda x, o: np.asarray(x[1], np.float64).copy(),
        priors=priors, data=means, cov=cov, init=np.zeros(ndim), pool=None,
        nwalkers=8, temperatureArr=[1.0],
        params={"trainingoption": 1, "num_epochs": 15, "batch_size": 10,
                "linearmodel": {"norder": 1}},
        method="emcee", seed=5,
    )
    it0 = os.path.join(outdir, "iter_0")
    assert os.path.isfile(os.path.join(it0, LINEAR_MODEL_FILE))
    assert np.all(np.isfinite(chain)) and np.all(np.isfinite(logp))

    # retrieval composes the pre-model: wrapper output == NN + LM pathway
    trainer = retrieve_model(it0, ndim, ndim)
    assert trainer.linearmodel is not None
    emulator = retrieve_model_wrapper(it0)
    x = jnp.asarray([[0.1, 0.2]], jnp.float32)
    from linna_tpu import nn as N

    x_in = trainer.transforms.x_transform(x)
    manual = N.apply_model(
        trainer.spec, trainer.params, x_in, linearmodel=trainer.linearmodel
    )
    manual = trainer.transforms.y_data.inverse(
        trainer.transforms.y_transform(manual)
    )
    np.testing.assert_allclose(
        np.asarray(emulator(x)), np.asarray(manual), rtol=1e-5
    )
    # and differs from the bare-NN pathway (the pre-model is really there)
    bare = trainer.transforms.y_data.inverse(
        trainer.transforms.y_transform(
            N.apply_model(trainer.spec, trainer.params, x_in)
        )
    )
    assert not np.allclose(np.asarray(emulator(x)), np.asarray(bare))


def test_linearmodel_rejected_for_linear_bypass_spec(tmp_path):
    """A linear_bypass model spec cannot carry the external pre-model:
    apply_model ignores it for such specs (reference ChtoModelv2_linear,
    linna/nn.py:220-232), so accepting it would silently train NN+LM while
    sampling NN-only (ADVICE r4 medium).  Every entry point fails loudly."""
    import pytest

    from linna_tpu import losses as Ls
    from linna_tpu import nn as N
    from linna_tpu import transforms as T
    from linna_tpu.parallel.ensemble import EnsembleTrainer
    from linna_tpu.train import Trainer

    rng = np.random.default_rng(0)
    x = rng.uniform(-1, 1, (30, 2)).astype(np.float32)
    y = np.stack([x[:, 0], x[:, 1]], 1)
    lm = LM.fit_linear_model(x, y, norder=1)
    spec = N.make_model_spec("chto_v2_linear", 2, 2)
    xt = T.fit_x_transform(jnp.asarray(x))
    yt = T.fit_y_transform(jnp.asarray(y))
    yd = T.YTransformData(jnp.ones(2, jnp.float32))
    tset = T.TransformSet(xt, yt, yd)
    lstate = Ls.build_loss_state(np.zeros(2), np.eye(2), tset)
    with pytest.raises(ValueError, match="linear_bypass"):
        Trainer(spec, tset, lstate, linearmodel=lm)
    with pytest.raises(ValueError, match="linear_bypass"):
        EnsembleTrainer(
            spec, tset, lstate, [str(tmp_path)], [0], linearmodel=lm
        )

    # orchestrator-level: params["linearmodel"] + chto_v2_linear raises
    # before any training work
    from linna_tpu import ml_sampler_core

    priors = [
        {"param": f"l{i}", "dist": "flat", "arg1": -2.0, "arg2": 2.0}
        for i in range(2)
    ]
    with pytest.raises(ValueError, match="chto_v2_linear"):
        ml_sampler_core(
            ntrainArr=[40], nvalArr=[10], nkeepArr=[1], ntimesArr=[2],
            ntautolArr=[0.5], meanshiftArr=[100], stdshiftArr=[100],
            outdir=str(tmp_path / "out"),
            theory=lambda x, o: np.asarray(x[1], np.float64).copy(),
            priors=priors, data=np.zeros(2), cov=np.eye(2),
            init=np.zeros(2), pool=None, nwalkers=8, temperatureArr=[1.0],
            params={"trainingoption": 1, "num_epochs": 5, "batch_size": 10,
                    "linearmodel": {"norder": 1}},
            nnmodel_in="chto_v2_linear", method="emcee", seed=5,
        )
