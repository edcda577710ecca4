"""Model-retrieval wrappers over trained pipeline artifacts
(reference linna/util.py:611-734)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from linna_tpu import ml_sampler_core, retrieve_model_exist, retrieve_model_wrapper

NDIM = 2
COV = np.diag([0.5, 0.2])
MEANS = np.array([0.1, 1.0])
PRIORS = [
    {"param": f"t{i}", "dist": "flat", "arg1": -2.0, "arg2": 2.0}
    for i in range(NDIM)
]


@pytest.fixture(scope="module")
def trained_outdir(tmp_path_factory):
    outdir = str(tmp_path_factory.mktemp("retr") / "out")
    ml_sampler_core(
        ntrainArr=[30], nvalArr=[8], nkeepArr=[1], ntimesArr=[2],
        ntautolArr=[0.5], meanshiftArr=[100], stdshiftArr=[100],
        outdir=outdir, theory=lambda x, o: np.asarray(x[1], np.float64).copy(),
        priors=PRIORS, data=MEANS, cov=COV,
        init=np.zeros(NDIM), pool=None, nwalkers=4,
        temperatureArr=[1.0],
        params={"trainingoption": 1, "num_epochs": 10, "batch_size": 8},
        method="emcee", seed=3,
    )
    return outdir + "/iter_0/"


def test_retrieve_model_wrapper_predicts_and_differentiates(trained_outdir):
    emulator = retrieve_model_wrapper(trained_outdir)
    x = jnp.asarray([[0.2, 0.5], [0.0, 0.1]], jnp.float32)
    pred = emulator(x)
    assert pred.shape == (2, NDIM)
    assert np.all(np.isfinite(np.asarray(pred)))
    # single input
    single = emulator(x[0])
    np.testing.assert_allclose(np.asarray(single), np.asarray(pred[0]), rtol=1e-6)
    # differentiable through jax
    jac = jax.jacobian(emulator)(x[0])
    assert jac.shape == (NDIM, NDIM)
    assert np.all(np.isfinite(np.asarray(jac)))
    # jittable
    np.testing.assert_allclose(
        np.asarray(jax.jit(emulator)(x)), np.asarray(pred), rtol=1e-6
    )


def test_retrieve_model_exist_infers_shapes(trained_outdir):
    trainer, incut, outcut = retrieve_model_exist(trained_outdir, 1, NDIM)
    assert trainer.spec.in_size == NDIM  # inferred from saved samples
    assert incut == NDIM  # saved model is wider than the requested 1
    assert outcut == NDIM
