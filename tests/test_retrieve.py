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


def test_retrieve_model_exist_rejects_narrower_checkpoint(trained_outdir):
    """A checkpoint whose output is NARROWER than the requested data vector
    must fail loudly, not shape-error later inside the likelihood."""
    with pytest.raises(ValueError, match="narrower"):
        retrieve_model_exist(trained_outdir, NDIM, NDIM + 5)


def test_outcut_log_prob_matches_manual_cut(trained_outdir):
    """make_log_prob(out_cut=k) compares only the first k data-space
    prediction components against the k-point data vector (the reference's
    unapplied ``outcut``, linna/util.py:641-713 / main.py:254-263)."""
    from linna_tpu import likelihood as LK
    from linna_tpu import priors as P
    from linna_tpu.orchestrator import retrieve_model_wrapper

    trainer, incut, outcut = retrieve_model_exist(trained_outdir, NDIM, 1)
    assert outcut == 1
    pack = P.priors_from_list(PRIORS)
    data1, inv_cov1 = MEANS[:1], np.linalg.inv(COV[:1, :1])
    lp = LK.make_log_prob(
        trainer.spec, trainer.params, trainer.transforms, pack,
        data1, inv_cov1, temperature=1.0, out_cut=1,
    )
    x = jnp.asarray([[0.3, -0.2], [0.0, 0.4]], jnp.float32)
    got = np.asarray(lp(x))
    assert got.shape == (2,) and np.all(np.isfinite(got))
    # manual: full-width emulator prediction, cut, Gaussian chi^2 + ln prior
    emulator = retrieve_model_wrapper(trained_outdir)
    x_phys = np.asarray(P.transform(pack, x))
    m = np.asarray(emulator(jnp.asarray(x_phys)))[:, :1]
    d = m - data1
    want = -0.5 * np.einsum("wi,ij,wj->w", d, inv_cov1, d) + np.asarray(
        P.lnprior(x)
    )
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    # out_cut larger than the model's output is impossible to satisfy
    with pytest.raises(ValueError, match="out_cut"):
        LK.make_log_prob(
            trainer.spec, trainer.params, trainer.transforms, pack,
            np.zeros(NDIM + 3), np.eye(NDIM + 3), out_cut=NDIM + 3,
        )


def test_orchestrator_resumes_with_wider_checkpoint(trained_outdir, tmp_path):
    """End-to-end outcut wiring: a pipeline resumed against a checkpoint
    trained with a WIDER output than the current data vector must cut
    predictions and sample (reference scenario at linna/main.py:254-263)."""
    import os
    import shutil

    outdir = str(tmp_path / "resume")
    shutil.copytree(os.path.dirname(trained_outdir.rstrip("/")), outdir)
    # drop the finished chain so the MCMC stage re-runs against the (wider)
    # gated training artifacts
    os.remove(os.path.join(outdir, "iter_0", "chemcee_256.h5"))
    chain, logp = ml_sampler_core(
        ntrainArr=[30], nvalArr=[8], nkeepArr=[1], ntimesArr=[2],
        ntautolArr=[0.5], meanshiftArr=[100], stdshiftArr=[100],
        outdir=outdir, theory=lambda x, o: np.asarray(x[1], np.float64).copy(),
        priors=PRIORS, data=MEANS[:1], cov=COV[:1, :1],
        init=np.zeros(NDIM), pool=None, nwalkers=4,
        temperatureArr=[1.0],
        params={"trainingoption": 1, "num_epochs": 10, "batch_size": 8},
        method="emcee", seed=3,
    )
    assert chain.shape[1] == NDIM  # sampled in the checkpoint's input space
    assert np.all(np.isfinite(chain)) and np.all(np.isfinite(logp))
