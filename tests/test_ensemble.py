"""Ensemble emulator likelihood (extension beyond the reference): K
independently seeded emulators combined as chi2_eff = mean + k_std * std,
suppressing single-model blind valleys that MCMC otherwise exploits."""

import os

import jax
import jax.numpy as jnp
import numpy as np

from linna_tpu import likelihood as LK
from linna_tpu import ml_sampler_core, retrieve_model, retrieve_ensemble_params
from linna_tpu import nn as N
from linna_tpu import priors as P
from linna_tpu import transforms as T


def _setup(ndim=2, ndata=3):
    x_t = T.XTransform(jnp.zeros(ndim), jnp.ones(ndim), jnp.zeros(ndim, bool))
    y_t = T.YTransform(jnp.zeros(ndata), jnp.ones(ndata), False)
    y_d = T.YTransformData(jnp.ones(ndata))
    ts = T.TransformSet(x_t, y_t, y_d)
    pack = P.priors_from_list(
        [{"param": "a", "dist": "flat", "arg1": -2.0, "arg2": 2.0}] * ndim
    )
    spec = N.make_model_spec("chto_simple", ndim, ndata)
    data = np.array([0.1, -0.2, 0.3])
    inv_cov = np.eye(ndata)
    return spec, ts, pack, data, inv_cov


def test_ensemble_combination_math():
    """chi2_eff = mean + std across members; identical members reduce to the
    single-model likelihood exactly."""
    spec, ts, pack, data, inv_cov = _setup()
    p1 = N.init_model(jax.random.key(1), spec)
    p2 = N.init_model(jax.random.key(2), spec)
    x = jax.random.normal(jax.random.key(3), (8, 2))

    lp_single = LK.make_log_prob(spec, p1, ts, pack, data, inv_cov)
    lp_same = LK.make_log_prob(spec, [p1, p1], ts, pack, data, inv_cov)
    np.testing.assert_allclose(
        np.asarray(lp_same(x)), np.asarray(lp_single(x)), rtol=1e-5, atol=1e-5
    )

    # mixed ensemble is more conservative than the per-member mean
    lp_mix = LK.make_log_prob(spec, [p1, p2], ts, pack, data, inv_cov)
    lp2 = LK.make_log_prob(spec, p2, ts, pack, data, inv_cov)
    mean_members = 0.5 * (np.asarray(lp_single(x)) + np.asarray(lp2(x)))
    assert np.all(np.asarray(lp_mix(x)) <= mean_members + 1e-5)

    # k_std=0 reduces to the mean of member chi2s
    lp_mean = LK.make_log_prob(
        spec, [p1, p2], ts, pack, data, inv_cov, ensemble_k_std=0.0
    )
    np.testing.assert_allclose(np.asarray(lp_mean(x)), mean_members, rtol=1e-5, atol=1e-5)


def test_ensemble_gradients_finite():
    spec, ts, pack, data, inv_cov = _setup()
    ps = [N.init_model(jax.random.key(k), spec) for k in range(3)]
    lp = LK.make_log_prob(spec, ps, ts, pack, data, inv_cov)
    g = LK.make_grad_log_prob(lp)(jax.random.normal(jax.random.key(9), (4, 2)))
    assert np.all(np.isfinite(np.asarray(g)))


def test_pipeline_nensemble_artifacts_and_resume(tmp_path):
    outdir = str(tmp_path / "out")
    kwargs = dict(
        ntrainArr=[25], nvalArr=[6], nkeepArr=[1], ntimesArr=[2],
        ntautolArr=[0.5], meanshiftArr=[100], stdshiftArr=[100],
        outdir=outdir,
        theory=lambda x, o: np.asarray(x[1], np.float64).copy(),
        priors=[{"param": "a", "dist": "flat", "arg1": -2.0, "arg2": 2.0}] * 2,
        data=np.array([0.1, 0.5]), cov=np.diag([0.3, 0.2]),
        init=np.zeros(2), pool=None, nwalkers=4, temperatureArr=[1.0],
        params={"trainingoption": 1, "num_epochs": 8, "batch_size": 8,
                "nensemble": 2},
        method="emcee", seed=5,
    )
    chain1, _ = ml_sampler_core(**kwargs)
    it0 = os.path.join(outdir, "iter_0")
    assert os.path.isfile(os.path.join(it0, "best.ckpt.npz"))
    assert os.path.isfile(os.path.join(it0, "ens_1", "best.ckpt.npz"))
    trainer = retrieve_model(it0, 2, 2)
    members = retrieve_ensemble_params(it0, trainer)
    assert len(members) == 2
    # members genuinely differ (independent seeds)
    w0 = np.asarray(members[0]["layer1"]["w"])
    w1 = np.asarray(members[1]["layer1"]["w"])
    assert not np.allclose(w0, w1)
    # file-gated resume returns the identical chain
    chain2, _ = ml_sampler_core(**kwargs)
    np.testing.assert_array_equal(chain1, chain2)
