"""Importance-sampling post-pass and good-walker clustering
(reference linna/main.py:297-334, linna/util.py:57-66)."""

import os

import numpy as np
import numpy.testing as npt

from linna_tpu import ml_sampler_core
from linna_tpu import priors as P
from linna_tpu.orchestrator import _importance_sampling, get_good_walker_list


def _identity_theory(task, outdir):
    i, x = task
    return np.asarray(x, np.float64).copy()


def test_get_good_walker_list_two_clusters():
    """KMeans over mean log-prob keeps the high-probability cluster
    (reference linna/util.py:57-66)."""
    rng = np.random.default_rng(0)
    nsteps, nwalkers = 200, 8
    # tight clusters: the selector int-casts walker means, so give every good
    # walker the same integer band and the stuck ones a far-away band
    logp = -5.5 + rng.normal(0.0, 0.01, (nsteps, nwalkers))
    stuck = [1, 5, 6]
    logp[:, stuck] = -120.5 + rng.normal(0.0, 0.01, (nsteps, len(stuck)))
    good = get_good_walker_list(logp)
    assert set(good) == set(range(nwalkers)) - set(stuck)


def test_read_chain_and_cut_walkercut(tmp_path):
    """walkercut=True drops stuck walkers from the returned flat chain
    (reference linna/util.py:68-94)."""
    from linna_tpu.orchestrator import read_chain_and_cut
    from linna_tpu.samplers.backends import EmceeBackend

    rng = np.random.default_rng(2)
    nsteps, nwalkers, ndim = 300, 6, 2
    chain = rng.normal(0.0, 1.0, (nsteps, nwalkers, ndim))
    logp = -5.5 + rng.normal(0, 0.01, (nsteps, nwalkers))
    stuck = [2, 4]
    chain[:, stuck, :] = 50.0 + 0.01 * rng.normal(size=(nsteps, len(stuck), ndim))
    logp[:, stuck] = -120.5 + rng.normal(0, 0.01, (nsteps, len(stuck)))

    path = str(tmp_path / "chemcee_256.h5")
    b = EmceeBackend(path)
    b.reset(nwalkers, ndim)
    b.append(chain, logp, np.zeros(nwalkers), transform=lambda c: c)

    cut_chain, cut_lp, _ = read_chain_and_cut(path, nk=2, walkercut=True)
    assert np.all(cut_chain[:, 0] < 10.0)  # stuck walkers gone
    full_chain, _, _ = read_chain_and_cut(path, nk=2, walkercut=False)
    assert np.any(full_chain[:, 0] > 10.0)
    assert cut_chain.shape[0] == full_chain.shape[0] * (nwalkers - len(stuck)) // nwalkers


def test_read_chain_and_cut_nkeep_floor_and_nan_tau(tmp_path, monkeypatch):
    """tau*nk < 1 must keep ONE step, not the whole chain: a well-decorrelated
    sampler (NUTS measures tau < 1 on the trained emulator) made int(tau*nk)=0
    reachable, and chain[-0:] silently returned everything, burn-in included.
    All-NaN tau must warn and keep the full chain instead of crashing on
    int(NaN)."""
    import warnings

    from linna_tpu.orchestrator import read_chain_and_cut
    from linna_tpu.samplers.backends import EmceeBackend

    rng = np.random.default_rng(0)
    nsteps, nwalkers, ndim = 300, 4, 2
    chain = rng.normal(size=(nsteps, nwalkers, ndim))  # white noise: tau ~ 1
    logp = rng.normal(size=(nsteps, nwalkers))
    path = str(tmp_path / "chemcee_256.h5")
    b = EmceeBackend(path)
    b.reset(nwalkers, ndim)
    b.append(chain, logp, np.zeros(nwalkers), transform=lambda c: c)

    cut, _, _ = read_chain_and_cut(path, nk=0.3)  # tau*nk < 1
    assert cut.shape[0] == nwalkers  # exactly one kept step, flattened

    monkeypatch.setattr(
        "linna_tpu.samplers.convergence.integrated_time",
        lambda raw, **kw: np.full(ndim, np.nan),
    )
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        cut, _, _ = read_chain_and_cut(path, nk=2)
    assert any("NaN" in str(x.message) for x in w)
    assert cut.shape[0] == nsteps * nwalkers  # full chain, no crash


def test_importance_weights_downweight_biased_emulator(tmp_path):
    """w = exp(logp_true - logp_emulator), normalized, with >2-sigma
    log-weight outliers zeroed (reference linna/main.py:313-331): a point
    where the emulator overestimated the posterior gets downweighted."""
    outdir = str(tmp_path)
    ndim = 1
    rng = np.random.default_rng(1)
    samples = np.linspace(-1.0, 1.0, 24).reshape(-1, ndim)
    data = np.zeros(1)
    inv_cov = np.eye(1)
    priors = [{"param": "a", "dist": "flat", "arg1": -2.0, "arg2": 2.0}]
    pack = P.priors_from_list(priors)

    # exact log-posterior for the identity theory
    logp_true = -0.5 * samples[:, 0] ** 2
    # "emulator" logp: slightly biased + one wild outlier
    logp_emu = logp_true + rng.normal(0, 0.05, len(samples))
    logp_emu[3] = logp_true[3] - 50.0  # emulator badly underestimated here

    # pre-seed the subsample artifacts: the pass then only evaluates theory
    # and weights (file-gating contract, linna/main.py:300-311)
    np.save(os.path.join(outdir, "samples_im.npy"), samples)
    np.save(os.path.join(outdir, "log_prob_samples_x.npy"), logp_emu)

    chain, lp = _importance_sampling(
        outdir, "unused.h5", {"nimp": len(samples)}, 1, 2, "emcee",
        _identity_theory, None, priors, data, inv_cov,
        P.prior_range(pack), rng,
    )
    assert os.path.isfile(os.path.join(outdir, "theory.npy"))
    w_file = np.load(os.path.join(outdir, "weight_im.npy"))
    logp_emu_saved, logp_true_saved, w = w_file
    npt.assert_allclose(logp_emu_saved, logp_emu)
    npt.assert_allclose(logp_true_saved, logp_true, atol=1e-5)
    npt.assert_allclose(np.sum(w), 1.0, rtol=1e-10)
    # the wild log-weight outlier is zeroed (2-sigma clip)
    assert w[3] == 0.0
    # remaining weights follow exp(logp_true - logp_emu): where the emulator
    # overestimated (emu > true), the weight is below the median
    others = np.delete(np.arange(len(samples)), 3)
    over = others[(logp_emu - logp_true)[others] > 0.05]
    if len(over):
        assert np.all(w[over] < np.median(w[others]))
    # returned arrays are the subsample
    npt.assert_allclose(chain, samples)


def test_importance_weights_survive_exp_overflow(tmp_path):
    """A point whose true-vs-emulator log-prob gap exceeds the float64 exp
    range (~709) must be zeroed as the 2-sigma outlier it is — the
    reference's w=exp(...) then log(w) (linna/main.py:331-333) turns it into
    inf, poisons mean/std, and every weight comes back NaN."""
    outdir = str(tmp_path)
    rng = np.random.default_rng(2)
    samples = np.linspace(-1.0, 1.0, 24).reshape(-1, 1)
    logp_true = -0.5 * samples[:, 0] ** 2
    logp_emu = logp_true + rng.normal(0, 0.05, len(samples))
    logp_emu[5] = logp_true[5] - 800.0  # exp(+800) overflows float64
    np.save(os.path.join(outdir, "samples_im.npy"), samples)
    np.save(os.path.join(outdir, "log_prob_samples_x.npy"), logp_emu)

    priors = [{"param": "a", "dist": "flat", "arg1": -2.0, "arg2": 2.0}]
    _importance_sampling(
        outdir, "unused.h5", {"nimp": len(samples)}, 1, 2, "emcee",
        _identity_theory, None, priors, np.zeros(1), np.eye(1),
        P.prior_range(P.priors_from_list(priors)), rng,
    )
    _, _, w = np.load(os.path.join(outdir, "weight_im.npy"))
    assert np.all(np.isfinite(w))
    assert w[5] == 0.0
    npt.assert_allclose(np.sum(w), 1.0, rtol=1e-10)


def test_pipeline_importance_sampling_artifacts(tmp_path):
    """End-to-end: params['nimp'] triggers the post-pass and persists
    samples_im/weight_im (reference linna/main.py:297-334)."""
    outdir = str(tmp_path / "out")
    chain, logp = ml_sampler_core(
        ntrainArr=[20], nvalArr=[5], nkeepArr=[1], ntimesArr=[2],
        ntautolArr=[0.5], meanshiftArr=[100], stdshiftArr=[100],
        outdir=outdir,
        theory=_identity_theory,
        priors=[{"param": "a", "dist": "flat", "arg1": -2.0, "arg2": 2.0}] * 2,
        data=np.array([0.1, 0.5]), cov=np.diag([0.3, 0.2]),
        init=np.zeros(2), pool=None, nwalkers=4, temperatureArr=[1.0],
        params={"trainingoption": 1, "num_epochs": 6, "batch_size": 8,
                "nensemble": 1, "nimp": 10},
        method="emcee", seed=3,
    )
    assert os.path.isfile(os.path.join(outdir, "samples_im.npy"))
    assert os.path.isfile(os.path.join(outdir, "weight_im.npy"))
    samples = np.load(os.path.join(outdir, "samples_im.npy"))
    assert samples.shape == (10, 2)
    _, _, w = np.load(os.path.join(outdir, "weight_im.npy"))
    assert w.shape == (10,)
    npt.assert_allclose(np.sum(w), 1.0, rtol=1e-10)
    assert chain.shape == (10, 2)


def test_importance_weights_survive_nan_theory(tmp_path):
    """A failed theory evaluation (NaN data vector -> NaN logp) is zeroed
    like any outlier instead of poisoning mean/std (which made the keep mask
    all-False and crashed np.max over an empty slice)."""
    outdir = str(tmp_path)
    rng = np.random.default_rng(3)
    samples = np.linspace(-1.0, 1.0, 20).reshape(-1, 1)
    logp_emu = -0.5 * samples[:, 0] ** 2
    np.save(os.path.join(outdir, "samples_im.npy"), samples)
    np.save(os.path.join(outdir, "log_prob_samples_x.npy"), logp_emu)
    theory_vals = samples.copy()
    theory_vals[7] = np.nan  # one failed evaluation
    np.save(os.path.join(outdir, "theory.npy"), theory_vals)

    priors = [{"param": "a", "dist": "flat", "arg1": -2.0, "arg2": 2.0}]
    _importance_sampling(
        outdir, "unused.h5", {"nimp": len(samples)}, 1, 2, "emcee",
        _identity_theory, None, priors, np.zeros(1), np.eye(1),
        P.prior_range(P.priors_from_list(priors)), rng,
    )
    _, _, w = np.load(os.path.join(outdir, "weight_im.npy"))
    assert np.all(np.isfinite(w))
    assert w[7] == 0.0
    npt.assert_allclose(np.sum(w), 1.0, rtol=1e-10)
