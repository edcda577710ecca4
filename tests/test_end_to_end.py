"""End-to-end pipeline tests on a 2-D Gaussian with identity theory —
the reference's canonical integration test (reference tests/test_main.py:
1 iteration, identity theory, loose convergence), plus a posterior-accuracy
run and the file-gated resume contract."""

import os
from copy import deepcopy

import numpy as np
import numpy.testing as npt
import pytest

from linna_tpu import ml_sampler_core

NDIM = 2
COV = np.diag([0.5, 0.2])
MEANS = np.array([0.1, 1.0])
PRIORS = [
    {"param": f"test_{i}", "dist": "flat", "arg1": -2.0, "arg2": 2.0}
    for i in range(NDIM)
]


def theory(x, outdirs):
    return deepcopy(np.asarray(x[1], dtype=np.float64))


def _run(outdir, **overrides):
    kwargs = dict(
        ntrainArr=[20],
        nvalArr=[5],
        nkeepArr=[1],
        ntimesArr=[2],
        ntautolArr=[0.5],
        meanshiftArr=[100],
        stdshiftArr=[100],
        outdir=outdir,
        theory=theory,
        priors=PRIORS,
        data=MEANS,
        cov=COV,
        init=np.random.default_rng(5).uniform(size=NDIM),
        pool=None,
        nwalkers=4,
        device=None,
        dolog10index=None,
        ypositive=False,
        temperatureArr=[1.0],
        omegab2cut=None,
        params={"trainingoption": 1, "num_epochs": 10, "batch_size": 5},
        method="emcee",
        seed=7,
    )
    kwargs.update(overrides)
    return ml_sampler_core(**kwargs)


def test_pipeline_end_to_end(tmp_path):
    outdir = str(tmp_path / "out")
    chain, logprob = _run(outdir)
    assert chain.ndim == 2 and chain.shape[1] == NDIM
    assert len(chain) > 0
    assert np.all(np.isfinite(chain))
    # all pipeline artifacts in place (reference artifact contract)
    it0 = os.path.join(outdir, "iter_0")
    for f in [
        "train_samples_x.txt",
        "train_samples_y.npy",
        "val_samples_x.txt",
        "val_samples_y.npy",
        "transforms.npz",
        "best.ckpt.npz",
        "last.ckpt.npz",
        "lr.npy",
        "finish.json",
        "chemcee_256.h5",
    ]:
        assert os.path.isfile(os.path.join(it0, f)), f


def test_pipeline_resume_reads_same_chain(tmp_path):
    """Because every stage is file-gated, rerunning against existing
    artifacts must skip generation/training/sampling and return the stored
    chain (the reference's test_reading contract, tests/test_main.py:47-51)."""
    outdir = str(tmp_path / "out")
    chain1, lp1 = _run(outdir)
    chain2, lp2 = _run(outdir)
    npt.assert_array_equal(chain1, chain2)
    npt.assert_array_equal(np.asarray(lp1), np.asarray(lp2))


@pytest.mark.slow
def test_posterior_accuracy_2d_gaussian(tmp_path):
    """A two-iteration run with temperature annealing (the production
    refocusing schedule in miniature) must match the analytic posterior
    (mean=data, std=sqrt(diag cov), mildly truncated by the [-2,2] box).
    A single T=1 iteration cannot achieve this: the chi^2-ratio loss
    deliberately tolerates large emulator error far from the data
    (linna/util.py:1086-1087), and accuracy comes from retraining on
    posterior-focused points."""
    outdir = str(tmp_path / "out")
    chain, _ = _run(
        outdir,
        ntrainArr=[600, 600, 600],
        nvalArr=[100, 100, 100],
        nkeepArr=[2, 2, 8],
        ntimesArr=[10, 10, 20],
        ntautolArr=[0.2, 0.2, 0.1],
        meanshiftArr=[0.5, 0.5, 0.5],
        stdshiftArr=[0.5, 0.5, 0.5],
        temperatureArr=[4.0, 2.0, 1.0],
        nwalkers=32,
        # nensemble=2 damps single-training-trajectory variance (the same
        # config lands at 0.01-0.03 sigma on TPU but an individual CPU
        # training run can go bad; seed-averaged chi2 makes the test robust)
        params={"trainingoption": 1, "num_epochs": 400, "batch_size": 100,
                "nensemble": 2},
    )
    # analytic: truncated normal on [-2,2]
    from scipy.stats import truncnorm

    for d in range(NDIM):
        s = np.sqrt(COV[d, d])
        a, b = (-2 - MEANS[d]) / s, (2 - MEANS[d]) / s
        want_mean = truncnorm.mean(a, b, loc=MEANS[d], scale=s)
        want_std = truncnorm.std(a, b, loc=MEANS[d], scale=s)
        got_mean = chain[:, d].mean()
        got_std = chain[:, d].std()
        # quarter-sigma parity for a quick single-iteration run (emulator
        # error ~0.1 sigma + finite-chain noise); the production 4-iteration
        # schedule tightens this to sub-0.1 sigma
        assert abs(got_mean - want_mean) < 0.25 * want_std, (d, got_mean, want_mean)
        assert abs(got_std - want_std) < 0.35 * want_std, (d, got_std, want_std)


def test_per_iteration_methods(tmp_path):
    """method may be a per-iteration list (extension beyond the reference):
    each iteration samples with its own method and writes its own chain
    layout; the next iteration reads the previous method's file."""
    outdir = str(tmp_path / "out")
    chain, logprob = _run(
        outdir,
        ntrainArr=[20, 20], nvalArr=[5, 5], nkeepArr=[1, 1],
        ntimesArr=[2, 2], ntautolArr=[0.5, 0.5],
        meanshiftArr=[100, 100], stdshiftArr=[100, 100],
        temperatureArr=[2.0, 1.0],
        method=["zeus", "emcee"],
    )
    assert os.path.isfile(os.path.join(outdir, "iter_0", "zeus_256.h5"))
    assert os.path.isfile(os.path.join(outdir, "iter_1", "chemcee_256.h5"))
    assert not os.path.isfile(os.path.join(outdir, "iter_1", "zeus_256.h5"))
    assert np.all(np.isfinite(chain))


def test_per_iteration_methods_validation(tmp_path):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        _run(str(tmp_path / "a"), method=["emcee", "emcee"])  # 1 iteration
    with _pytest.raises(NotImplementedError):
        _run(str(tmp_path / "b"), method=["not_a_sampler"])
