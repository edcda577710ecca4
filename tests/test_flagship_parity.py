"""Flagship-config posterior parity, pinned (VERDICT r3 item 2).

Runs the DES-Y1-3x2pt-shaped synthetic analysis (examples.des_theory: 27
params -> 457-point data vector, the same theory/priors/data recipe as
bench_full.py and EXACT_POSTERIOR.json) through ``ml_sampler_core`` at a
seeded medium budget and pins the posterior moments against the stored
exact-likelihood posterior — a tolerance assert in the spirit of the
reference's pinned chain moments (/root/reference/tests/test_main.py:50-51),
not test_gaussian33's catastrophic-failure guard.

The budget is reduced from production (2 annealed iterations x 2000 points,
400 epochs, K=2, 64 walkers vs 4 x 10000 / 1000 epochs / 256): measured at
this tier the emulator bias lands at median 0.13-0.27 sigma with a worst
coordinate of 0.78-0.95 sigma DEPENDING ON THE TRAINING-KEY STREAM — the
member-seed variance dominates at this budget (a K=3/600-epoch calibration
attempt confirmed the swing but costs >90 min/run, too heavy for a daily
lane).  The pins below (median < 0.35, worst < 1.2 sigma) carry ~1.3x
headroom over the worst measured stream while remaining far tighter than
test_gaussian33's 0.7/6-sigma catastrophic guard; the production-budget
tightness (max emulator bias < 0.1 sigma) is enforced by the
self-verifying flagship gate instead (bench_full.py --check, executed
fresh each round: FLAGSHIP_r05.json).
"""

import json
import os
import sys

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)

from linna_tpu import ml_sampler_core  # noqa: E402


@pytest.mark.slow
def test_flagship_config_posterior_parity(tmp_path):
    exact_path = os.path.join(ROOT, "EXACT_POSTERIOR.json")
    if not os.path.isfile(exact_path):
        pytest.skip("EXACT_POSTERIOR.json reference artifact not present")
    with open(exact_path) as f:
        exact = json.load(f)
    e_mean = np.asarray(exact["exact_mean"])
    e_std = np.asarray(exact["exact_std"])

    from examples import des_theory as T

    truth_params = T.fiducial() + 0.05
    data = T.data_vector(truth_params)
    from linna_tpu.driver import read_triplet_cov

    cov = read_triplet_cov(T.cov_triplet_rows(T.noise_sigma(data)))
    priors = [
        {"param": f"p{i}", "dist": "flat", "arg1": -1.0, "arg2": 1.0}
        for i in range(T.NDIM)
    ]

    chain, _ = ml_sampler_core(
        ntrainArr=[2000, 2000],
        nvalArr=[200, 200],
        nkeepArr=[2, 5],
        ntimesArr=[5, 20],
        ntautolArr=[0.05, 0.03],
        meanshiftArr=[0.3, 0.3],
        stdshiftArr=[0.2, 0.2],
        outdir=str(tmp_path / "out"),
        theory=T.make_theory({}),
        priors=priors,
        data=data,
        cov=cov,
        init=T.fiducial(),
        pool=None,
        nwalkers=64,
        temperatureArr=[4.0, 1.0],
        params={
            "trainingoption": 1,
            "num_epochs": 400,
            "batch_size": 500,
            "nensemble": 2,
            "epochs_per_dispatch": 50,
        },
        method=["zeus", "nuts"],
        seed=11,
        verbose=True,
    )
    bias = np.abs(np.mean(chain, axis=0) - e_mean) / e_std
    width = np.std(chain, axis=0) / e_std
    # parity pins (see module docstring for the measured calibration)
    assert np.median(bias) < 0.35, np.sort(bias)[-5:]
    assert np.max(bias) < 1.2, np.sort(bias)[-5:]
    assert 0.8 < np.median(width) < 1.3, np.sort(width)
