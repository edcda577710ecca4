"""All-production-options flagship run (VERDICT r3 item 7): one DES-shaped
end-to-end pipeline with the four unit-tested-but-untraveled options enabled
TOGETHER — ``nbest`` best-point injection (reference linna/util.py:1167-1258),
``chisqcut`` row filtering (util.py:1260-1270), ``ypositive`` log-space
transforms (util.py:512-596), and ``nimp`` exact-theory importance sampling
(linna/main.py:297-334) — to flush out interaction bugs single-option unit
tests cannot see.

Theory: the DES synthetic survey map composed with ``exp(0.5 * y)`` so every
data-vector entry is strictly positive (the regime ypositive exists for:
cluster counts / positive statistics).  Medium 3-iteration schedule on the
real chip.

Writes FLAGSHIP_ALLOPTS_r04.json: wall clock, per-phase trace, posterior
sanity (finite moments, split R-hat), importance-sampling effective sample
size, and which option-specific artifacts were produced.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

NDIM, NDATA = 27, 457


def main(out: str = "FLAGSHIP_ALLOPTS_r04.json", fresh: bool = True):
    import faulthandler

    faulthandler.dump_traceback_later(300, repeat=True)
    from linna_tpu.orchestrator import _enable_compile_cache

    _enable_compile_cache()

    from examples import des_theory as T
    from linna_tpu import ml_sampler_core
    from linna_tpu.driver import read_triplet_cov
    from linna_tpu.samplers import convergence
    from linna_tpu.samplers.backends import ZeusBackend

    truth_params = T.fiducial() + 0.05

    def pos_vec(x):
        return np.exp(0.5 * T.data_vector(np.asarray(x, np.float64)))

    def theory(x, outdirs):
        return pos_vec(x[1])

    data = pos_vec(truth_params)
    # noise mapped from the flagship recipe through the delta method
    # (sigma_pos = |d(exp(0.5 y))/dy| * sigma_raw): the positive-observable
    # posterior then has the SAME parameter-space widths as the well-tested
    # des_synthetic flagship.  (A naive 1%-relative noise makes the
    # posterior ~50 sigma from init and the T=1 burn-in never ends.)
    # Triplet format is (i, j, gauss, non-gauss) — read_triplet_cov sums
    # the LAST TWO columns.
    sigma_raw = T.noise_sigma(T.data_vector(truth_params))
    sigma = 0.5 * np.abs(data) * sigma_raw
    rows = np.stack(
        [np.arange(NDATA), np.arange(NDATA), sigma**2, np.zeros(NDATA)],
        axis=1,
    )
    cov = read_triplet_cov(rows)
    inv_cov = np.linalg.inv(cov)
    # chisqcut acts on the RAW prediction norm y^T C^-1 y (reference
    # linna/util.py:1260-1270), which for a survey-like data vector is the
    # total SNR^2 (~4.6e6 here) — scale the cut to it so the filter drops
    # the far tail of the prior LHS without emptying the training set
    snr2 = float(data @ inv_cov @ data)

    priors = [
        {"param": f"p{i}", "dist": "flat", "arg1": -1.0, "arg2": 1.0}
        for i in range(NDIM)
    ]
    outdir = "/tmp/linna_allopts_bench"
    if fresh and os.path.isdir(outdir):
        shutil.rmtree(outdir)

    t0 = time.time()
    chain, logp = ml_sampler_core(
        ntrainArr=[2000, 2000, 2000, 2000],
        nvalArr=[200, 200, 200, 200],
        nkeepArr=[2, 2, 5, 5],
        ntimesArr=[5, 5, 10, 50],
        ntautolArr=[0.03, 0.03, 0.02, 0.01],
        meanshiftArr=[0.2] * 4,
        stdshiftArr=[0.15] * 4,
        outdir=outdir,
        theory=theory,
        priors=priors,
        data=data,
        cov=cov,
        init=T.fiducial(),
        pool=None,
        nwalkers=256,
        ypositive=True,                      # log-space y transforms
        # the paper/reference annealing (T^2 = 16,4,1,1): the first T=1
        # chain starts ~50 posterior-sigma from the mode (x0 = init +
        # 0.001 jitter each iteration, reference util.py:921) and only
        # reaches it because the T^2=4 iteration bridged the gap
        temperatureArr=[4.0, 2.0, 1.0, 1.0],
        params={
            "trainingoption": 1,
            "num_epochs": 800,
            "batch_size": 500,
            "nensemble": 2,
            "epochs_per_dispatch": 50,
            "nimp": 2000,                    # importance-sampling post-pass
        },
        method="zeus",
        nbest=[200, 200, 200, 200],               # optimizer best-point injection
        chisqcut=2.0 * snr2,                 # drop far-tail training rows
        seed=13,
        verbose=True,
    )
    wall = time.time() - t0

    # per-phase trace
    phases = {}
    trace_path = os.path.join(outdir, "trace.json")
    if os.path.isfile(trace_path):
        with open(trace_path) as f:
            for rec in json.load(f):
                phases[rec["phase"]] = phases.get(rec["phase"], 0.0) + rec.get(
                    "seconds", 0.0
                )

    final_dir = os.path.join(outdir, "iter_3")
    backend = ZeusBackend(os.path.join(final_dir, "zeus_256.h5"))
    raw = backend.get_value("chain_transformed")
    rhat = convergence.gelman_rubin(raw[len(raw) // 5 :], split=True)

    post_mean = np.mean(chain, axis=0)
    post_std = np.std(chain, axis=0)
    err_sigma = np.abs(post_mean - truth_params) / post_std

    # importance-sampling diagnostics
    w_path = os.path.join(outdir, "weight_im.npy")
    logp_em, logp_true, w = np.load(w_path)
    ess = float(np.sum(w) ** 2 / np.sum(w**2))

    # option-specific artifacts present?
    artifacts = {
        "best_samples": os.path.isfile(
            os.path.join(outdir, "iter_0", "best_samples_x.txt")
        ),
        "samples_im": os.path.isfile(os.path.join(outdir, "samples_im.npy")),
        "weight_im": True,
    }
    result = {
        "metric": "allopts_flagship_wallclock",
        "value": round(wall, 1),
        "unit": "s",
        "options": {
            "nbest": 200, "chisqcut": "2*SNR^2", "ypositive": True,
            "nimp": 2000, "nensemble": 2,
        },
        "phases_s": {k: round(v, 1) for k, v in phases.items()},
        "max_split_rhat": round(float(np.max(rhat)), 4),
        "max_posterior_err_sigma": round(float(np.max(err_sigma)), 3),
        "median_posterior_err_sigma": round(float(np.median(err_sigma)), 3),
        "importance_ess": round(ess, 1),
        "importance_nonzero_weights": int(np.sum(w > 0)),
        "mean_abs_dlogp_emulator_vs_true": round(
            float(np.mean(np.abs((logp_true - logp_em)[w > 0]))), 3
        ),
        "artifacts": artifacts,
        "chain_finite": bool(np.all(np.isfinite(chain))),
        "config": "4 iters x 2000, T^2=16,4,1,1, zeus 256 walkers, K=2, "
                  "positive-observable DES shape (exp(0.5*synthetic))",
    }
    with open(os.path.join(HERE, out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    assert result["chain_finite"], "non-finite posterior chain"
    assert ess > 10, f"importance ESS collapsed: {ess}"


if __name__ == "__main__":
    main(fresh="--resume" not in sys.argv)
