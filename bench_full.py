"""North-star benchmark: the synthetic DES-Y1-3x2pt analysis end-to-end on
one TPU chip (BASELINE.md: "wall-clock to R-1 < 0.01; converged DES-scale
chain in < 1 h; sub-0.1 sigma posterior parity").

Runs examples/des_synthetic.yaml (27 params -> 457-point data vector, the
paper's 4-iteration annealed schedule, 2-member emulator ensemble) through
the public driver, then reports:

- total wall-clock and the per-phase breakdown from trace.json
  (generate_training_point / train_emulator / mcmc per iteration);
- split Gelman-Rubin R-hat of the final-iteration chain (convergence);
- posterior accuracy: |mean - truth| / sigma per parameter (the synthetic
  truth is +0.05 in every coordinate, examples/make_des_inputs.py).

Writes FLAGSHIP.json (machine-readable) and prints one JSON summary line.
Reference scale for context: the real analysis this mimics took the
reference 24 h x 128 MPI ranks + 18 h GPU budgets (BASELINE.md).
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

OUTDIR = "/tmp/linna_des_bench"


def _enable_compile_cache():
    import jax

    jax.config.update("jax_compilation_cache_dir", "/tmp/linna_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def main(fresh: bool = True):
    import faulthandler

    # watchdog: if any phase wedges (e.g. a stuck remote compile), dump all
    # thread stacks every 5 minutes so the stall point is visible in the log
    faulthandler.dump_traceback_later(300, repeat=True)
    _enable_compile_cache()
    # inputs (same recipe as examples/make_des_inputs.py)
    from examples import des_theory as T

    indir = "/tmp/linna_des_inputs"
    os.makedirs(indir, exist_ok=True)
    truth_params = T.fiducial() + 0.05
    truth_vec = T.data_vector(truth_params)
    sigma = 0.05 * (np.abs(truth_vec) + 0.1)
    rng = np.random.default_rng(1)
    data = truth_vec + rng.standard_normal(T.NDATA) * sigma
    np.savetxt(os.path.join(indir, "data.txt"),
               np.stack([np.arange(T.NDATA), data], 1))
    rows = []
    for i in range(T.NDATA):
        rows.append([i, i, 0.0, sigma[i] ** 2])
        if i + 1 < T.NDATA:
            rows.append([i, i + 1, 0.0, 0.25 * sigma[i] * sigma[i + 1]])
    np.savetxt(os.path.join(indir, "cov_triplet.txt"), np.asarray(rows))

    if fresh and os.path.isdir(OUTDIR):
        shutil.rmtree(OUTDIR)

    from linna_tpu import driver
    from linna_tpu.config import yaml_load
    from linna_tpu.samplers import convergence

    params = yaml_load(os.path.join(HERE, "examples/des_synthetic.yaml"),
                       parent_dir=os.path.join(HERE, "examples"))
    params["outdir"] = OUTDIR
    params["base_dir"] = indir

    t0 = time.time()
    chain, logp = driver.run_from_config(params, method="zeus", verbose=True)
    wall = time.time() - t0

    # phase breakdown
    phases = {}
    trace_path = os.path.join(OUTDIR, "trace.json")
    if os.path.isfile(trace_path):
        with open(trace_path) as f:
            for rec in json.load(f):
                key = rec["phase"]
                phases[key] = phases.get(key, 0.0) + rec["seconds"]

    # convergence of the final chain (walker-resolved)
    from linna_tpu.samplers.backends import ZeusBackend

    last_iter = len(params["ntrainArr"]) - 1
    backend = ZeusBackend(
        os.path.join(OUTDIR, f"iter_{last_iter}/", "zeus_256.h5")
    )
    raw = backend.get_value("chain_transformed")
    half = raw[len(raw) // 5 :]  # discard 20% burn-in
    rhat = convergence.gelman_rubin(half, split=True)

    # posterior accuracy vs synthetic truth
    post_mean = np.mean(chain, axis=0)
    post_std = np.std(chain, axis=0)
    err_sigma = np.abs(post_mean - truth_params) / post_std

    result = {
        "metric": "des_synthetic_wallclock",
        "value": round(wall, 1),
        "unit": "s",
        "phases_s": {k: round(v, 1) for k, v in phases.items()},
        "max_split_rhat": round(float(np.max(rhat)), 4),
        "max_posterior_err_sigma": round(float(np.max(err_sigma)), 3),
        "median_posterior_err_sigma": round(float(np.median(err_sigma)), 3),
        "chain_shape": list(chain.shape),
        "ndim": T.NDIM,
        "ndata": T.NDATA,
        "config": "examples/des_synthetic.yaml (paper schedule: 4 iterations"
        " x 10000, T^2=16,4,1,1, nensemble=2, 256 walkers)",
    }
    with open(os.path.join(HERE, "FLAGSHIP.json"), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main(fresh="--resume" not in sys.argv)
