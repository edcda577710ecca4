"""One-command pod acceptance run (VERDICT r4 item 6).

The reference's cluster story was Slurm choreography that could never be
verified outside its home cluster (reference jobscript/example_sampler.job).
This script is the TPU-native replacement: a self-gating acceptance kit a
pod owner runs ON the hardware, exiting nonzero on any miss:

    # every host of the pod slice (or one host of a single-chip box):
    python examples/pod_accept.py                 # structural + flagship
    python examples/pod_accept.py --structural    # census gates only, ~1 min
    python examples/pod_accept.py --max-wall 900  # override the wall gate

Gates (thresholds = SCALING.json's structural predictions, re-checked here
on the REAL compiled HLO of this machine's mesh):

1. Sampler collective census (linna_tpu.parallel.census): stretch and slice
   chunks dispatch <= 2 per-step collectives (the two half-ensemble
   all-gathers), HMC/NUTS dispatch ZERO.
2. Trainer census: the K=2 member training chunk contains no collective
   crossing the 'ens' axis (members scale independently).
3. Flagship functional gate (skipped with --structural): the DES-3x2pt-
   shaped synthetic analysis (examples/des_synthetic.yaml recipe, the same
   problem bench_full.py --check gates) runs end-to-end; posterior bias vs
   the stored exact-likelihood posterior (EXACT_POSTERIOR.json) must stay
   under --max-bias sigma (default 0.1, the production parity claim) and
   the wall under --max-wall seconds.

Verdict: one JSON line, exit 0 on PASS / 1 on any FAIL.

Works single-process on a virtual CPU mesh too (the census is a property of
the compiled program, not of the interconnect), which is how the test suite
keeps this kit itself green before pod hardware exists
(tests/test_parallel.py::test_pod_accept_structural).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

HERE = os.path.dirname(os.path.abspath(__file__))
ROOT = os.path.dirname(HERE)
sys.path.insert(0, ROOT)


def structural_gates(report: dict) -> bool:
    """Census gates 1+2; fills report['structural']; returns pass/fail."""
    import jax

    from linna_tpu.parallel.census import (
        sampler_collective_census, trainer_collective_census,
    )

    ok = True
    sam = sampler_collective_census(walkers=max(16 * jax.device_count(), 64))
    gates = {"emcee": 2, "zeus": 2, "hmc": 0, "nuts": 0}
    sampler_verdicts = {}
    for method, limit in gates.items():
        n = sum(sam[method]["per_step"].values())
        sampler_verdicts[method] = {
            "per_step_collectives": n, "limit": limit, "pass": n <= limit,
        }
        ok &= n <= limit
    trn = trainer_collective_census(k=2)
    trainer_pass = trn["cross_member_collectives"] == 0
    ok &= trainer_pass
    report["structural"] = {
        "n_devices": sam["n_devices"],
        "sampler": sampler_verdicts,
        "trainer": {**trn, "pass": trainer_pass},
    }
    return ok


def flagship_gate(report: dict, max_bias: float, max_wall: float) -> bool:
    """Gate 3: the flagship synthetic analysis end-to-end with the bias gate
    of bench_full.py --check."""
    import tempfile

    import numpy as np

    from examples import des_theory as T
    from linna_tpu import ml_sampler_core
    from linna_tpu.driver import read_triplet_cov
    from linna_tpu.parallel import multihost as MH

    exact_path = os.path.join(ROOT, "EXACT_POSTERIOR.json")
    with open(exact_path) as f:
        exact = json.load(f)
    e_mean = np.asarray(exact["exact_mean"])
    e_std = np.asarray(exact["exact_std"])

    truth = T.fiducial() + 0.05
    data = T.data_vector(truth)
    cov = read_triplet_cov(T.cov_triplet_rows(T.noise_sigma(data)))
    priors = [
        {"param": f"p{i}", "dist": "flat", "arg1": -1.0, "arg2": 1.0}
        for i in range(T.NDIM)
    ]
    outdir = os.environ.get(
        "LINNA_ACCEPT_OUTDIR", os.path.join(tempfile.gettempdir(), "pod_accept_out")
    )
    t0 = time.perf_counter()
    chain, _ = ml_sampler_core(
        ntrainArr=[4000, 4000], nvalArr=[400, 400], nkeepArr=[2, 5],
        ntimesArr=[5, 20], ntautolArr=[0.05, 0.03],
        meanshiftArr=[0.3, 0.2], stdshiftArr=[0.2, 0.15],
        outdir=outdir, theory=T.make_theory({}), priors=priors,
        data=data, cov=cov, init=T.fiducial(), pool=None, nwalkers=128,
        temperatureArr=[4.0, 1.0],
        params={"trainingoption": 1, "num_epochs": 1000, "batch_size": 500,
                "nensemble": 2, "epochs_per_dispatch": 50},
        method=["zeus", "nuts"], seed=11,
    )
    wall = time.perf_counter() - t0
    bias = np.abs(np.mean(chain, axis=0) - e_mean) / e_std
    med, worst = float(np.median(bias)), float(np.max(bias))
    ok = med < max_bias and worst < 5 * max_bias and wall < max_wall
    report["flagship"] = {
        "wall_s": round(wall, 1), "max_wall_s": max_wall,
        "median_bias_sigma": round(med, 4),
        "worst_bias_sigma": round(worst, 4),
        "max_bias_sigma": max_bias,
        "n_hosts": MH.process_count(),
        "pass": ok,
    }
    return ok


def main(argv=None) -> int:
    ap = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    ap.add_argument("--structural", action="store_true",
                    help="census gates only (no flagship run)")
    ap.add_argument("--max-bias", type=float, default=0.1,
                    help="median posterior bias gate in sigma (worst 5x)")
    ap.add_argument("--max-wall", type=float, default=3600.0,
                    help="flagship wall-clock gate in seconds (cold compile "
                    "included; a warm single v5e chip lands ~300 s)")
    args = ap.parse_args(argv)

    from linna_tpu.parallel import multihost as MH

    MH.initialize()

    report: dict = {"metric": "pod_acceptance"}
    ok = structural_gates(report)
    if not args.structural:
        ok &= flagship_gate(report, args.max_bias, args.max_wall)
    report["pass"] = bool(ok)
    import jax

    if getattr(jax, "process_index", lambda: 0)() == 0:
        print(json.dumps(report))
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
