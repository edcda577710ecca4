"""Exact-posterior reference for the DES synthetic flagship.

The flagship metric (bench_full.py) reports |chain mean - injected truth| /
chain std.  The synthetic data vector is noiseless, so the *likelihood*
peaks exactly at the truth — but the theory map is nonlinear (quadratic +
tanh terms, examples/des_theory.py), so the true posterior is skewed and
its MEAN need not sit on the truth.  That intrinsic offset is a property of
the inference problem, not of the emulator: an exact-likelihood sampler
pays it too.

This script computes the decomposition by sampling the EXACT posterior
(true theory, no emulator) with the repo's own NUTS to high effective
sample size, then records per-parameter exact moments:

  intrinsic skew   = |exact mean - truth|        / exact std
  emulator bias    = |flagship mean - exact mean| / exact std   (bench_full)

The exact likelihood is the same whitened-space composition the pipeline
samples (likelihood.make_log_prob with the emulator prediction replaced by
the true data_vector): lp(x) = -0.5 (m(phys(x)) - d)^T C^-1 (m(phys(x)) - d)
- 0.5 |x|^2, with the identical banded covariance construction as
examples/make_des_inputs.py.

Runs on CPU by default (the theory is two small matmuls; NUTS needs only
its gradient) so it can share the machine with a TPU flagship run.
Writes EXACT_POSTERIOR.json (DES default) / EXACT_POSTERIOR_<TAG>.json; pass
``theory=examples.lsst_theory`` on the CLI for the LSST-scale posterior.
"""

from __future__ import annotations

import importlib
import json
import os
import shutil
import sys

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)
os.environ.setdefault("JAX_PLATFORMS", "cpu")

# post-warmup steps kept; NUTS tau ~ 1 on this posterior so with 256
# walkers this is an ESS of a few 1e5 per parameter -> MC error on the
# mean of ~0.002 sigma, well below the 0.01-sigma reporting precision
N_STEPS = 1500


def main(
    n_steps: int = N_STEPS,
    seed: int = 7,
    theory_mod: str = "examples.des_theory",
) -> dict:
    import jax
    import jax.numpy as jnp

    from bench_common import (
        default_config_yaml,
        exact_posterior_filename,
        theory_tag,
    )

    T = importlib.import_module(theory_mod)
    tag = theory_tag(theory_mod)
    outdir = f"/tmp/linna_{tag}_exact"
    out_json = exact_posterior_filename(tag)
    from linna_tpu import priors as PR
    from linna_tpu.driver import read_triplet_cov
    from linna_tpu.likelihood import gaussian_loglike
    from linna_tpu.samplers import run as sampler_run
    from linna_tpu.samplers.backends import EmceeBackend

    truth = T.fiducial() + 0.05
    truth_vec = T.data_vector(truth)

    # the SAME covariance recipe as the pipeline inputs — shared source in
    # des_theory so the decomposition can't drift from the flagship posterior
    cov = read_triplet_cov(T.cov_triplet_rows(T.noise_sigma(truth_vec)))
    inv_cov = np.linalg.inv(cov)

    # the SAME priors as the flagship run — read from the analysis class's
    # own YAML (bench_full samples the posterior those priors define; a
    # hardcoded prior list here would silently decompose against a
    # different posterior)
    from linna_tpu.config import yaml_load

    config_path = os.path.join(HERE, default_config_yaml(tag))
    cfg = yaml_load(config_path, parent_dir=os.path.dirname(config_path))
    prior_list = cfg["sampled_params"]
    if len(prior_list) != T.NDIM:
        raise ValueError(
            f"{config_path} defines {len(prior_list)} priors but "
            f"{theory_mod} has NDIM={T.NDIM}"
        )
    pack = PR.priors_from_list(prior_list)

    data_j = jnp.asarray(truth_vec, jnp.float32)
    inv_j = jnp.asarray(inv_cov, jnp.float32)

    def log_prob(x):
        x = jnp.asarray(x, jnp.float32)
        xp = PR.transform(pack, x)
        # the canonical jax mirror of des_theory.data_vector (parity-tested)
        m = T.data_vector_jax(xp)
        lp = gaussian_loglike(m, data_j, inv_j) + PR.lnprior(x)
        return jnp.where(jnp.isnan(lp), -jnp.inf, lp)

    nwalkers = 256
    rng = np.random.default_rng(seed)
    x0_center = np.asarray(PR.inv_transform(pack, jnp.asarray(truth)))
    x0 = x0_center + 0.01 * rng.standard_normal((nwalkers, T.NDIM))

    if os.path.isdir(outdir):
        shutil.rmtree(outdir)
    sampler_run.run_ensemble(
        log_prob,
        x0.astype(np.float32),
        outdir,
        method="nuts",
        transform=lambda c: np.asarray(PR.transform(pack, c)),
        # fixed high-ESS length: run exactly n_steps with no convergence
        # machinery at all (the documented contract of
        # convergence_check=False) — no per-check tau FFTs, and no reliance
        # on sentinel tolerances staying unreachable
        convergence_check=False,
        max_iterations=n_steps,
        check_every=250,
        seed=seed,
        progress=True,
    )

    backend = EmceeBackend(os.path.join(outdir, sampler_run.EMCEE_FILENAME))
    full = backend.get_value("chain_transformed")
    flat = full[len(full) // 5 :].reshape(-1, T.NDIM)
    mean = np.mean(flat, axis=0)
    std = np.std(flat, axis=0)
    skew_sigma = np.abs(mean - truth) / std

    # split-half consistency of the exact mean: MC-error sanity check
    h1, h2 = np.array_split(full[len(full) // 5 :], 2)
    mc_err = np.abs(
        np.mean(h1.reshape(-1, T.NDIM), 0) - np.mean(h2.reshape(-1, T.NDIM), 0)
    ) / (2.0 * std)

    result = {
        "metric": "exact_posterior_reference",
        "sampler": "nuts",
        "n_steps": int(len(full)),
        "nwalkers": nwalkers,
        "exact_mean": [round(float(v), 6) for v in mean],
        "exact_std": [round(float(v), 6) for v in std],
        "truth": [round(float(v), 6) for v in truth],
        "intrinsic_skew_sigma": [round(float(v), 4) for v in skew_sigma],
        "max_intrinsic_skew_sigma": round(float(np.max(skew_sigma)), 4),
        "median_intrinsic_skew_sigma": round(float(np.median(skew_sigma)), 4),
        "split_half_mc_err_sigma_max": round(float(np.max(mc_err)), 4),
        "note": "exact-likelihood NUTS on the flagship posterior; "
        "intrinsic_skew_sigma is what a PERFECT emulator would score on "
        "bench_full's |mean-truth|/std metric",
    }
    with open(os.path.join(HERE, out_json), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps({k: v for k, v in result.items() if "exact_" not in k}))
    return result


if __name__ == "__main__":
    # CLI: [n_steps] [theory=MODULE] [seed=K] — anything else is an error
    n, _theory, _seed = N_STEPS, "examples.des_theory", 7
    for arg in sys.argv[1:]:
        if arg.startswith("theory="):
            _theory = arg.partition("=")[2]
        elif arg.startswith("seed="):
            _seed = int(arg.partition("=")[2])
        elif arg.isdigit():
            n = int(arg)
        else:
            raise SystemExit(
                f"unknown argument {arg!r}; usage: "
                "bench_exact_posterior.py [n_steps] [theory=MOD] [seed=K]"
            )
    main(n_steps=n, seed=_seed, theory_mod=_theory)
