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

Also drives the other synthetic analysis classes: pass
``theory=examples.lsst_theory yaml=examples/lsst_synthetic.yaml`` on the
CLI for the LSST-Y10-6x2pt+N-scale run (40 params -> 1560 points).
"""

from __future__ import annotations

import importlib
import json
import os
import shutil
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)


def _enable_compile_cache():
    from linna_tpu.orchestrator import _enable_compile_cache as enable

    enable()


def main(
    fresh: bool = True,
    overrides: dict | None = None,
    out: str = "FLAGSHIP.json",
    theory_mod: str = "examples.des_theory",
    config_yaml: str = "examples/des_synthetic.yaml",
    check: float | None = None,
):
    from bench_common import exact_posterior_filename, theory_tag

    tag = theory_tag(theory_mod)
    outdir = f"/tmp/linna_{tag}_bench"
    indir = f"/tmp/linna_{tag}_inputs"
    import faulthandler

    # watchdog: if any phase wedges (e.g. a stuck remote compile), dump all
    # thread stacks every 5 minutes so the stall point is visible in the log
    faulthandler.dump_traceback_later(300, repeat=True)
    _enable_compile_cache()
    # tunneled-TPU wedge guard: the first device op of a fresh client can
    # hang indefinitely after a previous client was killed; exit 3 fast so a
    # shell retry loop can start a fresh client instead of burning the
    # timeout (a new process usually recovers the tunnel)
    import threading

    _guard = threading.Timer(
        180, lambda: (print("TUNNEL-WEDGED", flush=True), os._exit(3))
    )
    _guard.daemon = True
    _guard.start()
    import jax

    jax.block_until_ready(jax.numpy.ones((8, 8)).sum())
    _guard.cancel()
    # inputs (same recipe as examples/make_des_inputs.py)
    T = importlib.import_module(theory_mod)

    os.makedirs(indir, exist_ok=True)
    truth_params = T.fiducial() + 0.05
    truth_vec = T.data_vector(truth_params)
    # noiseless data + ~1-4%-of-box posterior widths; the shared recipe in
    # des_theory keeps this posterior identical to bench_exact_posterior's
    data = truth_vec
    np.savetxt(os.path.join(indir, "data.txt"),
               np.stack([np.arange(T.NDATA), data], 1))
    from linna_tpu.driver import read_triplet_cov

    rows = T.cov_triplet_rows(T.noise_sigma(truth_vec))
    np.savetxt(os.path.join(indir, "cov_triplet.txt"), rows)
    cov_dense = read_triplet_cov(rows)

    if fresh and os.path.isdir(outdir):
        shutil.rmtree(outdir)

    from linna_tpu import driver
    from linna_tpu.config import yaml_load
    from linna_tpu.samplers import convergence

    config_path = config_yaml if os.path.isabs(config_yaml) else os.path.join(
        HERE, config_yaml
    )
    # resolve include: against the config's own directory, not a fixed one
    params = yaml_load(config_path, parent_dir=os.path.dirname(config_path))
    params["outdir"] = outdir
    params["base_dir"] = indir
    params.update(overrides or {})

    t0 = time.time()
    chain, logp = driver.run_from_config(params, method="zeus", verbose=True)
    wall = time.time() - t0

    # phase breakdown
    phases = {}
    trace_path = os.path.join(outdir, "trace.json")
    if os.path.isfile(trace_path):
        try:
            with open(trace_path) as f:
                for rec in json.load(f):
                    key = rec["phase"]
                    phases[key] = phases.get(key, 0.0) + rec.get("seconds", 0.0)
        except (OSError, ValueError):
            # a torn trace file must not kill the run AFTER the multi-hour
            # pipeline finished — the breakdown is diagnostic, not load-bearing
            phases = {"_corrupt_trace": 1.0}

    # convergence of the final chain (walker-resolved); the backend file
    # follows the final iteration's sampler (methodArr override supported)
    from linna_tpu.orchestrator import _chain_filename, _open_backend

    last_iter = len(params["ntrainArr"]) - 1
    final_dir = os.path.join(outdir, f"iter_{last_iter}/")
    m_arr = params.get("methodArr")
    final_method = m_arr[last_iter] if m_arr else "zeus"
    backend = _open_backend(
        os.path.join(final_dir, _chain_filename(final_method)), final_method
    )

    def _rhat():
        raw = backend.get_value("chain_transformed")
        half = raw[len(raw) // 5 :]  # discard 20% burn-in
        return convergence.gelman_rubin(half, split=True)

    rhat = _rhat()

    # North-star polish: the reference's tau*ntimes criterion stops at
    # ~50 tau, which lands around R-1 ~ 0.04; BASELINE.md's target is
    # R-1 < 0.01.  The HDF5 backend resumes, so keep extending the final
    # chain (file-gated: re-running is incremental) until R-hat passes.
    t_polish0 = time.time()
    polish_rounds = 0
    log_prob = pack = None
    while np.max(rhat) - 1.0 > 0.01 and polish_rounds < 12:
        polish_rounds += 1
        from linna_tpu import likelihood as LK
        from linna_tpu import orchestrator as OC
        from linna_tpu import priors as PR
        from linna_tpu.samplers import run as sampler_run

        if log_prob is None:  # emulator/priors are fixed — build once
            trainer = OC.retrieve_model(final_dir, T.NDIM, T.NDATA)
            members = OC.retrieve_ensemble_params(final_dir, trainer)
            pack = PR.priors_from_list(params["sampled_params"])
            log_prob = LK.make_log_prob(
                trainer.spec, members, trainer.transforms, pack, data,
                np.linalg.inv(cov_dense),
            )
        n_now = backend.iteration
        sampler_run.run_ensemble(
            log_prob,
            backend.get_last_sample(),
            final_dir,
            method=final_method,
            transform=lambda x, _p=pack: PR.transform_np(_p, x),
            max_iterations=n_now + 2000,
            # the R-hat gate above is the stopping rule here, so the
            # sampler's own tau re-estimates are pure overhead (measured:
            # they dominated polish wall — batched FFTs over the full
            # 10k-step window); disable them and use big chunks so polish
            # is pure device sampling
            convergence_check=False,
            check_every=500,
            seed=100 + polish_rounds,
        )
        rhat = _rhat()
    polish_s = time.time() - t_polish0

    # posterior accuracy vs synthetic truth, on the (possibly polished)
    # final chain — same discard as the R-hat computation
    full = backend.get_value("chain_transformed")
    flat = full[len(full) // 5 :].reshape(-1, T.NDIM)
    post_mean = np.mean(flat, axis=0)
    post_std = np.std(flat, axis=0)
    err_sigma = np.abs(post_mean - truth_params) / post_std

    # The |mean - truth| metric conflates emulator error with the exact
    # posterior's own nonlinear skew (up to 0.10 sigma on this theory; see
    # bench_exact_posterior.py).  When the exact-likelihood reference
    # exists, also report the emulator's true contribution:
    # |flagship mean - exact mean| / exact std.
    emu_bias = None
    exact_path = os.path.join(HERE, exact_posterior_filename(tag))
    if os.path.isfile(exact_path):
        with open(exact_path) as f:
            exact = json.load(f)
        e_mean = np.asarray(exact["exact_mean"])
        e_std = np.asarray(exact["exact_std"])
        emu_bias = np.abs(post_mean - e_mean) / e_std

    result = {
        "metric": f"{tag}_synthetic_wallclock",
        "value": round(wall, 1),
        "unit": "s",
        "phases_s": {k: round(v, 1) for k, v in phases.items()},
        "max_split_rhat": round(float(np.max(rhat)), 4),
        "polish_to_rhat_s": round(polish_s, 1),
        "polish_rounds": polish_rounds,
        "max_posterior_err_sigma": round(float(np.max(err_sigma)), 3),
        "median_posterior_err_sigma": round(float(np.median(err_sigma)), 3),
        **(
            {
                "max_emulator_bias_sigma": round(float(np.max(emu_bias)), 3),
                "median_emulator_bias_sigma": round(
                    float(np.median(emu_bias)), 3
                ),
            }
            if emu_bias is not None
            else {}
        ),
        "final_chain_steps": int(len(full)),
        "nwalkers": int(full.shape[1]),
        "ndim": T.NDIM,
        "ndata": T.NDATA,
        # derive the provenance string from the ACTUAL merged config, not a
        # hardcoded schedule (yaml= is user-suppliable)
        "config": (
            f"{config_yaml} ({len(params['ntrainArr'])} iterations x "
            f"{params['ntrainArr'][0]}, T^2="
            f"{','.join(str(round(t**2)) for t in params['temperatureArr'])}, "
            f"nensemble={params.get('nensemble', 1)}, "
            f"{params['nwalkers']} walkers)"
        )
        + (f" + overrides {overrides}" if overrides else ""),
    }
    with open(os.path.join(HERE, out), "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))

    # --check: the accuracy headline verifies ITSELF (VERDICT r3 item 2) —
    # the freshly measured emulator bias against the stored exact-likelihood
    # posterior must stay under the threshold, or this command exits
    # nonzero.  A regression in training/sampling accuracy now fails a
    # command instead of needing a human to read JSON (the spirit of the
    # reference's pinned chain moments, /root/reference/tests/test_main.py:50-51).
    if check is not None:
        if emu_bias is not None:
            metric, name = emu_bias, "emulator bias (vs exact posterior)"
        else:
            metric, name = err_sigma, "posterior error (vs synthetic truth)"
        worst = float(np.max(metric))
        ok = worst <= check
        print(
            f"CHECK {'PASS' if ok else 'FAIL'}: max {name} = {worst:.3f} "
            f"sigma (threshold {check}); median {float(np.median(metric)):.3f}",
            flush=True,
        )
        if not ok:
            sys.exit(1)
    return result


if __name__ == "__main__":
    # CLI: [--resume] [--check] [out=FILE.json] [key=value ...]  — key=value
    # entries override the YAML config (e.g. train_compute_dtype=bfloat16).
    # --check (or check=0.15): exit nonzero when the measured max emulator
    # bias vs the stored exact posterior exceeds the threshold (default 0.1
    # sigma) — the self-verifying accuracy gate.
    _overrides, _out = {}, "FLAGSHIP.json"
    _theory, _yaml = "examples.des_theory", "examples/des_synthetic.yaml"
    _check = 0.1 if "--check" in sys.argv else None
    for arg in sys.argv[1:]:
        if arg in ("--resume", "--check") or "=" not in arg:
            continue
        k, _, v = arg.partition("=")
        if k == "out":
            _out = v
        elif k == "theory":
            _theory = v
        elif k == "yaml":
            _yaml = v
        elif k == "check":
            _check = float(v)
        else:
            try:
                v = json.loads(v)
            except json.JSONDecodeError:
                pass
            _overrides[k] = v
    main(fresh="--resume" not in sys.argv, overrides=_overrides, out=_out,
         theory_mod=_theory, config_yaml=_yaml, check=_check)
