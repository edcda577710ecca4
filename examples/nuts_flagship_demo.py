"""Gradient-sampler demo on the trained flagship emulator.

The reference wires HMC/NUTS but its tree kernels are stubs (reference
linna/sampler.py:14-21); here NUTS is complete and batched, and this script
measures it against the production zeus-style slice sampler on the SAME
trained emulator posterior — run ``python bench_full.py`` first so the
flagship artifacts exist under ``/tmp/linna_des_bench``.

Measured on one TPU v5e (docs/FLAGSHIP.md): slice tau ~ 30 at 15 ms/step
for 256 walkers (~580 ESS/s); preconditioned NUTS tau ~ 0.8 (~1140 ESS/s,
2x) with posterior means agreeing to < 0.05 sigma.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/tmp/linna_jax_cache")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from linna_tpu import likelihood as LK
from linna_tpu import orchestrator as O
from linna_tpu import priors as P
from linna_tpu.samplers import convergence, hmc, precondition, slicemove
from linna_tpu.samplers.backends import ZeusBackend

OUT = "/tmp/linna_des_bench/iter_3"
INDIR = "/tmp/linna_des_inputs"
NDIM, NDATA, W = 27, 457, 256


def load_posterior():
    trainer = O.retrieve_model(OUT, NDIM, NDATA)
    members = O.retrieve_ensemble_params(OUT, trainer)
    data = np.loadtxt(os.path.join(INDIR, "data.txt"))[:, 1]
    rows = np.loadtxt(os.path.join(INDIR, "cov_triplet.txt"))
    cov = np.zeros((NDATA, NDATA))
    for i, j, _, v in rows:
        cov[int(i), int(j)] = cov[int(j), int(i)] = v
    priors = [
        {"param": f"p{i}", "dist": "flat", "arg1": -1.0, "arg2": 1.0}
        for i in range(NDIM)
    ]
    pack = P.priors_from_list(priors)
    lp = LK.make_log_prob(
        trainer.spec, members, trainer.transforms, pack, data, np.linalg.inv(cov)
    )
    chain = ZeusBackend(os.path.join(OUT, "zeus_256.h5")).get_chain()
    flat = chain[len(chain) // 2 :].reshape(-1, NDIM)
    x0 = flat[np.random.default_rng(0).integers(0, len(flat), W)].astype(np.float32)
    return lp, x0


def main():
    lp, x0 = load_posterior()

    # NUTS with MAP + Hessian-eigenbasis preconditioning (the production
    # method="nuts" path in samplers/run.py)
    t0 = time.time()
    pre = precondition.calc_hess_mass_mat(lp, np.mean(x0, axis=0))
    lp_pre = pre.wrap_log_prob(lp)
    x0_pre = np.asarray(pre.to_sampling(x0), np.float32)
    t_pre = time.time() - t0

    state = hmc.init_nuts_state(jax.random.key(1), jnp.asarray(x0_pre), lp_pre, m_adapt=100)
    # warm up past ALL m_adapt dual-averaging steps (plus compile) so the
    # timed region and the tau estimate see only post-adaptation samples —
    # an adapting prefix is nonstationary and inflates tau / deflates ESS/s
    state, chain, _ = hmc.nuts_chunk(lp_pre, state, 100, 5)
    jax.block_until_ready(chain)
    assert int(state.m_adapt) == 0, "timing must start after adaptation"
    t0 = time.time()
    state, chain, _ = hmc.nuts_chunk(lp_pre, state, 200, 5)
    jax.block_until_ready(chain)
    t_nuts = time.time() - t0
    ch = np.asarray(chain)
    tau_n = convergence.integrated_time(ch)
    ess_nuts = 200 * W / max(np.max(tau_n), 1.0) / t_nuts
    print(
        f"NUTS: precond {t_pre:.1f}s; 200x{W} in {t_nuts:.1f}s; "
        f"tau max={np.max(tau_n):.1f}; ESS/s={ess_nuts:.0f}"
    )

    # zeus-style ensemble slice (production default)
    sstate = slicemove.init_slice_state(jax.random.key(2), jnp.asarray(x0), lp)
    for _ in range(10):  # mu tuning
        sstate, sch, _ = slicemove.slice_chunk(lp, sstate, 50, 100)
        sstate = slicemove.tune_mu(sstate)
    jax.block_until_ready(sch)
    t0 = time.time()
    sstate, sch, _ = slicemove.slice_chunk(lp, sstate, 500, 100)
    jax.block_until_ready(sch)
    t_slice = time.time() - t0
    sc = np.asarray(sch)
    tau_s = convergence.integrated_time(sc)
    ess_slice = 500 * W / max(np.max(tau_s), 1.0) / t_slice
    print(
        f"slice: 500x{W} in {t_slice:.1f}s; tau max={np.max(tau_s):.1f}; "
        f"ESS/s={ess_slice:.0f}"
    )
    print(f"NUTS/slice ESS-rate ratio: {ess_nuts / ess_slice:.2f}")

    # cross-validation: the two samplers must agree on the posterior
    nuts_orig = np.asarray(pre.to_original(ch[50:].reshape(-1, NDIM)))
    ms = sc[100:].reshape(-1, NDIM).mean(0)
    ss = sc[100:].reshape(-1, NDIM).std(0)
    agree = np.max(np.abs(nuts_orig.mean(0) - ms) / ss)
    print(f"max |mean_nuts - mean_slice|/std = {agree:.3f}")


if __name__ == "__main__":
    main()
