"""Open-and-execute walkthrough: sample a 2-D Gaussian posterior with LINNA,
inspect the artifacts, retrieve the trained emulator, and take gradients
through it.

This is the script form of the reference's
``docs/notebooks/multivariate_gaussian_distribution.ipynb`` (cited by its
README): the same toy problem (means [0.1, 1], diagonal covariance, flat
[-2, 2] priors, identity theory), a reduced 2-iteration schedule so it
finishes in a couple of minutes on CPU, plus the retrieval/gradient demo the
reference keeps in ``retrieve_model_wrapper_in`` (linna/util.py:715-734).

Run:
    python examples/walkthrough.py [outdir]

Produces under <outdir> (default /tmp/linna_walkthrough):
    iter_{0,1}/...              the pipeline's file-gated artifacts
    walkthrough_posterior.png   sampled vs analytic posterior draws
and prints the emulator's prediction + Jacobian at the posterior mean and
the artifact tree.  Re-running the same command resumes/skips finished
stages (the restart contract, SURVEY §5.3).
"""

from __future__ import annotations

import os
import sys

import numpy as np

# runnable from anywhere: put the repo root (this file's parent's parent)
# ahead of the script dir so `import linna_tpu` resolves without installing
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(outdir: str = "/tmp/linna_walkthrough") -> None:
    import jax
    import jax.numpy as jnp

    from linna_tpu import ml_sampler_core
    from linna_tpu.likelihood import make_grad_log_prob, make_log_prob
    from linna_tpu.orchestrator import retrieve_model, retrieve_model_wrapper
    from linna_tpu import priors as P

    # ---- 1. the problem: a 2-D Gaussian posterior ------------------------
    ndim = 2
    means = np.array([0.1, 1.0])
    cov = np.diag([0.5, 0.2])
    priors = [
        {"param": f"test_{i}", "dist": "flat", "arg1": -2.0, "arg2": 2.0}
        for i in range(ndim)
    ]

    def theory(x, outdirs):
        # the "expensive model": here the identity map on the parameters
        return np.asarray(x[1], dtype=np.float64).copy()

    # ---- 2. run LINNA ----------------------------------------------------
    # A reduced 2-iteration schedule (the paper schedule is 4 x 10000; this
    # is a walkthrough, not a production run).
    chain, logprob = ml_sampler_core(
        ntrainArr=[400, 400], nvalArr=[80, 80],
        nkeepArr=[2, 4], ntimesArr=[8, 15], ntautolArr=[0.2, 0.1],
        meanshiftArr=[0.5, 0.5], stdshiftArr=[0.5, 0.5],
        outdir=outdir, theory=theory, priors=priors,
        data=means, cov=cov, init=np.zeros(ndim), pool=None,
        nwalkers=24, temperatureArr=[2.0, 1.0],
        params={"trainingoption": 1, "num_epochs": 300, "batch_size": 100},
        method="zeus", seed=3,
    )
    print(f"chain: {chain.shape}, posterior mean {np.mean(chain, 0).round(3)} "
          f"(truth {means}), std {np.std(chain, 0).round(3)} "
          f"(truth {np.sqrt(np.diag(cov)).round(3)})")

    # ---- 3. check the result: sampled vs analytic draws ------------------
    try:
        import matplotlib

        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        ref = np.random.default_rng(0).multivariate_normal(means, cov, len(chain))
        fig, ax = plt.subplots(figsize=(5, 5))
        ax.scatter(chain[:, 0], chain[:, 1], s=2, label="LINNA", alpha=0.4)
        ax.scatter(ref[:, 0], ref[:, 1], s=2, label="analytic", alpha=0.4)
        ax.axvline(means[0], c="r", lw=0.8)
        ax.axhline(means[1], c="r", lw=0.8)
        ax.set_xlabel("test_0")
        ax.set_ylabel("test_1")
        ax.legend()
        fig.savefig(os.path.join(outdir, "walkthrough_posterior.png"), dpi=120)
        plt.close(fig)
        print(f"wrote {outdir}/walkthrough_posterior.png")
    except ImportError:
        print("matplotlib unavailable: skipping the posterior plot")

    # ---- 4. retrieve the trained emulator and differentiate through it ---
    # (reference retrieve_model_wrapper_in, linna/util.py:715-734 — the
    # notebook's "useful performance check tools" section)
    final_dir = os.path.join(outdir, "iter_1/")
    emulator = retrieve_model_wrapper(final_dir)
    x0 = jnp.asarray(np.mean(chain, axis=0), jnp.float32)
    pred = emulator(x0)
    jac = jax.jacobian(emulator)(x0)
    print(f"emulator({np.asarray(x0).round(3)}) = {np.asarray(pred).round(3)}")
    print(f"d(emulator)/dx =\n{np.asarray(jac).round(3)}")

    # gradients of the full log-posterior (what HMC/NUTS consume)
    trainer = retrieve_model(final_dir, ndim, len(means))
    pack = P.priors_from_list(priors)
    log_prob = make_log_prob(
        trainer.spec, trainer.params, trainer.transforms, pack,
        means, np.linalg.inv(cov),
    )
    grad = make_grad_log_prob(log_prob)
    x_white = np.zeros((1, ndim), np.float32)
    print(f"grad log p at whitened 0: {np.asarray(grad(x_white))[0].round(3)}")

    # ---- 5. the artifact tree (file-gated: every stage resumable) --------
    print(f"\nartifacts under {outdir}:")
    for root, _dirs, files in sorted(os.walk(outdir)):
        rel = os.path.relpath(root, outdir)
        for f in sorted(files):
            print(f"  {os.path.join(rel, f) if rel != '.' else f}")


if __name__ == "__main__":
    main(sys.argv[1] if len(sys.argv) > 1 else "/tmp/linna_walkthrough")
