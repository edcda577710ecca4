"""Process-separated training entry point.

The reference ships training to a (possibly remote) GPU process by pickling
the ``train_NN`` closure + args and busy-waiting on a ``finish.pkl`` sentinel
(reference linna/main.py:186-252, linna/train_gpu.py:24-38).  On TPU the
trainer runs in process by default; this module keeps the process-separated
mode for CLI parity and crash isolation, pickle-free: the orchestrator
serializes the request as ``train_request.json`` + ``train_request.npz`` in
the iteration directory and invokes

    python -m linna_tpu.train_entry <outdir_in>

which runs :func:`linna_tpu.orchestrator.train_emulator` and leaves the
usual ``finish.json`` marker.
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

REQUEST_JSON = "train_request.json"
REQUEST_NPZ = "train_request.npz"

__all__ = ["write_request", "run_request", "main"]


def write_request(
    outdir_in: str,
    outdir_list,
    data,
    cov,
    sigma,
    dolog10index,
    ypositive: bool,
    model_name: str,
    params: dict,
    usebest: bool,
    seed: int = 1234,
) -> None:
    os.makedirs(outdir_in, exist_ok=True)
    np.savez(
        os.path.join(outdir_in, REQUEST_NPZ), data=data, cov=cov, sigma=sigma
    )
    clean = {
        k: v
        for k, v in params.items()
        if isinstance(v, (int, float, str, bool, list, type(None)))
    }
    with open(os.path.join(outdir_in, REQUEST_JSON), "w") as f:
        json.dump(
            {
                "outdir_list": list(outdir_list),
                # `is not None`, not truthiness: a numpy index array raises
                # on bool() and an empty list must stay an explicit []
                "dolog10index": (
                    [int(i) for i in dolog10index]
                    if dolog10index is not None
                    else None
                ),
                "ypositive": bool(ypositive),
                "model_name": model_name,
                "params": clean,
                "usebest": bool(usebest),
                "seed": int(seed),
            },
            f,
        )


def run_request(outdir_in: str, verbose: bool = False) -> None:
    from .orchestrator import train_emulator

    with open(os.path.join(outdir_in, REQUEST_JSON)) as f:
        req = json.load(f)
    with np.load(os.path.join(outdir_in, REQUEST_NPZ)) as arrs:
        data, cov, sigma = arrs["data"], arrs["cov"], arrs["sigma"]
    train_emulator(
        outdir_in,
        req["outdir_list"],
        data,
        cov,
        sigma,
        req["dolog10index"],
        req["ypositive"],
        req["model_name"],
        req["params"],
        usebest=req["usebest"],
        seed=req["seed"],
        verbose=verbose,
    )


def main(argv=None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if not argv:
        print("usage: python -m linna_tpu.train_entry <outdir_in>", file=sys.stderr)
        return 2
    # honor JAX_PLATFORMS even when a sitecustomize force-registers another
    # backend (e.g. a tunneled TPU) — the parent chose the platform
    plat = os.environ.get("JAX_PLATFORMS")
    if plat:
        import jax

        jax.config.update("jax_platforms", plat)
    run_request(argv[0], verbose="--verbose" in argv)
    return 0


if __name__ == "__main__":
    sys.exit(main())
