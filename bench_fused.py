"""Pallas fused-likelihood kernel vs the XLA composition, measured where it
matters: inside a jitted 100-step stretch-move sampler chunk and as a raw
batched evaluation, at the flagship DES-Y1-3x2pt shape (27 params -> 457-dim
data vector) across walker counts.

This is the evidence for the ``use_fused=`` dispatch in
``linna_tpu.likelihood.make_log_prob`` (see ops/fused.py): the fused kernel
keeps the 457-dim prediction in VMEM and writes one f32 per walker, which
pays off at small/medium walker counts where the XLA path is
HBM-round-trip-bound; at very large batches both saturate the same MXU
roofline.

Writes FUSED_BENCH.json and prints one JSON line per configuration.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, HERE)

NDIM = 27
NDATA = 457
CHUNK = 100
WALKER_COUNTS = (128, 512, 1024, 4096, 16384)


def _enable_compile_cache():
    from linna_tpu.orchestrator import _enable_compile_cache as enable

    enable()


def _rate_chunk(log_prob, walkers: int, reps: int = 3) -> float:
    """Walker log-prob evals/s inside the jitted sampler chunk."""
    import jax

    from linna_tpu.samplers import stretch

    x0 = jax.random.normal(jax.random.key(1), (walkers, NDIM), dtype="float32")
    state = stretch.init_state(jax.random.key(2), x0, log_prob)
    state, chain, _ = stretch.stretch_chunk(log_prob, state, CHUNK, 2.0)
    jax.block_until_ready(chain)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, chain, _ = stretch.stretch_chunk(log_prob, state, CHUNK, 2.0)
    jax.block_until_ready(chain)
    return walkers * CHUNK * reps / (time.perf_counter() - t0)


def _rate_raw(log_prob, walkers: int, reps: int = 20) -> float:
    """Raw batched (W, D) -> (W,) evals/s (one dispatch per call)."""
    import jax

    f = jax.jit(log_prob)
    x = jax.random.normal(jax.random.key(3), (walkers, NDIM), dtype="float32")
    jax.block_until_ready(f(x))
    t0 = time.perf_counter()
    for _ in range(reps):
        out = f(x)
    jax.block_until_ready(out)
    return walkers * reps / (time.perf_counter() - t0)


def main():
    _enable_compile_cache()
    import jax

    from __graft_entry__ import _build_problem
    from linna_tpu import likelihood as LK
    from linna_tpu.ops import fused

    spec, params, transforms, pack, data, inv_cov, lp_xla = _build_problem(
        NDIM, NDATA
    )
    if not fused.pallas_available():
        print(json.dumps({"error": "no TPU backend; fused bench skipped"}))
        return 0
    lp_fused = LK.make_log_prob(
        spec, params, transforms, pack, data, inv_cov, use_fused=True
    )

    # semantics check at bench shape before timing
    x = np.asarray(
        jax.random.normal(jax.random.key(9), (256, NDIM), dtype="float32")
    )
    a, b = np.asarray(lp_xla(x)), np.asarray(lp_fused(x))
    max_err = float(np.max(np.abs(a - b) / (np.abs(a) + 1.0)))
    assert max_err < 5e-4, f"fused/XLA disagree: rel err {max_err}"

    results = []
    for w in WALKER_COUNTS:
        row = {
            "walkers": w,
            "xla_chunk_evals_s": round(_rate_chunk(lp_xla, w), 1),
            "fused_chunk_evals_s": round(_rate_chunk(lp_fused, w), 1),
            "xla_raw_evals_s": round(_rate_raw(lp_xla, w), 1),
            "fused_raw_evals_s": round(_rate_raw(lp_fused, w), 1),
        }
        row["chunk_speedup"] = round(
            row["fused_chunk_evals_s"] / row["xla_chunk_evals_s"], 3
        )
        row["raw_speedup"] = round(
            row["fused_raw_evals_s"] / row["xla_raw_evals_s"], 3
        )
        results.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "shape": {"ndim": NDIM, "ndata": NDATA, "chunk": CHUNK},
        "device": str(jax.devices()[0]),
        "max_rel_err_vs_xla": max_err,
        "rows": results,
    }
    with open(os.path.join(HERE, "FUSED_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
