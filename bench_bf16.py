"""bf16 vs f32 emulator-likelihood throughput inside real sampler chunks at
the flagship DES shape (27 -> 457), across walker counts.

Evidence for the ``compute_dtype="bfloat16"`` option in
``linna_tpu.likelihood.make_log_prob``: the MXU's native bf16 rate vs the
f32 path, measured where production spends its time (100-step stretch
chunks).  Also reports the bf16 vs f32 log-prob deviation at the bench
shape so the accuracy cost is recorded next to the speedup.

Writes BF16_BENCH.json and prints one JSON line per walker count.
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
WALKER_COUNTS = (256, 1024, 4096, 16384)


def _rate_chunk(log_prob, walkers: int, reps: int = 3, ndim: int = NDIM) -> float:
    import jax

    from linna_tpu.samplers import stretch

    x0 = jax.random.normal(jax.random.key(1), (walkers, ndim), dtype="float32")
    state = stretch.init_state(jax.random.key(2), x0, log_prob)
    state, chain, _ = stretch.stretch_chunk(log_prob, state, CHUNK, 2.0)
    jax.block_until_ready(chain)
    t0 = time.perf_counter()
    for _ in range(reps):
        state, chain, _ = stretch.stretch_chunk(log_prob, state, CHUNK, 2.0)
    jax.block_until_ready(chain)
    return walkers * CHUNK * reps / (time.perf_counter() - t0)


def main():
    import jax

    from linna_tpu.orchestrator import _enable_compile_cache

    _enable_compile_cache()

    from __graft_entry__ import _build_problem
    from linna_tpu import likelihood as LK

    spec, params, transforms, pack, data, inv_cov, lp_f32 = _build_problem(
        NDIM, NDATA
    )
    lp_bf16 = LK.make_log_prob(
        spec, params, transforms, pack, data, inv_cov,
        compute_dtype="bfloat16",
    )

    x = np.asarray(
        jax.random.normal(jax.random.key(9), (1024, NDIM), dtype="float32")
    )
    a, b = np.asarray(lp_f32(x)), np.asarray(lp_bf16(x))
    dev = np.abs(a - b)
    accuracy = {
        "median_abs_dlogp": float(np.median(dev)),
        "p95_abs_dlogp": float(np.percentile(dev, 95)),
    }

    rows = []
    for w in WALKER_COUNTS:
        row = {
            "walkers": w,
            "f32_chunk_evals_s": round(_rate_chunk(lp_f32, w), 1),
            "bf16_chunk_evals_s": round(_rate_chunk(lp_bf16, w), 1),
        }
        row["speedup"] = round(
            row["bf16_chunk_evals_s"] / row["f32_chunk_evals_s"], 3
        )
        rows.append(row)
        print(json.dumps(row), flush=True)

    # Regimes where bf16 could plausibly pay (VERDICT r4 item 4): the
    # K-member ensemble likelihood (matmul work scales with K) and the
    # LSST 6x2pt shape (40 -> 1560-wide output, ~3.4x the matmul bytes).
    from linna_tpu import nn as N

    extra = []
    for kmem in (2, 4):
        members = [
            N.init_model(jax.random.key(100 + m), spec) for m in range(kmem)
        ]
        lpf = LK.make_log_prob(spec, members, transforms, pack, data, inv_cov)
        lpb = LK.make_log_prob(
            spec, members, transforms, pack, data, inv_cov,
            compute_dtype="bfloat16",
        )
        row = {
            "case": f"ensemble_K{kmem}", "walkers": 4096,
            "f32_chunk_evals_s": round(_rate_chunk(lpf, 4096), 1),
            "bf16_chunk_evals_s": round(_rate_chunk(lpb, 4096), 1),
        }
        row["speedup"] = round(
            row["bf16_chunk_evals_s"] / row["f32_chunk_evals_s"], 3
        )
        extra.append(row)
        print(json.dumps(row), flush=True)

    spec2, params2, t2, pack2, d2, ic2, lp2_f32 = _build_problem(40, 1560)
    lp2_bf16 = LK.make_log_prob(
        spec2, params2, t2, pack2, d2, ic2, compute_dtype="bfloat16"
    )
    for w in (1024, 4096):
        row = {
            "case": "lsst_40x1560", "walkers": w,
            "f32_chunk_evals_s": round(_rate_chunk(lp2_f32, w, ndim=40), 1),
            "bf16_chunk_evals_s": round(_rate_chunk(lp2_bf16, w, ndim=40), 1),
        }
        row["speedup"] = round(
            row["bf16_chunk_evals_s"] / row["f32_chunk_evals_s"], 3
        )
        extra.append(row)
        print(json.dumps(row), flush=True)

    out = {
        "shape": {"ndim": NDIM, "ndata": NDATA, "chunk": CHUNK},
        "device": str(jax.devices()[0]),
        "accuracy": accuracy,
        "rows": rows,
        "regime_rows": extra,
    }
    with open(os.path.join(HERE, "BF16_BENCH.json"), "w") as f:
        json.dump(out, f, indent=1)
    return 0


if __name__ == "__main__":
    sys.exit(main())
