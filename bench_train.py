"""Training-phase measurement on the real chip (VERDICT r2 items 2 & 3).

Flagship-shaped supervised problem (27 params -> 457-point data vector,
40k stacked training rows, batch 500 — iteration 3 of the DES schedule) —
measures steady-state seconds/epoch for:

- K=1 f32            : the single-member baseline;
- K=2 f32            : vmap member-packing overhead on ONE chip (on 2 chips
                       with 'ens' sharded each chip runs exactly the K=1
                       program — SCALING.json's HLO shows no cross-member
                       collectives — so this ratio bounds the pod overhead);
- K=2 bf16 compute   : train_compute_dtype="bfloat16" (f32 master weights);
- K=2 f32 batch 2000 : fewer, larger steps (LR-scaled usage would apply).

Writes TRAIN_BENCH.json and prints it.
"""

from __future__ import annotations

import json
import tempfile
import time

import numpy as np

NDIM, NDATA = 27, 457
N_TRAIN, N_VAL = 40_000, 2_000
EPOCHS = 30


def main():
    import jax

    from linna_tpu.orchestrator import _enable_compile_cache

    _enable_compile_cache()
    import jax.numpy as jnp

    from linna_tpu import losses as L
    from linna_tpu import nn as N
    from linna_tpu import transforms as T
    from linna_tpu.parallel.ensemble import EnsembleTrainer

    rng = np.random.default_rng(0)
    w = rng.standard_normal((NDIM, NDATA)) / np.sqrt(NDIM)
    tx = np.asarray(rng.uniform(-1, 1, (N_TRAIN, NDIM)), np.float32)
    ty = np.asarray(tx @ w, np.float32)
    vx = np.asarray(rng.uniform(-1, 1, (N_VAL, NDIM)), np.float32)
    vy = np.asarray(vx @ w, np.float32)
    sigma = np.ones(NDATA)
    xt = T.fit_x_transform(tx, None)
    yt = T.fit_y_transform(ty, ypositive=False)
    tset = T.TransformSet(xt, yt, T.YTransformData(jnp.asarray(sigma, jnp.float32)))
    loss_state = L.build_loss_state(np.zeros(NDATA), np.eye(NDATA), tset)
    spec = N.make_model_spec("chto_v2", NDIM, NDATA)

    # isolate device compute: the matplotlib training-progress render at the
    # end of every train() call costs ~0.5-1 s of host time — at tens of
    # epochs that is up to ~10% of the timed region and identical across
    # cases, biasing every ratio toward 1.  (The tiny end-of-train npz
    # checkpoint writes remain; they are symmetric and ~ms.)
    from linna_tpu.utils import plots as _plots

    _plots.plot_training_progress = lambda *a, **k: None
    _plots.plot_lr_range = lambda *a, **k: None

    def run(k: int, compute_dtype, batch: int) -> float:
        with tempfile.TemporaryDirectory() as td:
            tr = EnsembleTrainer(
                spec, tset, loss_state,
                [f"{td}/m{m}" for m in range(k)], [100 + m for m in range(k)],
                compute_dtype=compute_dtype,
            )
            kw = dict(batch_size=batch, auto_lr=False, initfrombest=False,
                      epochs_per_dispatch=EPOCHS)
            tr.train(tx, ty, vx, vy, num_epochs=EPOCHS, **kw)  # compile + warm
            t0 = time.perf_counter()
            tr.train(tx, ty, vx, vy, num_epochs=EPOCHS, **kw)
            return (time.perf_counter() - t0) / EPOCHS

    cases = [
        ("k1_f32_b500", 1, None, 500),
        ("k2_f32_b500", 2, None, 500),
        ("k2_bf16_b500", 2, "bfloat16", 500),
        ("k2_f32_b2000", 2, None, 2000),
    ]
    out = {}
    for name, k, cd, b in cases:
        s = run(k, cd, b)
        out[name] = round(s, 4)
        print(f"{name}: {s * 1e3:.1f} ms/epoch", flush=True)
    import jax as _j

    result = {
        "platform": _j.devices()[0].platform,
        "shape": {"ndim": NDIM, "ndata": NDATA, "n_train": N_TRAIN,
                  "batch": 500, "epochs_timed": EPOCHS},
        "sec_per_epoch": out,
        "k2_packing_overhead_vs_k1": round(out["k2_f32_b500"] / out["k1_f32_b500"], 3),
        "bf16_speedup_vs_f32": round(out["k2_f32_b500"] / out["k2_bf16_b500"], 3),
    }
    with open("TRAIN_BENCH.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
