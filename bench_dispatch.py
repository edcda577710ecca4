"""Trainer-wall A/B of the round-5 dispatch changes (VERDICT r4 item 5):
dynamic DispatchSchedule + speculative double-buffer vs serial fixed-chunk
dispatch, at the DES flagship training shape (27 -> 457, 40k rows, batch
500, K=2 mesh trainer, epochs_per_dispatch=50).

What speculation hides is the per-chunk host time (metric fetch RTT over
the tunneled link + supervisor/save/plot) behind the next chunk's device
compute, so the measured quantity is WALL seconds of Trainer.train for a
fixed epoch budget — not ms/epoch of device compute (TRAIN_PROFILE.json
covers that).  Writes DISPATCH_BENCH.json and prints one JSON line.
"""

from __future__ import annotations

import json
import tempfile
import time

import numpy as np

NDIM, NDATA = 27, 457
N_TRAIN, N_VAL = 40_000, 2_000
EPOCHS = 400
K = 2


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

    out = {"metric": "trainer_wall_dispatch_ab", "unit": "s",
           "shape": {"ndim": NDIM, "ndata": NDATA, "n_train": N_TRAIN,
                     "batch": 500, "k": K, "epochs": EPOCHS,
                     "epochs_per_dispatch": 50},
           "platform": jax.devices()[0].platform}

    def run(spec_flag: bool) -> dict:
        with tempfile.TemporaryDirectory() as td:
            tr = EnsembleTrainer(
                spec, tset, loss_state,
                [f"{td}/m{m}" for m in range(K)], list(range(K)),
            )
            tr.speculative_dispatch = spec_flag
            t0 = time.perf_counter()
            tr.train(tx, ty, vx, vy, num_epochs=EPOCHS, batch_size=500,
                     auto_lr=False, initfrombest=False,
                     epochs_per_dispatch=50)
            wall = time.perf_counter() - t0
            return {"wall_s": round(wall, 2),
                    "phases": {k: round(v, 2)
                               for k, v in tr.phase_seconds.items()},
                    "epochs_run": tr.epochs_run}

    # warm both program shapes once (compile + cache), then time
    for flag in (True, False):
        run(flag)
    out["speculative"] = run(True)
    out["serial"] = run(False)
    out["speedup"] = round(
        out["serial"]["wall_s"] / out["speculative"]["wall_s"], 3
    )
    with open("DISPATCH_BENCH.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
