"""Multi-chip scaling measurements (VERDICT r2 item 3).

Measures — rather than asserts — the two parallel paths on whatever device
mesh is available (run under ``XLA_FLAGS=--xla_force_host_platform_device_count=8``
for the virtual-mesh numbers — the script defaults the platform to cpu; set
``LINNA_SCALING_PLATFORM=tpu`` on a real pod for ICI-backed timings):

1. **Ensemble training**: wall-clock of ``EnsembleTrainer`` (all K members
   as one sharded program over the ('ens','data') mesh) vs the serial
   ``Trainer`` loop (K sequential single-member runs) at K=2 and K=4, same
   total epochs/batches/seeds.
2. **Sampler chunk throughput**: walker-sharded ``stretch_chunk`` rate at
   1/2/4/8 devices for a fixed ensemble size.

Writes SCALING.json and prints it.  Relative timings on the virtual CPU mesh
measure *program structure* (one dispatch vs K, collective overhead), not ICI
bandwidth — the roofline note in the JSON says what does and doesn't
transfer.
"""

from __future__ import annotations

import json
import time

import numpy as np


def _setup():
    import os

    import jax

    # default to the virtual CPU mesh (the sitecustomize force-sets a
    # 1-device tunneled platform, useless for scaling); an explicit
    # LINNA_SCALING_PLATFORM=tpu runs on the real device mesh so a pod
    # reports ICI-backed timings as the docstring promises
    platform = os.environ.get("LINNA_SCALING_PLATFORM", "cpu")
    jax.config.update("jax_platforms", platform)
    return jax


NDIM, NDATA = 8, 64
N_TRAIN, N_VAL, BATCH = 2000, 200, 250
EPOCHS = 40


def _problem(jax):
    from linna_tpu import losses as L
    from linna_tpu import nn as N
    from linna_tpu import transforms as T

    rng = np.random.default_rng(0)
    w = rng.standard_normal((NDIM, NDATA))
    tx = np.asarray(rng.uniform(-1, 1, (N_TRAIN, NDIM)), np.float32)
    ty = np.asarray(tx @ w, np.float32)
    vx = np.asarray(rng.uniform(-1, 1, (N_VAL, NDIM)), np.float32)
    vy = np.asarray(vx @ w, np.float32)
    cov = np.eye(NDATA)
    sigma = np.sqrt(np.diag(cov))
    xt = T.fit_x_transform(tx, None)
    yt = T.fit_y_transform(ty / sigma, ypositive=False)
    tset = T.TransformSet(
        xt, yt, T.YTransformData(jax.numpy.asarray(sigma, jax.numpy.float32))
    )
    loss_state = L.build_loss_state(np.zeros(NDATA), cov, tset)
    spec = N.make_model_spec("chto_v2", NDIM, NDATA)
    return spec, tset, loss_state, tx, ty, vx, vy


def bench_trainer(jax, k: int, tmpdir: str) -> dict:
    """Steady-state wall for EPOCHS epochs x K members: mesh vs serial."""
    import os

    from linna_tpu.parallel.ensemble import EnsembleTrainer
    from linna_tpu.train import Trainer

    spec, tset, loss_state, tx, ty, vx, vy = _problem(jax)
    seeds = [100 + i for i in range(k)]

    # isolate device compute: the per-train() matplotlib render is a
    # ~0.5-1 s host constant identical in both variants — at EPOCHS=40 of a
    # tiny model it would dominate and bias the mesh/serial ratio toward 1
    from linna_tpu.utils import plots as _plots

    _plots.plot_training_progress = lambda *a, **k: None
    _plots.plot_lr_range = lambda *a, **k: None

    def run_mesh() -> float:
        dirs = [os.path.join(tmpdir, f"mesh{k}_{m}") for m in range(k)]
        tr = EnsembleTrainer(spec, tset, loss_state, dirs, seeds)
        kw = dict(batch_size=BATCH, auto_lr=False, initfrombest=False,
                  epochs_per_dispatch=EPOCHS)
        tr.train(tx, ty, vx, vy, num_epochs=EPOCHS, **kw)  # compile + run
        t0 = time.perf_counter()
        tr.train(tx, ty, vx, vy, num_epochs=EPOCHS, **kw)  # cached program
        return time.perf_counter() - t0

    def run_serial() -> float:
        trainers = []
        for m in range(k):
            d = os.path.join(tmpdir, f"ser{k}_{m}")
            os.makedirs(d, exist_ok=True)
            trainers.append(
                Trainer(spec, tset, loss_state, outdir=d, seed=seeds[m])
            )
        kw = dict(batch_size=BATCH, auto_lr=False, initfrombest=False,
                  epochs_per_dispatch=EPOCHS)
        for tr in trainers:
            tr.train(tx, ty, vx, vy, num_epochs=EPOCHS, **kw)  # compile + run
        t0 = time.perf_counter()
        for tr in trainers:
            tr.train(tx, ty, vx, vy, num_epochs=EPOCHS, **kw)
        return time.perf_counter() - t0

    mesh_s = run_mesh()
    serial_s = run_serial()
    return {
        "k": k,
        "mesh_s": round(mesh_s, 2),
        "serial_s": round(serial_s, 2),
        "speedup": round(serial_s / mesh_s, 2),
    }


def bench_sampler(jax, walkers: int = 1024, chunk: int = 50) -> list:
    """stretch_chunk throughput at 1/2/4/8 devices (walker-sharded)."""
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from linna_tpu import likelihood as LK
    from linna_tpu import nn as N
    from linna_tpu import priors as PR
    from linna_tpu import transforms as T
    from linna_tpu.samplers import stretch

    spec, tset, loss_state, tx, ty, vx, vy = _problem(jax)
    params = N.init_model(jax.random.key(0), spec)
    pack = PR.priors_from_list(
        [{"param": f"p{i}", "dist": "flat", "arg1": -2.0, "arg2": 2.0}
         for i in range(NDIM)]
    )
    log_prob = LK.make_log_prob(
        spec, params, tset, pack, np.zeros(NDATA), np.eye(NDATA)
    )
    x0 = jax.random.normal(jax.random.key(1), (walkers, NDIM), dtype="float32")

    out = []
    all_devices = jax.devices()
    for d in (1, 2, 4, 8):
        if d > len(all_devices):
            break
        mesh = Mesh(np.asarray(all_devices[:d]), ("walkers",))
        x0_d = jax.device_put(x0, NamedSharding(mesh, P("walkers", None)))
        state = stretch.init_state(jax.random.key(2), x0_d, log_prob)
        state, chain, _ = stretch.stretch_chunk(log_prob, state, chunk, 2.0)
        jax.block_until_ready(chain)  # compile
        reps, t0 = 3, time.perf_counter()
        for _ in range(reps):
            state, chain, _ = stretch.stretch_chunk(log_prob, state, chunk, 2.0)
        jax.block_until_ready(chain)
        dt = time.perf_counter() - t0
        out.append(
            {"devices": d,
             "evals_per_s": round(walkers * chunk * reps / dt, 1)}
        )
    return out


def hlo_collectives(jax, k: int = 4) -> dict:
    """K-member training chunk census (delegates to the in-package
    linna_tpu.parallel.census — also used by examples/pod_accept.py): the
    contract is exactly one collective kind, the per-member gradient
    all-reduce confined to each member's 'data' group, nothing crossing
    'ens'."""
    from linna_tpu.parallel.census import trainer_collective_census

    return trainer_collective_census(
        k=k, ndim=NDIM, ndata=NDATA, n_train=N_TRAIN, n_val=N_VAL,
        batch=BATCH, epochs=5,
    )


def _hlo_census_by_computation(txt: str) -> dict:
    from linna_tpu.parallel.census import hlo_census_by_computation

    return hlo_census_by_computation(txt)


def sampler_hlo_collectives(jax, walkers: int = 256, nsteps: int = 8) -> dict:
    """Walker-sharded chunk census for every sampler on the full mesh
    (VERDICT r3 item 1; r5: re-censused after the shard_map rework —
    stretch/slice at 2 per-step all-gathers, HMC/NUTS at zero).  Delegates
    to linna_tpu.parallel.census, the same code examples/pod_accept.py
    gates on."""
    from linna_tpu.parallel.census import sampler_collective_census

    return sampler_collective_census(
        ndim=NDIM, ndata=NDATA, walkers=walkers, nsteps=nsteps
    )


def main():
    import tempfile

    jax = _setup()
    result = {
        "platform": jax.devices()[0].platform,
        "n_devices": jax.device_count(),
        "shape": {"ndim": NDIM, "ndata": NDATA, "n_train": N_TRAIN,
                  "batch": BATCH, "epochs": EPOCHS},
        "note": (
            "Read the virtual-CPU-mesh timings for what they are: all 8 "
            "'devices' timeshare the SAME physical cores, so the serial path "
            "gives each member every core (XLA intra-op threading) while the "
            "mesh path partitions those cores and adds partition overhead — "
            "speedup < 1 here is expected and measures pure program-structure "
            "overhead, an upper bound on what real chips pay.  The real-chip "
            "argument is structural, from the compiled HLO ('hlo' section): "
            "the K-member training chunk contains exactly one collective — "
            "the per-member gradient all-reduce with replica_groups confined "
            "to each member's 'data' group — and nothing crossing 'ens', so "
            "on K*d real chips the members run independently and wall-clock "
            "~= one member on d chips plus the vmap packing overhead "
            "(measured on the real chip in TRAIN_BENCH.json)."
        ),
    }
    with tempfile.TemporaryDirectory() as td:
        result["trainer"] = [bench_trainer(jax, 2, td), bench_trainer(jax, 4, td)]
    result["sampler"] = bench_sampler(jax)
    result["hlo"] = hlo_collectives(jax)
    result["sampler_hlo"] = sampler_hlo_collectives(jax)
    result["sampler_hlo_note"] = (
        "Walker-sharded chunk census on the 8-device mesh, after the round-5 "
        "shard_map rework (stretch.shard_over_walkers): the stretch AND "
        "slice moves each dispatch exactly 2 collectives per step — the two "
        "half-ensemble all-gathers for the partner/direction indexing, "
        "~8 KB — with the stepping-out/shrink while-loops running on purely "
        "device-local walker blocks (under plain GSPMD they paid 10 and 30 "
        "per step respectively, the r4 census).  HMC and NUTS dispatch ZERO "
        "collectives — gradient moves are walker-local, so they scale "
        "embarrassingly across chips.  Every collective result is "
        "(walkers, ndim)-sized: nothing scales with the data-vector width — "
        "the 457-point emulator output never crosses chips, so on real ICI "
        "(~100 GB/s/link) the per-step collective cost is O(microseconds) "
        "against a ~100 us likelihood step."
    )
    with open("SCALING.json", "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result, indent=1))


if __name__ == "__main__":
    main()
