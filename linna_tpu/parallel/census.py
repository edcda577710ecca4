"""Compiled-HLO collective census — the structural acceptance evidence for
the multi-chip design (SURVEY §5.8; VERDICT r3 item 1 / r4 item 6).

On a machine with N devices (real TPU pod slice or a virtual
``--xla_force_host_platform_device_count`` CPU mesh) these helpers compile
the production device programs on the full mesh and count the collective
instructions — split into *per-step* (inside scan/while loop bodies,
executed every sampler step) and *per-chunk* (dispatch-time resharding).
The acceptance thresholds (examples/pod_accept.py):

- stretch / slice chunks: <= 2 per-step collectives (the two half-ensemble
  all-gathers of ``shard_over_walkers``; GSPMD partitioning without the
  shard_map path paid 10/30);
- HMC / NUTS chunks: zero collectives — gradient moves are walker-local;
- the K-member training chunk: exactly one collective kind — the per-member
  gradient all-reduce with replica groups confined to each member's 'data'
  group; NOTHING crossing the 'ens' axis.

Nothing here times anything: the census is the property of the compiled
program, identical on virtual CPU devices and real chips, which is what
makes it runnable as a gate before pod hardware exists (and re-runnable ON
the pod, where the same thresholds must hold over real ICI).
"""

from __future__ import annotations

import re
import tempfile
from typing import Optional

import numpy as np

__all__ = [
    "hlo_census_by_computation",
    "sampler_collective_census",
    "trainer_collective_census",
]

_OPCODES = (
    "all-gather", "all-reduce", "reduce-scatter", "collective-permute",
    "all-to-all", "collective-broadcast",
)
_DBYTES = {"f32": 4, "s32": 4, "u32": 4, "f64": 8, "bf16": 2, "pred": 1,
           "s8": 1, "u8": 1, "f16": 2, "s64": 8, "u64": 8}


def hlo_census_by_computation(txt: str) -> dict:
    """Count collective instructions in compiled-HLO text, split into those
    inside loop-body computations (executed once PER STEP of the chunk's
    scan/while) and those outside (once per chunk dispatch)."""
    per_step: dict = {}
    per_chunk: dict = {}
    step_bytes = 0
    comp = ""
    for line in txt.splitlines():
        if not line.startswith(" ") and "{" in line:
            comp = line.split("(")[0].strip().lstrip("%")
        m = re.search(r"= (\w+)\[([\d,]*)\]\S* ([a-z-]+)\(", line)
        if m and m.group(3) in _OPCODES:
            # scan/while bodies lower to non-ENTRY region computations; a
            # collective there executes once per STEP of the chunk
            body = any(k in comp for k in ("while", "body", "cond", "region"))
            tgt = per_step if body else per_chunk
            tgt[m.group(3)] = tgt.get(m.group(3), 0) + 1
            if body:
                shape = m.group(2)
                n = int(np.prod([int(s) for s in shape.split(",") if s] or [1]))
                step_bytes += n * _DBYTES.get(m.group(1), 4)
    return {
        "per_step": per_step,
        "per_chunk": per_chunk,
        "per_step_result_bytes": step_bytes,
    }


def _census_problem(ndim: int, ndata: int):
    """Random-weight flagship-shaped likelihood (the census is a property of
    program structure, not of trained values — make_log_prob keeps
    weights/transforms out of the HLO via the _pure/_env split)."""
    import jax
    import jax.numpy as jnp

    from .. import likelihood as LK
    from .. import nn as N
    from .. import priors as PR
    from .. import transforms as T

    rng = np.random.default_rng(0)
    tx = np.asarray(rng.uniform(-1, 1, (64, ndim)), np.float32)
    ty = np.asarray(
        tx @ rng.standard_normal((ndim, ndata)) + 1.0, np.float32
    )
    sigma = np.ones(ndata)
    tset = T.TransformSet(
        T.fit_x_transform(tx),
        T.fit_y_transform(ty / sigma),
        T.YTransformData(jnp.asarray(sigma, jnp.float32)),
    )
    spec = N.make_model_spec("chto_v2", ndim, ndata)
    params = N.init_model(jax.random.key(0), spec)
    pack = PR.priors_from_list(
        [{"param": f"p{i}", "dist": "flat", "arg1": -2.0, "arg2": 2.0}
         for i in range(ndim)]
    )
    log_prob = LK.make_log_prob(
        spec, params, tset, pack, np.zeros(ndata), np.eye(ndata)
    )
    return spec, tset, log_prob


def sampler_collective_census(
    ndim: int = 27,
    ndata: int = 457,
    walkers: int = 256,
    nsteps: int = 8,
    methods=("emcee", "zeus", "hmc", "nuts"),
) -> dict:
    """Compile every sampler's walker-sharded chunk on the full device mesh
    and census its collectives.  The complementary-half all-gather
    (stretch/slicemove shard_over_walkers) is the only per-step cross-walker
    data motion — (walkers x ndim)-sized, independent of the data-vector
    width: the emulator output never crosses chips."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from ..samplers import hmc, slicemove, stretch

    spec, tset, log_prob = _census_problem(ndim, ndata)
    lp_fn, env = log_prob._pure, log_prob._env
    mesh = Mesh(np.asarray(jax.devices()), ("walkers",))
    x0 = jax.device_put(
        jax.random.normal(jax.random.key(1), (walkers, ndim), dtype="float32"),
        NamedSharding(mesh, P("walkers", None)),
    )

    chunks = {
        "emcee": (
            stretch.init_state, lambda st: stretch.stretch_chunk.lower(
                lp_fn, st, nsteps, 2.0, lp_env=env, mesh=mesh
            ),
        ),
        "zeus": (
            slicemove.init_slice_state, lambda st: slicemove.slice_chunk.lower(
                lp_fn, st, nsteps, 100, lp_env=env, mesh=mesh
            ),
        ),
        "hmc": (
            hmc.init_hmc_state, lambda st: hmc.hmc_chunk.lower(
                lp_fn, st, nsteps, 10, lp_env=env
            ),
        ),
        "nuts": (
            hmc.init_nuts_state, lambda st: hmc.nuts_chunk.lower(
                lp_fn, st, nsteps, 3, lp_env=env
            ),
        ),
    }
    out = {"n_devices": jax.device_count(), "walkers": walkers}
    for name in methods:
        init, lower = chunks[name]
        state = jax.jit(
            lambda k, x, e, _i=init: _i(k, x, lambda xx: lp_fn(xx, e))
        )(jax.random.key(2), x0, env)
        txt = lower(state).compile().as_text()
        out[name] = hlo_census_by_computation(txt)
    return out


def trainer_collective_census(
    k: int = 2,
    ndim: int = 8,
    ndata: int = 64,
    n_train: int = 2000,
    n_val: int = 200,
    batch: int = 250,
    epochs: int = 5,
) -> dict:
    """Compile the K-member training chunk on the ('ens','data') mesh and
    census its collective replica groups: the contract is exactly one
    collective kind — the per-member gradient all-reduce confined to each
    member's 'data' group — and zero collectives crossing 'ens' (so on K*d
    real chips members train independently, the activated form of the
    reference's scaffolded DDP, linna/predictor_gpu.py:264-267)."""
    import jax
    import jax.numpy as jnp

    from .. import losses as L
    from ..parallel.ensemble import EnsembleTrainer

    spec, tset, log_prob = _census_problem(ndim, ndata)
    rng = np.random.default_rng(0)
    tx = np.asarray(rng.uniform(-1, 1, (n_train, ndim)), np.float32)
    ty = np.asarray(tx @ rng.standard_normal((ndim, ndata)), np.float32)
    vx = np.asarray(rng.uniform(-1, 1, (n_val, ndim)), np.float32)
    vy = np.asarray(vx @ rng.standard_normal((ndim, ndata)), np.float32)
    loss_state = L.build_loss_state(
        np.zeros(ndata), np.eye(ndata), tset
    )
    with tempfile.TemporaryDirectory() as td:
        tr = EnsembleTrainer(
            spec, tset, loss_state,
            [f"{td}/m{m}" for m in range(k)], list(range(k)),
        )
        tr._batch_size = batch
        ekeys = jnp.stack([jax.random.key(m) for m in range(k)])
        txt = (
            type(tr)._epochs_members.lower(
                tr, tr.params, tr.opt_state, ekeys,
                jnp.asarray(tx), jnp.asarray(ty), jnp.asarray(vx),
                jnp.asarray(vy), epochs, tr.transforms, tr.loss_state,
            )
            .compile()
            .as_text()
        )
        groups = re.findall(
            r"replica_groups=(\[[\d,]+\]<=\[\d+\]|\{[^}]*\})", txt
        )
        ens, data = tr.mesh.shape["ens"], tr.mesh.shape["data"]
    # iota form [G,S]<=[N]: S consecutive devices per group; with the
    # ('ens','data') mesh built from devices.reshape(ens, data), groups of
    # size == data that tile consecutively are exactly per-member data groups
    cross = [g for g in groups if g != f"[{ens},{data}]<=[{ens * data}]"]
    return {
        "k": k,
        "mesh": {"ens": ens, "data": data},
        "collective_instructions": len(groups),
        "replica_groups": groups[:4],
        "cross_member_collectives": len(cross),
    }
