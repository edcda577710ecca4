"""Mesh construction and sharding rules for the emulator.

TPU-native replacement for the reference's process-level parallelism
(reference linna/util.py:100-289 MPI pools; linna/predictor_gpu.py:264-267
DDP): one 2-D logical mesh ``('data', 'model')`` over the chip array.

Sharding rules (Megatron-style column/row alternation over the trunk):

- ``layer1``: column-parallel — weight (in, h) split on the output (hidden)
  dim, bias sharded to match;
- residual blocks: ``lin1`` row-parallel (hidden input dim split, partial
  sums all-reduced by GSPMD), ``lin2`` and the skip projection
  column-parallel on the block's output width;
- ``layer6``: row-parallel (consumes the model-sharded trunk);
- ``layer7``/``layer8``: replicated (output dim is the physical data vector,
  usually small relative to the trunk and consumed by the loss everywhere).

These are *annotations*, not a hand-written comm schedule: XLA GSPMD
propagates them through the forward/backward graph and inserts the
all-reduces/all-gathers on ICI.
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "make_mesh",
    "make_ensemble_mesh",
    "member_sharding",
    "param_shardings",
    "shard_params",
    "batch_sharding",
    "replicated",
    "put_global",
]


def put_global(x, sharding: NamedSharding):
    """Place a host array onto a (possibly multi-process) sharding.

    ``jax.device_put`` requires addressable devices; on a pod the mesh spans
    processes, so the array is built from per-shard callbacks instead — each
    process materializes only its addressable shards.  Every process must
    hold the same ``x`` (SPMD: they do, by construction)."""
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def put_global_tree(tree, shardings):
    """Pytree version of :func:`put_global`."""
    return jax.tree.map(put_global, tree, shardings)


def make_ensemble_mesh(n_members: int, devices: Optional[Sequence] = None) -> Mesh:
    """('ens', 'data') mesh for stacked ensemble-member training: the member
    axis is sized ``gcd(n_members, n_devices)`` so the stacked member
    dimension shards evenly, and the remaining devices form the
    data-parallel axis used for intra-member batch sharding.

    Examples on 8 devices: K=4 -> ('ens': 4, 'data': 2) — each member on its
    own 2-chip data-parallel group; K=1 -> ('ens': 1, 'data': 8) — pure data
    parallelism (the DDP the reference scaffolded but never activated,
    linna/predictor_gpu.py:264-267)."""
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    ens = math.gcd(int(n_members), n)
    return Mesh(devices.reshape(ens, n // ens), ("ens", "data"))


def member_sharding(mesh: Mesh, tree):
    """NamedSharding pytree putting every stacked leaf's leading (member)
    axis on 'ens' and replicating the rest."""
    return jax.tree.map(
        lambda leaf: NamedSharding(mesh, P("ens", *([None] * (leaf.ndim - 1)))),
        tree,
    )


def make_mesh(
    devices: Optional[Sequence] = None,
    n_model: Optional[int] = None,
    axis_names=("data", "model"),
) -> Mesh:
    """Build a ('data', 'model') mesh over ``devices`` (default: all).

    ``n_model`` — size of the tensor-parallel axis; default 1 (pure data
    parallel), the right choice for the production emulator whose trunk
    (<=1000 wide) fits comfortably in one core's VMEM.
    """
    if devices is None:
        devices = jax.devices()
    devices = np.asarray(devices)
    n = devices.size
    if n_model is None:
        n_model = 1
    if n % n_model != 0:
        raise ValueError(f"{n} devices not divisible by n_model={n_model}")
    grid = devices.reshape(n // n_model, n_model)
    return Mesh(grid, axis_names)


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharding(mesh: Mesh, also_model: bool = False) -> NamedSharding:
    """Shard a (batch, feature) array's batch dim over 'data' (optionally over
    the flattened ('data','model') axes, for pure-dp workloads like walker
    ensembles that should use every chip)."""
    spec = P(("data", "model"), None) if also_model else P("data", None)
    return NamedSharding(mesh, spec)


def _linear_sharding(mesh, kind: str):
    """kind: 'col' shards the output dim, 'row' shards the input dim,
    'rep' replicates."""
    if kind == "col":
        return {"w": NamedSharding(mesh, P(None, "model")),
                "b": NamedSharding(mesh, P("model"))}
    if kind == "row":
        return {"w": NamedSharding(mesh, P("model", None)),
                "b": NamedSharding(mesh, P())}
    return {"w": NamedSharding(mesh, P()), "b": NamedSharding(mesh, P())}


def param_shardings(params, mesh: Mesh):
    """NamedSharding pytree matching an emulator param dict
    (:func:`linna_tpu.nn.init_model`)."""
    out = {}
    for name, p in params.items():
        if name == "layer1":
            out[name] = _linear_sharding(mesh, "col")
        elif name.startswith("rb"):
            out[name] = {
                "lin1": _linear_sharding(mesh, "row"),
                "lin2": _linear_sharding(mesh, "col"),
                "skip_w": NamedSharding(mesh, P(None, "model")),
            }
        elif name == "layer6":
            out[name] = _linear_sharding(mesh, "row")
        else:  # layer7, layer8, linear_bypass: replicated
            out[name] = {k: NamedSharding(mesh, P()) for k in p}
        # drop bias entries that don't exist (bias-free linears)
        if isinstance(p, dict):
            out[name] = {k: v for k, v in out[name].items() if k in p}
    return out


def shard_params(params, mesh: Mesh):
    """Place an emulator param dict onto the mesh per :func:`param_shardings`."""
    return jax.device_put(params, param_shardings(params, mesh))
