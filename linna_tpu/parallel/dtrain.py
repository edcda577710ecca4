"""Mesh-sharded training steps — **experimental / dryrun- and test-only**.

The reference scaffolded torch DDP data parallelism but never activated it
(reference linna/predictor_gpu.py:264-267,407-411; production calls pass
``pool=None, size=1`` — linna/util.py:1287).  Here the same capability is a
first-class jit: the batch is sharded over the 'data' mesh axis, parameters
and optimizer state are sharded over 'model' (tensor parallel) or replicated,
and GSPMD inserts the gradient all-reduce — the psum the reference would have
gotten from DDP's NCCL ring rides ICI instead.

Production status: the orchestrator's active multi-device trainer is
``parallel/ensemble.EnsembleTrainer`` (('ens','data') mesh — data-parallel
within a member, members independent); it covers everything the pipeline
needs because LINNA's emulators (≤ ~1000-wide trunks) fit on one chip with
orders of magnitude of headroom, so tensor-parallel weight sharding has no
production shape where it pays.  This module stays as the validated
sharding recipe for a future model size that needs it — it is compiled and
executed by ``__graft_entry__.dryrun_multichip`` and ``tests/test_parallel.py``
but is NOT reachable from ``ml_sampler_core``.
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh

from .. import losses as L
from .. import nn as N
from ..transforms import TransformSet
from .mesh import batch_sharding, param_shardings, replicated

__all__ = ["make_sharded_train_step", "make_sharded_epoch"]


def make_sharded_train_step(
    spec: N.ModelSpec,
    transforms: TransformSet,
    loss_state: L.LossState,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable:
    """Build ``step(params, opt_state, bx, by) -> (params, opt_state, loss)``
    jitted over ``mesh``: batch sharded on 'data', params/opt state sharded
    per :func:`linna_tpu.parallel.mesh.param_shardings`."""

    def loss_fn(params, bx, by):
        pred = N.apply_model(spec, params, transforms.x_transform(bx))
        return L.loss_fn(loss_state, transforms, pred, by)

    def step(params, opt_state, bx, by):
        loss, grads = jax.value_and_grad(loss_fn)(params, bx, by)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    bsh = batch_sharding(mesh)
    return jax.jit(
        step,
        in_shardings=(None, None, bsh, bsh),
        donate_argnums=(0, 1),
    )


def make_sharded_epoch(
    spec: N.ModelSpec,
    transforms: TransformSet,
    loss_state: L.LossState,
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
    batch_size: int,
) -> Callable:
    """Build a whole-epoch device program over the mesh (shuffle -> scanned
    minibatch AdamW steps -> full-batch validation), the sharded analogue of
    ``Trainer._epoch``.  Returns
    ``epoch(params, opt_state, key, train_x, train_y, val_x, val_y)
    -> (params, opt_state, batch_losses, val_metric)``."""

    def loss_fn(params, bx, by):
        pred = N.apply_model(spec, params, transforms.x_transform(bx))
        return L.loss_fn(loss_state, transforms, pred, by)

    def epoch(params, opt_state, key, train_x, train_y, val_x, val_y):
        n = train_x.shape[0]
        nb = max(n // batch_size, 1)
        perm = jax.random.permutation(key, n)[: nb * batch_size].reshape(
            nb, batch_size
        )

        def step(carry, idx):
            params, opt_state = carry
            bx = jax.lax.with_sharding_constraint(
                train_x[idx], batch_sharding(mesh)
            )
            by = jax.lax.with_sharding_constraint(
                train_y[idx], batch_sharding(mesh)
            )
            loss, grads = jax.value_and_grad(loss_fn)(params, bx, by)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return (params, opt_state), loss

        (params, opt_state), batch_losses = jax.lax.scan(
            step, (params, opt_state), perm
        )
        val_pred = N.apply_model(spec, params, transforms.x_transform(val_x))
        val_metric = L.val_metric_fn(loss_state, transforms, val_pred, val_y)
        return params, opt_state, batch_losses, val_metric

    bsh = batch_sharding(mesh)
    return jax.jit(
        epoch,
        in_shardings=(None, None, replicated(mesh), bsh, bsh, bsh, bsh),
        donate_argnums=(0, 1),
    )


def init_sharded(key, spec: N.ModelSpec, optimizer, mesh: Mesh):
    """Initialize params + optimizer state directly onto the mesh."""
    params = N.init_model(key, spec)
    params = jax.device_put(params, param_shardings(params, mesh))
    opt_state = jax.jit(optimizer.init)(params)
    return params, opt_state
