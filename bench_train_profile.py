"""Where does the training step's time go? (round-3 follow-up to
TRAIN_BENCH.json: measured 3.1 ms/step bf16 K=2 at the flagship shape vs a
~0.1-0.2 ms HBM roofline -> 15-30x headroom somewhere.)

Times progressively stripped variants of the epoch program on the real
chip, all as ONE jitted dispatch over EPOCHS epochs so the ~20 ms tunnel
RTT amortizes away:

  full        : the production chunk (shuffle -> scanned AdamW steps -> val)
  no_val      : same minus the per-epoch validation forward/metric
  no_opt      : scanned fwd+bwd only (grads summed; no optimizer update)
  fwd_only    : scanned forward + loss only (no backward)
  carry_only  : scan over the same (params, opt_state) carries doing one
                trivial elementwise op -- isolates while-loop/carry overhead
  megabatch   : the whole epoch's FLOPs as ONE fwd+bwd over all rows --
                the XLA large-batch ceiling (batch-parallel upper bound)

Prints one JSON line; writes TRAIN_PROFILE.json.
"""

from __future__ import annotations

import json
import time
from functools import partial

import numpy as np

NDIM, NDATA = 27, 457
N_TRAIN, N_VAL = 40_000, 2_000
BATCH = 500
EPOCHS = 30
K = 2


def main(compute_dtype="bfloat16", ndim=NDIM, ndata=NDATA, out_file="TRAIN_PROFILE.json"):
    import jax

    from linna_tpu.orchestrator import _enable_compile_cache

    _enable_compile_cache()
    import jax.numpy as jnp
    import optax

    from linna_tpu import losses as L
    from linna_tpu import nn as N
    from linna_tpu import transforms as T
    from linna_tpu.train import _make_optimizer

    NDIM, NDATA = int(ndim), int(ndata)  # shape override (LSST: 40/1560)
    rng = np.random.default_rng(0)
    w = rng.standard_normal((NDIM, NDATA)) / np.sqrt(NDIM)
    tx = np.asarray(rng.uniform(-1, 1, (N_TRAIN, NDIM)), np.float32)
    ty = np.asarray(tx @ w, np.float32)
    vx = np.asarray(rng.uniform(-1, 1, (N_VAL, NDIM)), np.float32)
    vy = np.asarray(vx @ w, np.float32)
    xt = T.fit_x_transform(tx, None)
    yt = T.fit_y_transform(ty, ypositive=False)
    tx, ty, vx, vy = (jnp.asarray(a) for a in (tx, ty, vx, vy))
    tset = T.TransformSet(xt, yt, T.YTransformData(jnp.ones(NDATA, jnp.float32)))
    loss_state = L.build_loss_state(np.zeros(NDATA), np.eye(NDATA), tset)
    spec = N.make_model_spec("chto_v2", NDIM, NDATA)

    optimizer = _make_optimizer()
    keys = jax.random.split(jax.random.key(0), K)
    params = jax.vmap(lambda k: N.init_model(k, spec))(keys)
    opt_state = jax.jit(jax.vmap(optimizer.init))(params)

    def member_loss(p, bx, by):
        x = tset.x_transform(bx)
        if compute_dtype is not None:
            cd = jnp.dtype(compute_dtype)
            p = jax.tree.map(lambda a: a.astype(cd), p)
            x = x.astype(cd)
        pred = N.apply_model(spec, p, x).astype(jnp.float32)
        return L.loss_fn(loss_state, tset, pred, by)

    n = tx.shape[0]
    nb = n // BATCH

    # data rides as ARGUMENTS, not closure captures: captured arrays embed
    # as HLO literals and the LSST-shape train set (40000 x 1560 f32 ~250 MB)
    # blows past the remote-compile request limit (HTTP 413)
    def epochs_program(params, opt_state, key, tx, ty, vx, vy, *, do_val, do_opt, do_bwd):
        def one_epoch(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, n)[: nb * BATCH].reshape(nb, BATCH)

            def step(c, idx):
                p, s = c
                if not do_bwd:
                    return (p, s), member_loss(p, tx[idx], ty[idx])
                loss, grads = jax.value_and_grad(member_loss)(p, tx[idx], ty[idx])
                if not do_opt:
                    # consume the grads without an update
                    gsum = sum(jnp.sum(g) for g in jax.tree.leaves(grads))
                    return (p, s), loss + 0.0 * gsum
                updates, s = optimizer.update(grads, s, p)
                return (optax.apply_updates(p, updates), s), loss

            (params, opt_state), batch_losses = jax.lax.scan(
                step, (params, opt_state), perm
            )
            if do_val:
                val_pred = N.apply_model(spec, params, tset.x_transform(vx))
                vm = L.val_metric_fn(loss_state, tset, val_pred, vy)
            else:
                vm = jnp.zeros(3, jnp.float32)
            return (params, opt_state), (batch_losses, vm)

        ekeys = jax.random.split(key, EPOCHS)
        return jax.lax.scan(one_epoch, (params, opt_state), ekeys)

    def carry_only(params, opt_state, key, tx, ty, vx, vy):
        def one_epoch(carry, ekey):
            params, opt_state = carry

            def step(c, idx):
                p, s = c
                p = jax.tree.map(lambda a: a + jnp.float32(0) * idx[0], p)
                return (p, s), jnp.float32(0)

            perm = jax.random.permutation(ekey, n)[: nb * BATCH].reshape(nb, BATCH)
            (params, opt_state), _ = jax.lax.scan(step, (params, opt_state), perm)
            return (params, opt_state), jnp.float32(0)

        ekeys = jax.random.split(key, EPOCHS)
        return jax.lax.scan(one_epoch, (params, opt_state), ekeys)

    def megabatch(params, key, tx, ty):
        def one_epoch(carry, ekey):
            p = carry
            loss, grads = jax.value_and_grad(member_loss)(p, tx, ty)
            p = jax.tree.map(lambda a, g: a - 1e-12 * g.astype(a.dtype), p, grads)
            return p, loss

        ekeys = jax.random.split(key, EPOCHS)
        return jax.lax.scan(one_epoch, params, ekeys)

    # ---- round-4 carry-slimming candidates (VERDICT r3 item 6): the same
    # full epoch program with (a) the inner minibatch scan unrolled, (b) the
    # production best-params tracking added (to price what _epochs_tracked
    # actually pays), and (c) best tracking via epoch-index select instead of
    # a full-tree where per epoch.
    def epochs_unroll(params, opt_state, key, tx, ty, vx, vy, *, unroll):
        def one_epoch(carry, ekey):
            params, opt_state = carry
            perm = jax.random.permutation(ekey, n)[: nb * BATCH].reshape(nb, BATCH)

            def step(c, idx):
                p, s = c
                loss, grads = jax.value_and_grad(member_loss)(p, tx[idx], ty[idx])
                updates, s = optimizer.update(grads, s, p)
                return (optax.apply_updates(p, updates), s), loss

            (params, opt_state), batch_losses = jax.lax.scan(
                step, (params, opt_state), perm, unroll=unroll
            )
            val_pred = N.apply_model(spec, params, tset.x_transform(vx))
            vm = L.val_metric_fn(loss_state, tset, val_pred, vy)
            return (params, opt_state), (batch_losses, vm)

        ekeys = jax.random.split(key, EPOCHS)
        return jax.lax.scan(one_epoch, (params, opt_state), ekeys)

    def epochs_besttrack(params, opt_state, key, tx, ty, vx, vy):
        """The PRODUCTION epoch carry (train.py _epochs_tracked): best-val
        params tracked on device via a full-tree where per epoch."""
        def one_epoch(carry, ekey):
            params, opt_state, best_val, best_params = carry
            perm = jax.random.permutation(ekey, n)[: nb * BATCH].reshape(nb, BATCH)

            def step(c, idx):
                p, s = c
                loss, grads = jax.value_and_grad(member_loss)(p, tx[idx], ty[idx])
                updates, s = optimizer.update(grads, s, p)
                return (optax.apply_updates(p, updates), s), loss

            (params, opt_state), batch_losses = jax.lax.scan(
                step, (params, opt_state), perm
            )
            val_pred = N.apply_model(spec, params, tset.x_transform(vx))
            vm = L.val_metric_fn(loss_state, tset, val_pred, vy)
            improved = vm[0] < best_val
            best_val = jnp.where(improved, vm[0], best_val)
            best_params = jax.tree.map(
                lambda new, old: jnp.where(improved, new, old), params, best_params
            )
            return (params, opt_state, best_val, best_params), (batch_losses, vm)

        ekeys = jax.random.split(key, EPOCHS)
        best0 = jnp.asarray(jnp.inf, jnp.float32)
        return jax.lax.scan(
            one_epoch, (params, opt_state, best0, params), ekeys
        )

    def epochs_bestidx(params, opt_state, key, tx, ty, vx, vy):
        """Best tracking with a SLIM carry: only (best_val, best_epoch) ride
        the epoch scan; the chunk's best params are reconstructed AFTER the
        scan by replaying the winning epoch's updates?  No — cheaper: keep
        the full-tree select but OUTSIDE the scan is impossible (params are
        sequential), so this variant instead selects per epoch only when the
        epoch index advances the best, implemented identically but with the
        select fused into the carry write (measures whether the tree_map
        where actually costs anything beyond the carry copy)."""
        def one_epoch(carry, ekey):
            params, opt_state, best_val, best_epoch, ep = carry
            perm = jax.random.permutation(ekey, n)[: nb * BATCH].reshape(nb, BATCH)

            def step(c, idx):
                p, s = c
                loss, grads = jax.value_and_grad(member_loss)(p, tx[idx], ty[idx])
                updates, s = optimizer.update(grads, s, p)
                return (optax.apply_updates(p, updates), s), loss

            (params, opt_state), batch_losses = jax.lax.scan(
                step, (params, opt_state), perm
            )
            val_pred = N.apply_model(spec, params, tset.x_transform(vx))
            vm = L.val_metric_fn(loss_state, tset, val_pred, vy)
            improved = vm[0] < best_val
            best_val = jnp.where(improved, vm[0], best_val)
            best_epoch = jnp.where(improved, ep, best_epoch)
            return (params, opt_state, best_val, best_epoch, ep + 1), (
                batch_losses, vm,
            )

        ekeys = jax.random.split(key, EPOCHS)
        best0 = jnp.asarray(jnp.inf, jnp.float32)
        z = jnp.asarray(0, jnp.int32)
        return jax.lax.scan(
            one_epoch, (params, opt_state, best0, z, z), ekeys
        )

    variants = {
        "full": partial(epochs_program, do_val=True, do_opt=True, do_bwd=True),
        "no_val": partial(epochs_program, do_val=False, do_opt=True, do_bwd=True),
        "no_opt": partial(epochs_program, do_val=False, do_opt=False, do_bwd=True),
        "fwd_only": partial(epochs_program, do_val=False, do_opt=False, do_bwd=False),
        "full_unroll2": partial(epochs_unroll, unroll=2),
        "full_unroll4": partial(epochs_unroll, unroll=4),
        "full_besttrack": epochs_besttrack,
        "full_bestidx": epochs_bestidx,
    }

    out = {}
    key = jax.random.key(1)

    def timeit(fn, *args):
        r = fn(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = fn(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / EPOCHS

    for name, fn in variants.items():
        vf = jax.jit(jax.vmap(fn, in_axes=(0, 0, None, None, None, None, None)))
        s = timeit(vf, params, opt_state, key, tx, ty, vx, vy)
        out[name] = round(s * 1e3, 2)
        print(f"{name}: {s * 1e3:.2f} ms/epoch", flush=True)

    s = timeit(
        jax.jit(jax.vmap(carry_only, in_axes=(0, 0, None, None, None, None, None))),
        params, opt_state, key, tx, ty, vx, vy,
    )
    out["carry_only"] = round(s * 1e3, 2)
    print(f"carry_only: {s * 1e3:.2f} ms/epoch", flush=True)

    s = timeit(
        jax.jit(jax.vmap(megabatch, in_axes=(0, None, None, None))),
        params, key, tx, ty,
    )
    out["megabatch"] = round(s * 1e3, 2)
    print(f"megabatch: {s * 1e3:.2f} ms/epoch", flush=True)

    result = {
        "metric": "train_step_profile",
        "unit": "ms/epoch",
        "compute_dtype": str(compute_dtype),
        "shape": {"ndim": NDIM, "ndata": NDATA, "n_train": N_TRAIN,
                  "batch": BATCH, "k": K, "epochs_timed": EPOCHS},
        "platform": jax.devices()[0].platform,
        **out,
    }
    with open(out_file, "w") as f:
        json.dump(result, f, indent=1)
    print(json.dumps(result))


if __name__ == "__main__":
    import sys

    # CLI: [f32] [ndim=D] [ndata=N] [out=FILE.json] — shape overrides let the
    # same probe ladder run at any analysis class (LSST: ndim=40 ndata=1560)
    kv = dict(a.split("=", 1) for a in sys.argv[1:] if "=" in a)
    main(
        None if "f32" in sys.argv else "bfloat16",
        ndim=int(kv.get("ndim", NDIM)),
        ndata=int(kv.get("ndata", NDATA)),
        out_file=kv.get("out", "TRAIN_PROFILE.json"),
    )
