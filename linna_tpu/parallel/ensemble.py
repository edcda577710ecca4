"""Mesh-parallel ensemble-member training: all K emulators as ONE program.

The reference trains one emulator per call and scaffolded-but-never-activated
torch DDP for multi-device speed (reference linna/predictor_gpu.py:264-267,
407-411; production passes ``pool=None, size=1`` — linna/util.py:1287).  This
framework's flagship ``nensemble`` likelihood needs K independently seeded
emulators per iteration, which round 1 trained *serially* — K× the wall-clock
with most chips idle.  :class:`EnsembleTrainer` instead stacks the K members
along a leading axis and advances them together:

- the stacked parameters/optimizer state are sharded over the mesh's ``ens``
  axis (each member's weights live on its own device group);
- each member's minibatch is additionally sharded over the ``data`` axis
  (data parallelism *within* a member — the DDP analogue; GSPMD inserts the
  gradient all-reduce over ICI);
- the whole dispatch chunk (``epochs_per_dispatch`` epochs × minibatch scan ×
  validation) is one ``jit`` of a ``vmap`` over members.  The compiled HLO
  contains exactly one collective — the gradient all-reduce with
  replica_groups confined to each member's 'data' group, nothing crossing
  'ens' (measured: SCALING.json "hlo") — so on K×d chips the members run
  independently and the chunk's wall is ~one member on d chips plus the
  vmap packing overhead (measured on the real chip: TRAIN_BENCH.json);
- per-member PRNG streams, LR range tests, EarlyStopping and pathology
  recovery reproduce the serial :class:`linna_tpu.train.Trainer` exactly
  (shared :class:`linna_tpu.train.Supervisor` decision machine; per-member
  learning rates ride the vmapped ``optax.inject_hyperparams`` state), so
  checkpoints match the serial path to float tolerance;
- member 0 checkpoints into the iteration directory and members 1..K-1 into
  ``ens_k/``, identical artifact layout to the serial path (and to the
  reference's ``best.pth.tar`` contract, linna/nnutils.py:109-151).
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import NamedSharding, PartitionSpec as P

from .. import losses as L
from .. import nn as N
from ..train import (
    BATCH_UNROLL,
    BEST_CKPT,
    LAST_CKPT,
    DispatchSchedule,
    Supervisor,
    _make_optimizer,
    _tree_copy,
    smooth_and_pick_lr,
)
from ..transforms import TransformSet
from ..utils import checkpoint as ckpt
from ..utils import plots
from . import multihost as MH
from .mesh import make_ensemble_mesh, member_sharding, put_global_tree

__all__ = ["EnsembleTrainer"]


def _row(tree, m: int):
    """Member ``m``'s slice of a stacked pytree."""
    return jax.tree.map(lambda a: a[m], tree)


def _row_set(tree, m: int, row_tree):
    """Write a single-member pytree into row ``m`` of a stacked pytree."""
    return jax.tree.map(lambda a, r: a.at[m].set(r), tree, row_tree)


class EnsembleTrainer:
    """Train K ensemble members concurrently on a ('ens', 'data') mesh.

    ``outdirs[k]``/``seeds[k]`` give each member the same artifacts and PRNG
    stream it would get from a serial ``Trainer(..., outdir=outdirs[k],
    seed=seeds[k])`` run, so the two paths are interchangeable on disk.
    """

    # coarse disk-checkpoint cadence (see Trainer.save_every): each save
    # fetches params+best+opt (~45 MB at the DES shape) over the device
    # link and writes K npz files — far more than re-training the interval
    save_every = 200
    # maximum epochs per dispatch; DispatchSchedule caps the effective chunk
    # in the pathology-prone regime (see Trainer.epochs_per_dispatch)
    epochs_per_dispatch = 10
    # speculative double-buffer dispatch (see Trainer.speculative_dispatch)
    speculative_dispatch = True

    def __init__(
        self,
        spec: N.ModelSpec,
        transforms: TransformSet,
        loss_state: L.LossState,
        outdirs: Sequence[str],
        seeds: Sequence[int],
        mesh=None,
        compute_dtype: Optional[str] = None,
        linearmodel=None,
    ):
        assert len(outdirs) == len(seeds)
        self.spec = spec
        self.transforms = transforms
        self.loss_state = loss_state
        # opt-in mixed precision (see Trainer.compute_dtype)
        self.compute_dtype = compute_dtype
        # optional frozen additive pre-model shared by every member
        # (reference ChtoModelv2 ``linearmodel`` slot, linna/nn.py:104-108)
        if linearmodel is not None and spec.linear_bypass:
            # same contract as Trainer.__init__: apply_model ignores the
            # external pre-model for linear_bypass specs (reference
            # linna/nn.py:220-232) — reject the silent train/inference skew
            raise ValueError(
                "linearmodel cannot be combined with a linear_bypass model "
                "spec (the built-in 1e-3 bypass replaces the pre-model slot)"
            )
        self.linearmodel = linearmodel
        self.outdirs = [str(d) for d in outdirs]
        self.n_members = len(outdirs)
        self.mesh = mesh if mesh is not None else make_ensemble_mesh(self.n_members)
        # per-member host PRNG streams, split exactly like Trainer.__init__
        self.member_keys = [jax.random.key(int(s)) for s in seeds]
        k_inits = []
        for m in range(self.n_members):
            self.member_keys[m], k_init = jax.random.split(self.member_keys[m])
            k_inits.append(k_init)
        init_fn = jax.vmap(lambda k: N.init_model(k, spec))
        keys = jnp.stack(k_inits)
        if jax.process_count() == 1:
            # all member inits as ONE jitted device program placed straight
            # onto the mesh: the previous eager per-member init + host
            # restack paid dozens of per-op round trips and a full
            # params-sized device->host->device bounce (measured in
            # trace.json trainer_init_s — part of the 7.8 s/iteration
            # stacked-init + LR-sweep wall, VERDICT r3 item 6).  Bitwise
            # identical values: vmapped jax.random is elementwise in the key.
            shapes = jax.eval_shape(init_fn, keys)
            self.params = jax.jit(
                init_fn, out_shardings=member_sharding(self.mesh, shapes)
            )(keys)
        else:
            # pod path: the mesh spans processes, so the global array is
            # built from per-shard host callbacks (put_global); every host
            # computes the identical stacked init from the shared seeds
            stacked = jax.tree.map(
                lambda *xs: np.stack([np.asarray(x) for x in xs]),
                *[jax.tree.map(np.asarray, N.init_model(k, spec)) for k in k_inits],
            )
            self.params = put_global_tree(
                stacked, member_sharding(self.mesh, stacked)
            )
        self.optimizer = _make_optimizer(mu_dtype=compute_dtype)
        self.opt_state = jax.jit(jax.vmap(self.optimizer.init))(self.params)
        (
            self._jit_reset_opt, self._jit_load_row, self._jit_reinit_row,
        ) = self._jit_interventions()
        self.lr = np.full(self.n_members, 1e-4)
        self.wd = np.full(self.n_members, 1e-4)
        self.best_val_loss = np.full(self.n_members, np.inf)
        self._best_params_mem = None
        self._best_dirty = np.zeros(self.n_members, bool)
        self._last_disk_save = -(10**9)

    # ---------------------------------------------------------------- jitted

    # transforms/loss_state ride as ARGUMENTS of the jitted programs, not
    # closed-over constants: captured arrays embed as HLO literals, so each
    # run's fitted transforms would change the HLO bytes and defeat the
    # persistent compilation cache (~40 s recompile per iteration per fresh
    # run at the DES flagship shape; see Trainer._loss)
    def _member_loss(self, params, bx, by, tset, lstate):
        x = tset.x_transform(bx)
        x32 = x
        if self.compute_dtype is not None:
            cd = jnp.dtype(self.compute_dtype)
            params = jax.tree.map(lambda a: a.astype(cd), params)
            x = x.astype(cd)
        pred = N.apply_model(self.spec, params, x).astype(jnp.float32)
        if self.linearmodel is not None:
            pred = pred + self.linearmodel(x32)
        return L.loss_fn(lstate, tset, pred, by)

    @partial(jax.jit, static_argnums=(0, 8), donate_argnums=(1, 2))
    def _epochs_members(
        self, params, opt_state, ekeys, train_x, train_y, val_x, val_y, n_epochs,
        tset, lstate,
    ):
        """``n_epochs`` epochs for ALL members as one device program:
        vmap over the stacked member axis of the serial trainer's
        epoch-chunk (shuffle -> scanned minibatch AdamW steps -> validation
        -> on-device best tracking).  Minibatches are sharded over the
        'data' mesh axis inside each member lane."""
        bsh = NamedSharding(self.mesh, P("data", None))
        n = train_x.shape[0]
        bs = self._batch_size
        nb = max(n // bs, 1)

        def member(params, opt_state, key):
            def one_epoch(carry, ekey):
                params, opt_state, best_val, best_params = carry
                perm = jax.random.permutation(ekey, n)[: nb * bs].reshape(nb, bs)

                def step(c, idx):
                    p, s = c
                    bx = jax.lax.with_sharding_constraint(train_x[idx], bsh)
                    by = jax.lax.with_sharding_constraint(train_y[idx], bsh)
                    loss, grads = jax.value_and_grad(self._member_loss)(
                        p, bx, by, tset, lstate
                    )
                    updates, s = self.optimizer.update(grads, s, p)
                    return (optax.apply_updates(p, updates), s), loss

                (params, opt_state), batch_losses = jax.lax.scan(
                    step, (params, opt_state), perm, unroll=BATCH_UNROLL
                )
                val_pred = N.apply_model(self.spec, params, tset.x_transform(val_x))
                if self.linearmodel is not None:
                    val_pred = val_pred + self.linearmodel(tset.x_transform(val_x))
                val_metric = L.val_metric_fn(lstate, tset, val_pred, val_y)
                if self.spec.out_size <= 16:
                    centered = val_pred - jnp.mean(val_pred, axis=0)
                    denom = jnp.sqrt(jnp.mean(centered**2, axis=0)) + 1e-20
                    corr = (
                        (centered / denom).T @ (centered / denom)
                    ) / val_pred.shape[0]
                    min_eig = jnp.linalg.eigvalsh(corr)[0]
                else:
                    min_eig = jnp.asarray(1.0)
                improved = val_metric[0] < best_val
                best_val = jnp.where(improved, val_metric[0], best_val)
                best_params = jax.tree_util.tree_map(
                    lambda new, old: jnp.where(improved, new, old),
                    params,
                    best_params,
                )
                return (params, opt_state, best_val, best_params), (
                    batch_losses, val_metric, min_eig,
                )

            ekeys_e = jax.random.split(key, n_epochs)
            best0 = jnp.asarray(jnp.inf, jnp.float32)
            (params, opt_state, best_val, best_params), (losses, vms, eigs) = (
                jax.lax.scan(one_epoch, (params, opt_state, best0, params), ekeys_e)
            )
            return params, opt_state, losses, vms, eigs, best_val, best_params

        return jax.vmap(member)(params, opt_state, ekeys)

    @partial(jax.jit, static_argnums=(0, 6))
    def _lr_sweep_members(
        self, params, order, lrs, train_x, train_y, num_iter, tset, lstate
    ):
        """The LR range test for all members at once: one scanned sweep per
        member lane (same batch order and lr schedule as the serial
        ``lr_range_test``), returning raw loss traces f32[K, num_iter].
        Minibatches are sharded over the 'data' mesh axis like
        ``_epochs_members`` so the sweep follows the same sharding story."""
        bsh = NamedSharding(self.mesh, P("data", None))
        n = train_x.shape[0]
        bs = self._batch_size
        nb = max(n // bs, 1)

        def member(p):
            s = self.optimizer.init(p)

            def it_step(carry, xs):
                p, s = carry
                it, lr = xs
                b = jnp.mod(it, nb)
                idx = jax.lax.dynamic_slice(order, (b * bs,), (bs,))
                s = s._replace(
                    hyperparams={**s.hyperparams, "learning_rate": lr}
                )
                bx = jax.lax.with_sharding_constraint(train_x[idx], bsh)
                by = jax.lax.with_sharding_constraint(train_y[idx], bsh)
                loss, grads = jax.value_and_grad(self._member_loss)(
                    p, bx, by, tset, lstate
                )
                updates, s = self.optimizer.update(grads, s, p)
                return (optax.apply_updates(p, updates), s), loss

            (_, _), raw = jax.lax.scan(
                it_step, (p, s), (jnp.arange(num_iter), lrs)
            )
            return raw

        return jax.vmap(member)(params)

    # ------------------------------------------------------------------ host

    def _set_hypers(self) -> None:
        self.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            self.lr, jnp.float32
        )
        self.opt_state.hyperparams["weight_decay"] = jnp.asarray(
            self.wd, jnp.float32
        )

    # Interventions as single jitted programs.  The eager per-leaf forms
    # (tree.map of a[m] / a.at[m].set over ~40 leaves, plus an eager
    # optimizer.init) cost ~80 device dispatches per intervention — measured
    # ~1.5 s each over a tunneled link, and the DES iteration-0 T=4 regime
    # spike-reloads ~67 times per 1000 epochs (≈100 s of pure intervention
    # overhead in one training call).  One traced program per (member,
    # operation) collapses that to one dispatch (~0.1 s).
    def _jit_interventions(self):
        opt_init = self.optimizer.init
        spec = self.spec

        def reset_opt_impl(params, opt_state, m):
            fresh = opt_init(jax.tree.map(lambda a: a[m], params))
            return jax.tree.map(
                lambda a, r: a.at[m].set(r), opt_state, fresh
            )

        def load_row_impl(params, opt_state, best, m):
            row = jax.tree.map(lambda a: a[m], best)
            params = jax.tree.map(
                lambda a, r: a.at[m].set(r), params, row
            )
            return params, reset_opt_impl(params, opt_state, m)

        def reinit_row_impl(params, opt_state, key, m):
            fresh = N.init_model(key, spec)
            params = jax.tree.map(
                lambda a, r: a.at[m].set(r), params, fresh
            )
            return params, reset_opt_impl(params, opt_state, m)

        return (
            jax.jit(reset_opt_impl, static_argnums=2),
            jax.jit(load_row_impl, static_argnums=3),
            jax.jit(reinit_row_impl, static_argnums=3),
        )

    def _reset_member_optimizer(self, m: int) -> None:
        self.opt_state = self._jit_reset_opt(self.params, self.opt_state, m)

    def _reinit_member(self, m: int) -> None:
        self.member_keys[m], k = jax.random.split(self.member_keys[m])
        self.params, self.opt_state = self._jit_reinit_row(
            self.params, self.opt_state, k, m
        )

    def _load_best_member(self, m: int) -> bool:
        """Member analogue of ``Trainer.load_best``: in-memory best first,
        then the member's ``best.ckpt.npz``."""
        if self._best_params_mem is not None and np.isfinite(self.best_val_loss[m]):
            # one jitted program: row copy + member optimizer re-init (the
            # caller's _reset_member_optimizer then finds fresh state; kept
            # idempotent because opt re-init is deterministic)
            self.params, self.opt_state = self._jit_load_row(
                self.params, self.opt_state, self._best_params_mem, m
            )
            return True
        path = os.path.join(self.outdirs[m], BEST_CKPT)

        # file-derived state: the PRIMARY reads; the raw payload ships
        # bit-exactly to every pod host (same convention as _auto_lr and the
        # sampler resume loaders), so a non-primary host with a lagging
        # shared-filesystem view can neither take a different exists-branch
        # (reinit vs reload -> divergent SPMD programs) nor load different
        # bytes than the primary
        def _read():
            if not ckpt.checkpoint_exists(path):
                return None
            arrays, meta = ckpt.read_checkpoint_raw(path)
            return (
                {k: v for k, v in arrays.items() if k.startswith("params/")},
                meta,
            )

        payload = MH.broadcast_from_primary(_read)
        if payload is None:
            return False
        arrays, meta = payload
        row = ckpt.params_from_raw(_row(self.params, m), arrays)
        self.params = _row_set(self.params, m, row)
        self.best_val_loss[m] = float(
            meta.get("best_val_loss", self.best_val_loss[m])
        )
        return True

    def _auto_lr(self, train_x, train_y, num_iter: int = 100) -> np.ndarray:
        """Per-member LR range test with per-member ``lr.npy`` persistence
        (reference linna/predictor_gpu.py:222-246)."""
        # the have/missing split decides whether the collective LR sweep is
        # dispatched — the PRIMARY loads the per-member values (NaN =
        # missing) and they ship bit-exactly to every pod host, so all hosts
        # take the same branch with the same numbers and a non-primary host
        # with a lagging or torn shared-filesystem view neither skips a
        # sweep the others join nor crashes reading a file the primary just
        # wrote (it never opens the files at all)
        def _load_lrs():
            vals = np.full(self.n_members, np.nan)
            for m, d in enumerate(self.outdirs):
                path = os.path.join(d, "lr.npy")
                if os.path.isfile(path):
                    vals[m] = float(np.load(path))
            return vals

        lr_out = np.asarray(MH.broadcast_from_primary(_load_lrs))
        missing = [m for m in range(self.n_members) if not np.isfinite(lr_out[m])]
        if not missing:
            return lr_out
        lrs = np.geomspace(1e-4, 5e-3, num_iter)
        order = np.random.default_rng(1234).permutation(int(train_x.shape[0]))
        raw = MH.fetch(
            self._lr_sweep_members(
                self.params,
                jnp.asarray(order),
                jnp.asarray(lrs, jnp.float32),
                train_x,
                train_y,
                num_iter,
                self.transforms,
                self.loss_state,
            )
        )
        for m in missing:
            lr, losses, lrs_used = smooth_and_pick_lr(lrs, raw[m])
            lr_out[m] = lr
            if MH.is_primary():
                os.makedirs(self.outdirs[m], exist_ok=True)
                np.save(os.path.join(self.outdirs[m], "lr.npy"), lr)
                plots.plot_lr_range(
                    lrs_used, losses, os.path.join(self.outdirs[m], "lr_tunning.png")
                )
        return lr_out

    def _save(self, epoch: int, force: bool = False) -> None:
        if not force and epoch - self._last_disk_save < self.save_every:
            return
        # Periodic saves write ONLY dirty best.ckpts (see Trainer._save:
        # last.ckpt + optimizer state are never read back and ride the final
        # forced save only).  The dirty check precedes the fetch, so a
        # no-improvement interval costs zero device->host traffic.  All
        # hosts share identical _best_dirty (it derives from the fetched
        # chunk metrics), so the fetch below stays a collective everyone
        # joins.
        if not force and not self._best_dirty.any():
            return
        self._last_disk_save = epoch
        # fetch is a collective on a multi-process mesh (member rows live on
        # other hosts' devices) — every host calls it; only the primary
        # writes.  One batched fetch: per-tree sequential fetches pay a
        # device->host round trip per leaf (~100 leaves across the three
        # trees — seconds per save on a tunneled device).
        opt = self.opt_state if force else None
        params_h, best_h, opt_h = MH.fetch(
            (self.params if force else None, self._best_params_mem, opt)
        )
        # clear the dirty flags on EVERY host, not just the writer: the
        # dirty-any gate above decides whether the next periodic save joins
        # the fetch collective, so a primary-only clear would deadlock the
        # pod (primary skips, the others wait in allgather — caught by
        # tests/test_multihost_2proc.py)
        dirty = self._best_dirty.copy()
        self._best_dirty[:] = False
        if not MH.is_primary():
            return
        for m, d in enumerate(self.outdirs):
            meta = {
                "epoch": epoch,
                "best_val_loss": float(self.best_val_loss[m]),
                "lr": float(self.lr[m]),
            }
            opt_m = _row(opt_h, m) if opt_h is not None else None
            if force:
                ckpt.save_checkpoint(
                    os.path.join(d, LAST_CKPT),
                    jax.tree.map(lambda a: a[m], params_h),
                    opt_m,
                    meta,
                )
            if best_h is not None and dirty[m]:
                ckpt.save_checkpoint(
                    os.path.join(d, BEST_CKPT),
                    jax.tree.map(lambda a: a[m], best_h),
                    opt_m,
                    meta,
                )

    def train(
        self,
        train_x: np.ndarray,
        train_y: np.ndarray,
        val_x: np.ndarray,
        val_y: np.ndarray,
        num_epochs: int,
        batch_size: int,
        initfrombest: bool = True,
        auto_lr: bool = True,
        lr_scale: float = 1.0,
        epochs_per_dispatch: Optional[int] = None,
        verbose: bool = False,
    ) -> Tuple[list, list]:
        """Run the supervised loop for every member; returns per-member
        (train_losses, val_metrics) lists mirroring ``Trainer.train``."""
        train_x = jnp.asarray(train_x, jnp.float32)
        train_y = jnp.asarray(train_y, jnp.float32)
        val_x = jnp.asarray(val_x, jnp.float32)
        val_y = jnp.asarray(val_y, jnp.float32)
        self._batch_size = min(int(batch_size), int(train_x.shape[0]))
        if epochs_per_dispatch is not None:
            self.epochs_per_dispatch = max(int(epochs_per_dispatch), 1)
        if MH.is_primary():
            for d in self.outdirs:
                os.makedirs(d, exist_ok=True)

        # wall-time breakdown of this call (read by train_emulator into
        # trace.json; same keys as Trainer.train)
        ps = self.phase_seconds = {
            "auto_lr": 0.0, "dispatch": 0.0, "wait_fetch": 0.0,
            "supervisor": 0.0, "save": 0.0, "plot": 0.0,
        }
        if auto_lr:
            t0 = time.perf_counter()
            self.lr = self._auto_lr(train_x, train_y)
            ps["auto_lr"] += time.perf_counter() - t0
        self.lr = self.lr * lr_scale
        if initfrombest:
            for m in range(self.n_members):
                self._load_best_member(m)
        self.opt_state = jax.jit(jax.vmap(self.optimizer.init))(self.params)
        self._set_hypers()

        sups = [
            Supervisor(self.lr[m], self.wd[m], verbose=verbose, tag=f"member{m}")
            for m in range(self.n_members)
        ]
        for m in range(self.n_members):
            sups[m].best_val_loss = float(self.best_val_loss[m])
        train_losses: List[List[float]] = [[] for _ in range(self.n_members)]
        val_metrics: List[List[np.ndarray]] = [[] for _ in range(self.n_members)]
        i = 0
        last_plot = 0
        nb = 1
        sched = DispatchSchedule(self.epochs_per_dispatch)

        def _dispatch(k):
            ekeys = []
            for m in range(self.n_members):
                self.member_keys[m], ek = jax.random.split(self.member_keys[m])
                ekeys.append(ek)
            return self._epochs_members(
                self.params, self.opt_state, jnp.stack(ekeys),
                train_x, train_y, val_x, val_y, k,
                self.transforms, self.loss_state,
            )

        pending = None  # speculatively dispatched next chunk: (k, outputs)
        while i < num_epochs and not all(s.stopped for s in sups):
            if pending is None:
                k = sched.k_at(i, num_epochs)
                t0 = time.perf_counter()
                outs = _dispatch(k)
                ps["dispatch"] += time.perf_counter() - t0
            else:
                k, outs = pending
                pending = None
            (
                new_params, new_opt, losses_k, vms_k, eigs_k,
                chunk_best_val, chunk_best_params,
            ) = outs

            # speculative double-buffer (see Trainer.train): chunk k+1 runs
            # on device while every host fetches and processes chunk k.  All
            # hosts take identical accept/discard branches — the decisions
            # derive from the MH.fetch'd (identical) metrics — so the
            # speculative collective program stays SPMD-aligned.
            k2 = sched.k_at(i + k, num_epochs, quiet=sched.quiet + 1)
            outs2 = None
            # speculate only after a quiet chunk (see Trainer.train): in
            # chronically spiky phases nearly every speculative chunk would
            # be discarded — wasted device work
            if k2 > 0 and self.speculative_dispatch and sched.quiet >= 1:
                t0 = time.perf_counter()
                prev_params, prev_opt = _tree_copy((new_params, new_opt))
                self.params, self.opt_state = new_params, new_opt
                outs2 = _dispatch(k2)
                self.params, self.opt_state = prev_params, prev_opt
                ps["dispatch"] += time.perf_counter() - t0
            else:
                self.params, self.opt_state = new_params, new_opt

            # fetch: identical host values on every process (collective when
            # member rows are sharded across hosts) — the Supervisor decisions
            # below must match on all hosts for SPMD dispatch to stay aligned.
            # One batched fetch for all four values: one round trip, not four.
            t1 = time.perf_counter()
            losses_k, vms_k, eigs_k, cbv = MH.fetch(
                (losses_k, vms_k, eigs_k, chunk_best_val)
            )
            ps["wait_fetch"] += time.perf_counter() - t1
            vms_k = vms_k.astype(np.float64)  # [K, k, 3]
            nb = losses_k.shape[-1]  # losses_k: [K, k, nb]
            cbv = cbv.astype(np.float64)  # [K]

            improved = np.array(
                [sups[m].observe_chunk_best(float(cbv[m])) for m in range(self.n_members)]
            )
            if improved.any():
                self.best_val_loss = np.array([s.best_val_loss for s in sups])
                if self._best_params_mem is None:
                    self._best_params_mem = chunk_best_params
                else:
                    mask = jnp.asarray(improved)
                    self._best_params_mem = jax.tree.map(
                        lambda new, old: jnp.where(
                            mask.reshape((-1,) + (1,) * (new.ndim - 1)), new, old
                        ),
                        chunk_best_params,
                        self._best_params_mem,
                    )
                self._best_dirty |= improved

            # host supervisors: same decision machine as the serial Trainer,
            # one per member; params-replacing interventions write into the
            # member's row of the stacked state
            t0 = time.perf_counter()
            intervened = [False] * self.n_members
            hyper_changed = False
            for j in range(k):
                for m in range(self.n_members):
                    batch_losses = losses_k[m, j]
                    train_losses[m].extend(batch_losses.tolist())
                    loss = float(batch_losses[-1])
                    vm = vms_k[m, j]
                    val_metrics[m].append(vm)
                    action = sups[m].step(
                        i + j, vm, loss, float(eigs_k[m, j]), suppressed=intervened[m]
                    )
                    if action == "reinit":
                        self.lr[m] = sups[m].lr
                        self._reinit_member(m)
                        hyper_changed = True
                        intervened[m] = True
                    elif action == "reload":
                        self.lr[m] = sups[m].lr
                        if not self._load_best_member(m):
                            self.member_keys[m], kk = jax.random.split(
                                self.member_keys[m]
                            )
                            self.params = _row_set(
                                self.params, m, N.init_model(kk, self.spec)
                            )
                        self._reset_member_optimizer(m)
                        hyper_changed = True
                        intervened[m] = True
                    elif action == "hyper":
                        self.lr[m], self.wd[m] = sups[m].lr, sups[m].wd
                        hyper_changed = True
            if hyper_changed:
                self._set_hypers()
            ps["supervisor"] += time.perf_counter() - t0
            any_intervened = any(intervened)
            sched.observe(any_intervened)
            if outs2 is not None and not (
                any_intervened
                or hyper_changed
                or all(s.stopped for s in sups)
            ):
                pending = (k2, outs2)
            # else: speculative chunk dropped (ran from superseded member
            # rows or hypers); self.params/opt hold the corrected
            # restore-point state

            i += k
            t0 = time.perf_counter()
            self._save(i - 1)
            ps["save"] += time.perf_counter() - t0
            # coarse plot cadence: each matplotlib render is ~0.5-1 s of
            # host time serial with training (K figures per refresh); the
            # final trainniing.png is always written below
            if last_plot == 0 or i - last_plot >= 500:
                last_plot = i
                if MH.is_primary():
                    t0 = time.perf_counter()
                    for m, d in enumerate(self.outdirs):
                        plots.plot_training_progress(
                            train_losses[m],
                            val_metrics[m],
                            os.path.join(d, "training_progress.png"),
                            batches_per_epoch=max(nb, 1),
                        )
                    ps["plot"] += time.perf_counter() - t0

        self.epochs_run = i
        t0 = time.perf_counter()
        self._save(num_epochs - 1, force=True)
        ps["save"] += time.perf_counter() - t0
        if MH.is_primary():
            t0 = time.perf_counter()
            for m, d in enumerate(self.outdirs):
                plots.plot_training_progress(
                    train_losses[m],
                    val_metrics[m],
                    os.path.join(d, "trainniing.png"),
                    batches_per_epoch=max(nb, 1),
                )
            ps["plot"] += time.perf_counter() - t0
        return train_losses, val_metrics
