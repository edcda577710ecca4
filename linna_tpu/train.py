"""Emulator trainer: jit-compiled epoch loop + host-side training supervisor.

Design: the compute-heavy path (shuffle -> minibatch AdamW steps -> full-batch
validation) is ONE jitted function per epoch, with the minibatch loop as a
``lax.scan`` so the whole epoch is a single device program (reference does a
Python DataLoader loop per batch: linna/predictor_gpu.py:268-312).  Around it
runs a host supervisor that reproduces the reference's robustness machinery:

- automatic LR range test picking the steepest-descent learning rate
  (linna/predictor_gpu.py:222-246, torch_lr_finder semantics: exponential
  sweep 1e-4 -> 5e-3 over 100 iters, smoothed loss, min-gradient pick,
  lr/100 when >1, persisted to ``lr.npy``);
- ``EarlyStopping`` with patience 500, median-filtered metric queues,
  cooling counters and an overfit detector that grows weight decay
  (linna/predictor_gpu.py:19-151);
- flat-validation "bad training" detector in the first 120 epochs that
  reinitializes weights (linna/predictor_gpu.py:319-335);
- NaN/spike detector that reloads the best checkpoint, resets the optimizer
  and halves the learning rate (linna/predictor_gpu.py:339-373);
- per-epoch ``last``/``best`` checkpoints with resume-from-best
  (linna/predictor_gpu.py:405-419, linna/nnutils.py:109-151).

Learning rate and weight decay are runtime-dynamic via
``optax.inject_hyperparams`` so supervisor interventions never trigger a
recompile.
"""

from __future__ import annotations

import os
import time
from functools import partial
from typing import List, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax

from . import losses as L
from . import nn as N
from .transforms import TransformSet
from .utils import checkpoint as ckpt
from .utils import plots

__all__ = ["EarlyStopping", "Trainer", "lr_range_test", "Supervisor"]

LAST_CKPT = "last.ckpt.npz"
BEST_CKPT = "best.ckpt.npz"
MIN_LR = 2e-6
# Unroll factor of the minibatch scan inside the epoch program.  Measured on
# v5e at the DES flagship shape (TRAIN_PROFILE.json, bf16 K=2): 12.74 ->
# 10.17 (unroll=2) -> 9.92 ms/epoch (unroll=4), a 22% epoch-wall cut — the
# scan's per-iteration loop overhead was the largest single slice after the
# round-3 optimizations (carry_only 1.74 ms/epoch).  Best-params tracking in
# the epoch carry measured FREE (full_besttrack == full), so it stays.
BATCH_UNROLL = 4


class EarlyStopping:
    """Patience/cooling early-stopping state machine
    (reference linna/predictor_gpu.py:19-151).

    ``step`` returns an action code: 0 = continue, 1 = halve lr (+wd),
    2 = stop, 3 = double weight decay (overfit detected).
    """

    def __init__(self, patience: int = 500, nqueue: int = 200, min_delta: float = 0.0):
        self.patience = patience
        self.nqueue = nqueue
        self.min_delta = min_delta
        self.best: Optional[float] = None
        self.best_t: Optional[float] = None
        self.num_bad_epochs = 0
        self.cooling = 0
        self.cooling_weight_decay = 0
        self.queue_t: List[float] = []
        self.queue_v: List[float] = []

    def step(self, val_metric: float, train_metric: float) -> int:
        self.queue_t.append(float(train_metric))
        self.queue_v.append(float(val_metric))
        if len(self.queue_t) > self.nqueue:
            self.queue_t.pop(0)
        if len(self.queue_v) > self.nqueue:
            self.queue_v.pop(0)
        if self.best is None:
            self.best = val_metric
            self.best_t = train_metric
            self.num_bad_epochs = 0
            return 0
        if np.isnan(val_metric):
            self.num_bad_epochs += 1
            return 0
        if val_metric < self.best - self.min_delta:
            self.num_bad_epochs = 0
            self.cooling = 0
            self.cooling_weight_decay = 0
            self.best = val_metric
            self.best_t = train_metric
            return self._check_stop()
        self.num_bad_epochs += 1
        if self.patience * 0.9 <= self.num_bad_epochs < self.patience:
            # nearly out of patience: try one lr halving, then "cool" for up
            # to 500 epochs before giving up (linna/predictor_gpu.py:101-113)
            if self.cooling != 0:
                if self.cooling > 500:
                    self.cooling = 0
                    self.num_bad_epochs += 5
                    return self._check_stop()
                self.num_bad_epochs -= 1
                self.cooling += 1
                return 0
            self.cooling += 1
            return 1
        if len(self.queue_t) > max(2, 0.5 * self.nqueue):
            # overfit: train loss falling while val loss rising over the two
            # halves of the queues (linna/predictor_gpu.py:114-131)
            half_t = len(self.queue_t) // 2
            half_v = len(self.queue_v) // 2
            t_trend = np.median(self.queue_t[half_t:]) - np.median(self.queue_t[:half_t])
            v_trend = np.median(self.queue_v[half_v:]) - np.median(self.queue_v[:half_v])
            if t_trend < 0 and v_trend > 0:
                if self.cooling_weight_decay != 0:
                    if self.cooling_weight_decay > 1000:
                        self.cooling_weight_decay = 0
                        return self._check_stop()
                    self.queue_t = []
                    self.queue_v = []
                    self.cooling_weight_decay += 1
                    if self.cooling_weight_decay % 50 == 0:
                        return 3
                    return self._check_stop()
                self.cooling_weight_decay += 1
                return 3
        return self._check_stop()

    def _check_stop(self) -> int:
        return 2 if self.num_bad_epochs >= self.patience else 0


class Supervisor:
    """Host-side per-model training supervisor: turns per-epoch metrics into
    the reference's pathology-recovery decisions.  A pure decision machine —
    callers apply the returned action to device state — so the serial
    :class:`Trainer` and the mesh-parallel
    :class:`linna_tpu.parallel.ensemble.EnsembleTrainer` share identical
    recovery logic.

    Actions returned by :meth:`step`:

    - ``"none"``   — keep training;
    - ``"hyper"``  — ``self.lr``/``self.wd`` changed (EarlyStopping codes 1/3,
      reference linna/predictor_gpu.py:374-401); caller re-injects them;
    - ``"reinit"`` — reinitialize weights + reset optimizer (flat-start
      detector linna/predictor_gpu.py:319-335, or output collapse);
    - ``"reload"`` — reload best params (fallback: reinit) + reset optimizer
      (NaN/spike recovery linna/predictor_gpu.py:339-373, or late stall);
    - ``"stop"``   — early stop.

    ``vm`` rows passed to :meth:`step` are mutated in place when the spike
    detector clamps the recorded metric (linna/predictor_gpu.py:369-371).
    """

    def __init__(
        self,
        lr: float,
        wd: float = 1e-4,
        patience: int = 500,
        verbose: bool = False,
        tag: str = "",
    ):
        self.es = EarlyStopping(patience=patience)
        self.lr = float(lr)
        self.wd = float(wd)
        self.old = 0.0
        self.told = 0.0
        self.best_val_loss = float("inf")
        self.stopped = False
        self.verbose = verbose
        self.tag = tag
        self.val_hist: List[float] = []

    def _say(self, msg: str) -> None:
        if self.verbose:
            prefix = f"[{self.tag}] " if self.tag else ""
            print(prefix + msg, flush=True)

    def observe_chunk_best(self, chunk_best_val: float) -> bool:
        """Record the best validation metric seen inside a dispatch chunk;
        returns True when it improves on the running best (and the member is
        still training)."""
        if self.stopped or not chunk_best_val < self.best_val_loss:
            return False
        self.best_val_loss = float(chunk_best_val)
        return True

    def step(
        self,
        ep: int,
        vm: np.ndarray,
        loss: float,
        min_eig: float,
        suppressed: bool = False,
    ) -> str:
        """Decide on epoch ``ep`` given its val-metric row ``vm``, last-batch
        train ``loss`` and collapse diagnostic ``min_eig``.  ``suppressed``
        marks epochs after a params-replacing intervention within the same
        dispatch chunk (their trajectory is discarded; only the metric
        history is kept)."""
        val0 = float(vm[0])
        self.val_hist.append(val0)
        if suppressed or self.stopped:
            self.old, self.told = val0, loss
            return "none"

        recent = self.val_hist[-10:]
        flat_start = (
            ep >= 10
            and ep < 120
            and ep % 10 == 0
            and np.std(recent) < 0.01 * np.mean(recent)
        )
        # Output collapse (dead ReLU output stage) never recovers by gradient
        # descent — reinit on a rank-deficient prediction correlation; a late
        # stall far above the best reloads it (this framework's additions).
        collapsed = (
            min_eig < 1e-6
            and ep % 10 == 0
            and ep >= 10
            and val0 > 2.0 * self.best_val_loss
        )
        late_stall = (
            ep >= 120
            and ep % 50 == 0
            and self.best_val_loss < np.inf
            and val0 > 3.0 * self.best_val_loss
            and np.std(recent) < 0.01 * np.mean(recent)
        )
        # --- flat-start detector (linna/predictor_gpu.py:319-335) +
        #     collapse/stall escapes
        if flat_start or collapsed:
            self._say(
                f"bad training restart at epoch {ep} "
                f"({'collapse' if collapsed else 'flat start'})"
            )
            if ep > 10 and self.lr > 2e-4:
                self.lr = max(self.lr / 2.0, MIN_LR)
            return "reinit"
        if late_stall:
            self._say(f"late stall at epoch {ep}: reload best")
            return "reload"
        # --- NaN / loss-spike recovery (linna/predictor_gpu.py:339-373)
        if (
            np.isnan(val0)
            or val0 > 1e10
            or (ep != 0 and val0 - self.old > 5 * self.old)
            or (ep != 0 and loss - self.told > 5 * self.told)
        ):
            if (
                np.isnan(val0) or val0 > 1e10 or val0 - self.old > 10 * self.old
            ) and ep > 10:
                if self.lr > MIN_LR:
                    self.lr = self.lr / 2.0
            if not np.isnan(val0) and val0 - self.old > 5 * self.old:
                vm[0] = self.old
                self.val_hist[-1] = self.old
            return "reload"

        action = self.es.step(val0, loss)
        out = "none"
        if action == 1:
            if self.lr > MIN_LR:
                self.lr /= 2.0
                self.wd /= 2.0
                out = "hyper"
            else:
                self.es.cooling = 0
        elif action == 2:
            self._say(f"early stop at epoch {ep} (lr={self.lr:g})")
            self.stopped = True
            out = "stop"
        elif action == 3:
            if self.wd < 1.0:
                self.wd *= 2.0
                out = "hyper"
        if out != "stop":
            self.old, self.told = val0, loss
        return out


class DispatchSchedule:
    """Dynamic epochs-per-dispatch (VERDICT r4 items 5+7), shared by the
    serial Trainer and the mesh EnsembleTrainer so their chunking — and
    therefore their per-member PRNG streams — stay identical.

    The configured ``epochs_per_dispatch`` is the MAXIMUM chunk.  The
    schedule caps the effective chunk at ``guard`` (10) epochs while inside
    the flat-start detector window (first 120 epochs — where the
    reinit/reload interventions live, Supervisor.step) and for the chunks
    right after an intervention, then doubles per quiet chunk back up to the
    maximum.  This bounds the pathology-recovery lag to <=``guard`` epochs
    in the risky regime (the reference checks per epoch,
    linna/predictor_gpu.py:319-401; a fixed 50-epoch chunk could lag a NaN
    recovery by 49 epochs and discard the rest of the chunk's trajectory)
    while keeping the steady state at one host round trip per
    ``epochs_per_dispatch`` epochs."""

    FLAT_WINDOW = 120  # Supervisor's flat-start detector range
    GUARD = 10

    def __init__(self, max_epd: int, guard: int = GUARD):
        self.max_epd = max(int(max_epd), 1)
        self.guard = min(guard, self.max_epd)
        self.quiet = 0  # consecutive chunks without a params intervention

    def k_at(self, i: int, num_epochs: int, quiet: int = None) -> int:
        """Chunk length starting at epoch ``i`` (0 when done).  ``quiet``
        overrides the observed counter — speculative dispatch peeks at the
        next chunk assuming the current one lands quiet.

        One guard chunk follows every intervention (recovery granularity),
        then the size jumps straight back to the maximum: a gradual-doubling
        ramp measured WORSE in chronically spiky phases (the DES iteration-0
        T=4 regime reloads best every ~15 epochs, so a slow ramp pins the
        run at guard-sized chunks and multiplies the per-chunk tunnel
        round trips)."""
        if i >= num_epochs:
            return 0
        q = self.quiet if quiet is None else quiet
        if i < self.FLAT_WINDOW or q == 0:
            k = self.guard
        else:
            k = self.max_epd
        return min(k, num_epochs - i)

    def observe(self, intervened: bool) -> None:
        self.quiet = 0 if intervened else self.quiet + 1

    def quiet_path_lengths(self, num_epochs: int) -> list:
        """The chunk lengths of an intervention-free run (used by
        parallel.precompile to warm one program per distinct length)."""
        out, i, q = [], 0, 0
        while i < num_epochs:
            k = self.k_at(i, num_epochs, quiet=q)
            out.append(k)
            i += k
            q += 1
        return out


def _make_optimizer(mu_dtype=None) -> optax.GradientTransformation:
    """AdamW with runtime-dynamic lr/wd.

    ``mu_dtype``: storage dtype of the first moment (update math stays f32).
    The trainers pass their ``compute_dtype`` here: the per-batch AdamW
    update is HBM-bandwidth-floor-bound (docs/TRAINING_PERF.md — 40% of the
    LSST-shape epoch is moment traffic), and storing mu in bf16 under the
    already-reduced-precision training regime measured 42.7 -> 38.3 ms/epoch
    (10%) at that shape with final losses equal within member-to-member
    noise.  ``static_args``: a dtype is not a schedulable hyperparameter."""
    return optax.inject_hyperparams(optax.adamw, static_args=("mu_dtype",))(
        learning_rate=1e-4, weight_decay=1e-4, mu_dtype=mu_dtype
    )


def device_spike_recover(
    optimizer, params, opt_state, best_params, val0, loss,
    prev_val, prev_loss, ep,
):
    """Per-epoch NaN/loss-spike recovery traced INTO the training chunk
    (reference linna/predictor_gpu.py:339-373, which runs per epoch on the
    host next to a local GPU).

    Round-5 motivation: the DES iteration-0 T=4 regime spike-reloads ~70
    times per 1000 epochs.  As host interventions each reload cost device
    round trips, reset the dispatch schedule to guard-sized chunks and
    discarded the speculative chunk — measured 283 s for that iteration's
    training.  On device the recovery is a few fused selects per epoch:
    chunks stay at the configured maximum and the host supervisor only
    handles the rare structural pathologies (flat start, collapse, late
    stall, early stopping).

    Semantics per epoch (after the epoch's batches and validation):
      trigger = NaN(val) | val>1e10 | val-prev>5*prev | loss-prev>5*prev
      on trigger: params <- best-so-far, optimizer state re-initialized,
                  lr halved when the spike is big (val-prev>10*prev or NaN,
                  ep>10, floor MIN_LR) — exactly the reference's decisions;
      the RECORDED val metric is clamped to the previous value on trigger
      rows (reference clamps moderate spikes; NaN rows are clamped too here
      so the host-side EarlyStopping never ingests NaN);
      prev_val/prev_loss update only on quiet epochs (the reference's early
      return skips its old/told update on trigger).

    Returns (params, opt_state, vm0_recorded, prev_val, prev_loss, trigger).
    """
    bad = jnp.isnan(val0) | (val0 > 1e10)
    spike_v = (ep != 0) & (val0 - prev_val > 5.0 * prev_val)
    spike_t = (ep != 0) & (loss - prev_loss > 5.0 * prev_loss)
    trigger = bad | spike_v | spike_t
    big = (bad | (val0 - prev_val > 10.0 * prev_val)) & (ep > 10)
    params = jax.tree.map(
        lambda b, p: jnp.where(trigger, b, p), best_params, params
    )
    lr = opt_state.hyperparams["learning_rate"]
    wd = opt_state.hyperparams["weight_decay"]
    fresh = optimizer.init(params)
    opt_state = jax.tree.map(
        lambda f, o: jnp.where(trigger, f, o), fresh, opt_state
    )
    new_lr = jnp.where(
        trigger & big & (lr > MIN_LR), lr * 0.5, lr
    )
    # re-inject the carried hyperparams (optimizer.init resets them to the
    # constructor defaults) with the spike-halved lr
    opt_state.hyperparams["learning_rate"] = new_lr
    opt_state.hyperparams["weight_decay"] = wd
    vm0_rec = jnp.where(trigger, prev_val, val0)
    prev_val = jnp.where(trigger, prev_val, val0)
    prev_loss = jnp.where(trigger, prev_loss, loss)
    return params, opt_state, vm0_rec, prev_val, prev_loss, trigger


@jax.jit
def _tree_copy(tree):
    """Device-side deep copy as ONE dispatched program (per-leaf eager
    copies would pay ~100 dispatch round trips on a tunneled device).  The
    restore point for speculative chunk dispatch, whose inputs are donated."""
    return jax.tree.map(jnp.copy, tree)


def _set_hyper(opt_state, lr: float, wd: float):
    opt_state.hyperparams["learning_rate"] = jnp.asarray(lr, jnp.float32)
    opt_state.hyperparams["weight_decay"] = jnp.asarray(wd, jnp.float32)
    return opt_state


class Trainer:
    """Owns model spec/params/optimizer/transforms (reference ``Predictor``,
    linna/predictor_gpu.py:153-199) and runs the supervised training loop."""

    def __init__(
        self,
        spec: N.ModelSpec,
        transforms: TransformSet,
        loss_state: L.LossState,
        outdir: Optional[str] = None,
        seed: int = 1234,
        params=None,
        compute_dtype: Optional[str] = None,
        linearmodel=None,
    ):
        self.spec = spec
        self.transforms = transforms
        self.loss_state = loss_state
        self.outdir = outdir
        self.seed = seed
        # optional frozen additive pre-model under the NN (reference
        # ChtoModelv2's ``linearmodel`` slot, linna/nn.py:104-108): the NN
        # trains on the residual — see linear_model.py / the orchestrator's
        # params["linearmodel"] hook
        if linearmodel is not None and spec.linear_bypass:
            # apply_model ignores the external pre-model for linear_bypass
            # specs (reference ChtoModelv2_linear.forward, linna/nn.py:220-232)
            # — training NN+LM here while sampling evaluates NN-only would be
            # a silent train/inference mismatch
            raise ValueError(
                "linearmodel cannot be combined with a linear_bypass model "
                "spec (the built-in 1e-3 bypass replaces the pre-model slot)"
            )
        self.linearmodel = linearmodel
        # opt-in mixed precision: forward/backward in ``compute_dtype``
        # (e.g. "bfloat16"), f32 master weights + AdamW state + loss/metric
        # arithmetic — the training analogue of likelihood.compute_dtype
        self.compute_dtype = compute_dtype
        self.key = jax.random.key(seed)
        if params is None:
            self.key, init_key = jax.random.split(self.key)
            params = N.init_model(init_key, spec)
        self.params = params
        self.optimizer = _make_optimizer(mu_dtype=compute_dtype)
        self.opt_state = self.optimizer.init(self.params)
        # interventions as single jitted programs (the eager tree forms cost
        # ~80 dispatches each over a tunneled link; spike-heavy training
        # phases reload dozens of times — see EnsembleTrainer._jit_interventions)
        self._jit_opt_init = jax.jit(self.optimizer.init)
        self._jit_init_model = jax.jit(lambda k: N.init_model(k, spec))
        self.best_val_loss = float("inf")
        self.lr = 1e-4
        self.wd = 1e-4

    # ---------------------------------------------------------------- jitted

    # transforms/loss_state are threaded through the jitted programs as
    # ARGUMENTS (not closed-over constants): captured jnp arrays embed as HLO
    # literals, so every fresh run's median/MAD transforms and inverse
    # covariance would change the HLO bytes and defeat the persistent
    # compilation cache (measured: ~40 s recompile per iteration per run at
    # the DES flagship shape; as arguments the program is data-independent
    # and compiles once per shape, ever)
    def _loss(self, params, bx, by, tset, lstate):
        x = tset.x_transform(bx)
        x32 = x
        if self.compute_dtype is not None:
            cd = jnp.dtype(self.compute_dtype)
            params = jax.tree.map(lambda a: a.astype(cd), params)
            x = x.astype(cd)
        pred = N.apply_model(self.spec, params, x).astype(jnp.float32)
        if self.linearmodel is not None:
            # frozen additive pre-model in f32 (reference nn.py:104-108:
            # forward output = trunk + linearmodel(input))
            pred = pred + self.linearmodel(x32)
        return L.loss_fn(lstate, tset, pred, by)

    @partial(jax.jit, static_argnums=(0, 8), donate_argnums=(1, 2))
    def _epochs_tracked(
        self, params, opt_state, key, train_x, train_y, val_x, val_y, n_epochs,
        tset, lstate,
    ):
        """``n_epochs`` full epochs as ONE device program (scan over epochs,
        scan over minibatches inside) — one host round trip per chunk
        instead of per epoch (measured on a tunneled v5e: ~0.15 s/epoch of
        host sync vs ~7 ms/epoch of compute for the DES-scale model).
        Tracks the best-validation params *within the chunk* on device, so
        chunked dispatch loses no best-checkpoint granularity.  The min-eig
        output is an output-collapse diagnostic: the ReLU trunk can die into
        a rank-deficient output subspace (min eig of the prediction
        correlation ~0) which never recovers by gradient descent; only a
        risk (and only computed) for small outputs."""
        n = train_x.shape[0]
        bs = self._batch_size
        nb = max(n // bs, 1)

        def one_epoch(carry, ekey):
            params, opt_state, best_val, best_params = carry
            perm = jax.random.permutation(ekey, n)[: nb * bs].reshape(nb, bs)

            def step(c, idx):
                p, s = c
                loss, grads = jax.value_and_grad(self._loss)(
                    p, train_x[idx], train_y[idx], tset, lstate
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
                corr = (centered / denom).T @ (centered / denom) / val_pred.shape[0]
                min_eig = jnp.linalg.eigvalsh(corr)[0]
            else:
                min_eig = jnp.asarray(1.0)
            improved = val_metric[0] < best_val
            best_val = jnp.where(improved, val_metric[0], best_val)
            best_params = jax.tree_util.tree_map(
                lambda new, old: jnp.where(improved, new, old), params, best_params
            )
            return (params, opt_state, best_val, best_params), (
                batch_losses, val_metric, min_eig,
            )

        ekeys = jax.random.split(key, n_epochs)
        best0 = jnp.asarray(jnp.inf, jnp.float32)
        (params, opt_state, best_val, best_params), (losses, vms, eigs) = jax.lax.scan(
            one_epoch, (params, opt_state, best0, params), ekeys
        )
        return params, opt_state, losses, vms, eigs, best_val, best_params

    @partial(jax.jit, static_argnums=0)
    def _train_step(self, params, opt_state, bx, by, tset, lstate):
        loss, grads = jax.value_and_grad(self._loss)(params, bx, by, tset, lstate)
        updates, opt_state = self.optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss

    # ------------------------------------------------------------------ host

    def _reinit_weights(self):
        self.key, k = jax.random.split(self.key)
        self.params = self._jit_init_model(k)

    def _reset_optimizer(self):
        self.opt_state = _set_hyper(
            self._jit_opt_init(self.params), self.lr, self.wd
        )

    def load_best(self) -> bool:
        """Resume params from the in-memory best (kept on device during a
        run) or ``best.ckpt.npz`` (linna/predictor_gpu.py:451-459)."""
        best_mem = getattr(self, "_best_params_mem", None)
        if best_mem is not None:
            # hand out a copy (one jitted program, not ~40 eager per-leaf
            # copies): self.params gets donated into _epoch, which would
            # otherwise invalidate the stored best
            self.params = _tree_copy(best_mem)
            return True
        if self.outdir is None:
            return False
        path = os.path.join(self.outdir, BEST_CKPT)
        if not ckpt.checkpoint_exists(path):
            return False
        self.params, _, meta = ckpt.load_checkpoint(path, self.params)
        self.best_val_loss = float(meta.get("best_val_loss", self.best_val_loss))
        return True

    # Disk-checkpoint cadence.  The reference saves every epoch
    # (linna/predictor_gpu.py:405-419) — cheap on a local GPU box, but on a
    # TPU host each save is a full params+opt-state device->host transfer
    # (~15 MB for the DES-scale model; measured ~8 s/epoch over a tunneled
    # link, 100x the epoch's compute).  The best params live on device
    # between saves, so recovery semantics are unchanged: a crash loses at
    # most save_every epochs of progress (~3 s of device compute at the
    # flagship shape — the fetch+write per save costs more than retraining
    # the interval, so the cadence is deliberately coarse).
    save_every = 200
    # Epochs per device dispatch: whole-chunk scans cut the per-epoch host
    # round trip (~0.15 s over a tunneled link vs ~7 ms of compute).  This
    # is the MAXIMUM chunk; DispatchSchedule caps the effective chunk during
    # the pathology-prone flat-start window and right after interventions.
    epochs_per_dispatch = 10
    # Speculative double-buffer: enqueue chunk k+1 from the future device
    # state before fetching chunk k's metrics (discarded on the rare
    # supervisor intervention).  Off => serial dispatch (debug/parity).
    speculative_dispatch = True

    def _save(self, epoch: int, is_best: bool, force: bool = False):
        if is_best:
            # deep-copy on device: _epoch donates the params buffers, so a
            # bare reference would be invalidated next epoch
            self._best_params_mem = jax.tree.map(jnp.copy, self.params)
            self._best_dirty = True
        if self.outdir is None:
            return
        last = getattr(self, "_last_disk_save", -10**9)
        if not force and epoch - last < self.save_every:
            return
        # Periodic saves write ONLY a dirty best.ckpt: last.ckpt is never
        # read back by anything (resume is always best-params + fresh
        # optimizer — load_best / orchestrator.retrieve_model, the
        # reference's production initfrombest contract), so its periodic
        # copies were pure device->host traffic; it rides the final forced
        # save for external tooling, with the optimizer state (2/3 of the
        # bytes, equally never loaded back).  Crash recovery is unchanged:
        # best.ckpt is the resume artifact and still lands every
        # ``save_every`` epochs when it improved (measured at the LSST
        # flagship shape: periodic saves were 90 s of the 587 s training
        # wall; see docs/TRAINING_PERF.md).
        if not force and not getattr(self, "_best_dirty", False):
            return
        self._last_disk_save = epoch
        meta = {"epoch": epoch, "best_val_loss": self.best_val_loss, "lr": self.lr}
        opt = self.opt_state if force else None
        if force:
            ckpt.save_checkpoint(
                os.path.join(self.outdir, LAST_CKPT), self.params, opt, meta
            )
        if getattr(self, "_best_dirty", False):
            best = getattr(self, "_best_params_mem", self.params)
            ckpt.save_checkpoint(
                os.path.join(self.outdir, BEST_CKPT), best, opt, meta
            )
            self._best_dirty = False

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
    ) -> Tuple[np.ndarray, np.ndarray]:
        """Run the full supervised loop; returns (train_losses, val_metrics)
        with the reference's shapes (per-batch losses, per-epoch metrics)."""
        train_x = jnp.asarray(train_x, jnp.float32)
        train_y = jnp.asarray(train_y, jnp.float32)
        val_x = jnp.asarray(val_x, jnp.float32)
        val_y = jnp.asarray(val_y, jnp.float32)
        self._batch_size = min(int(batch_size), int(train_x.shape[0]))
        if epochs_per_dispatch is not None:
            self.epochs_per_dispatch = max(int(epochs_per_dispatch), 1)

        # wall-time breakdown of this call (read by train_emulator into
        # trace.json: SURVEY §5.1's "per-phase timing from the start")
        ps = self.phase_seconds = {
            "auto_lr": 0.0, "dispatch": 0.0, "wait_fetch": 0.0,
            "supervisor": 0.0, "save": 0.0, "plot": 0.0,
        }
        if auto_lr:
            t0 = time.perf_counter()
            self.lr = lr_range_test(self, train_x, train_y, outdir=self.outdir)
            ps["auto_lr"] += time.perf_counter() - t0
        self.lr *= lr_scale
        if initfrombest:
            self.load_best()
        self._reset_optimizer()

        sup = Supervisor(self.lr, self.wd, verbose=verbose)
        sup.best_val_loss = self.best_val_loss
        train_losses: List[float] = []
        val_metrics: List[np.ndarray] = []
        i = 0
        last_plot = 0
        sched = DispatchSchedule(self.epochs_per_dispatch)

        def _dispatch(k):
            self.key, ekey = jax.random.split(self.key)
            return self._epochs_tracked(
                self.params, self.opt_state, ekey, train_x, train_y, val_x,
                val_y, k, self.transforms, self.loss_state,
            )

        pending = None  # speculatively dispatched next chunk: (k, outputs)
        while i < num_epochs and not sup.stopped:
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

            # Speculative double-buffer (VERDICT r4 item 5 — the sampler's
            # dispatch trick, samplers/run.py:609-618, applied to training):
            # enqueue chunk k+1 from the future post-chunk device state
            # BEFORE fetching chunk k's metrics, so the fetch latency and
            # the host-side supervisor/save/plot work overlap device
            # compute.  _epochs_tracked donates params/opt, so a device-side
            # copy is snapped first; on the rare supervisor intervention the
            # speculative chunk is discarded and the copy is the restore
            # point (one burned PRNG chunk-key split — documented stream
            # change vs the non-speculative path only after interventions).
            k2 = sched.k_at(i + k, num_epochs, quiet=sched.quiet + 1)
            outs2 = None
            # speculate only after a quiet chunk: in chronically spiky
            # phases (every chunk intervenes) speculation would discard
            # nearly every speculative chunk — pure wasted device work —
            # so it disables itself until the supervisor goes quiet
            if k2 > 0 and self.speculative_dispatch and sched.quiet >= 1:
                t0 = time.perf_counter()
                prev_params, prev_opt = _tree_copy((new_params, new_opt))
                self.params, self.opt_state = new_params, new_opt
                outs2 = _dispatch(k2)
                # host-visible state = the restore-point copies; if the
                # speculation is accepted, the next loop iteration replaces
                # them with the speculative chunk's outputs anyway
                self.params, self.opt_state = prev_params, prev_opt
                ps["dispatch"] += time.perf_counter() - t0
            else:
                self.params, self.opt_state = new_params, new_opt

            t1 = time.perf_counter()
            # one batched device->host transfer (device_get overlaps the
            # per-leaf copies) instead of three sequential blocking ones —
            # each blocking copy pays a full round trip on a tunneled device
            losses_k, vms_k, eigs_k, chunk_best_val = jax.device_get(
                (losses_k, vms_k, eigs_k, chunk_best_val)
            )
            ps["wait_fetch"] += time.perf_counter() - t1
            losses_k = np.asarray(losses_k)
            vms_k = np.asarray(vms_k, dtype=np.float64)
            eigs_k = np.asarray(eigs_k)
            if sup.observe_chunk_best(float(chunk_best_val)):
                self.best_val_loss = sup.best_val_loss
                # fresh jit output — not aliased to donated buffers
                self._best_params_mem = chunk_best_params
                self._best_dirty = True

            # host supervisor over the chunk's per-epoch metrics; the first
            # params-replacing intervention wins and the rest of the chunk's
            # trajectory is discarded (interventions are rare — the chunked
            # cadence matches the reference's per-epoch checks in practice)
            t0 = time.perf_counter()
            intervened = False
            hyper_changed = False
            for j in range(k):
                batch_losses = losses_k[j]
                train_losses.extend(batch_losses.tolist())
                loss = float(batch_losses[-1])
                vm = vms_k[j]
                val_metrics.append(vm)
                action = sup.step(
                    i + j, vm, loss, float(eigs_k[j]), suppressed=intervened
                )
                if action == "reinit":
                    self._reinit_weights()
                    self.lr = sup.lr
                    self._reset_optimizer()
                    intervened = True
                elif action == "reload":
                    if not self.load_best():
                        self._reinit_weights()
                    self.lr = sup.lr
                    self._reset_optimizer()
                    intervened = True
                elif action == "hyper":
                    self.lr, self.wd = sup.lr, sup.wd
                    self.opt_state = _set_hyper(self.opt_state, self.lr, self.wd)
                    hyper_changed = True

            ps["supervisor"] += time.perf_counter() - t0
            sched.observe(intervened)
            if outs2 is not None and not (
                intervened or hyper_changed or sup.stopped
            ):
                # quiet chunk: the speculative dispatch stands
                pending = (k2, outs2)
            # else: the speculative chunk ran from superseded params or
            # hypers — drop it (self.params/opt already hold the corrected
            # restore-point state; one check_every-sized chunk of device
            # work wasted, same trade as the sampler's double buffer)

            i += k
            t0 = time.perf_counter()
            self._save(i - 1, False)
            ps["save"] += time.perf_counter() - t0

            # training_progress.png periodically (the reference refreshed
            # every ~100 epochs, linna/predictor_gpu.py:422-442; each
            # matplotlib render costs ~0.5-1 s of host time serial with
            # training, so the cadence here is coarser — the final
            # trainniing.png below is always written)
            if self.outdir is not None and i - last_plot >= 500:
                last_plot = i
                t0 = time.perf_counter()
                plots.plot_training_progress(
                    train_losses, val_metrics,
                    os.path.join(self.outdir, "training_progress.png"),
                    batches_per_epoch=max(losses_k.shape[-1], 1),
                )
                ps["plot"] += time.perf_counter() - t0

        self.epochs_run = i
        t0 = time.perf_counter()
        self._save(num_epochs - 1, False, force=True)
        ps["save"] += time.perf_counter() - t0
        if self.outdir is not None:
            # final summary plot; reference filename kept (linna/util.py:1288)
            t0 = time.perf_counter()
            plots.plot_training_progress(
                train_losses, val_metrics,
                os.path.join(self.outdir, "trainniing.png"),
                batches_per_epoch=max(
                    int(train_x.shape[0]) // self._batch_size, 1
                ),
            )
            ps["plot"] += time.perf_counter() - t0
        return np.array(train_losses), np.array(val_metrics)

    # ------------------------------------------------------------- inference

    def predict(self, x: jax.Array) -> jax.Array:
        """x (physical params) -> emulated data vector in sigma-scaled space
        (reference linna/predictor_gpu.py:461-504: X_transform -> model ->
        y_transform)."""
        one = x.ndim == 1
        if one:
            x = x[None, :]
        x_in = self.transforms.x_transform(x)
        # apply_model owns the linearmodel gating (linear_bypass specs ignore
        # the external pre-model, exactly like the reference linna/nn.py:220-232)
        pred = N.apply_model(
            self.spec, self.params, x_in, linearmodel=self.linearmodel
        )
        out = self.transforms.y_transform(pred)
        return out[0] if one else out


def lr_range_test(
    trainer: Trainer,
    train_x: jax.Array,
    train_y: jax.Array,
    start_lr: float = 1e-4,
    end_lr: float = 5e-3,
    num_iter: int = 100,
    smooth_f: float = 0.05,
    diverge_th: float = 5.0,
    outdir: Optional[str] = None,
) -> float:
    """Exponential LR sweep; pick the lr at the steepest smoothed-loss descent
    (reference linna/predictor_gpu.py:222-246 wrapping torch_lr_finder with
    end_lr=5e-3, num_iter=100; lr/100 if the pick exceeds 1; persisted to
    ``lr.npy`` for resume)."""
    if outdir is not None:
        lr_path = os.path.join(outdir, "lr.npy")
        if os.path.isfile(lr_path):
            return float(np.load(lr_path))

    lrs = np.geomspace(start_lr, end_lr, num_iter)
    params = trainer.params
    opt_state = trainer.optimizer.init(params)
    bs = trainer._batch_size
    n = int(train_x.shape[0])
    nb = max(n // bs, 1)
    rng = np.random.default_rng(1234)
    order = rng.permutation(n)

    raw: List[float] = []
    for it in range(num_iter):
        opt_state = _set_hyper(opt_state, float(lrs[it]), 1e-4)
        b = it % nb
        idx = jnp.asarray(order[b * bs : (b + 1) * bs])
        params, opt_state, loss = trainer._train_step(
            params, opt_state, train_x[idx], train_y[idx],
            trainer.transforms, trainer.loss_state,
        )
        raw.append(float(loss))

    lr, losses, lrs_used = smooth_and_pick_lr(lrs, raw, smooth_f, diverge_th)
    if outdir is not None:
        os.makedirs(outdir, exist_ok=True)
        np.save(os.path.join(outdir, "lr.npy"), lr)
        # reference's LRFinder diagnostic (linna/predictor_gpu.py:230)
        plots.plot_lr_range(lrs_used, losses, os.path.join(outdir, "lr_tunning.png"))
    return lr


def smooth_and_pick_lr(
    lrs: np.ndarray,
    raw_losses,
    smooth_f: float = 0.05,
    diverge_th: float = 5.0,
):
    """Exponentially smooth a raw LR-sweep loss trace, truncate at the
    divergence threshold, and pick the lr at the steepest smoothed-loss
    descent.  The skip_start=10/skip_end=5 warmup trim follows
    torch_lr_finder's plotting convention — without it the argmin degenerates
    to the first few samples where the smoothing lag dominates the gradient.
    Shared by the serial and the mesh-parallel member sweeps so both pick
    identically.  Returns (lr, smoothed_losses, truncated_lrs)."""
    losses: List[float] = []
    best_loss = np.inf
    for i, loss in enumerate(np.asarray(raw_losses, dtype=np.float64)):
        if i > 0:
            loss = smooth_f * loss + (1 - smooth_f) * losses[-1]
        if loss < best_loss:
            best_loss = loss
        losses.append(float(loss))
        if loss > diverge_th * best_loss:
            break
    lrs = np.asarray(lrs)[: len(losses)]
    skip_start, skip_end = 10, 5
    window = np.array(losses[skip_start : len(losses) - skip_end])
    if len(window) >= 3:
        pick = skip_start + int(np.gradient(window).argmin())
    else:
        pick = int(np.gradient(np.array(losses)).argmin())
    lr = float(lrs[pick])
    if lr > 1.0:
        lr = lr / 100.0
    return lr, losses, lrs
