"""Convergence-gated incremental ensemble sampling.

The device advances the ensemble in fixed-size jit-compiled chunks
(``check_every`` steps — the reference's check cadence,
linna/sampler.py:530-538, 682); between chunks the host appends to HDF5 and
evaluates the reference's three-part convergence test:

  1. chain length exceeds ``ntimes`` autocorrelation times (per-param for the
     stretch path as in emcee, mean-tau for the slice path as in zeus);
  2. relative change of tau since the previous check below ``tautol``;
  3. split-half mean/std stationarity over the trailing ``nk * tau`` steps.

Fresh stretch runs reproduce the reference's burn-in: 100 throwaway steps,
keep the top ``50*nwalkers`` samples by log-prob, restart the ensemble from a
random draw of those (linna/sampler.py:519-529).  Runs resume from the HDF5
last sample when the file already exists (linna/sampler.py:475-487,713-725).
"""

from __future__ import annotations

import os
import warnings
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..parallel import multihost as MH
from . import backends, convergence, hmc, precondition, slicemove, stretch

__all__ = ["run_ensemble", "EMCEE_FILENAME", "ZEUS_FILENAME"]

# hmc/nuts share the emcee chain file, as in the reference where they are
# moves inside the emcee machinery (linna/sampler.py:469,496-503)
EMCEE_FILENAME = "chemcee_256.h5"
ZEUS_FILENAME = "zeus_256.h5"
GRADIENT_METHODS = ("hmc", "nuts")


def _np_transform(transform):
    if transform is None:
        return None

    def apply(chain: np.ndarray) -> np.ndarray:
        flat = chain.reshape(-1, chain.shape[-1])
        out = np.asarray(transform(flat))
        return out.reshape(chain.shape[:-1] + (out.shape[-1],))

    return apply


# sampler state classes by method, for exact-resume (de)serialization
_STATE_CLS = {
    "emcee": stretch.EnsembleState,
    "hmc": hmc.HMCState,
    "nuts": hmc.NUTSState,
    "zeus": slicemove.SliceState,
}
PRECOND_FILENAME = "precond.npz"


def _state_to_blob(state) -> dict:
    """Sampler NamedTuple -> flat numpy dict (PRNG key via key_data).
    ``fetch`` is a collective on a multi-process mesh — call on all hosts.
    One batched fetch for the whole state: per-field fetches each pay a
    device round trip (~20 ms on a tunneled TPU), every chunk."""
    return MH.fetch(
        {
            name: (jax.random.key_data(v) if name == "key" else v)
            for name, v in zip(state._fields, state)
        }
    )


def _blob_to_state(cls, blob: dict, place):
    """Rebuild a sampler state from a saved blob; ``place`` re-shards
    per-walker arrays over the current device mesh."""
    kwargs = {}
    for name in cls._fields:
        v = blob[name]
        kwargs[name] = (
            jax.random.wrap_key_data(jnp.asarray(v)) if name == "key" else place(v)
        )
    return cls(**kwargs)


def run_ensemble(
    log_prob_fn: Callable[[jax.Array], jax.Array],
    x0: np.ndarray,
    outdir: str,
    method: str = "zeus",
    transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ntimes: float = 10,
    tautol: float = 0.01,
    meanshift: float = 0.1,
    stdshift: float = 0.1,
    nk: float = 2,
    check_every: int = 100,
    max_iterations: int = 100_000,
    tau_window: int = 20_000,
    tau_check_growth: float = 1.05,
    tau_walkers: int = 64,
    convergence_check: bool = True,
    seed: int = 0,
    a: float = 2.0,
    slice_max_steps: int = 100,
    tune_chunks: int = 10,
    n_leapfrog: int = 10,
    max_depth: int = 5,
    m_adapt: int = 100,
    shard_walkers: bool = True,
    progress: bool = False,
    trace_rec: Optional[dict] = None,
):
    """Sample until converged; returns the backend holding the chain.

    ``method``: "emcee" (affine-invariant stretch, file ``chemcee_256.h5``)
    or "zeus" (ensemble slice, file ``zeus_256.h5``) — names kept for
    API parity with the reference (linna/util.py:1474-1504).

    ``tau_walkers``: walker-subset cap for the tau estimate (see
    convergence.integrated_time) — bounds the host FFT cost per check at
    large ensembles.  Set <= 0 or None to use every walker.

    ``convergence_check=False`` runs exactly ``max_iterations`` steps with no
    tau/stationarity evaluation at all (callers extending a finished chain
    under their own stopping rule, e.g. an external R-hat gate).

    ``trace_rec``: optional mutable dict (PhaseTimer record) receiving this
    call's wall breakdown — preconditioning, state init, the sampling loop's
    device wait vs host persistence/convergence time, and the step count.
    """
    import time as _time

    ps = {"precond": 0.0, "init": 0.0, "setup": 0.0, "device_wait": 0.0,
          "host": 0.0, "tau_checks": 0.0}
    _t_setup0 = _time.perf_counter()
    if not tau_walkers or tau_walkers <= 0:
        tau_walkers = None
    os.makedirs(outdir, exist_ok=True)
    x0 = np.asarray(x0, dtype=np.float32)
    nwalkers, ndim = x0.shape
    if method == "zeus" and nwalkers < 4:
        # the differential slice direction needs two DISTINCT walkers from
        # the complementary half; with a 1-walker complement the direction
        # is exactly zero and those walkers silently never move (while the
        # stepping-out loop burns max_steps batched evals per step)
        raise ValueError(
            f"method='zeus' needs nwalkers >= 4 (got {nwalkers}): the "
            "differential slice move draws two distinct walkers from the "
            "complementary half-ensemble"
        )
    key = jax.random.key(seed)
    tfn = _np_transform(transform)

    def _lp_split(fn):
        """(pure_fn, env) when the likelihood exposes its env decomposition
        (likelihood.make_log_prob), else (fn, None).  The env rides through
        the jitted chunk programs as a traced argument so trained weights
        never embed in the HLO — the chunk compiles once per shape ever
        (persistent cache) instead of once per iteration per run."""
        pure = getattr(fn, "_pure", None)
        return (pure, fn._env) if pure is not None else (fn, None)

    if method in ("emcee",) + GRADIENT_METHODS:
        backend = backends.EmceeBackend(os.path.join(outdir, EMCEE_FILENAME))
    elif method == "zeus":
        backend = backends.ZeusBackend(os.path.join(outdir, ZEUS_FILENAME))
    else:
        raise NotImplementedError(method)

    # In-memory chain window: only the most recent ~tau_window steps are kept
    # on the host (the HDF5 backend persists the full chain).  Both the tau
    # estimate and the split-half stationarity test operate on trailing
    # windows, and the tau*ntimes < iteration criterion only needs the step
    # count — so a rolling buffer gives identical convergence decisions with
    # O(tau_window) memory instead of O(iteration) and no per-check O(n)
    # re-concatenation of the full history.
    rolling: list = []
    rolling_len = 0

    def _push(chunk: np.ndarray) -> int:
        nonlocal rolling_len
        rolling.append(chunk)
        rolling_len += len(chunk)
        while rolling and rolling_len - len(rolling[0]) >= tau_window:
            rolling_len -= len(rolling[0])
            rolling.pop(0)
        return rolling_len

    # resume decision: the primary's filesystem view, broadcast so every pod
    # host takes the same branch (a non-primary host could otherwise observe
    # the file mid-reset and diverge — caught by tests/test_multihost_2proc.py)
    resume = bool(np.asarray(MH.broadcast(np.int32(backend.initialized if MH.is_primary() else 0))))
    # exact-resume blob: full sampler state + convergence bookkeeping saved
    # after every chunk (reference stores the emcee RNG/move state each
    # save_step, linna/sampler.py:346-368); absent on pre-upgrade chains,
    # which fall back to the statistical re-init path.  The primary's file
    # is authoritative: it loads once and the blob ships bit-exactly to
    # every pod host, so hosts can never take different init branches (exact
    # vs statistical dispatch different sharded programs — a pod hang) no
    # matter how stale a non-primary's shared-filesystem view is.
    state_blob = MH.broadcast_from_primary(backend.load_state) if resume else None
    if state_blob is not None:
        # emcee/hmc/nuts share one chain file, so a blob written by a
        # different method can be lying in wait: restoring it would either
        # KeyError on a missing field or — worse, hmc<->nuts whose field
        # names overlap — silently misinterpret step sizes and counters.
        saved_method = state_blob.get("_method")
        blob_fields = {k for k in state_blob if not k.startswith("_")}
        want_fields = set(_STATE_CLS[method]._fields)
        if (
            saved_method is not None
            and np.asarray(saved_method).item() != method.encode()
        ):
            warnings.warn(
                f"sampler_state was written by method "
                f"{np.asarray(saved_method).item().decode()!r}; resuming "
                f"{method!r} statistically from the chain positions",
                stacklevel=2,
            )
            state_blob = None
        elif blob_fields != want_fields:
            # pre-method-tag blob whose fields don't exactly match this
            # method's state class (same cross-method hazard, legacy files)
            warnings.warn(
                "sampler_state fields do not match the requested method's "
                "state; resuming statistically from the chain positions",
                stacklevel=2,
            )
            state_blob = None

    precond = None
    if method in GRADIENT_METHODS:
        # MAP + Hessian eigenbasis reparameterization; sample in the
        # whitened-curvature space with unit mass (linna/sampler.py:408-456).
        # The preconditioner persists to precond.npz so resume continues in
        # the SAME space without re-paying the MAP search.
        pfile = os.path.join(outdir, PRECOND_FILENAME)
        if resume and MH.primary_flag(os.path.isfile(pfile)):
            # primary loads, values ship bit-exactly (full f64) to all hosts
            # — a pod host with a lagging filesystem view neither crashes on
            # the read nor samples in a numerically different whitened space.
            # A corrupt/truncated file (pre-atomic-write versions could tear
            # it) loads as None and falls through to a fresh MAP search —
            # broadcast, so every pod host takes the same branch.
            def _load_precond():
                try:
                    z = np.load(pfile)
                    return z["center"], z["basis"], z["scales"]
                except Exception:
                    return None

            payload = MH.broadcast_from_primary(_load_precond)
            if payload is None:
                # the saved sampler state's coords/step sizes live in the OLD
                # preconditioned space — restoring them against a freshly
                # computed basis would silently misplace every walker; resume
                # statistically from the chain positions instead
                state_blob = None
                warnings.warn(
                    f"unreadable {PRECOND_FILENAME}; re-running the MAP "
                    "search and resuming statistically from the chain "
                    "positions (the chain continues in a fresh "
                    "preconditioned space)",
                    stacklevel=2,
                )
            else:
                precond = precondition.Preconditioner(*payload)
        if precond is None:
            _t0 = _time.perf_counter()
            precond = precondition.calc_hess_mass_mat(
                log_prob_fn, np.mean(x0, axis=0)
            )
            ps["precond"] += _time.perf_counter() - _t0
            if MH.is_primary():
                # atomic: a crash mid-savez would leave a truncated file that
                # passes the isfile gate forever and bricks every resume of
                # this chain (np.load -> BadZipFile inside the primary loader)
                tmp = pfile + ".tmp.npz"  # keep .npz so savez doesn't rename
                np.savez(
                    tmp,
                    center=precond.center,
                    basis=precond.basis,
                    scales=precond.scales,
                )
                os.replace(tmp, pfile)
        log_prob_fn = precond.wrap_log_prob(log_prob_fn)

    lp_fn, lp_env = _lp_split(log_prob_fn)

    def _init_jit(init_fn, skey, x0_dev, **kw):
        """Run a sampler-state init as ONE jitted device program.

        Eagerly, ``init_fn``'s log-prob / reasonable-epsilon math executes
        op-by-op — dozens of tiny XLA compiles per run (measured: minutes of
        wall on a remote-compile device, the faulthandler watchdog caught
        ``init_slice_state`` inside ``backend_compile_and_load``).  Jitted
        with the likelihood env as a traced argument the whole init is one
        data-independent program that persists in the compilation cache."""
        if lp_env is None:
            return jax.jit(lambda k, x: init_fn(k, x, log_prob_fn, **kw))(
                skey, x0_dev
            )
        return jax.jit(
            lambda k, x, env: init_fn(k, x, lambda xx: lp_fn(xx, env), **kw)
        )(skey, x0_dev, lp_env)

    iteration = 0
    hist_pending = 0  # persisted steps not yet hydrated into the window
    if resume:
        # primary view of the chain file, shipped to all hosts: walker
        # positions and the step counter drive both the sampler inputs and
        # every branch below — per-host reads could diverge on a lagging
        # shared-filesystem view
        x0, iteration = MH.broadcast_from_primary(
            lambda: (
                np.asarray(backend.get_last_sample(), dtype=np.float32),
                int(backend.iteration),
            )
        )
        if (
            state_blob is not None
            and "_iteration" in state_blob
            and int(np.asarray(state_blob["_iteration"])) != iteration
        ):
            # chain append and state save are two HDF5 transactions; a crash
            # between them leaves a blob one chunk behind the file.  Resuming
            # from it would regenerate and re-append that exact chunk (a
            # duplicated block that biases tau and the posterior) — fall back
            # to the statistical re-init path instead.  Blobs written before
            # the _iteration key existed are trusted as-is (pre-upgrade
            # behavior; they carry no crash marker either way).
            warnings.warn(
                f"sampler_state is {iteration - int(np.asarray(state_blob['_iteration']))} "
                "steps behind the chain file (crash between append and state "
                "save?) — discarding it and resuming statistically",
                stacklevel=2,
            )
            state_blob = None
        # The persisted history is only needed if a tau estimate actually
        # fires (it may never: short extensions, tau_check_growth past
        # max_iterations) — defer the HDF5 read until then, and read only
        # the trailing window slice instead of the full chain.
        hist_pending = iteration
    elif method == "emcee":
        if MH.is_primary():
            backend.reset(nwalkers, ndim)
        # burn-in with restart from the high-probability set
        key, bkey, rkey = jax.random.split(key, 3)
        bstate = _init_jit(stretch.init_state, bkey, jnp.asarray(x0))
        bstate, bchain, blps = stretch.stretch_chunk(
            lp_fn, bstate, 100, a, lp_env=lp_env
        )
        bchain, blps = MH.fetch((bchain, blps))
        flat = bchain.reshape(-1, ndim)
        flat_lp = blps.reshape(-1)
        top = flat[np.argsort(flat_lp)[::-1][: int(50 * nwalkers)]]
        pick = jax.random.randint(rkey, (nwalkers,), 0, len(top))
        x0 = top[np.asarray(pick)]

    def _hydrate() -> None:
        """Prepend the persisted chain tail to the rolling window (lazy)."""
        nonlocal hist_pending, rolling_len
        need = min(hist_pending, tau_window - rolling_len)
        if need > 0:
            # bound the read to the pre-resume rows: by the time a tau check
            # fires, the backend also holds the post-resume chunks that are
            # already in ``rolling`` — an unbounded get_chain would duplicate
            # them (and break time-ordering) in the window
            tail = np.asarray(backend.get_chain(discard=hist_pending - need))
            tail = tail[:need]
            rolling.insert(0, tail)
            rolling_len += len(tail)
        hist_pending = 0

    if not resume and method in GRADIENT_METHODS:
        if MH.is_primary():
            backend.reset(nwalkers, ndim)
        x0 = precond.draw_x0(np.random.default_rng(seed), nwalkers)
    elif resume and method in GRADIENT_METHODS:
        x0 = np.asarray(precond.to_sampling(x0), dtype=np.float32)

    walker_mesh = None
    if shard_walkers and jax.device_count() > 1:
        if nwalkers % (2 * jax.device_count()) == 0:
            # spread the ensemble over every chip: each half-ensemble update
            # becomes a data-parallel batch; GSPMD keeps the gather of stretch
            # partners / slice directions on ICI
            from jax.sharding import Mesh

            walker_mesh = Mesh(np.asarray(jax.devices()), ("walkers",))
        else:
            warnings.warn(
                f"walker sharding skipped: nwalkers={nwalkers} is not a "
                f"multiple of 2*device_count={2 * jax.device_count()}; the "
                f"ensemble runs on a single device — round nwalkers up to "
                f"{-(-nwalkers // (2 * jax.device_count())) * 2 * jax.device_count()} "
                f"to use all {jax.device_count()} devices",
                stacklevel=2,
            )

    def _place(a):
        """Device placement: per-walker arrays shard over the mesh."""
        a = np.asarray(a)
        if walker_mesh is None or a.ndim < 1 or a.shape[0] != nwalkers:
            return jnp.asarray(a)
        from jax.sharding import NamedSharding, PartitionSpec

        from ..parallel.mesh import put_global

        spec = PartitionSpec(*(("walkers",) + (None,) * (a.ndim - 1)))
        return put_global(a, NamedSharding(walker_mesh, spec))

    old_tau = np.inf
    prev_accepted = np.zeros(nwalkers)
    n_chunks_done = 0
    if state_blob is not None:
        # exact resume: reconstruct the sampler state (PRNG key, per-walker
        # step sizes, dual-averaging state, slice mu, acceptance counters)
        # and the convergence bookkeeping — the continued chain is bitwise
        # identical to an uninterrupted run
        state = _blob_to_state(_STATE_CLS[method], state_blob, _place)
        if "accepted" in state_blob:
            prev_accepted = np.asarray(state_blob["accepted"], np.float64)
        old_tau = np.asarray(state_blob["_old_tau"], np.float64)
        if method == "zeus":
            old_tau = float(old_tau[0]) if old_tau.size else np.inf
        n_chunks_done = int(state_blob["_n_chunks_done"])
    else:
        _t0 = _time.perf_counter()
        x0_dev = _place(x0)
        key, skey = jax.random.split(key)
        if method == "emcee":
            state = _init_jit(stretch.init_state, skey, x0_dev)
        elif method == "hmc":
            state = _init_jit(hmc.init_hmc_state, skey, x0_dev)
        elif method == "nuts":
            state = _init_jit(hmc.init_nuts_state, skey, x0_dev, m_adapt=m_adapt)
        else:
            state = _init_jit(slicemove.init_slice_state, skey, x0_dev)
        jax.block_until_ready(state.coords)
        ps["init"] += _time.perf_counter() - _t0
    # Tau recomputation cadence: the batched-FFT tau estimate over the
    # trailing window is the dominant host cost per check at production
    # sizes (seconds per call), and re-estimating it every 100 steps on a
    # chain that is nowhere near tau*ntimes < iteration is pure waste.  It
    # is recomputed only once the chain has grown ``tau_check_growth``x
    # since the last estimate (>=1 chunk), making the total tau cost
    # O(log(total_steps)) estimates per run while keeping the convergence
    # decision cadence tight near the end (5% of chain length).  Set
    # ``tau_check_growth=1.0`` for the reference's strict every-100-step
    # estimates (linna/sampler.py:530-538).
    next_tau_iter = iteration
    last_tau_iter = iteration
    if state_blob is not None and "_next_tau_iter" in state_blob:
        next_tau_iter = float(state_blob["_next_tau_iter"])
        last_tau_iter = int(state_blob["_last_tau_iter"])

    converged_flag = False
    finished_flag = False

    def _save_state() -> None:
        # fetch inside _state_to_blob is a collective — all hosts call this;
        # only the primary writes the sampler_state group
        blob = _state_to_blob(state)
        blob["_method"] = np.bytes_(method)
        blob["_iteration"] = np.asarray(int(iteration))
        blob["_old_tau"] = np.atleast_1d(np.asarray(old_tau, np.float64))
        blob["_n_chunks_done"] = np.asarray(n_chunks_done)
        blob["_next_tau_iter"] = np.asarray(float(next_tau_iter))
        blob["_last_tau_iter"] = np.asarray(int(last_tau_iter))
        blob["_converged"] = np.asarray(bool(converged_flag))
        # terminal marker: False for every mid-run save, True once the run
        # exits through ANY legitimate stop (converged, max_iterations,
        # NaN-tau bailout).  Distinguishes a chain whose process died mid-run
        # (no terminal save → orchestrator._chain_incomplete resumes it) from
        # one that stopped on purpose without converging, which the reference
        # skips on bare existence (linna/main.py:273-274) and which would
        # otherwise be re-entered — and re-extended — on every restart.
        blob["_finished"] = np.asarray(bool(finished_flag))
        if MH.is_primary():
            backend.save_state(blob)

    def _tau_check():
        """Evaluate the three-part convergence test on the trailing window.

        Returns (converged, nan_stop) and advances the tau bookkeeping
        (old_tau, cadence markers).  Shared by the in-loop cadence check and
        the on-resume re-evaluation of an already-converged chain."""
        nonlocal old_tau, last_tau_iter, next_tau_iter
        steps_since_tau = iteration - last_tau_iter
        last_tau_iter = iteration
        next_tau_iter = iteration * tau_check_growth
        # The reference's Delta-tau criterion is |tau_new - tau_old| / tau
        # over ONE check interval (check_every steps, linna/sampler.py:545).
        # With the geometric cadence consecutive estimates are further
        # apart, so the raw ratio would measure drift over a longer window
        # and e.g. a tau ~ 0.08*n burn-in transient would sit at ~5% forever
        # (> tautol) even where the reference's per-100-step test passes.
        # Normalizing to a per-check_every rate restores the reference
        # semantics exactly at cadence=check_every and per-step-equivalent
        # behavior otherwise.
        dtau_scale = check_every / max(steps_since_tau, check_every)

        # tau is estimated over at most the trailing ``tau_window`` steps —
        # that caps both the per-check FFT cost (O(n log n) in window size)
        # and host memory; the tau*ntimes < iteration test uses the full
        # persisted step count.  The estimate runs on the PRIMARY alone (its
        # window may hydrate from the HDF5 chain file, run.py _hydrate) and
        # the verdict + new tau ship to every host, so the loop's
        # break/continue branch is identical everywhere no matter how stale
        # a non-primary's filesystem view is.
        def _estimate():
            _hydrate()
            recent = np.concatenate(rolling) if len(rolling) > 1 else rolling[0]
            if method != "zeus":
                tau = convergence.integrated_time(
                    recent[-tau_window:], max_walkers=tau_walkers
                )
                if np.isnan(np.sum(tau)) and iteration > 10:
                    return False, True, None
                converged = bool(np.all(tau * ntimes < iteration))
                converged &= bool(
                    np.all(np.abs(old_tau - tau) / tau * dtau_scale < tautol)
                )
                window = max(int(nk * np.mean(tau)), 2)
                converged &= convergence.check_mean_std(
                    recent[-window:], meanshift, stdshift
                )
            else:
                # zeus path: scalar mean tau over the chain minus 20% burn-in
                # (linna/sampler.py:682-691, discard=0.2).  The burn-in cut is
                # applied exactly: steps older than the in-memory window are
                # all pre-burn-in once 0.8*iteration exceeds the window.
                burn = int(0.2 * iteration)
                behind = iteration - len(recent)  # older steps, not in memory
                drop = max(0, burn - behind)
                tau_arr = convergence.integrated_time(
                    recent[drop:][-tau_window:], max_walkers=tau_walkers
                )
                tau = float(np.mean(tau_arr))
                converged = tau * ntimes < iteration
                converged &= bool(
                    np.abs(old_tau - tau) / tau * dtau_scale < tautol
                )
                window = max(int(nk * tau), 2)
                converged &= convergence.check_mean_std(
                    recent[-window:], meanshift, stdshift
                )
            if progress:
                print(
                    f"iter {iteration}: tau={np.mean(tau):.2f} "
                    f"converged={converged}",
                    flush=True,
                )
            return converged, False, tau

        converged, nan_stop, tau = MH.broadcast_from_primary(_estimate)
        if nan_stop:
            return False, True
        old_tau = tau
        return converged, False

    # Idempotent restart on a converged chain: when the persisted state says
    # the previous run stopped because the convergence test passed, re-run
    # the test on the existing chain under the CURRENT criteria (they may
    # have been tightened) before sampling anything — if it still passes,
    # the chain is returned untouched instead of being extended by another
    # chunk (reference analogue: the orchestrator's finish.json file gating,
    # linna/util.py:1506-1516; here the sampler itself is restart-safe).
    def _finish_trace() -> None:
        if trace_rec is not None:
            trace_rec["sampler"] = {k: round(v, 3) for k, v in ps.items()}
            trace_rec["steps_run"] = int(iteration)

    ps["setup"] = _time.perf_counter() - _t_setup0 - ps["precond"] - ps["init"]
    if (
        convergence_check
        and state_blob is not None
        and bool(np.asarray(state_blob.get("_converged", False)))
        and rolling_len + hist_pending > 0
    ):
        _t_tc = _time.perf_counter()
        already_done, _ = _tau_check()
        ps["tau_checks"] += _time.perf_counter() - _t_tc
        if already_done:
            converged_flag = True
            _finish_trace()
            return backend

    def _advance(st):
        """Dispatch one check_every-step device chunk (async — returns
        future arrays; nothing blocks until the host touches them)."""
        # walker_mesh routes the ensemble moves through shard_over_walkers
        # (device-local while_loops; 2 collectives/step instead of 10-30 —
        # stretch.py/slicemove.py docstrings); HMC/NUTS chunks have zero
        # cross-walker data motion and need no mesh plumbing
        if method == "emcee":
            return stretch.stretch_chunk(
                lp_fn, st, check_every, a, lp_env=lp_env, mesh=walker_mesh
            )
        if method == "hmc":
            return hmc.hmc_chunk(lp_fn, st, check_every, n_leapfrog, lp_env=lp_env)
        if method == "nuts":
            return hmc.nuts_chunk(lp_fn, st, check_every, max_depth, lp_env=lp_env)
        return slicemove.slice_chunk(
            lp_fn, st, check_every, slice_max_steps, lp_env=lp_env,
            mesh=walker_mesh,
        )

    # Double-buffered dispatch: chunk k+1 is enqueued on the device BEFORE
    # the host consumes chunk k's results, so the HDF5 append, the prior
    # transform, and the tau/stationarity FFTs all overlap device sampling
    # instead of leaving the device idle (JAX dispatch is asynchronous; the
    # fetch of chunk k's arrays only synchronizes chunk k — the device keeps
    # executing chunk k+1).  On an early break (converged / NaN tau) the
    # pending chunk is discarded: check_every wasted device steps, versus a
    # host-bound serial loop everywhere else.  The persisted chain, saved
    # state, and resume behavior are bitwise identical to serial execution
    # (zeus mu-tuning is applied to the post-chunk state before the next
    # dispatch, exactly as in the serial order).
    pending = None
    while iteration < max_iterations:
        if pending is None:
            pending = _advance(state)
        state, chain, lps = pending
        if method == "zeus" and n_chunks_done < tune_chunks:
            state = slicemove.tune_mu(state)
        pending = (
            _advance(state) if iteration + check_every < max_iterations else None
        )
        # fetch: replicate device results onto every host (collective when
        # walkers are sharded across processes) before host-side appends and
        # convergence math — all hosts see identical values, only the primary
        # writes the HDF5 file
        _t0 = _time.perf_counter()
        if method == "zeus":
            chain, lps = MH.fetch((chain, lps))
        else:  # one batched round trip for chunk + acceptance counters
            chain, lps, acc = MH.fetch((chain, lps, state.accepted))
            acc = acc.astype(np.float64)
        _t1 = _time.perf_counter()
        ps["device_wait"] += _t1 - _t0
        if method == "emcee":
            if MH.is_primary():
                backend.append(
                    chain.astype(np.float64),
                    lps.astype(np.float64),
                    acc - prev_accepted,
                    transform=tfn,
                )
            prev_accepted = acc
        elif method in GRADIENT_METHODS:
            # acc: cumulative mean Metropolis alpha per walker (H&G Alg. 6)
            # — the real statistic, not a constant
            # store in the original (whitened-prior) space
            chain = chain.astype(np.float64)
            chain = precond.to_original(chain.reshape(-1, ndim)).reshape(chain.shape)
            if MH.is_primary():
                backend.append(
                    chain,
                    lps.astype(np.float64),
                    acc - prev_accepted,
                    transform=tfn,
                )
            prev_accepted = acc
        else:
            if MH.is_primary():
                backend.append(
                    chain.astype(np.float64), lps.astype(np.float64), transform=tfn
                )
        _push(np.asarray(chain))
        iteration += check_every
        n_chunks_done += 1

        if not convergence_check or iteration < next_tau_iter:
            _save_state()
            ps["host"] += _time.perf_counter() - _t1
            continue
        _t2 = _time.perf_counter()
        ps["host"] += _t2 - _t1
        converged, nan_stop = _tau_check()
        _t3 = _time.perf_counter()
        ps["tau_checks"] += _t3 - _t2
        converged_flag = converged
        _save_state()
        ps["host"] += _time.perf_counter() - _t3
        if converged or nan_stop:
            break

    # legitimate exit (converged / max_iterations / NaN-tau): stamp the
    # terminal marker so restarts treat this chain as complete rather than
    # mid-run dead (the in-loop saves could not know the loop was ending)
    finished_flag = True
    _save_state()
    _finish_trace()
    return backend
