"""Background ahead-of-time compile warming for the training programs.

On a fresh machine every iteration's training dispatch pays a full XLA
compile, because each iteration trains on a differently-sized stack (the
reference schedule grows it by ``ntrain`` rows per iteration,
linna/main.py:47-75).  Measured at the LSST flagship shape over a
remote-compile TPU link these compiles were 152 s of the 587 s training wall
(trace.json ``dispatch``) — pure serial latency, since the chip is idle while
the compiler runs.

The training programs are *data-independent by construction*: the fitted
transforms, loss tensors and trained weights all ride through the jitted
functions as traced ARGUMENTS (see Trainer._loss), so iteration ``i``'s
program is fully determined by static shapes known at run start —
(model spec, stacked row counts, batch size, ensemble size, chunk length,
compute dtype).  :func:`warm_ensemble_training` therefore lowers and
compiles each future iteration's exact programs in a daemon thread while
iteration 0 is still generating data and training; the resulting
executables land in JAX's persistent compilation cache, and the foreground
dispatch later finds them there instead of compiling (a cache read is
~1-2 s vs 30-60 s).

The warm thread performs no device execution beyond a few tiny constant
transfers: the big arrays are ``jax.ShapeDtypeStruct``s and the member
params/optimizer state are built by the SAME constructors the real
EnsembleTrainer uses (so the lowered HLO — including donation and GSPMD
sharding annotations — is byte-identical and the cache key matches).

Gating (see :func:`ml_sampler_core`'s call site): single-process runs with
the default curation path only — ypositive row drops, chisq cuts and
best-point injection change the stacked row counts in data-dependent ways,
making the future shapes unknowable.  A warm miss is harmless (the
foreground compiles exactly as before); the env var ``LINNA_PRECOMPILE=0``
disables warming entirely.
"""

from __future__ import annotations

import os
import threading
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "warm_ensemble_training",
    "warm_pipeline",
    "iter_lowered",
    "iter_lowered_sampler",
    "enabled",
    "compile_cache_enabled",
    "compile_cache_dir",
]


def compile_cache_dir() -> Optional[str]:
    """The persistent XLA compilation cache directory, or ``None`` when the
    cache is disabled (the single source of truth for the
    ``LINNA_COMPILE_CACHE`` knob: set to a path to relocate, ``0``/empty to
    disable)."""
    d = os.environ.get("LINNA_COMPILE_CACHE", "/tmp/linna_jax_cache")
    return None if d in ("0", "") else d


def compile_cache_enabled() -> bool:
    """Whether the persistent XLA compilation cache is on."""
    return compile_cache_dir() is not None


def enabled() -> bool:
    # Warming pays off ONLY through the persistent compilation cache: the
    # warm thread's executables live under dummy-trainer jit identities the
    # foreground never reuses in-process.  With the cache off, warming is
    # pure wasted compile work competing with the foreground.
    return (
        os.environ.get("LINNA_PRECOMPILE", "1") != "0"
        and compile_cache_enabled()
    )


def _chunk_lengths(num_epochs: int, epochs_per_dispatch: int) -> List[int]:
    """Distinct device-chunk lengths the dispatch loop can request on its
    intervention-free path (train.DispatchSchedule — the guard-sized chunks
    through the flat-start window, the steady-state maximum, and the tail),
    plus the post-intervention ramp lengths (guard*2^n) so a recovery does
    not pay a cold compile mid-run."""
    from ..train import DispatchSchedule

    sched = DispatchSchedule(epochs_per_dispatch)
    out: List[int] = []
    for k in sched.quiet_path_lengths(num_epochs):
        if k not in out:
            out.append(k)
    # the post-intervention guard chunk (k_at with quiet=0) — usually
    # already present from the flat-window prefix
    if sched.guard <= num_epochs and sched.guard not in out:
        out.append(sched.guard)
    return out


def iter_lowered(
    model_name: str,
    ndim: int,
    ndata: int,
    n_members: int,
    shapes: Sequence[Tuple[int, int]],
    batch_size: int,
    chunk_lengths: Sequence[int],
    compute_dtype: Optional[str],
    lr_sweep_iters: int = 100,
):
    """Yield (label, lowered) for every ensemble training program the given
    schedule will dispatch — built from a dummy trainer whose constructors
    match the production ``EnsembleTrainer`` exactly, so each lowered HLO is
    byte-identical to the real dispatch's (tested) and the compile-cache key
    matches."""
    import jax
    import jax.numpy as jnp

    from .. import losses as L
    from .. import nn as N
    from .. import transforms as T
    from .ensemble import EnsembleTrainer

    spec = N.make_model_spec(model_name, ndim, ndata)

    # real (tiny) transform/loss pytrees via the production constructors, so
    # leaf dtypes/weak-types — and therefore the traced HLO — match exactly
    tset = T.TransformSet(
        T.fit_x_transform(np.zeros((4, ndim)) + 0.5, None),
        T.fit_y_transform(np.ones((4, ndata))),
        T.YTransformData(jnp.ones((ndata,), jnp.float32)),
    )
    lstate = L.build_loss_state(np.ones(ndata), np.eye(ndata), tset)

    # a real EnsembleTrainer: same mesh, same member init + optimizer-state
    # constructors => identical param/opt pytrees, shardings and donation
    trainer = EnsembleTrainer(
        spec,
        tset,
        lstate,
        outdirs=[None] * n_members,  # never written: train() is not called
        seeds=list(range(n_members)),
        compute_dtype=compute_dtype,
    )
    ekeys = jnp.stack([jax.random.key(i) for i in range(n_members)])

    f32 = jnp.float32
    for n_train, n_val in shapes:
        trainer._batch_size = min(int(batch_size), int(n_train))
        tx = jax.ShapeDtypeStruct((n_train, ndim), f32)
        ty = jax.ShapeDtypeStruct((n_train, ndata), f32)
        vx = jax.ShapeDtypeStruct((n_val, ndim), f32)
        vy = jax.ShapeDtypeStruct((n_val, ndata), f32)
        for k in chunk_lengths:
            yield f"epochs_n{n_train}_k{k}", EnsembleTrainer._epochs_members.lower(
                trainer, trainer.params, trainer.opt_state, ekeys,
                tx, ty, vx, vy, int(k), tset, lstate,
            )
        order = jax.ShapeDtypeStruct((n_train,), jnp.int32)
        lrs = jax.ShapeDtypeStruct((lr_sweep_iters,), f32)
        yield f"lr_sweep_n{n_train}", EnsembleTrainer._lr_sweep_members.lower(
            trainer, trainer.params, order, lrs, tx, ty, lr_sweep_iters,
            tset, lstate,
        )


def _warm_shapes(*args, **kwargs) -> int:
    """Compile every program from :func:`iter_lowered`; returns the count.
    Runs in the warm thread; failures are dropped by the caller."""
    compiled = 0
    for _label, lowered in iter_lowered(*args, **kwargs):
        lowered.compile()
        compiled += 1
    return compiled


def _dummy_log_prob(model_name: str, ndim: int, ndata: int, n_members: int):
    """A likelihood built exactly like the orchestrator's sampling-phase one
    (likelihood.make_log_prob over retrieved ensemble params) but from dummy
    values of the right shapes — its ``(_pure, _env)`` decomposition traces
    to the same HLO as the real iteration's."""
    import jax
    import jax.numpy as jnp

    from .. import likelihood as LK
    from .. import nn as N
    from .. import priors as P
    from .. import transforms as T

    spec = N.make_model_spec(model_name, ndim, ndata)
    tset = T.TransformSet(
        T.fit_x_transform(np.zeros((4, ndim)) + 0.5, None),
        T.fit_y_transform(np.ones((4, ndata))),
        T.YTransformData(jnp.ones((ndata,), jnp.float32)),
    )
    pack = P.priors_from_list(
        [{"dist": "flat", "arg1": -1.0, "arg2": 1.0}] * ndim
    )
    members = [
        N.init_model(jax.random.key(m), spec) for m in range(n_members)
    ]
    return LK.make_log_prob(
        spec,
        members if n_members > 1 else members[0],
        tset,
        pack,
        np.zeros(ndata),
        np.eye(ndata),
    )


def iter_lowered_sampler(
    model_name: str,
    ndim: int,
    ndata: int,
    n_members: int,
    nwalkers: int,
    methods: Sequence[str],
    check_every: int = 100,
    slice_max_steps: int = 100,
    a: float = 2.0,
    max_depth: int = 5,
    m_adapt: int = 100,
):
    """Yield (label, lowered) for each distinct sampler method's device
    programs (state init + chunk; for gradient methods also the MAP
    neg/grad/hessian jits), matching the programs
    :func:`linna_tpu.samplers.run.run_ensemble` dispatches."""
    import jax
    import jax.numpy as jnp

    from ..samplers import hmc, slicemove, stretch

    lp = _dummy_log_prob(model_name, ndim, ndata, n_members)
    lp_fn, env = lp._pure, lp._env
    f32 = jnp.float32
    key = jax.random.key(0)
    x0 = jax.ShapeDtypeStruct((nwalkers, ndim), f32)
    kdt = key.dtype

    # mirror run.py's walker-mesh condition so the warmed chunk program is
    # byte-identical to the one run_ensemble will dispatch: on a multi-device
    # machine with a compatible walker count that is the shard_map variant
    walker_mesh = None
    if jax.device_count() > 1 and nwalkers % (2 * jax.device_count()) == 0:
        from jax.sharding import Mesh

        walker_mesh = Mesh(np.asarray(jax.devices()), ("walkers",))

    def init_lowered(init_fn, **kw):
        # identical construction to run.py's _init_jit
        return jax.jit(
            lambda k, x, e: init_fn(k, x, lambda xx: lp_fn(xx, e), **kw)
        ).lower(key, x0, env)

    done = set()
    for method in methods:
        if method in done:
            continue
        done.add(method)
        if method == "zeus":
            yield "zeus_init", init_lowered(slicemove.init_slice_state)
            state = slicemove.SliceState(
                x0,
                jax.ShapeDtypeStruct((nwalkers,), f32),
                jax.ShapeDtypeStruct((), kdt),
                jax.ShapeDtypeStruct((), f32),
                jax.ShapeDtypeStruct((), jnp.int32),
                jax.ShapeDtypeStruct((), jnp.int32),
            )
            yield "zeus_chunk", slicemove.slice_chunk.lower(
                lp_fn, state, check_every, slice_max_steps, lp_env=env,
                mesh=walker_mesh,
            )
        elif method == "emcee":
            yield "emcee_init", init_lowered(stretch.init_state)
            state = stretch.EnsembleState(
                x0,
                jax.ShapeDtypeStruct((nwalkers,), f32),
                jax.ShapeDtypeStruct((), kdt),
                jax.ShapeDtypeStruct((nwalkers,), jnp.int32),
            )
            yield "emcee_chunk", stretch.stretch_chunk.lower(
                lp_fn, state, check_every, a, lp_env=env, mesh=walker_mesh
            )
        elif method in ("hmc", "nuts"):
            # the MAP search + Hessian jits (precondition.calc_hess_mass_mat)
            x1 = jax.ShapeDtypeStruct((ndim,), f32)

            def single(x, e):
                return jnp.squeeze(lp_fn(jnp.asarray(x, f32)[None, :], e))

            yield f"{method}_map_f", jax.jit(
                lambda x, e: -single(x, e)
            ).lower(x1, env)
            yield f"{method}_map_g", jax.jit(
                jax.grad(lambda x, e: -single(x, e), argnums=0)
            ).lower(x1, env)
            yield f"{method}_map_h", jax.jit(
                jax.hessian(lambda x, e: -single(x, e), argnums=0)
            ).lower(x1, env)

            # the preconditioner-wrapped likelihood (same env nesting as
            # Preconditioner.wrap_log_prob)
            from ..samplers.precondition import Preconditioner

            pre = Preconditioner(
                np.zeros(ndim), np.eye(ndim), np.ones(ndim)
            )
            wrapped = pre.wrap_log_prob(lp)
            wfn, wenv = wrapped._pure, wrapped._env

            def winit_lowered(init_fn, **kw):
                return jax.jit(
                    lambda k, x, e: init_fn(
                        k, x, lambda xx: wfn(xx, e), **kw
                    )
                ).lower(key, x0, wenv)

            if method == "nuts":
                yield "nuts_init", winit_lowered(
                    hmc.init_nuts_state, m_adapt=m_adapt
                )
                state = hmc.NUTSState(
                    x0,
                    jax.ShapeDtypeStruct((nwalkers,), f32),
                    x0,
                    jax.ShapeDtypeStruct((), kdt),
                    jax.ShapeDtypeStruct((nwalkers,), f32),
                    jax.ShapeDtypeStruct((nwalkers,), f32),
                    jax.ShapeDtypeStruct((nwalkers,), f32),
                    jax.ShapeDtypeStruct((nwalkers,), f32),
                    jax.ShapeDtypeStruct((nwalkers,), f32),
                    jax.ShapeDtypeStruct((), jnp.int32),
                    jax.ShapeDtypeStruct((nwalkers,), f32),
                )
                yield "nuts_chunk", hmc.nuts_chunk.lower(
                    wfn, state, check_every, max_depth, lp_env=wenv
                )
            else:
                yield "hmc_init", winit_lowered(hmc.init_hmc_state)
                state = hmc.HMCState(
                    x0,
                    jax.ShapeDtypeStruct((nwalkers,), f32),
                    x0,
                    jax.ShapeDtypeStruct((), kdt),
                    jax.ShapeDtypeStruct((nwalkers,), f32),
                    jax.ShapeDtypeStruct((nwalkers,), jnp.int32),
                )
                yield "hmc_chunk", hmc.hmc_chunk.lower(
                    wfn, state, check_every, 10, lp_env=wenv
                )


def warm_ensemble_training(
    model_name: str,
    ndim: int,
    ndata: int,
    n_members: int,
    shapes: Sequence[Tuple[int, int]],
    batch_size: int,
    num_epochs: int,
    epochs_per_dispatch: int,
    compute_dtype: Optional[str],
    block: bool = False,
) -> Optional[threading.Thread]:
    """Start (or run inline with ``block=True``, for tests) the compile
    warmer for the given future stack ``shapes`` [(n_train, n_val), ...].

    Returns the daemon thread (or None when disabled/empty).  Exceptions in
    the thread are swallowed: warming must never take down the pipeline."""
    return warm_pipeline(
        model_name, ndim, ndata, n_members, shapes, batch_size, num_epochs,
        epochs_per_dispatch, compute_dtype, methods=(), nwalkers=0,
        block=block,
    )


def warm_pipeline(
    model_name: str,
    ndim: int,
    ndata: int,
    n_members: int,
    shapes: Sequence[Tuple[int, int]],
    batch_size: int,
    num_epochs: int,
    epochs_per_dispatch: int,
    compute_dtype: Optional[str],
    methods: Sequence[str] = (),
    nwalkers: int = 0,
    block: bool = False,
) -> Optional[threading.Thread]:
    """Warm the full pipeline's device programs in one daemon thread:
    iteration 0's training shape first, then the first sampler method's
    programs (needed right after iteration 0's training), then the remaining
    training shapes and sampler methods in schedule order.

    ``methods``/``nwalkers`` empty disables the sampler half.  Exceptions
    are swallowed; ``block=True`` runs inline (tests)."""
    shapes = [s for s in shapes]
    methods = [str(m) for m in methods]
    if not enabled() or not (shapes or methods):
        return None
    chunk_lengths = _chunk_lengths(int(num_epochs), int(epochs_per_dispatch))

    def run():
        try:
            if shapes:
                _warm_shapes(
                    model_name, ndim, ndata, n_members, shapes[:1],
                    batch_size, chunk_lengths, compute_dtype,
                )
            if methods and nwalkers:
                for _label, lowered in iter_lowered_sampler(
                    model_name, ndim, ndata, n_members, int(nwalkers),
                    methods[:1],
                ):
                    lowered.compile()
            if len(shapes) > 1:
                _warm_shapes(
                    model_name, ndim, ndata, n_members, shapes[1:],
                    batch_size, chunk_lengths, compute_dtype,
                )
            if methods and nwalkers:
                for _label, lowered in iter_lowered_sampler(
                    model_name, ndim, ndata, n_members, int(nwalkers),
                    [m for m in methods[1:] if m != methods[0]],
                ):
                    lowered.compile()
        except Exception:  # pragma: no cover - best-effort by design
            pass

    if block:
        run()
        return None
    t = threading.Thread(target=run, name="linna-compile-warmer", daemon=True)
    t.start()
    return t
