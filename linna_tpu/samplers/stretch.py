"""Affine-invariant ensemble "stretch" move, fully jit-compiled on device.

This replaces the reference's emcee path (linna/sampler.py:494-495,530-554)
where every walker's log-probability was a separate host/MPI task
(linna/util.py:990).  Here one device program advances the WHOLE ensemble
``nsteps`` steps: a ``lax.scan`` over steps, each step updating the two
Goodman-Weare half-ensembles in turn with the complementary half as the
stretch-partner pool, and the batched emulator likelihood evaluated for all
active walkers in one MXU matmul stack.  Chunks of ~100 steps stream back to
the host for HDF5 persistence and convergence checks, matching the
reference's check cadence (linna/sampler.py:530-538).

Proposal: z ~ g(z) ∝ 1/sqrt(z) on [1/a, a] via z = ((a-1)u + 1)^2 / a,
accept with ln q = (D-1) ln z + logp(y) - logp(x)  (Goodman & Weare 2010,
as in emcee's StretchMove).

Performance notes (measured on v5e at the flagship shape, 4096 walkers,
27 -> 457 emulator; the likelihood itself runs at ~44 M evals/s ≈ 70% of
the chip's achievable matmul rate, so the move machinery is what's left to
optimize):

- all of a chunk's random numbers are generated in three batched draws
  BEFORE the step scan instead of per step.  Per-step threefry generation
  sat serially between the likelihood matmuls and cost ~40% of the chunk's
  device time; batched pre-generation amortizes the counter-mode hashing
  and overlaps with nothing the steps need (2.7 ms/chunk saved of 15.8);
- the scan carries the ensemble as ``(2, W/2, D)`` so each step's two
  half-updates are row slices and restacks, not concatenates.  The chunk's
  persisted chain view reshapes back to ``(nsteps, W, D)`` for free
  (contiguous) — the public API and the walker-axis sharding are unchanged
  (1.4 ms/chunk saved).

Net: 25.9 -> 36.7 M walker-evals/s at the bench shape, identical sampler
semantics (the PRNG stream ordering differs from the per-step-split
implementation, so chains are not bitwise comparable across this change —
within a version, seeded runs and exact resume remain bitwise
deterministic).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = [
    "EnsembleState",
    "bind_env",
    "init_state",
    "shard_over_walkers",
    "stretch_chunk",
]


def bind_env(log_prob_fn: Callable, lp_env) -> Callable:
    """Close a pure two-argument likelihood ``fn(x, env)`` over its traced
    env (likelihood.make_log_prob's ``_pure``/``_env`` split — keeps trained
    weights/transforms out of the compiled HLO so chunk programs persist in
    the compilation cache across runs).  ``lp_env is None`` means
    ``log_prob_fn`` is already a closed one-argument callable."""
    if lp_env is None:
        return log_prob_fn
    return lambda x: log_prob_fn(x, lp_env)


class EnsembleState(NamedTuple):
    coords: jax.Array  # f32[W, D]
    log_prob: jax.Array  # f32[W]
    key: jax.Array  # PRNG key
    accepted: jax.Array  # i32[W] cumulative acceptance counts


def init_state(
    key: jax.Array, x0: jax.Array, log_prob_fn: Callable[[jax.Array], jax.Array]
) -> EnsembleState:
    x0 = jnp.asarray(x0, jnp.float32)
    if x0.shape[0] % 2:
        # same contract as emcee's RedBlueMove; the (2, W/2, D) chunk layout
        # relies on it, and an odd count would otherwise surface as an
        # opaque reshape error inside the jitted chunk
        raise ValueError(
            f"nwalkers must be even for the stretch move (got {x0.shape[0]})"
        )
    lp = log_prob_fn(x0)
    return EnsembleState(
        x0, lp, key, jnp.zeros(x0.shape[0], jnp.int32)
    )


def _half_update(
    log_prob_fn, a: float, ndim: int, active_x, active_lp, comp_x, prt, u, u_acc
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Update one half-ensemble given the complementary half and this step's
    pre-drawn randoms (partner indices, z-uniforms, log accept-uniforms)."""
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    partner_x = comp_x[prt]
    proposal = partner_x + z[:, None] * (active_x - partner_x)
    prop_lp = log_prob_fn(proposal)
    ln_accept = (ndim - 1.0) * jnp.log(z) + prop_lp - active_lp
    accept = u_acc < ln_accept
    new_x = jnp.where(accept[:, None], proposal, active_x)
    new_lp = jnp.where(accept, prop_lp, active_lp)
    return new_x, new_lp, accept


def shard_over_walkers(mesh, scan_fn, carry_specs, xs_specs, ys_specs):
    """Wrap a per-chunk scan so each device advances only ITS walker block
    (VERDICT r4 item 3).

    Under plain jit+GSPMD the chunk's cross-walker reductions (while_loop
    conds, acceptance counters) and the complementary-half partner gathers
    each lower to per-iteration collectives — 10/step for stretch, 30/step
    for the slice move's stepping-out/shrink loops (SCALING.json r4 census).
    Under ``shard_map`` those reductions are DEVICE-LOCAL: the only
    cross-device data motion left is one small all-gather of the
    complementary half-ensemble per half-update (half x ndim floats over
    ICI, two per step), handed to ``scan_fn`` as the ``gather`` callable.
    Scalar counters psum once per chunk inside ``scan_fn``.

    ``scan_fn(carry, xs, gather, axis)`` must return ``(carry, ys)`` like a
    completed ``lax.scan``; specs are PartitionSpec pytrees matching those
    structures.  Walker-sharded RNG that draws *inside* the device loop must
    decorrelate per device via ``jax.random.fold_in(key,
    jax.lax.axis_index(axis))`` — pre-drawn step-fixed randoms shard with
    their walkers and keep the exact global stream."""
    axis = mesh.axis_names[0]

    def body(carry, xs):
        gather = lambda x: jax.lax.all_gather(x, axis, tiled=True)
        return scan_fn(carry, xs, gather, axis)

    return jax.shard_map(
        body,
        mesh=mesh,
        in_specs=(carry_specs, xs_specs),
        out_specs=(carry_specs, ys_specs),
        check_vma=False,
    )


def _stretch_scan(log_prob_fn, a, ndim, nsteps, carry, xs, gather, axis):
    """The chunk's step scan, shared by the single-device and walker-sharded
    paths: ``gather`` replicates the complementary half before the partner
    indexing (identity on one device; one all-gather per half-update on a
    mesh — the only cross-device collective in the chunk)."""

    def step(carry, xs):
        c2, lp2, acc2 = carry
        prt, u, ua = xs
        nx0, nlp0, a0 = _half_update(
            log_prob_fn, a, ndim, c2[0], lp2[0], gather(c2[1]), prt[0], u[0], ua[0]
        )
        nx1, nlp1, a1 = _half_update(
            log_prob_fn, a, ndim, c2[1], lp2[1], gather(nx0), prt[1], u[1], ua[1]
        )
        c2 = jnp.stack([nx0, nx1])
        lp2 = jnp.stack([nlp0, nlp1])
        acc2 = acc2 + jnp.stack([a0, a1]).astype(jnp.int32)
        return (c2, lp2, acc2), (c2, lp2)

    return jax.lax.scan(step, carry, xs, length=nsteps)


@partial(jax.jit, static_argnums=(0, 2, 3, 5))
def stretch_chunk(
    log_prob_fn: Callable[[jax.Array], jax.Array],
    state: EnsembleState,
    nsteps: int,
    a: float = 2.0,
    lp_env=None,
    mesh=None,
):
    """Advance ``nsteps`` stretch-move steps; returns (state, chain, log_probs)
    with chain f32[nsteps, W, D] and log_probs f32[nsteps, W].

    ``lp_env``: optional traced pytree for a pure two-argument likelihood
    ``log_prob_fn(x, lp_env)`` (likelihood.make_log_prob's ``_pure``/``_env``
    split) — keeps trained weights/transforms out of the compiled HLO so the
    chunk program persists in the compilation cache across runs.

    ``mesh``: optional 1-axis walker mesh.  When given, the chunk runs under
    :func:`shard_over_walkers`: each device advances its own walker block
    and the per-step collective census drops from 10 (GSPMD partitioning of
    the partner gather + acceptance bookkeeping) to 2 small half-ensemble
    all-gathers.  Identical RNG stream — every random draw is step-fixed and
    pre-drawn globally."""
    log_prob_fn = bind_env(log_prob_fn, lp_env)

    coords, lp, key, accepted = state
    w = coords.shape[0]
    half = w // 2
    ndim = coords.shape[1]
    c2 = coords.reshape(2, half, ndim)
    lp2 = lp.reshape(2, half)
    acc2 = accepted.reshape(2, half)

    # one batched draw per random stream for the whole chunk (see module
    # docstring); the carried key advances once per chunk
    key, k_pair, k_z, k_acc = jax.random.split(key, 4)
    partners = jax.random.randint(k_pair, (nsteps, 2, half), 0, half)
    us = jax.random.uniform(k_z, (nsteps, 2, half))
    ln_u_acc = jnp.log(jax.random.uniform(k_acc, (nsteps, 2, half)))

    scan_fn = partial(_stretch_scan, log_prob_fn, a, ndim, nsteps)
    carry = (c2, lp2, acc2)
    xs = (partners, us, ln_u_acc)
    if mesh is None:
        (c2, lp2, acc2), (chain2, lps2) = scan_fn(
            carry, xs, lambda x: x, None
        )
    else:
        from jax.sharding import PartitionSpec as P

        ax = mesh.axis_names[0]
        if half % mesh.devices.size:
            raise ValueError(
                f"half-ensemble size {half} must divide over the "
                f"{mesh.devices.size}-device walker mesh"
            )
        carry_specs = (P(None, ax, None), P(None, ax), P(None, ax))
        xs_specs = (P(None, None, ax),) * 3
        ys_specs = (P(None, None, ax, None), P(None, None, ax))
        (c2, lp2, acc2), (chain2, lps2) = shard_over_walkers(
            mesh, scan_fn, carry_specs, xs_specs, ys_specs
        )(carry, xs)
    new_state = EnsembleState(
        c2.reshape(w, ndim), lp2.reshape(w), key, acc2.reshape(w)
    )
    return new_state, chain2.reshape(nsteps, w, ndim), lps2.reshape(nsteps, w)
