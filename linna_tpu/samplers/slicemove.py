"""Ensemble slice sampler (zeus-style differential slice move) under jit.

The reference delegates to the external ``zeus`` package
(linna/sampler.py:699-737) whose per-walker stepping-out/shrinking loops run
variable-length Python iterations with one host/MPI task per log-prob call.
The TPU-native version vectorizes the Karamanis & Beutler (2020) ensemble
slice sampler over the whole half-ensemble: direction vectors come from the
differential move (mu * (x_l - x_m) for two distinct complementary-half
walkers), and the variable-length expansion and shrink loops become
``lax.while_loop``s over masked walker batches — every iteration evaluates
the batched emulator likelihood for all walkers in one MXU pass and walkers
that already finished are frozen by their masks.  The shrink loop provably
terminates toward t=0 (where logp = logp(x_k) > Y always holds), so masking
is safe.

Step-size tuning follows zeus: mu <- mu * 2*Ne/(Ne + Nc) from the expansion
and contraction counts, applied between device chunks during the tuning
phase.

Performance notes (measured on v5e, 27 -> 457 emulator; same analysis as
stretch.py — the move machinery around the likelihood calls was ~50% of the
chunk's device time at the production 256-walker ensemble):

- the step-fixed random draws (direction pairs, slice heights, initial
  interval offsets) are generated in batched draws BEFORE the step scan;
  only the shrink loop's rejection draws — whose count is data-dependent —
  stay inside the loop;
- the stepping-out loop evaluates BOTH interval ends in one stacked
  ``(2*half, D)`` likelihood batch per iteration instead of two separate
  calls — same math, half the launches, double the matmul batch;
- the scan carries the ensemble as ``(2, W/2, D)`` (see stretch.py); the
  persisted chain view reshapes back for free.

Net at the flagship shape: 44 -> ~30 ms per 100-step chunk at 256 walkers.
PRNG stream ordering differs from the per-step-split implementation (chains
are not bitwise comparable across this change; within a version, seeded
runs and exact resume remain bitwise deterministic).

Walker sharding (round 5): under plain jit+GSPMD the stepping-out/shrink
``while_loop`` conds (``jnp.any``/``jnp.all`` over the sharded walker axis)
and counter sums re-reduced across the mesh EVERY loop iteration — 30
collectives per step (r4 census).  ``slice_chunk(mesh=...)`` now runs the
chunk under stretch.shard_over_walkers: each device's loops run on its own
walker block with local conds, and the only per-step collectives are the 2
half-ensemble all-gathers for the direction pairs (re-censused: 2/step,
~8 KB).  The shrink loop's in-loop rejection draws become per-device
streams (``fold_in(key, axis_index)``) — a documented PRNG-stream change
vs the single-device order; step-fixed draws keep the exact global stream,
and the single-device path is unchanged bit-for-bit.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .stretch import bind_env

__all__ = ["SliceState", "init_slice_state", "slice_chunk"]


class SliceState(NamedTuple):
    coords: jax.Array  # f32[W, D]
    log_prob: jax.Array  # f32[W]
    key: jax.Array
    mu: jax.Array  # f32[] tunable scale
    n_expand: jax.Array  # i32[] cumulative expansion count
    n_contract: jax.Array  # i32[] cumulative contraction count


def init_slice_state(
    key: jax.Array,
    x0: jax.Array,
    log_prob_fn: Callable[[jax.Array], jax.Array],
    mu: float = 1.0,
) -> SliceState:
    x0 = jnp.asarray(x0, jnp.float32)
    if x0.shape[0] % 2:
        # the (2, W/2, D) chunk layout requires an even split (and zeus's own
        # half-ensembles assume one); fail clearly at init rather than with a
        # reshape error inside the jitted chunk
        raise ValueError(
            f"nwalkers must be even for the slice move (got {x0.shape[0]})"
        )
    lp = log_prob_fn(x0)
    return SliceState(
        x0,
        lp,
        key,
        jnp.asarray(mu, jnp.float32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )


def _slice_half(
    log_prob_fn, max_steps: int, active_x, active_lp, comp_x, mu,
    l, m, expo, u0, k_shrink,
):
    """One slice update of the active half-ensemble given this step's
    pre-drawn randoms: distinct partner indices ``l``/``m``, slice-height
    exponentials ``expo``, initial-interval uniforms ``u0``, and the shrink
    loop's base key.

    Returns (new_x, new_lp, n_expand, n_contract).
    """
    n_active = active_x.shape[0]
    direction = mu * (comp_x[l] - comp_x[m])  # [n_active, D]

    # log slice height: Y = logp(x) - Exp(1)
    y = active_lp - expo

    # initial interval [L, R] = [-u, 1-u] in direction units
    left = -u0
    right = left + 1.0

    def lp_at(t):
        return log_prob_fn(active_x + t[:, None] * direction)

    # ---- stepping-out: expand each end while it is still inside the slice.
    # Both ends ride ONE stacked likelihood batch per iteration.
    def expand_cond(carry):
        left, right, need_l, need_r, ne, it = carry
        return jnp.logical_and(
            it < max_steps, jnp.logical_or(jnp.any(need_l), jnp.any(need_r))
        )

    def expand_body(carry):
        left, right, need_l, need_r, ne, it = carry
        t_both = jnp.concatenate([left, right])
        lp_both = lp_at2(t_both)
        inside_l = lp_both[:n_active] > y
        inside_r = lp_both[n_active:] > y
        still_l = need_l & inside_l
        still_r = need_r & inside_r
        left = jnp.where(still_l, left - 1.0, left)
        right = jnp.where(still_r, right + 1.0, right)
        ne = ne + jnp.sum(still_l.astype(jnp.int32)) + jnp.sum(still_r.astype(jnp.int32))
        return left, right, still_l, still_r, ne, it + 1

    def lp_at2(t_both):
        x2 = jnp.concatenate([active_x, active_x])
        d2 = jnp.concatenate([direction, direction])
        return log_prob_fn(x2 + t_both[:, None] * d2)

    need = jnp.ones((n_active,), bool)
    left, right, _, _, n_expand, _ = jax.lax.while_loop(
        expand_cond,
        expand_body,
        (left, right, need, need, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)),
    )

    # ---- shrinking: sample t ~ U(L, R) until inside the slice (the draw
    # count is data-dependent, so this loop's RNG stays inside)
    def shrink_cond(carry):
        left, right, t_acc, lp_acc, done, nc, key, it = carry
        return jnp.logical_and(it < max_steps, jnp.logical_not(jnp.all(done)))

    def shrink_body(carry):
        left, right, t_acc, lp_acc, done, nc, key, it = carry
        key, kt = jax.random.split(key)
        t = left + (right - left) * jax.random.uniform(kt, (n_active,))
        lp_t = lp_at(t)
        accept_now = (lp_t > y) & ~done
        t_acc = jnp.where(accept_now, t, t_acc)
        lp_acc = jnp.where(accept_now, lp_t, lp_acc)
        reject = (~(lp_t > y)) & ~done
        left = jnp.where(reject & (t < 0), t, left)
        right = jnp.where(reject & (t >= 0), t, right)
        nc = nc + jnp.sum(reject.astype(jnp.int32))
        done = done | accept_now
        return left, right, t_acc, lp_acc, done, nc, key, it + 1

    t0 = jnp.zeros((n_active,))
    done0 = jnp.zeros((n_active,), bool)
    _, _, t_final, lp_final, done, n_contract, _, _ = jax.lax.while_loop(
        shrink_cond,
        shrink_body,
        (
            left,
            right,
            t0,
            active_lp,
            done0,
            jnp.zeros((), jnp.int32),
            k_shrink,
            jnp.zeros((), jnp.int32),
        ),
    )
    # walkers that exhausted max_steps keep their original position (t=0)
    new_x = active_x + jnp.where(done, t_final, 0.0)[:, None] * direction
    new_lp = jnp.where(done, lp_final, active_lp)
    return new_x, new_lp, n_expand, n_contract


def _slice_scan(log_prob_fn, max_steps, mu, nsteps, carry, xs, gather, axis):
    """The chunk's step scan, shared by the single-device and walker-sharded
    paths (see stretch.shard_over_walkers).  ``gather`` replicates the
    complementary half before the direction-pair indexing — on a mesh that
    is the chunk's ONLY per-step collective (2 small all-gathers/step); the
    stepping-out/shrink while_loops and their any/all conds run on purely
    device-local walker blocks.  ``axis`` non-None additionally (a)
    decorrelates the shrink loop's in-loop draws per device via fold_in
    (documented PRNG-stream change vs the single-device order — the
    step-fixed draws are unchanged) and (b) psums the scalar expansion /
    contraction counters once per chunk (they feed zeus's between-chunk mu
    tuning, which needs the global counts)."""

    def step(carry, xs):
        c2, lp2, ne, nc = carry
        l, m, expo, u0, skeys = xs
        if axis is not None:
            dev = jax.lax.axis_index(axis)
            skeys = jax.vmap(lambda k: jax.random.fold_in(k, dev))(skeys)
        nx0, nlp0, ne0, nc0 = _slice_half(
            log_prob_fn, max_steps, c2[0], lp2[0], gather(c2[1]), mu,
            l[0], m[0], expo[0], u0[0], skeys[0],
        )
        nx1, nlp1, ne1, nc1 = _slice_half(
            log_prob_fn, max_steps, c2[1], lp2[1], gather(nx0), mu,
            l[1], m[1], expo[1], u0[1], skeys[1],
        )
        c2 = jnp.stack([nx0, nx1])
        lp2 = jnp.stack([nlp0, nlp1])
        return (c2, lp2, ne + ne0 + ne1, nc + nc0 + nc1), (c2, lp2)

    (c2, lp2, ne, nc), ys = jax.lax.scan(step, carry, xs, length=nsteps)
    if axis is not None:
        ne = jax.lax.psum(ne, axis)
        nc = jax.lax.psum(nc, axis)
    return (c2, lp2, ne, nc), ys


@partial(jax.jit, static_argnums=(0, 2, 3, 5))
def slice_chunk(
    log_prob_fn: Callable[[jax.Array], jax.Array],
    state: SliceState,
    nsteps: int,
    max_steps: int = 100,
    lp_env=None,
    mesh=None,
):
    """Advance ``nsteps`` ensemble-slice steps on device; returns
    (state, chain f32[nsteps, W, D], log_probs f32[nsteps, W]).

    ``lp_env``: optional traced env for a pure ``log_prob_fn(x, lp_env)``
    (see stretch.stretch_chunk).

    ``mesh``: optional 1-axis walker mesh — runs the chunk under
    stretch.shard_over_walkers, cutting the per-step collective census from
    30 (GSPMD-partitioned while_loop conds + counter reductions + direction
    gathers; SCALING.json r4) to 2 half-ensemble all-gathers.  The shrink
    loop's in-loop rejection draws are per-device streams (fold_in of the
    device index); all step-fixed draws keep the exact global stream."""
    log_prob_fn = bind_env(log_prob_fn, lp_env)

    coords, lp, key, mu, n_expand, n_contract = state
    w = coords.shape[0]
    half = w // 2
    ndim = coords.shape[1]
    c2 = coords.reshape(2, half, ndim)
    lp2 = lp.reshape(2, half)

    # batched pre-generation of the step-fixed draws (see module docstring);
    # the distinct-pair construction matches the previous per-step variant:
    # m = (l + offset) % half with offset in [1, half)
    key, k_l, k_off, k_h, k_u0, k_sh = jax.random.split(key, 6)
    ls = jax.random.randint(k_l, (nsteps, 2, half), 0, half)
    offs = jax.random.randint(k_off, (nsteps, 2, half), 1, half)
    ms = (ls + offs) % half
    expos = jax.random.exponential(k_h, (nsteps, 2, half))
    u0s = jax.random.uniform(k_u0, (nsteps, 2, half))
    shrink_keys = jax.random.split(k_sh, nsteps * 2).reshape(nsteps, 2)

    scan_fn = partial(_slice_scan, log_prob_fn, max_steps, mu, nsteps)
    # the scan carries this CHUNK's counter increments from zero (the psum
    # in the sharded path must not multiply the prior cumulative value by
    # the device count); the state's running totals are added back below
    zero = jnp.zeros((), jnp.int32)
    carry = (c2, lp2, zero, zero)
    xs = (ls, ms, expos, u0s, shrink_keys)
    if mesh is None:
        (c2, lp2, ne_inc, nc_inc), (chain2, lps2) = scan_fn(
            carry, xs, lambda x: x, None
        )
    else:
        from jax.sharding import PartitionSpec as P

        from .stretch import shard_over_walkers

        ax = mesh.axis_names[0]
        if half % mesh.devices.size:
            raise ValueError(
                f"half-ensemble size {half} must divide over the "
                f"{mesh.devices.size}-device walker mesh"
            )
        carry_specs = (P(None, ax, None), P(None, ax), P(), P())
        xs_specs = (
            P(None, None, ax), P(None, None, ax), P(None, None, ax),
            P(None, None, ax), P(None, None),
        )
        ys_specs = (P(None, None, ax, None), P(None, None, ax))
        (c2, lp2, ne_inc, nc_inc), (chain2, lps2) = shard_over_walkers(
            mesh, scan_fn, carry_specs, xs_specs, ys_specs
        )(carry, xs)
    new_state = SliceState(
        c2.reshape(w, ndim), lp2.reshape(w), key, mu,
        n_expand + ne_inc, n_contract + nc_inc,
    )
    return new_state, chain2.reshape(nsteps, w, ndim), lps2.reshape(nsteps, w)


def tune_mu(state: SliceState) -> SliceState:
    """zeus step-size adaptation between chunks: mu *= 2 Ne/(Ne+Nc)."""
    ne = state.n_expand.astype(jnp.float32)
    nc = state.n_contract.astype(jnp.float32)
    factor = 2.0 * ne / jnp.maximum(ne + nc, 1.0)
    new_mu = jnp.clip(state.mu * jnp.maximum(factor, 1e-3), 1e-4, 1e4)
    return state._replace(
        mu=new_mu,
        n_expand=jnp.zeros((), jnp.int32),
        n_contract=jnp.zeros((), jnp.int32),
    )
