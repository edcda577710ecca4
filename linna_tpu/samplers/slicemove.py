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
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

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
    lp = log_prob_fn(x0)
    return SliceState(
        x0,
        lp,
        key,
        jnp.asarray(mu, jnp.float32),
        jnp.zeros((), jnp.int32),
        jnp.zeros((), jnp.int32),
    )


def _distinct_pairs(key, n_active: int, n_comp: int):
    k1, k2 = jax.random.split(key)
    l = jax.random.randint(k1, (n_active,), 0, n_comp)
    offset = jax.random.randint(k2, (n_active,), 1, n_comp)
    m = (l + offset) % n_comp
    return l, m


def _slice_half(
    log_prob_fn, max_steps: int, active_x, active_lp, comp_x, mu, key
):
    """One slice update of the active half-ensemble.

    Returns (new_x, new_lp, n_expand, n_contract).
    """
    n_active = active_x.shape[0]
    k_pair, k_h, k_lr, k_shrink = jax.random.split(key, 4)

    l, m = _distinct_pairs(k_pair, n_active, comp_x.shape[0])
    direction = mu * (comp_x[l] - comp_x[m])  # [n_active, D]

    # log slice height: Y = logp(x) - Exp(1)
    y = active_lp - jax.random.exponential(k_h, (n_active,))

    # initial interval [L, R] = [-u, 1-u] in direction units
    u0 = jax.random.uniform(k_lr, (n_active,))
    left = -u0
    right = left + 1.0

    def lp_at(t):
        return log_prob_fn(active_x + t[:, None] * direction)

    # ---- stepping-out: expand each end while it is still inside the slice
    def expand_cond(carry):
        left, right, need_l, need_r, ne, it = carry
        return jnp.logical_and(
            it < max_steps, jnp.logical_or(jnp.any(need_l), jnp.any(need_r))
        )

    def expand_body(carry):
        left, right, need_l, need_r, ne, it = carry
        lp_l = lp_at(left)
        lp_r = lp_at(right)
        inside_l = lp_l > y
        inside_r = lp_r > y
        still_l = need_l & inside_l
        still_r = need_r & inside_r
        left = jnp.where(still_l, left - 1.0, left)
        right = jnp.where(still_r, right + 1.0, right)
        ne = ne + jnp.sum(still_l.astype(jnp.int32)) + jnp.sum(still_r.astype(jnp.int32))
        return left, right, need_l & inside_l, need_r & inside_r, ne, it + 1

    need = jnp.ones((n_active,), bool)
    left, right, _, _, n_expand, _ = jax.lax.while_loop(
        expand_cond,
        expand_body,
        (left, right, need, need, jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32)),
    )

    # ---- shrinking: sample t ~ U(L, R) until inside the slice
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


def _one_step(log_prob_fn, max_steps: int, state: SliceState) -> SliceState:
    w = state.coords.shape[0]
    half = w // 2
    key, k0, k1 = jax.random.split(state.key, 3)
    x0, lp0 = state.coords[:half], state.log_prob[:half]
    x1, lp1 = state.coords[half:], state.log_prob[half:]
    nx0, nlp0, ne0, nc0 = _slice_half(log_prob_fn, max_steps, x0, lp0, x1, state.mu, k0)
    nx1, nlp1, ne1, nc1 = _slice_half(
        log_prob_fn, max_steps, x1, lp1, nx0, state.mu, k1
    )
    return SliceState(
        jnp.concatenate([nx0, nx1]),
        jnp.concatenate([nlp0, nlp1]),
        key,
        state.mu,
        state.n_expand + ne0 + ne1,
        state.n_contract + nc0 + nc1,
    )


@partial(jax.jit, static_argnums=(0, 2, 3))
def slice_chunk(
    log_prob_fn: Callable[[jax.Array], jax.Array],
    state: SliceState,
    nsteps: int,
    max_steps: int = 100,
    lp_env=None,
):
    """Advance ``nsteps`` ensemble-slice steps on device; returns
    (state, chain f32[nsteps, W, D], log_probs f32[nsteps, W]).

    ``lp_env``: optional traced env for a pure ``log_prob_fn(x, lp_env)``
    (see stretch.stretch_chunk)."""
    if lp_env is not None:
        pure_fn = log_prob_fn
        log_prob_fn = lambda x: pure_fn(x, lp_env)

    def step(state, _):
        state = _one_step(log_prob_fn, max_steps, state)
        return state, (state.coords, state.log_prob)

    state, (chain, lps) = jax.lax.scan(step, state, None, length=nsteps)
    return state, chain, lps


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
