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
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple, Tuple

import jax
import jax.numpy as jnp

__all__ = ["EnsembleState", "init_state", "stretch_chunk"]


class EnsembleState(NamedTuple):
    coords: jax.Array  # f32[W, D]
    log_prob: jax.Array  # f32[W]
    key: jax.Array  # PRNG key
    accepted: jax.Array  # i32[W] cumulative acceptance counts


def init_state(
    key: jax.Array, x0: jax.Array, log_prob_fn: Callable[[jax.Array], jax.Array]
) -> EnsembleState:
    x0 = jnp.asarray(x0, jnp.float32)
    lp = log_prob_fn(x0)
    return EnsembleState(
        x0, lp, key, jnp.zeros(x0.shape[0], jnp.int32)
    )


def _half_update(
    log_prob_fn, a: float, active_x, active_lp, comp_x, key
) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Update one half-ensemble given the complementary half."""
    n_active = active_x.shape[0]
    n_comp = comp_x.shape[0]
    ndim = active_x.shape[1]
    k_pair, k_z, k_acc = jax.random.split(key, 3)
    partners = jax.random.randint(k_pair, (n_active,), 0, n_comp)
    u = jax.random.uniform(k_z, (n_active,))
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    partner_x = comp_x[partners]
    proposal = partner_x + z[:, None] * (active_x - partner_x)
    prop_lp = log_prob_fn(proposal)
    ln_accept = (ndim - 1.0) * jnp.log(z) + prop_lp - active_lp
    accept = jnp.log(jax.random.uniform(k_acc, (n_active,))) < ln_accept
    new_x = jnp.where(accept[:, None], proposal, active_x)
    new_lp = jnp.where(accept, prop_lp, active_lp)
    return new_x, new_lp, accept


def _one_step(log_prob_fn, a: float, state: EnsembleState) -> EnsembleState:
    w = state.coords.shape[0]
    half = w // 2
    key, k0, k1 = jax.random.split(state.key, 3)
    x0, lp0 = state.coords[:half], state.log_prob[:half]
    x1, lp1 = state.coords[half:], state.log_prob[half:]
    new_x0, new_lp0, acc0 = _half_update(log_prob_fn, a, x0, lp0, x1, k0)
    new_x1, new_lp1, acc1 = _half_update(log_prob_fn, a, x1, lp1, new_x0, k1)
    coords = jnp.concatenate([new_x0, new_x1])
    log_prob = jnp.concatenate([new_lp0, new_lp1])
    accepted = state.accepted + jnp.concatenate([acc0, acc1]).astype(jnp.int32)
    return EnsembleState(coords, log_prob, key, accepted)


@partial(jax.jit, static_argnums=(0, 2, 3))
def stretch_chunk(
    log_prob_fn: Callable[[jax.Array], jax.Array],
    state: EnsembleState,
    nsteps: int,
    a: float = 2.0,
    lp_env=None,
):
    """Advance ``nsteps`` stretch-move steps; returns (state, chain, log_probs)
    with chain f32[nsteps, W, D] and log_probs f32[nsteps, W].

    ``lp_env``: optional traced pytree for a pure two-argument likelihood
    ``log_prob_fn(x, lp_env)`` (likelihood.make_log_prob's ``_pure``/``_env``
    split) — keeps trained weights/transforms out of the compiled HLO so the
    chunk program persists in the compilation cache across runs."""
    if lp_env is not None:
        pure_fn = log_prob_fn
        log_prob_fn = lambda x: pure_fn(x, lp_env)

    def step(state, _):
        state = _one_step(log_prob_fn, a, state)
        return state, (state.coords, state.log_prob)

    state, (chain, lps) = jax.lax.scan(step, state, None, length=nsteps)
    return state, chain, lps
