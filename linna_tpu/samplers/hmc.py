"""Gradient samplers: HMC and NUTS, fully jit-compiled and walker-batched.

The reference wires HMC/NUTS as custom emcee moves whose inner kernels are
*stubs* (reference linna/sampler.py:14-21 ``stop_criterion``/``leapfrog``/
``build_tree`` raise NotImplementedError; the outer machinery at
linna/sampler.py:59-307 — per-walker leapfrog via pool.map, dual-averaging
step-size adaptation with gamma=0.05, t0=10, kappa=0.75, delta=0.6, tree
doubling to maxheight=5 — is present but cannot run).  This module completes
them TPU-natively:

- gradients come from ``jax.grad`` through the emulator (replacing the
  per-walker ``torch.autograd`` loop, linna/util.py:1023-1035);
- every walker advances simultaneously: single-chain kernels are written
  pure and ``vmap``-ed, so each leapfrog is one batched MXU pass over the
  whole ensemble;
- the NUTS tree is Hoffman & Gelman Alg. 3 with the recursion unrolled at
  trace time over the static ``max_depth`` (reference maxheight=5,
  linna/sampler.py:502) — 2^d - 1 leapfrogs per sample, stopped lanes
  masked;
- per-walker dual averaging reproduces the reference's constants
  (linna/sampler.py:199-233).
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from .stretch import bind_env

__all__ = [
    "HMCState",
    "NUTSState",
    "init_hmc_state",
    "init_nuts_state",
    "hmc_chunk",
    "nuts_chunk",
    "find_reasonable_epsilon",
]

# dual-averaging constants (reference linna/sampler.py:199-209)
DA_GAMMA = 0.05
DA_T0 = 10.0
DA_KAPPA = 0.75
DA_DELTA = 0.6
DIVERGENCE = 1000.0  # joint-energy drop treated as divergent (H&G eq. 8)


class HMCState(NamedTuple):
    coords: jax.Array  # f32[W, D]
    log_prob: jax.Array  # f32[W]
    grad: jax.Array  # f32[W, D] d(log_prob)/dx at coords (carried: saves one
    #                  full emulator forward+backward per sample)
    key: jax.Array
    epsilon: jax.Array  # f32[W] per-walker step size
    accepted: jax.Array  # i32[W]


class NUTSState(NamedTuple):
    coords: jax.Array  # f32[W, D]
    log_prob: jax.Array  # f32[W]
    grad: jax.Array  # f32[W, D] d(log_prob)/dx at coords (carried)
    key: jax.Array
    epsilon: jax.Array  # f32[W]
    # dual averaging per walker
    mu: jax.Array  # f32[W] log(10*eps0)
    h_bar: jax.Array  # f32[W]
    log_eps_bar: jax.Array  # f32[W]
    m: jax.Array  # f32[W] adaptation step counter
    m_adapt: jax.Array  # i32[] number of adaptation steps remaining
    accepted: jax.Array  # f32[W] cumulative mean-alpha (expected acceptances)


def _value_and_grad_batched(log_prob_fn):
    """(W, D) -> (lp (W,), grad (W, D)) through the batched emulator."""

    def single(x):
        return jnp.squeeze(log_prob_fn(x[None, :]))

    return jax.vmap(jax.value_and_grad(single))


def _leapfrog(vg_fn, x, r, grad, eps, inv_mass):
    """One batched leapfrog step.  r ~ N(0, M); K = 0.5 r^T M^-1 r."""
    r_half = r + 0.5 * eps[:, None] * grad
    x_new = x + eps[:, None] * (inv_mass * r_half)
    lp_new, grad_new = vg_fn(x_new)
    r_new = r_half + 0.5 * eps[:, None] * grad_new
    return x_new, r_new, lp_new, grad_new


def _kinetic(r, inv_mass):
    return 0.5 * jnp.sum(r * r * inv_mass, axis=-1)


# --------------------------------------------------------------------- HMC


def init_hmc_state(
    key,
    x0,
    log_prob_fn,
    epsilon: float | None = None,
    mass: jax.Array | float = 1.0,
) -> HMCState:
    """``epsilon=None`` (default) runs the per-walker reasonable-epsilon
    search (H&G Alg. 4, reference linna/sampler.py:151-186) — the reference
    only did this for NUTS, leaving HMC with a fixed step that is fragile
    without Hessian whitening.  Pass the SAME ``mass`` that the chunks will
    integrate with: a step size tuned against unit-mass kinetic energy is
    wrong by ~sqrt(mass) per direction otherwise."""
    x0 = jnp.asarray(x0, jnp.float32)
    lp, grad = _value_and_grad_batched(log_prob_fn)(x0)
    w = x0.shape[0]
    if epsilon is None:
        key, k_eps = jax.random.split(key)
        eps = find_reasonable_epsilon(k_eps, x0, log_prob_fn, mass)
    else:
        eps = jnp.full((w,), epsilon, jnp.float32)
    return HMCState(
        x0,
        lp,
        grad,
        key,
        eps,
        jnp.zeros((w,), jnp.int32),
    )


@partial(jax.jit, static_argnums=(0, 2, 3))
def hmc_chunk(
    log_prob_fn: Callable,
    state: HMCState,
    nsteps: int,
    n_leapfrog: int = 10,
    mass: jax.Array | float = 1.0,
    lp_env=None,
):
    """Advance ``nsteps`` HMC samples (each ``n_leapfrog`` leapfrog steps +
    MH accept with the kinetic-energy factor, reference
    linna/sampler.py:59-149 ``HamiltonianMove``); returns
    (state, chain f32[nsteps, W, D], log_probs f32[nsteps, W]).

    ``lp_env``: optional traced env for a pure ``log_prob_fn(x, lp_env)``
    (see stretch.stretch_chunk)."""
    log_prob_fn = bind_env(log_prob_fn, lp_env)
    vg_fn = _value_and_grad_batched(log_prob_fn)
    mass_v = jnp.broadcast_to(
        jnp.asarray(mass, jnp.float32), state.coords.shape[-1:]
    )
    inv_mass = 1.0 / mass_v
    sqrt_mass = jnp.sqrt(mass_v)

    def one_sample(state, _):
        w, d = state.coords.shape
        key, k_r, k_acc = jax.random.split(state.key, 3)
        r0 = jax.random.normal(k_r, (w, d)) * sqrt_mass
        # lp/grad at the current position ride in the state (they were the
        # accepted lp_new/grad_new of the previous sample) — recomputing
        # them here would waste one full emulator pass per sample
        lp0, grad0 = state.log_prob, state.grad

        def lf(carry, _):
            x, r, lp, grad = carry
            x, r, lp, grad = _leapfrog(vg_fn, x, r, grad, state.epsilon, inv_mass)
            return (x, r, lp, grad), None

        (x_new, r_new, lp_new, grad_new), _ = jax.lax.scan(
            lf, (state.coords, r0, lp0, grad0), None, length=n_leapfrog
        )
        log_accept = (lp_new - _kinetic(r_new, inv_mass)) - (
            lp0 - _kinetic(r0, inv_mass)
        )
        accept = jnp.log(jax.random.uniform(k_acc, (w,))) < log_accept
        coords = jnp.where(accept[:, None], x_new, state.coords)
        lp = jnp.where(accept, lp_new, state.log_prob)
        grad = jnp.where(accept[:, None], grad_new, state.grad)
        new_state = HMCState(
            coords, lp, grad, key, state.epsilon,
            state.accepted + accept.astype(jnp.int32),
        )
        return new_state, (coords, lp)

    state, (chain, lps) = jax.lax.scan(one_sample, state, None, length=nsteps)
    return state, chain, lps


# -------------------------------------------------------------------- NUTS


def _single_vg(log_prob_fn):
    def single(x):
        return jnp.squeeze(log_prob_fn(x[None, :]))

    return jax.value_and_grad(single)


def find_reasonable_epsilon(key, x0, log_prob_fn, mass: jax.Array | float = 1.0):
    """Per-walker initial step size (H&G Alg. 4; reference
    linna/sampler.py:151-186 ``find_reasonable_epsilon``): double/halve eps
    until the one-step acceptance crosses 0.5."""
    vg1 = _single_vg(log_prob_fn)
    d = x0.shape[-1]
    mass_v = jnp.broadcast_to(jnp.asarray(mass, jnp.float32), (d,))
    inv_mass = 1.0 / mass_v

    def one_walker(key, x):
        lp0, grad0 = vg1(x)
        r0 = jax.random.normal(key, (d,)) * jnp.sqrt(mass_v)
        joint0 = lp0 - 0.5 * jnp.sum(r0 * r0 * inv_mass)

        def joint_after(eps):
            r_half = r0 + 0.5 * eps * grad0
            x_new = x + eps * inv_mass * r_half
            lp_new, grad_new = vg1(x_new)
            r_new = r_half + 0.5 * eps * grad_new
            lp_new = jnp.where(jnp.isnan(lp_new), -jnp.inf, lp_new)
            return lp_new - 0.5 * jnp.sum(r_new * r_new * inv_mass)

        eps0 = jnp.asarray(1.0, jnp.float32)
        a = jnp.where(joint_after(eps0) - joint0 > jnp.log(0.5), 1.0, -1.0)

        def cond(carry):
            eps, it = carry
            ratio = joint_after(eps) - joint0
            ratio = jnp.where(jnp.isnan(ratio), -jnp.inf, ratio)
            return jnp.logical_and(it < 100, a * ratio > -a * jnp.log(2.0))

        def body(carry):
            eps, it = carry
            return eps * (2.0**a), it + 1

        eps, _ = jax.lax.while_loop(cond, body, (eps0, jnp.asarray(0, jnp.int32)))
        return eps

    keys = jax.random.split(key, x0.shape[0])
    return jax.vmap(one_walker)(keys, x0)


def _build_tree(vg1, z, r, grad, lp, v, depth, eps, joint0, log_slice, key, inv_mass):
    """H&G Alg. 3 ``BuildTree`` with the recursion unrolled at trace time
    (``depth`` is a Python int).  Single-walker; vmapped by the caller.

    Returns (z_minus, r_minus, grad_minus, z_plus, r_plus, grad_plus,
    z_prop, lp_prop, grad_prop, n_valid, s_continue, alpha_sum, n_alpha).
    """
    if depth == 0:
        # one leapfrog in direction v
        r_half = r + 0.5 * (v * eps) * grad
        z_new = z + (v * eps) * inv_mass * r_half
        lp_new, grad_new = vg1(z_new)
        r_new = r_half + 0.5 * (v * eps) * grad_new
        lp_new = jnp.where(jnp.isnan(lp_new), -jnp.inf, lp_new)
        joint = lp_new - 0.5 * jnp.sum(r_new * r_new * inv_mass)
        n_valid = (log_slice <= joint).astype(jnp.float32)
        s_cont = log_slice < joint + DIVERGENCE
        alpha = jnp.minimum(1.0, jnp.exp(joint - joint0))
        alpha = jnp.where(jnp.isnan(alpha), 0.0, alpha)
        return (
            z_new, r_new, grad_new,
            z_new, r_new, grad_new,
            z_new, lp_new, grad_new, n_valid, s_cont, alpha, jnp.asarray(1.0),
        )

    k1, k2, k_pick = jax.random.split(key, 3)
    (zm, rm, gm, zp, rp, gp, zprop, lpprop, gprop, n1, s1, a1, na1) = _build_tree(
        vg1, z, r, grad, lp, v, depth - 1, eps, joint0, log_slice, k1, inv_mass
    )
    # second half, started from the appropriate edge; computed unconditionally
    # and masked by s1 (lanes that already stopped keep the first half).
    edge_z = jnp.where(v > 0, zp, zm)
    edge_r = jnp.where(v > 0, rp, rm)
    edge_g = jnp.where(v > 0, gp, gm)
    (
        zm2, rm2, gm2, zp2, rp2, gp2, zprop2, lpprop2, gprop2, n2, s2, a2, na2
    ) = _build_tree(
        vg1, edge_z, edge_r, edge_g, lp, v, depth - 1, eps, joint0, log_slice, k2,
        inv_mass,
    )
    zm = jnp.where(jnp.logical_and(s1, v < 0), zm2, zm)
    rm = jnp.where(jnp.logical_and(s1, v < 0), rm2, rm)
    gm = jnp.where(jnp.logical_and(s1, v < 0), gm2, gm)
    zp = jnp.where(jnp.logical_and(s1, v > 0), zp2, zp)
    rp = jnp.where(jnp.logical_and(s1, v > 0), rp2, rp)
    gp = jnp.where(jnp.logical_and(s1, v > 0), gp2, gp)

    n2 = jnp.where(s1, n2, 0.0)
    take2 = jax.random.uniform(k_pick) < n2 / jnp.maximum(n1 + n2, 1e-30)
    zprop = jnp.where(jnp.logical_and(s1, take2), zprop2, zprop)
    lpprop = jnp.where(jnp.logical_and(s1, take2), lpprop2, lpprop)
    gprop = jnp.where(jnp.logical_and(s1, take2), gprop2, gprop)

    dz = zp - zm
    no_uturn = jnp.logical_and(
        jnp.sum(dz * (inv_mass * rm)) >= 0.0, jnp.sum(dz * (inv_mass * rp)) >= 0.0
    )
    s_out = jnp.logical_and(s1, jnp.logical_and(s2, no_uturn))
    a_sum = a1 + jnp.where(s1, a2, 0.0)
    na_sum = na1 + jnp.where(s1, na2, 0.0)
    return zm, rm, gm, zp, rp, gp, zprop, lpprop, gprop, n1 + n2, s_out, a_sum, na_sum


def _nuts_single(vg1, max_depth, key, x, lp, grad, eps, inv_mass, sqrt_mass):
    """One NUTS sample for one walker (H&G Alg. 3 outer doubling loop,
    reference linna/sampler.py:276-307).  ``grad`` is the carried gradient at
    ``x`` (saves one emulator pass per sample).  Returns
    (x', lp', grad', alpha, n_alpha)."""
    d = x.shape[-1]
    k_r, k_slice, key = jax.random.split(key, 3)
    r0 = jax.random.normal(k_r, (d,)) * sqrt_mass
    joint0 = lp - 0.5 * jnp.sum(r0 * r0 * inv_mass)
    # log of the slice variable u ~ U(0, exp(joint0)): log u = joint0 + log U
    log_slice = joint0 + jnp.log(jax.random.uniform(k_slice))

    zm, rm, gm = x, r0, grad
    zp, rp, gp = x, r0, grad
    zprop, lpprop, gprop = x, lp, grad
    n_total = jnp.asarray(1.0)
    s = jnp.asarray(True)
    alpha_sum = jnp.asarray(0.0)
    n_alpha = jnp.asarray(0.0)

    for depth in range(max_depth):
        k_v, k_tree, k_acc, key = jax.random.split(key, 4)
        v = jnp.where(jax.random.uniform(k_v) < 0.5, 1.0, -1.0)
        edge_z = jnp.where(v > 0, zp, zm)
        edge_r = jnp.where(v > 0, rp, rm)
        edge_g = jnp.where(v > 0, gp, gm)
        (
            zm2, rm2, gm2, zp2, rp2, gp2, zprop2, lpprop2, gprop2, n2, s2, a2, na2
        ) = _build_tree(
            vg1, edge_z, edge_r, edge_g, lp, v, depth, eps, joint0, log_slice,
            k_tree, inv_mass,
        )
        upd = s  # only lanes still running may extend the trajectory
        zm = jnp.where(jnp.logical_and(upd, v < 0), zm2, zm)
        rm = jnp.where(jnp.logical_and(upd, v < 0), rm2, rm)
        gm = jnp.where(jnp.logical_and(upd, v < 0), gm2, gm)
        zp = jnp.where(jnp.logical_and(upd, v > 0), zp2, zp)
        rp = jnp.where(jnp.logical_and(upd, v > 0), rp2, rp)
        gp = jnp.where(jnp.logical_and(upd, v > 0), gp2, gp)

        accept_prob = jnp.minimum(1.0, n2 / jnp.maximum(n_total, 1e-30))
        take = jnp.logical_and(
            jnp.logical_and(upd, s2),
            jax.random.uniform(k_acc) < accept_prob,
        )
        zprop = jnp.where(take, zprop2, zprop)
        lpprop = jnp.where(take, lpprop2, lpprop)
        gprop = jnp.where(take, gprop2, gprop)

        alpha_sum = alpha_sum + jnp.where(upd, a2, 0.0)
        n_alpha = n_alpha + jnp.where(upd, na2, 0.0)
        n_total = n_total + jnp.where(upd, n2, 0.0)

        dz = zp - zm
        no_uturn = jnp.logical_and(
            jnp.sum(dz * (inv_mass * rm)) >= 0.0,
            jnp.sum(dz * (inv_mass * rp)) >= 0.0,
        )
        s = jnp.logical_and(upd, jnp.logical_and(s2, no_uturn))

    alpha = alpha_sum / jnp.maximum(n_alpha, 1.0)
    return zprop, lpprop, gprop, alpha, jnp.maximum(n_alpha, 1.0)


def init_nuts_state(
    key,
    x0,
    log_prob_fn,
    m_adapt: int = 100,
    mass: jax.Array | float = 1.0,
) -> NUTSState:
    """Initialize, including per-walker reasonable-epsilon search."""
    x0 = jnp.asarray(x0, jnp.float32)
    lp, grad = _value_and_grad_batched(log_prob_fn)(x0)
    key, k_eps = jax.random.split(key)
    eps = find_reasonable_epsilon(k_eps, x0, log_prob_fn, mass)
    w = x0.shape[0]
    return NUTSState(
        x0,
        lp,
        grad,
        key,
        eps,
        jnp.log(10.0 * eps),
        jnp.zeros((w,)),
        jnp.zeros((w,)),
        jnp.ones((w,)),
        jnp.asarray(m_adapt, jnp.int32),
        jnp.zeros((w,)),
    )


@partial(jax.jit, static_argnums=(0, 2, 3))
def nuts_chunk(
    log_prob_fn: Callable,
    state: NUTSState,
    nsteps: int,
    max_depth: int = 5,
    mass: jax.Array | float = 1.0,
    lp_env=None,
):
    """Advance ``nsteps`` NUTS samples for the whole ensemble; dual-averaging
    adaptation runs for the first ``state.m_adapt`` samples
    (reference linna/sampler.py:214-246).  Returns (state, chain, log_probs).

    ``lp_env``: optional traced env for a pure ``log_prob_fn(x, lp_env)``
    (see stretch.stretch_chunk)."""
    log_prob_fn = bind_env(log_prob_fn, lp_env)
    vg1 = _single_vg(log_prob_fn)
    d = state.coords.shape[-1]
    mass_v = jnp.broadcast_to(jnp.asarray(mass, jnp.float32), (d,))
    inv_mass = 1.0 / mass_v
    sqrt_mass = jnp.sqrt(mass_v)

    sample_w = jax.vmap(
        lambda key, x, lp, grad, eps: _nuts_single(
            vg1, max_depth, key, x, lp, grad, eps, inv_mass, sqrt_mass
        )
    )

    def one_sample(state, _):
        w = state.coords.shape[0]
        key, k_s = jax.random.split(state.key)
        keys = jax.random.split(k_s, w)
        x_new, lp_new, grad_new, alpha, n_alpha = sample_w(
            keys, state.coords, state.log_prob, state.grad, state.epsilon
        )
        # dual averaging (reference linna/sampler.py:228-240)
        adapting = state.m_adapt > 0
        eta = 1.0 / (state.m + DA_T0)
        h_bar = jnp.where(
            adapting,
            (1.0 - eta) * state.h_bar + eta * (DA_DELTA - alpha),
            state.h_bar,
        )
        log_eps = state.mu - jnp.sqrt(state.m) / DA_GAMMA * h_bar
        eta2 = state.m ** (-DA_KAPPA)
        log_eps_bar = jnp.where(
            adapting,
            eta2 * log_eps + (1.0 - eta2) * state.log_eps_bar,
            state.log_eps_bar,
        )
        epsilon = jnp.where(
            adapting, jnp.exp(log_eps), jnp.exp(state.log_eps_bar)
        )
        new_state = NUTSState(
            x_new,
            lp_new,
            grad_new,
            key,
            epsilon,
            state.mu,
            h_bar,
            log_eps_bar,
            state.m + jnp.where(adapting, 1.0, 0.0),
            jnp.maximum(state.m_adapt - 1, 0),
            # expected acceptances: mean Metropolis alpha over the sample's
            # leapfrog trajectory — the statistic the HDF5 'accepted'
            # dataset records for NUTS (H&G Alg. 6's alpha/n_alpha)
            state.accepted + alpha,
        )
        return new_state, (x_new, lp_new)

    state, (chain, lps) = jax.lax.scan(one_sample, state, None, length=nsteps)
    return state, chain, lps
