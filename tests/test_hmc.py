"""Gradient samplers (HMC / NUTS) on analytic targets.

The reference's NUTS/HMC inner kernels are stubs (linna/sampler.py:14-21);
these tests pin down the completed TPU-native implementation: correct
posterior moments on a correlated Gaussian, dual-averaging adaptation toward
the 0.6 target acceptance, MAP/Hessian preconditioning, and the full
convergence-gated ``run_ensemble`` path with resume."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from linna_tpu.samplers import hmc, precondition, run as sampler_run

MEAN = np.array([1.0, -0.5])
COV = np.array([[1.0, 0.6], [0.6, 0.8]])
INV_COV = np.linalg.inv(COV)


def log_prob(x):
    d = x - jnp.asarray(MEAN, jnp.float32)
    return -0.5 * jnp.einsum("...i,ij,...j->...", d, jnp.asarray(INV_COV, jnp.float32), d)


def test_find_reasonable_epsilon_finite():
    x0 = jax.random.normal(jax.random.key(0), (8, 2))
    eps = hmc.find_reasonable_epsilon(jax.random.key(1), x0, log_prob)
    eps = np.asarray(eps)
    assert eps.shape == (8,)
    assert np.all(np.isfinite(eps)) and np.all(eps > 0)


def test_hmc_gaussian_moments():
    x0 = jax.random.normal(jax.random.key(2), (64, 2))
    state = hmc.init_hmc_state(jax.random.key(3), x0, log_prob, epsilon=0.3)
    state, chain, lps = hmc.hmc_chunk(log_prob, state, 400, 10)
    samples = np.asarray(chain[100:]).reshape(-1, 2)
    acc_rate = float(np.mean(np.asarray(state.accepted))) / 400
    assert acc_rate > 0.5, acc_rate
    np.testing.assert_allclose(samples.mean(axis=0), MEAN, atol=0.1)
    np.testing.assert_allclose(np.cov(samples.T), COV, atol=0.15)


def test_nuts_gaussian_moments_and_adaptation():
    x0 = jax.random.normal(jax.random.key(4), (32, 2))
    state = hmc.init_nuts_state(jax.random.key(5), x0, log_prob, m_adapt=100)
    eps_init = np.asarray(state.epsilon).copy()
    state, chain, lps = hmc.nuts_chunk(log_prob, state, 300, 5)
    samples = np.asarray(chain[100:]).reshape(-1, 2)
    np.testing.assert_allclose(samples.mean(axis=0), MEAN, atol=0.1)
    np.testing.assert_allclose(np.cov(samples.T), COV, atol=0.15)
    # dual averaging must have adapted (epsilon changed and finite)
    eps_final = np.asarray(state.epsilon)
    assert np.all(np.isfinite(eps_final)) and np.all(eps_final > 0)
    assert not np.allclose(eps_final, eps_init)
    # adaptation is over after m_adapt samples
    assert int(state.m_adapt) == 0


def test_preconditioner_roundtrip_and_map():
    pre = precondition.calc_hess_mass_mat(log_prob, np.zeros(2))
    np.testing.assert_allclose(pre.center, MEAN, atol=1e-2)
    y = pre.to_sampling(np.array([0.3, 0.7]))
    np.testing.assert_allclose(pre.to_original(y), [0.3, 0.7], atol=1e-6)
    # wrapped log-prob at y=0 equals log-prob at the MAP
    wrapped = pre.wrap_log_prob(log_prob)
    lp0 = float(wrapped(jnp.zeros((1, 2)))[0])
    lp_map = float(log_prob(jnp.asarray(pre.center, jnp.float32)[None, :])[0])
    np.testing.assert_allclose(lp0, lp_map, atol=1e-4)
    # in sampling space the covariance is ~identity: wrapped curvature ~ -I
    h = np.asarray(jax.hessian(lambda y: jnp.squeeze(wrapped(y[None, :])))(
        jnp.zeros(2)
    ))
    np.testing.assert_allclose(h, -np.eye(2), atol=0.05)


@pytest.mark.parametrize("method", ["hmc", "nuts"])
def test_run_ensemble_gradient_methods(tmp_path, method):
    outdir = str(tmp_path / method)
    x0 = 0.1 * np.random.default_rng(0).standard_normal((16, 2))
    backend = sampler_run.run_ensemble(
        log_prob,
        x0,
        outdir,
        method=method,
        ntimes=5,
        tautol=0.5,
        meanshift=1.0,
        stdshift=1.0,
        check_every=50,
        max_iterations=400,
        seed=0,
    )
    chain = backend.get_chain()
    assert chain.shape[1:] == (16, 2)
    flat = chain[chain.shape[0] // 2 :].reshape(-1, 2)
    np.testing.assert_allclose(flat.mean(axis=0), MEAN, atol=0.15)
    # resume: rerunning must extend, not restart
    n1 = backend.iteration
    backend2 = sampler_run.run_ensemble(
        log_prob, x0, outdir, method=method, ntimes=5, tautol=0.5,
        meanshift=1.0, stdshift=1.0, check_every=50,
        max_iterations=n1 + 50, seed=0,
    )
    assert backend2.iteration >= n1
