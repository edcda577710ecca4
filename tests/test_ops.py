"""Pallas fused kernels vs the pure-jnp reference composition (interpret
mode; the real TPU path is exercised by bench.py and the driver)."""

import jax
import jax.numpy as jnp
import numpy as np

from linna_tpu import likelihood as LK
from linna_tpu import nn as N
from linna_tpu import priors as P
from linna_tpu import transforms as T
from linna_tpu.ops import fused_apply, fused_log_prob


def _problem(ndim=5, ndata=33, seed=0):
    key = jax.random.key(seed)
    ks = jax.random.split(key, 6)
    spec = N.make_model_spec("chto_v2", ndim, ndata)
    params = N.init_model(ks[0], spec)
    xt = T.XTransform(
        jax.random.normal(ks[1], (ndim,)) * 0.1,
        jnp.ones(ndim) + 0.1 * jax.random.uniform(ks[2], (ndim,)),
        jnp.zeros(ndim, bool),
    )
    yt = T.YTransform(
        jax.random.normal(ks[3], (ndata,)) * 0.1,
        jnp.ones(ndata) * 1.3,
        False,
    )
    yd = T.YTransformData(jnp.ones(ndata) * 0.7)
    transforms = T.TransformSet(xt, yt, yd)
    priors = [
        {"param": "g", "dist": "gauss", "arg1": 0.2, "arg2": 1.1}
    ] + [
        {"param": f"p{i}", "dist": "flat", "arg1": -2.0, "arg2": 2.0}
        for i in range(ndim - 1)
    ]
    pack = P.priors_from_list(priors)
    data = np.asarray(jax.random.normal(ks[4], (ndata,)) * 0.3)
    a = np.asarray(jax.random.normal(ks[5], (ndata, ndata))) * 0.05
    inv_cov = np.eye(ndata) + a @ a.T
    return spec, params, transforms, pack, data, inv_cov


def test_fused_apply_matches_reference():
    spec, params, transforms, *_ = _problem()
    x = jax.random.normal(jax.random.key(7), (37, spec.in_size))  # odd batch
    want = np.asarray(N.apply_model(spec, params, x))
    got = np.asarray(fused_apply(spec, params, x, interpret=True))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_fused_apply_gradients_match():
    spec, params, transforms, *_ = _problem(ndim=3, ndata=4)
    x = jax.random.normal(jax.random.key(8), (8, 3))

    def loss_f(p):
        return jnp.sum(fused_apply(spec, p, x, interpret=True) ** 2)

    def loss_r(p):
        return jnp.sum(N.apply_model(spec, p, x) ** 2)

    gf = jax.grad(loss_f)(params)
    gr = jax.grad(loss_r)(params)
    for a, b in zip(jax.tree_util.tree_leaves(gf), jax.tree_util.tree_leaves(gr)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-5)


def test_fused_log_prob_matches_reference():
    spec, params, transforms, pack, data, inv_cov = _problem()
    lp_ref = LK.make_log_prob(
        spec, params, transforms, pack, data, inv_cov, temperature=4.0
    )
    lp_fused = fused_log_prob(
        spec, params, transforms, pack, data, inv_cov, temperature=4.0,
        interpret=True,
    )
    x = jax.random.normal(jax.random.key(9), (300, spec.in_size))
    want = np.asarray(lp_ref(x))
    got = np.asarray(lp_fused(x))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)


def test_fused_log_prob_gradient_matches():
    spec, params, transforms, pack, data, inv_cov = _problem(ndim=4, ndata=8)
    lp_ref = LK.make_log_prob(spec, params, transforms, pack, data, inv_cov)
    lp_fused = fused_log_prob(
        spec, params, transforms, pack, data, inv_cov, interpret=True
    )
    x = jax.random.normal(jax.random.key(10), (6, 4))
    g_ref = np.asarray(LK.make_grad_log_prob(lp_ref)(x))
    g_fused = np.asarray(LK.make_grad_log_prob(lp_fused)(x))
    np.testing.assert_allclose(g_fused, g_ref, rtol=1e-4, atol=1e-5)


def test_fused_log_prob_exposes_env_decomposition():
    """use_fused must not defeat the sampler's compile-cache design: the
    fused callable carries the same _pure/_env split as make_log_prob, so
    run.py threads the trained weights through the jitted chunks as traced
    arguments instead of baking them into the HLO."""
    spec, params, transforms, pack, data, inv_cov = _problem(ndim=3, ndata=6)
    lp = fused_log_prob(
        spec, params, transforms, pack, data, inv_cov, interpret=True
    )
    assert hasattr(lp, "_pure") and hasattr(lp, "_env")
    x = jax.random.normal(jax.random.key(12), (8, 3))
    np.testing.assert_allclose(
        np.asarray(lp._pure(x, lp._env)), np.asarray(lp(x)), rtol=1e-6
    )
    # gradients flow through the (x, env) form — the one the samplers use
    g = jax.grad(lambda xx: jnp.sum(lp._pure(xx, lp._env)))(x)
    assert np.all(np.isfinite(np.asarray(g)))


def test_fused_log_prob_log10_rejects_nonpositive():
    """Reference semantics: log10 of a non-positive physical value is NaN ->
    lp = -inf (rejected proposal).  The fused kernel clamps for arithmetic
    safety but must still return -inf, not finite garbage."""
    spec, params, transforms, pack, data, inv_cov = _problem(ndim=5, ndata=33)
    xt = transforms.x_transform._replace(
        log10_mask=jnp.asarray([True] + [False] * 4)
    )
    transforms = transforms._replace(x_transform=xt)
    lp_ref = LK.make_log_prob(spec, params, transforms, pack, data, inv_cov)
    lp_fused = fused_log_prob(
        spec, params, transforms, pack, data, inv_cov, interpret=True
    )
    # param 0 has a gauss prior (mean 0.2, sig 1.1): whitened -3 -> physical
    # -3.1 < 0 on the log10 lane
    x = np.zeros((4, 5), np.float32)
    x[1, 0] = -3.0
    x[3, 0] = -5.0
    ref = np.asarray(lp_ref(jnp.asarray(x)))
    got = np.asarray(lp_fused(jnp.asarray(x)))
    assert ref[1] == -np.inf and ref[3] == -np.inf
    np.testing.assert_array_equal(got[[1, 3]], [-np.inf, -np.inf])
    np.testing.assert_allclose(got[[0, 2]], ref[[0, 2]], rtol=2e-4, atol=2e-4)


def test_fused_rejects_linear_bypass_spec():
    import pytest

    spec, params, transforms, pack, data, inv_cov = _problem(ndim=3, ndata=6)
    spec_lin = N.make_model_spec("chto_v2_linear", 3, 6)
    params_lin = N.init_model(jax.random.key(0), spec_lin)
    with pytest.raises(ValueError, match="bypass"):
        fused_apply(spec_lin, params_lin, jnp.zeros((4, 3)), interpret=True)
    with pytest.raises(ValueError, match="bypass"):
        fused_log_prob(
            spec_lin, params_lin, transforms, pack, data, inv_cov,
            interpret=True,
        )
    # and make_log_prob must not route such a spec to the fused path
    lp = LK.make_log_prob(
        spec_lin, params_lin, transforms, pack, data, inv_cov, use_fused=True
    )
    want = np.asarray(
        LK.make_log_prob(spec_lin, params_lin, transforms, pack, data, inv_cov)(
            jnp.zeros((2, 3))
        )
    )
    np.testing.assert_allclose(np.asarray(lp(jnp.zeros((2, 3)))), want, rtol=1e-6)


def test_fused_log_prob_ypositive():
    spec, params, transforms, pack, data, inv_cov = _problem(ndim=3, ndata=6)
    yt = transforms.y_transform._replace(
        ypositive=True, mean=jnp.zeros(6), std=jnp.full((6,), 0.05)
    )
    transforms = transforms._replace(y_transform=yt)
    data = np.abs(data[:6]) + 1.0
    lp_ref = LK.make_log_prob(spec, params, transforms, pack, data, inv_cov)
    lp_fused = fused_log_prob(
        spec, params, transforms, pack, data, inv_cov, interpret=True
    )
    x = jax.random.normal(jax.random.key(11), (16, 3)) * 0.3
    np.testing.assert_allclose(
        np.asarray(lp_fused(x)), np.asarray(lp_ref(x)), rtol=2e-4, atol=2e-4
    )
