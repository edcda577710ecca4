"""Emulator network topology/init tests (reference linna/nn.py:11-133)."""

import numpy as np
import numpy.testing as npt
import jax
import jax.numpy as jnp

from linna_tpu import nn as N


def test_hidden_size_rule():
    assert N.hidden_size_for(1) == 32
    assert N.hidden_size_for(2) == 64
    assert N.hidden_size_for(30) == 960
    assert N.hidden_size_for(31) == 1000
    assert N.hidden_size_for(500) == 1000


def test_init_shapes_chto_v2():
    spec = N.make_model_spec("chto_v2", 5, 40)
    params = N.init_model(jax.random.key(0), spec)
    h = 1000
    assert params["layer1"]["w"].shape == (5, h)
    assert params["rb1"]["lin1"]["w"].shape == (h, 16)
    assert params["rb1"]["lin2"]["w"].shape == (16, h // 2)
    assert params["rb1"]["skip_w"].shape == (h, h // 2)
    assert params["rb2"]["lin1"]["w"].shape == (h // 2, 32)
    assert params["rb3"]["lin1"]["w"].shape == (h // 4, 64)
    assert params["layer6"]["w"].shape == (h // 8, h // 2)
    assert params["layer7"]["w"].shape == (h // 2, 40)
    assert params["layer8"]["w"].shape == (40, 40)


def test_init_values():
    spec = N.make_model_spec("chto_v2", 3, 2)
    params = N.init_model(jax.random.key(0), spec)
    # biases all 1e-2 (linna/nn.py:42,99)
    npt.assert_allclose(np.asarray(params["layer1"]["b"]), 1e-2)
    # skip weights Xavier, NOT zero: ChtoModelv2.init_weight re-initializes
    # every nn.Linear incl. each skip_layer after the block zeroed it
    # (linna/nn.py:91-99 walks modules() parent-first) — the effective
    # production init is Xavier
    skip = np.asarray(params["rb1"]["skip_w"])
    assert np.any(skip != 0.0)
    h = params["layer1"]["w"].shape[1]
    skip_limit = np.sqrt(6.0 / (h + h // 2))
    assert np.all(np.abs(skip) <= skip_limit)
    # xavier bound respected
    w = np.asarray(params["layer1"]["w"])
    limit = np.sqrt(6.0 / (3 + 32))
    assert np.all(np.abs(w) <= limit)


def test_forward_shapes_and_batching():
    spec = N.make_model_spec("chto_v2", 4, 7)
    params = N.init_model(jax.random.key(1), spec)
    x1 = jnp.ones((4,))
    xb = jnp.ones((13, 4))
    y1 = N.apply_model(spec, params, x1)
    yb = N.apply_model(spec, params, xb)
    assert y1.shape == (7,)
    assert yb.shape == (13, 7)
    # batch vs single matmul kernels may differ in summation order
    npt.assert_allclose(np.asarray(yb[0]), np.asarray(y1), rtol=1e-4, atol=1e-6)


def test_block_finite_at_init():
    """Resblock output = relu(0.1 * lin2(relu(lin1(x))) + skip(x));
    the network produces finite output at init."""
    spec = N.make_model_spec("chto_simple", 2, 3)
    params = N.init_model(jax.random.key(2), spec)
    y = N.apply_model(spec, params, jnp.asarray([[0.3, -0.5]]))
    assert np.all(np.isfinite(np.asarray(y)))


def test_linear_bypass_variant():
    spec = N.make_model_spec("chto_v2_linear", 3, 2)
    params = N.init_model(jax.random.key(3), spec)
    npt.assert_allclose(np.asarray(params["linear_bypass"]["w"]), 1e-5)
    npt.assert_allclose(np.asarray(params["linear_bypass"]["b"]), 0.0)
    x = jnp.ones((1, 3))
    base = N.apply_model(
        N.make_model_spec("chto_v2", 3, 2),
        {k: v for k, v in params.items() if k != "linear_bypass"},
        x,
    )
    full = N.apply_model(spec, params, x)
    npt.assert_allclose(
        np.asarray(full - base), 1e-3 * (3 * 1e-5 + 0.0), rtol=1e-4, atol=1e-9
    )


def test_forward_is_jittable_and_differentiable():
    spec = N.make_model_spec("chto_simple", 3, 4)
    params = N.init_model(jax.random.key(4), spec)

    @jax.jit
    def f(p, x):
        return jnp.sum(N.apply_model(spec, p, x) ** 2)

    g = jax.grad(f)(params, jnp.ones((8, 3)))
    leaves = jax.tree_util.tree_leaves(g)
    assert all(np.all(np.isfinite(np.asarray(l))) for l in leaves)
    assert any(np.any(np.asarray(l) != 0) for l in leaves)
