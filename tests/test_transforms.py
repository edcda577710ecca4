"""X/Y transform parity tests (reference linna/util.py:402-596, 1440-1451)."""

import numpy as np
import numpy.testing as npt
import jax.numpy as jnp

from linna_tpu import transforms as T


def test_x_transform_fit_and_apply():
    rng = np.random.default_rng(0)
    x = np.abs(rng.normal(1.0, 0.2, size=(200, 3))) + 0.1
    xt = T.fit_x_transform(x, dolog10index=[1])
    x1 = x.copy()
    x1[:, 1] = np.log10(x1[:, 1])
    # torch std default is Bessel-corrected
    want = (x1 - x1.mean(axis=0)) / x1.std(axis=0, ddof=1)
    got = np.asarray(xt(jnp.asarray(x, dtype=jnp.float32)))
    npt.assert_allclose(got, want, rtol=1e-4, atol=1e-4)


def test_y_data_transform_and_cov():
    rng = np.random.default_rng(1)
    sigma = rng.uniform(0.5, 2.0, 5)
    cov = np.diag(sigma**2)
    yd = T.YTransformData(jnp.asarray(sigma, jnp.float32))
    y = rng.normal(size=(4, 5))
    npt.assert_allclose(
        np.asarray(yd(jnp.asarray(y, jnp.float32))), y / sigma, rtol=1e-5
    )
    npt.assert_allclose(
        np.asarray(yd.inverse(yd(jnp.asarray(y, jnp.float32)))), y, rtol=1e-5
    )
    # D^-1 C D^-1 of a diag(sigma^2) is identity
    npt.assert_allclose(yd.transform_cov(cov), np.eye(5), atol=1e-6)


def test_y_transform_median_mad():
    rng = np.random.default_rng(2)
    y = rng.normal(3.0, 2.0, size=(501, 4))
    yt = T.fit_y_transform(y, ypositive=False)
    med = np.median(y, axis=0)
    mad = np.median(np.abs(y - med), axis=0)
    npt.assert_allclose(np.asarray(yt.mean), med, rtol=1e-5)
    npt.assert_allclose(np.asarray(yt.std), mad, rtol=1e-5)
    # apply/inverse roundtrip
    z = yt.inverse(jnp.asarray(y[:10], jnp.float32))
    back = yt(z)
    npt.assert_allclose(np.asarray(back), y[:10], rtol=1e-4)


def test_y_transform_mad_floor():
    # constant column -> MAD == 0 -> floored to 1.0 (linna/util.py:1451)
    y = np.ones((50, 2))
    y[:, 1] = np.linspace(0, 1, 50)
    yt = T.fit_y_transform(y, ypositive=False)
    assert float(yt.std[0]) == 1.0


def test_y_transform_ypositive():
    rng = np.random.default_rng(3)
    y = np.exp(rng.normal(0.0, 1.0, size=(301, 3)))
    yt = T.fit_y_transform(y, ypositive=True)
    logy = np.log(y)
    med = np.median(logy, axis=0)
    npt.assert_allclose(np.asarray(yt.mean), med, rtol=1e-5)
    # inverse(apply(z)) == z
    z = rng.normal(size=(5, 3)).astype(np.float32)
    back = yt.inverse(yt(jnp.asarray(z)))
    npt.assert_allclose(np.asarray(back), z, rtol=1e-4, atol=1e-5)


def test_ypositive_cov_transform():
    rng = np.random.default_rng(4)
    d = rng.uniform(1.0, 2.0, 3)
    cov = np.diag((0.1 * d) ** 2)
    y = np.exp(rng.normal(0.0, 1.0, size=(100, 3)))
    yt = T.fit_y_transform(y, ypositive=True)
    got = yt.transform_cov(cov, data=d)
    std = np.asarray(yt.std, dtype=np.float64)
    want = np.log1p(cov / (d[:, None] * d[None, :])) / (std[:, None] * std[None, :])
    npt.assert_allclose(got, want, rtol=1e-6)


def test_transformset_npz_roundtrip(tmp_path):
    rng = np.random.default_rng(5)
    ts = T.TransformSet(
        T.fit_x_transform(rng.normal(1, 0.1, (50, 2)) + 2, dolog10index=[0]),
        T.fit_y_transform(rng.normal(size=(51, 3))),
        T.YTransformData(jnp.asarray(rng.uniform(0.5, 1.5, 3), jnp.float32)),
    )
    path = str(tmp_path / "transforms.npz")
    T.save_transforms(path, ts)
    ts2 = T.load_transforms(path)
    npt.assert_allclose(np.asarray(ts2.x_transform.mean), np.asarray(ts.x_transform.mean))
    npt.assert_allclose(np.asarray(ts2.y_transform.std), np.asarray(ts.y_transform.std))
    npt.assert_allclose(np.asarray(ts2.y_data.sigma), np.asarray(ts.y_data.sigma))
    assert ts2.y_transform.ypositive == ts.y_transform.ypositive


def test_x_transform_gradient_finite_at_zero():
    """Gradients through XTransform must be finite at x == 0 for lanes the
    log10 mask does NOT select: a bare where(mask, log10(x), x) rides
    0 * inf = NaN through the VJP and poisoned HMC/NUTS gradients at the
    whitened origin (regression; examples/walkthrough.py surfaces it)."""
    import jax

    xt = T.XTransform(
        jnp.zeros(3), jnp.ones(3), jnp.asarray([False, True, False])
    )
    x = jnp.asarray([0.0, 2.0, -1.0])  # lane 0 hits the trap point
    g = jax.grad(lambda z: xt(z).sum())(x)
    assert np.all(np.isfinite(np.asarray(g))), g
    # the selected lane's log10 derivative is still exact
    np.testing.assert_allclose(float(g[1]), 1.0 / (2.0 * np.log(10.0)), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(g)[[0, 2]], [1.0, 1.0], rtol=1e-6)
