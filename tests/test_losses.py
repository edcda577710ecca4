"""Chi^2-ratio loss parity tests (reference linna/util.py:1055-1127)."""

import numpy as np
import numpy.testing as npt
import jax.numpy as jnp

from linna_tpu import losses as L
from linna_tpu import transforms as T


def _setup(ndata=6, nbatch=8, seed=0, ypositive=False):
    rng = np.random.default_rng(seed)
    data = rng.normal(1.0, 0.1, ndata) if not ypositive else rng.uniform(1, 2, ndata)
    A = rng.normal(size=(ndata, ndata)) * 0.05
    cov = np.eye(ndata) * 0.04 + A @ A.T
    sigma = np.sqrt(np.diag(cov))
    yd = T.YTransformData(jnp.asarray(sigma, jnp.float32))
    train_y = data + rng.normal(0, 0.2, size=(200, ndata)) * sigma
    if ypositive:
        train_y = np.abs(train_y) + 0.1
    yt = T.fit_y_transform(train_y / sigma, ypositive=ypositive)
    xt = T.fit_x_transform(rng.normal(size=(100, 2)))
    ts = T.TransformSet(xt, yt, yd)
    state = L.build_loss_state(data, cov, ts)
    targets = train_y[:nbatch]
    preds_std = np.asarray(ts.y_transform.inverse(ts.y_data(jnp.asarray(targets, jnp.float32))))
    preds_std = preds_std + rng.normal(0, 0.1, preds_std.shape)
    return state, ts, preds_std.astype(np.float32), targets.astype(np.float32), cov, data


def _ref_loss(state, ts, y_pred_std, y_target_raw, cov, data):
    """Straight NumPy float64 re-derivation of Auxilleryfunc (util.py:1060-1088)."""
    sigma = np.asarray(ts.y_data.sigma, np.float64)
    std = np.asarray(ts.y_transform.std, np.float64)
    mean = np.asarray(ts.y_transform.mean, np.float64)
    cov_scaled = cov / (sigma[:, None] * sigma[None, :])
    if ts.y_transform.ypositive:
        # reference composes: sigma-scaled cov first, then /(d_i d_j) and log1p
        # (linna/util.py:1063 with Y_invtransform_class.transform_cov:582-588)
        d = np.asarray(data, np.float64)
        cov0 = cov_scaled / (d[:, None] * d[None, :])
        cov_scaled = np.log1p(np.where(cov0 <= -1, 1e-10 - 1, cov0))
    cov_std = cov_scaled / (std[:, None] * std[None, :])
    icov = np.linalg.inv(cov_std)
    if ts.y_transform.ypositive:
        data_std = (np.log(np.asarray(data) / sigma) - mean) / std
        tgt_std = (np.log(y_target_raw / sigma) - mean) / std
    else:
        data_std = (np.asarray(data) / sigma - mean) / std
        tgt_std = (y_target_raw / sigma - mean) / std
    mask = (y_target_raw == 1e-30) | (y_target_raw == 1e10) | (data_std == 1e-30)
    ndata = len(data)

    def chi2(delta):
        d0 = np.where(mask, 0.0, delta)
        return np.sum((d0 @ icov) * d0, axis=-1)

    c_nn_d = chi2(y_pred_std - data_std)
    c_m_d = np.maximum(chi2(tgt_std - data_std), 0.5 * ndata)
    c_m_nn = chi2(tgt_std - y_pred_std)
    return np.mean(c_m_nn / c_m_d), c_m_d, c_nn_d


def test_loss_matches_reference_formula():
    state, ts, preds, targets, cov, data = _setup()
    got = float(L.loss_fn(state, ts, jnp.asarray(preds), jnp.asarray(targets)))
    want, _, _ = _ref_loss(state, ts, preds, targets, cov, data)
    npt.assert_allclose(got, want, rtol=2e-3)


def test_loss_ypositive():
    state, ts, preds, targets, cov, data = _setup(ypositive=True, seed=3)
    got = float(L.loss_fn(state, ts, jnp.asarray(preds), jnp.asarray(targets)))
    want, _, _ = _ref_loss(state, ts, preds, targets, cov, data)
    npt.assert_allclose(got, want, rtol=5e-3)


def test_sentinel_masking():
    state, ts, preds, targets, cov, data = _setup(seed=1)
    targets2 = targets.copy()
    targets2[0, :3] = 1e10  # clipped sentinel entries must not contribute
    l1 = float(L.loss_fn(state, ts, jnp.asarray(preds), jnp.asarray(targets2)))
    assert np.isfinite(l1)
    # fully-sentinel row contributes 0 chi2 -> loss for that row is 0
    targets3 = targets.copy()
    targets3[0, :] = 1e10
    per_row, _, _ = L.chi2_terms(state, ts, jnp.asarray(preds), jnp.asarray(targets3))
    assert float(per_row[0]) == 0.0


def test_denominator_floor():
    state, ts, preds, targets, cov, data = _setup(seed=2)
    # target exactly at data -> chi2(target,data)=0 -> floored to ndata/2
    sigma = np.asarray(ts.y_data.sigma)
    targets4 = np.tile(data, (len(targets), 1)).astype(np.float32)
    _, c_m_d, _ = L.chi2_terms(state, ts, jnp.asarray(preds), jnp.asarray(targets4))
    npt.assert_allclose(np.asarray(c_m_d), 0.5 * len(data), rtol=1e-4)


def test_val_metric_components():
    state, ts, preds, targets, cov, data = _setup(seed=4)
    m = np.asarray(L.val_metric_fn(state, ts, jnp.asarray(preds), jnp.asarray(targets)))
    loss, c_m_d, c_nn_d = _ref_loss(state, ts, preds, targets, cov, data)
    frac = np.abs(c_nn_d / c_m_d - 1)
    npt.assert_allclose(m[1], np.max(frac), rtol=2e-3)
    npt.assert_allclose(m[2], np.median(frac), rtol=2e-3)
