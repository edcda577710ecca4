"""Posterior-weighted chi^2-ratio training loss and validation metric.

Reference semantics (linna/util.py:1055-1127 ``Auxilleryfunc``/``Loss_fn``/
``Val_metric_fn``): all chi^2 terms are computed in the emulator's
standardized output space using the covariance mapped through both the
1/sigma data scaling and the median/MAD output standardization; rows and
entries carrying sentinel values (1e-30 failed theory / 1e10 clipped) are
masked out of the residuals; the denominator chi^2(target, data) is floored
at 0.5*ndata so points already on top of the data don't blow up the ratio.

    loss = mean_i [ chi^2(NN_i, target_i) / max(chi^2(target_i, data), ndata/2) ]

This weights emulator accuracy by posterior relevance: points far from the
data (large chi^2(target, data)) may be emulated loosely.

The loss state is a pytree (:class:`LossState`) built once per training run on
the host (float64 covariance inversion) and then closed over by the jitted
train step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from .transforms import TransformSet

__all__ = ["LossState", "build_loss_state", "chi2_terms", "loss_fn", "val_metric_fn"]

SENTINEL_LOW = 1e-30
SENTINEL_HIGH = 1e10


class LossState(NamedTuple):
    """Precomputed tensors for the chi^2-ratio loss (all in standardized
    NN-output space)."""

    inv_transformed_cov: jax.Array  # f32[N, N]
    data_std: jax.Array  # f32[N] — data vector in standardized space
    ndata: int


def build_loss_state(
    data: np.ndarray, cov: np.ndarray, transforms: TransformSet
) -> LossState:
    """Host-side setup (reference linna/util.py:1060-1069): map the covariance
    into standardized space in float64, invert it there, and standardize the
    data vector (NaN -> 1e-30 like the reference's ``nan_to_num``)."""
    cov64 = np.asarray(cov, dtype=np.float64)
    cov_scaled = transforms.y_data.transform_cov(cov64)
    cov_std = transforms.y_transform.transform_cov(cov_scaled, data=data)
    inv_cov_std = np.linalg.inv(cov_std)
    data_std = np.asarray(
        transforms.y_transform.inverse(transforms.y_data(jnp.asarray(data, jnp.float32)))
    )
    data_std = np.nan_to_num(data_std, nan=SENTINEL_LOW)
    return LossState(
        jnp.asarray(inv_cov_std, dtype=jnp.float32),
        jnp.asarray(data_std, dtype=jnp.float32),
        int(np.asarray(data).shape[-1]),
    )


def _masked_chi2(delta: jax.Array, mask: jax.Array, inv_cov: jax.Array) -> jax.Array:
    """sum(delta @ inv_cov * delta) over the data axis with masked entries
    zeroed (reference linna/util.py:1075-1085)."""
    d = jnp.where(mask, 0.0, delta)
    return jnp.sum((d @ inv_cov) * d, axis=-1)


def chi2_terms(
    state: LossState,
    transforms: TransformSet,
    y_pred_std: jax.Array,
    y_target_raw: jax.Array,
):
    """Per-sample (loss, chi2_target_data, chi2_nn_data).

    ``y_pred_std``: NN output in standardized space (batch, N).
    ``y_target_raw``: theory targets in raw data units (batch, N).
    Mirrors linna/util.py:1070-1088.
    """
    y_target_std = transforms.y_transform.inverse(transforms.y_data(y_target_raw))
    mask = (
        (y_target_raw == SENTINEL_LOW)
        | (y_target_raw == SENTINEL_HIGH)
        | (state.data_std == SENTINEL_LOW)
    )
    chisq_nn_d = _masked_chi2(y_pred_std - state.data_std, mask, state.inv_transformed_cov)
    chisq_m_d = _masked_chi2(y_target_std - state.data_std, mask, state.inv_transformed_cov)
    chisq_m_nn = _masked_chi2(y_target_std - y_pred_std, mask, state.inv_transformed_cov)
    floor = 0.5 * state.ndata
    chisq_m_d = jnp.maximum(chisq_m_d, floor)
    loss = chisq_m_nn / chisq_m_d
    return loss, chisq_m_d, chisq_nn_d


def loss_fn(
    state: LossState,
    transforms: TransformSet,
    y_pred_std: jax.Array,
    y_target_raw: jax.Array,
) -> jax.Array:
    """Scalar training loss (reference linna/util.py:1090-1116)."""
    loss, _, _ = chi2_terms(state, transforms, y_pred_std, y_target_raw)
    return jnp.mean(loss)


def val_metric_fn(
    state: LossState,
    transforms: TransformSet,
    y_pred_std: jax.Array,
    y_target_raw: jax.Array,
) -> jax.Array:
    """[median(loss), max|chi2_nn,d/chi2_M,d - 1|, median(|.|)]
    (reference linna/util.py:1118-1127)."""
    loss, chisq_m_d, chisq_nn_d = chi2_terms(state, transforms, y_pred_std, y_target_raw)
    fracerr = jnp.abs(chisq_nn_d / chisq_m_d - 1.0)
    return jnp.array(
        [jnp.median(loss), jnp.max(fracerr), jnp.median(fracerr)], dtype=jnp.float32
    )
