"""Input/output standardization transforms for the emulator.

Reference semantics (linna/util.py:402-596): the NN sees standardized inputs
``(x - mean)/std`` (with optional per-index log10) and emits standardized
outputs that are mapped back to data space by a robust median/MAD affine map,
optionally through ``exp``/``log`` for strictly-positive data vectors; the
data vector itself is pre-scaled by ``1/sqrt(diag(cov))``.

Here every transform is a NamedTuple of arrays (a JAX pytree) with pure
``apply`` functions, so transforms compose inside ``jit``/``vmap``/``grad``
and serialize to ``.npz`` — no pickle anywhere.

Fitting rules mirror linna/util.py:1440-1451 and
linna/util.py:1308-1313 (``median_absolute_deviation``): X statistics use the
Bessel-corrected std (torch default), Y statistics use median + MAD with a
``std < 1e-10 -> 1.0`` floor.
"""

from __future__ import annotations

import dataclasses
from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "XTransform",
    "YTransformData",
    "YTransform",
    "fit_x_transform",
    "fit_y_transform",
    "save_transforms",
    "load_transforms",
    "TransformSet",
]


class XTransform(NamedTuple):
    """Parameter standardization ``x -> (x' - mean)/std`` where ``x'`` applies
    log10 at the masked indices (reference linna/util.py:466-497)."""

    mean: jax.Array  # f32[D]
    std: jax.Array  # f32[D]
    log10_mask: jax.Array  # bool[D]

    def __call__(self, x: jax.Array) -> jax.Array:
        # double-where: log10 must never SEE the unselected lanes.  A bare
        # ``where(mask, log10(x), x)`` has a NaN *gradient* at any x <= 0
        # even when the mask is False there (the unselected branch's
        # d log10/dx = inf rides 0 * inf = NaN through where's VJP) — which
        # poisoned HMC/NUTS gradients at whitened 0 for plain flat priors.
        safe = jnp.where(self.log10_mask, x, 1.0)
        x1 = jnp.where(self.log10_mask, jnp.log10(safe), x)
        return (x1 - self.mean) / self.std


class YTransformData(NamedTuple):
    """Data-vector scaling ``y -> y/sigma`` with ``sigma = sqrt(diag(cov))``
    (reference linna/util.py:402-464)."""

    sigma: jax.Array  # f32[N]

    def __call__(self, y: jax.Array) -> jax.Array:
        return y / self.sigma

    def inverse(self, y: jax.Array) -> jax.Array:
        return y * self.sigma

    def transform_cov(self, cov: np.ndarray) -> np.ndarray:
        """D^-1 C D^-1 in float64 (reference linna/util.py:437-447)."""
        inv_sigma = 1.0 / np.asarray(self.sigma, dtype=np.float64)
        return cov * inv_sigma[:, None] * inv_sigma[None, :]


@dataclasses.dataclass(frozen=True)
class YTransform:
    """NN-output destandardization (reference linna/util.py:512-596).

    ``apply``: standardized NN output -> sigma-scaled data space
    (``y*std + mean`` or ``exp(y*std + mean)`` when ``ypositive``).
    ``inverse``: sigma-scaled data space -> standardized space.

    A registered dataclass (not a NamedTuple) so ``ypositive`` is pytree
    *metadata*: the transform set is passed as an argument into the jitted
    training programs (see Trainer._loss), and a bool leaf would arrive
    there as a tracer and break the Python ``if`` branches below.
    """

    mean: jax.Array  # f32[N]
    std: jax.Array  # f32[N]
    ypositive: bool

    def _replace(self, **kw) -> "YTransform":
        return dataclasses.replace(self, **kw)

    def __call__(self, y: jax.Array) -> jax.Array:
        out = y * self.std + self.mean
        if self.ypositive:
            out = jnp.exp(out)
        return out

    def inverse(self, y: jax.Array) -> jax.Array:
        if self.ypositive:
            y = jnp.log(y)
        return (y - self.mean) / self.std

    def transform_cov(self, cov: np.ndarray, data: Optional[np.ndarray] = None) -> np.ndarray:
        """Map a (sigma-scaled) covariance into standardized NN-output space
        (reference linna/util.py:572-590).

        For ``ypositive`` the covariance is first mapped to log space via
        ``log(1 + C/(d_i d_j))`` around the expected data vector ``data``.
        Computed on host in float64 — this is setup-time work.
        """
        std = np.asarray(self.std, dtype=np.float64)
        if self.ypositive:
            if data is None:
                raise ValueError("ypositive covariance transform needs the data vector")
            d = np.asarray(data, dtype=np.float64)
            cov0 = cov / (d[:, None] * d[None, :])
            cov0 = np.where(cov0 <= -1.0, 1e-10 - 1.0, cov0)
            cov = np.log1p(cov0)
        inv_std = 1.0 / std
        return cov * inv_std[:, None] * inv_std[None, :]


jax.tree_util.register_dataclass(
    YTransform, data_fields=["mean", "std"], meta_fields=["ypositive"]
)


class TransformSet(NamedTuple):
    """All transforms for one trained emulator iteration — the artifact the
    reference persists as five pickles (linna/util.py:1329-1331,1443,1453-1455);
    here a single ``transforms.npz``."""

    x_transform: XTransform
    y_transform: YTransform
    y_data: YTransformData


def fit_x_transform(
    train_x: np.ndarray, dolog10index: Optional[Sequence[int]] = None
) -> XTransform:
    """Mean/std over the (log10-mapped) training inputs
    (reference linna/util.py:1334-1342,1440-1442). Bessel-corrected std to
    match torch's default."""
    x = np.array(train_x, dtype=np.float64)
    mask = np.zeros(x.shape[-1], dtype=bool)
    if dolog10index is not None:
        for ind in dolog10index:
            mask[ind] = True
            x[:, ind] = np.log10(x[:, ind])
    mean = x.mean(axis=0)
    std = x.std(axis=0, ddof=1)
    return XTransform(
        jnp.asarray(mean, dtype=jnp.float32),
        jnp.asarray(std, dtype=jnp.float32),
        jnp.asarray(mask),
    )


def _median_absolute_deviation(y: np.ndarray, median: np.ndarray) -> np.ndarray:
    """MAD (no scale factor), matching linna/util.py:1308-1313."""
    return np.median(np.abs(y - median), axis=0)


def fit_y_transform(
    train_y_scaled: np.ndarray, ypositive: bool = False
) -> YTransform:
    """Median/MAD statistics of the sigma-scaled training outputs
    (reference linna/util.py:1444-1451).

    ``train_y_scaled`` must already be divided by sigma (and is the *first
    iteration's* training set in the reference's non-ypositive path —
    linna/util.py:1449).  For ``ypositive`` the stats are taken in log space.
    """
    y = np.array(train_y_scaled, dtype=np.float64)
    if ypositive:
        y = np.log(y)
    median = np.median(y, axis=0)
    mad = _median_absolute_deviation(y, median)
    if not ypositive:
        mad = np.where(mad < 1e-10, 1.0, mad)
    return YTransform(
        jnp.asarray(median, dtype=jnp.float32),
        jnp.asarray(mad, dtype=jnp.float32),
        ypositive,
    )


def save_transforms(path: str, ts: TransformSet) -> None:
    """Persist the full transform set as one ``.npz`` artifact.

    Atomic (tmp + rename) like utils.checkpoint: the file is read by every
    later retrieval of this iteration's emulator, and a torn write would
    fail those loads until someone deletes it by hand."""
    import os

    tmp = path + ".tmp.npz"  # keep .npz so savez doesn't append a suffix
    np.savez(
        tmp,
        x_mean=np.asarray(ts.x_transform.mean),
        x_std=np.asarray(ts.x_transform.std),
        x_log10_mask=np.asarray(ts.x_transform.log10_mask),
        y_mean=np.asarray(ts.y_transform.mean),
        y_std=np.asarray(ts.y_transform.std),
        y_positive=np.array(ts.y_transform.ypositive),
        sigma=np.asarray(ts.y_data.sigma),
    )
    os.replace(tmp, path)


def load_transforms(path: str) -> TransformSet:
    with np.load(path) as z:
        xt = XTransform(
            jnp.asarray(z["x_mean"]), jnp.asarray(z["x_std"]), jnp.asarray(z["x_log10_mask"])
        )
        yt = YTransform(
            jnp.asarray(z["y_mean"]), jnp.asarray(z["y_std"]), bool(z["y_positive"])
        )
        yd = YTransformData(jnp.asarray(z["sigma"]))
    return TransformSet(xt, yt, yd)
