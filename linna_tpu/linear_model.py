"""PCA + polynomial-regression pre-model (reference ``LinearModel`` +
``pytorchPolynomialLinear``, linna/nn.py:200-298).

A trainable linear baseline that can be added under the NN emulator
(``apply_model(..., linearmodel=...)``): standardize inputs/outputs, PCA the
outputs (SVD of y^T y, keeping components with s/s0 > 0.05 when ``npc`` is
None), fit a polynomial regression in PC space by least squares, and evaluate
as a pure JAX function (differentiable, jit/vmap-safe) — the reference
rebuilt sklearn's prediction with stored coefficients and power products to
make it torch-differentiable; here the fit itself is plain ``lstsq`` and the
evaluation is one matmul over monomial features.

The reference pickles the fitted model (linna/nn.py:262-265); here it
round-trips through npz (pickle-free artifact contract).
"""

from __future__ import annotations

from itertools import combinations_with_replacement
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["LinearModel", "fit_linear_model", "polynomial_powers",
           "save_linear_model", "load_linear_model"]


def polynomial_powers(ndim: int, degree: int) -> np.ndarray:
    """All monomial exponent vectors with total degree <= ``degree``
    (sklearn ``PolynomialFeatures.powers_`` ordering: by degree, then
    lexicographic combinations)."""
    rows = []
    for deg in range(degree + 1):
        for combo in combinations_with_replacement(range(ndim), deg):
            p = np.zeros(ndim, dtype=np.int32)
            for i in combo:
                p[i] += 1
            rows.append(p)
    return np.stack(rows)


class LinearModel(NamedTuple):
    """Fitted PCA+polynomial model as a JAX pytree; callable on (B, D) or (D,)
    standardized-or-raw inputs exactly like the reference's ``__call__``
    (linna/nn.py:250-256)."""

    xmean: jax.Array  # f32[D]
    xstd: jax.Array  # f32[D]
    ymean: jax.Array  # f32[N]
    ystd: jax.Array  # f32[N]
    vec: jax.Array  # f32[npc, N] PC basis rows
    coef: jax.Array  # f32[P, npc] polynomial coefficients
    powers: jax.Array  # i32[P, D]

    def __call__(self, x: jax.Array) -> jax.Array:
        one = x.ndim == 1
        if one:
            x = x[None, :]
        xn = (x - self.xmean) / self.xstd
        # monomial features: prod(x**power) per power row.  For power==0
        # lanes the base is replaced by 1 BEFORE the power: d/dx of x**0 via
        # the power rule is 0 * x**(-1), which autodiffs to NaN exactly at
        # xn == 0 (an input equal to a training mean) and would poison
        # HMC/NUTS gradients through the whole composed model.
        base = jnp.where(self.powers[None, :, :] == 0, 1.0, xn[:, None, :])
        feats = jnp.prod(base ** self.powers[None, :, :], axis=-1)
        pc = feats @ self.coef  # (B, npc)
        out = pc @ self.vec * self.ystd + self.ymean
        return out[0] if one else out


def fit_linear_model(
    train_x: np.ndarray,
    train_y: np.ndarray,
    norder: int = 2,
    npc: Optional[int] = None,
    sample_weight: Optional[np.ndarray] = None,
) -> LinearModel:
    """Fit on host in float64 (reference linna/nn.py:227-249)."""
    x = np.asarray(train_x, dtype=np.float64)
    y = np.asarray(train_y, dtype=np.float64)
    xmean, xstd = x.mean(axis=0), x.std(axis=0, ddof=1)
    ymean, ystd = y.mean(axis=0), y.std(axis=0, ddof=1)
    xstd = np.where(xstd == 0, 1.0, xstd)
    ystd = np.where(ystd == 0, 1.0, ystd)
    xn = (x - xmean) / xstd
    yn = (y - ymean) / ystd

    vec, s, _ = np.linalg.svd(yn.T @ yn)
    if npc is None:
        keep = np.where(s / s[0] > 0.05)[0]
        npc = int(keep[-1]) + 1 if len(keep) else 1
    y_pc = yn @ vec[:, :npc]

    powers = polynomial_powers(x.shape[1], norder)
    feats = np.prod(xn[:, None, :] ** powers[None, :, :], axis=-1)
    if sample_weight is not None:
        w = np.sqrt(np.asarray(sample_weight, dtype=np.float64))[:, None]
        coef, *_ = np.linalg.lstsq(feats * w, y_pc * w, rcond=None)
    else:
        coef, *_ = np.linalg.lstsq(feats, y_pc, rcond=None)

    f32 = lambda a: jnp.asarray(a, jnp.float32)
    return LinearModel(
        f32(xmean), f32(xstd), f32(ymean), f32(ystd),
        f32(vec[:, :npc].T), f32(coef), jnp.asarray(powers),
    )


def save_linear_model(path: str, model: LinearModel) -> None:
    np.savez(path, **{k: np.asarray(v) for k, v in model._asdict().items()})


def load_linear_model(path: str) -> LinearModel:
    with np.load(path) as f:
        return LinearModel(
            jnp.asarray(f["xmean"]), jnp.asarray(f["xstd"]),
            jnp.asarray(f["ymean"]), jnp.asarray(f["ystd"]),
            jnp.asarray(f["vec"]), jnp.asarray(f["coef"]),
            jnp.asarray(f["powers"]),
        )
