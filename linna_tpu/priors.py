"""Prior specification and whitened-parameter transforms.

LINNA runs MCMC entirely in a *whitened* parameter space in which every prior
is an independent unit normal.  The maps between whitened and physical space
mirror the reference semantics (reference: linna/util.py:291-381
``gauss2unif``/``invgauss2unif``/``Transform``/``invTransform``,
linna/util.py:1160-1165 ``lnprior``, linna/util.py:1129-1157 ``LogPrior``,
linna/main.py:121-126 prior-range construction), but here they are pure,
batch-native JAX functions over a struct-of-arrays prior representation so the
whole likelihood pipeline stays inside one ``jit``.
"""

from __future__ import annotations

import json
from typing import NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "PriorPack",
    "priors_from_list",
    "priors_to_list",
    "gauss2unif",
    "invgauss2unif",
    "transform",
    "transform_np",
    "inv_transform",
    "lnprior",
    "log_prior_physical",
    "prior_range",
    "save_priors",
    "load_priors",
]

_SQRT2 = 1.4142135623730951


class PriorPack(NamedTuple):
    """Struct-of-arrays prior description (JAX pytree).

    ``is_gauss[i]`` selects between a Gaussian prior (``arg1``=mean,
    ``arg2``=sigma) and a flat prior (``arg1``=lower, ``arg2``=upper) for
    parameter ``i`` — same convention as the reference's list-of-dicts
    (linna/util.py:317-322).
    """

    is_gauss: jax.Array  # bool[D]
    arg1: jax.Array  # f32[D]
    arg2: jax.Array  # f32[D]

    @property
    def ndim(self) -> int:
        return self.arg1.shape[0]


def priors_from_list(priors: Sequence[dict]) -> PriorPack:
    """Build a :class:`PriorPack` from the reference-style list of dicts.

    Each entry: ``{'dist': 'flat'|'gauss', 'arg1': float, 'arg2': float}``.
    """
    is_gauss = np.array([p["dist"] == "gauss" for p in priors], dtype=bool)
    for p in priors:
        if p["dist"] not in ("gauss", "flat"):
            raise NotImplementedError(f"prior dist {p['dist']!r} not supported")
    arg1 = np.array([p["arg1"] for p in priors], dtype=np.float32)
    arg2 = np.array([p["arg2"] for p in priors], dtype=np.float32)
    return PriorPack(jnp.asarray(is_gauss), jnp.asarray(arg1), jnp.asarray(arg2))


def priors_to_list(pack: PriorPack) -> list[dict]:
    """Inverse of :func:`priors_from_list` (for config round-trips)."""
    is_gauss = np.asarray(pack.is_gauss)
    arg1 = np.asarray(pack.arg1)
    arg2 = np.asarray(pack.arg2)
    return [
        {
            "dist": "gauss" if g else "flat",
            "arg1": float(a),
            "arg2": float(b),
        }
        for g, a, b in zip(is_gauss, arg1, arg2)
    ]


def gauss2unif(x: jax.Array) -> jax.Array:
    """N(0,1)-distributed -> U(0,1)-distributed (reference linna/util.py:291-300)."""
    return 0.5 * (1.0 + jax.lax.erf(x / _SQRT2))


def invgauss2unif(u: jax.Array) -> jax.Array:
    """U(0,1)-distributed -> N(0,1)-distributed (reference linna/util.py:302-311)."""
    return _SQRT2 * jax.lax.erf_inv(2.0 * u - 1.0)


def transform(pack: PriorPack, x: jax.Array) -> jax.Array:
    """Whitened -> physical parameters, batched over leading axes.

    Gaussian prior: ``x * sigma + mu``; flat prior:
    ``gauss2unif(x) * (hi - lo) + lo`` (reference linna/util.py:339-343).
    """
    gauss = x * pack.arg2 + pack.arg1
    flat = gauss2unif(x) * (pack.arg2 - pack.arg1) + pack.arg1
    return jnp.where(pack.is_gauss, gauss, flat)


def transform_np(pack: PriorPack, x: np.ndarray) -> np.ndarray:
    """Host-side NumPy twin of :func:`transform`.

    The sampling loop applies the whitened->physical map to every persisted
    chunk (reference linna/sampler.py:340 ``transform`` before the HDF5
    append).  Going through the JAX version costs a device dispatch + fetch
    per chunk — pure round-trip latency on a tunneled device — for what is
    elementwise scalar math on data that is already on the host.
    """
    from scipy.special import ndtr

    x = np.asarray(x, dtype=np.float64)
    is_gauss = np.asarray(pack.is_gauss)
    arg1 = np.asarray(pack.arg1, dtype=np.float64)
    arg2 = np.asarray(pack.arg2, dtype=np.float64)
    gauss = x * arg2 + arg1
    flat = ndtr(x) * (arg2 - arg1) + arg1
    return np.where(is_gauss, gauss, flat)


def inv_transform(pack: PriorPack, x: jax.Array) -> jax.Array:
    """Physical -> whitened parameters (reference linna/util.py:373-377)."""
    gauss = (x - pack.arg1) / pack.arg2
    flat = invgauss2unif((x - pack.arg1) / (pack.arg2 - pack.arg1))
    return jnp.where(pack.is_gauss, gauss, flat)


def lnprior(x: jax.Array) -> jax.Array:
    """Log-prior in whitened space: exactly unit normal, ``-0.5 * sum(x^2)``
    (reference linna/util.py:1160-1165).  Reduces over the last axis.
    """
    return -0.5 * jnp.sum(jnp.square(x), axis=-1)


def log_prior_physical(pack: PriorPack, x: jax.Array) -> jax.Array:
    """Physical-space log-prior used by importance sampling
    (reference linna/util.py:1129-1157): flat boxes contribute -inf outside
    their bounds, Gaussian terms ``-0.5 ((x-mu)/sigma)^2``.
    """
    gauss_term = -0.5 * jnp.square((x - pack.arg1) / pack.arg2)
    inside = (x >= pack.arg1) & (x <= pack.arg2)
    flat_term = jnp.where(inside, 0.0, -jnp.inf)
    per_param = jnp.where(pack.is_gauss, gauss_term, flat_term)
    return jnp.sum(per_param, axis=-1)


def prior_range(pack: PriorPack) -> np.ndarray:
    """[D, 2] sampling box: flat priors use their bounds, Gaussian priors
    mu +/- 5 sigma (reference linna/main.py:121-126)."""
    is_gauss = np.asarray(pack.is_gauss)
    arg1 = np.asarray(pack.arg1, dtype=np.float64)
    arg2 = np.asarray(pack.arg2, dtype=np.float64)
    lo = np.where(is_gauss, arg1 - 5.0 * arg2, arg1)
    hi = np.where(is_gauss, arg1 + 5.0 * arg2, arg2)
    return np.stack([lo, hi], axis=1)


def save_priors(path: str, pack: PriorPack) -> None:
    """Serialize priors as JSON (no pickle anywhere in this framework)."""
    with open(path, "w") as f:
        json.dump(priors_to_list(pack), f)


def load_priors(path: str) -> PriorPack:
    with open(path) as f:
        return priors_from_list(json.load(f))
