"""Priors/whitening parity tests against the reference formulas
(linna/util.py:291-381, 1160-1165)."""

import numpy as np
import numpy.testing as npt
import pytest
from scipy.special import erf, erfinv

import jax.numpy as jnp

from linna_tpu import priors as P


@pytest.fixture
def mixed_pack():
    plist = [
        {"dist": "flat", "arg1": -2.0, "arg2": 2.0},
        {"dist": "gauss", "arg1": 0.5, "arg2": 0.1},
        {"dist": "flat", "arg1": 0.0, "arg2": 10.0},
    ]
    return P.priors_from_list(plist), plist


def _ref_transform(plist, x):
    """Reference Transform semantics, numpy float64."""
    out = np.empty_like(x, dtype=np.float64)
    for i, p in enumerate(plist):
        if p["dist"] == "gauss":
            out[..., i] = x[..., i] * p["arg2"] + p["arg1"]
        else:
            u = 0.5 * (1 + erf(x[..., i] / np.sqrt(2)))
            out[..., i] = u * (p["arg2"] - p["arg1"]) + p["arg1"]
    return out


def test_transform_matches_reference_formula(mixed_pack):
    pack, plist = mixed_pack
    rng = np.random.default_rng(0)
    x = rng.normal(size=(50, 3)).astype(np.float32)
    got = np.asarray(P.transform(pack, jnp.asarray(x)))
    want = _ref_transform(plist, x)
    npt.assert_allclose(got, want, rtol=2e-5, atol=2e-6)


def test_transform_inverse_roundtrip(mixed_pack):
    pack, _ = mixed_pack
    rng = np.random.default_rng(1)
    x = rng.normal(size=(100, 3)).astype(np.float32) * 1.5
    phys = P.transform(pack, jnp.asarray(x))
    back = P.inv_transform(pack, phys)
    npt.assert_allclose(np.asarray(back), x, rtol=1e-3, atol=2e-3)


def test_inv_transform_matches_reference_formula(mixed_pack):
    pack, plist = mixed_pack
    rng = np.random.default_rng(2)
    # physical points inside each prior's support
    phys = np.stack(
        [
            rng.uniform(-1.9, 1.9, 40),
            rng.normal(0.5, 0.1, 40),
            rng.uniform(0.5, 9.5, 40),
        ],
        axis=1,
    ).astype(np.float32)
    got = np.asarray(P.inv_transform(pack, jnp.asarray(phys)))
    want = np.empty_like(phys, dtype=np.float64)
    for i, p in enumerate(plist):
        if p["dist"] == "gauss":
            want[:, i] = (phys[:, i] - p["arg1"]) / p["arg2"]
        else:
            u = (phys[:, i] - p["arg1"]) / (p["arg2"] - p["arg1"])
            want[:, i] = np.sqrt(2) * erfinv(2 * u - 1)
    npt.assert_allclose(got, want, rtol=1e-3, atol=1e-3)


def test_lnprior_is_unit_normal():
    x = np.array([[0.0, 0.0], [1.0, 2.0]], dtype=np.float32)
    got = np.asarray(P.lnprior(jnp.asarray(x)))
    npt.assert_allclose(got, [0.0, -2.5], atol=1e-6)


def test_log_prior_physical(mixed_pack):
    pack, _ = mixed_pack
    inside = jnp.asarray([0.0, 0.5, 5.0])
    outside = jnp.asarray([3.0, 0.5, 5.0])  # param 0 outside flat box
    assert np.isfinite(float(P.log_prior_physical(pack, inside)))
    assert float(P.log_prior_physical(pack, outside)) == -np.inf
    # gaussian contribution
    shifted = jnp.asarray([0.0, 0.6, 5.0])
    npt.assert_allclose(
        float(P.log_prior_physical(pack, shifted)),
        -0.5 * ((0.6 - 0.5) / 0.1) ** 2,
        rtol=1e-4,
    )


def test_prior_range(mixed_pack):
    pack, _ = mixed_pack
    pr = P.prior_range(pack)
    npt.assert_allclose(pr[0], [-2.0, 2.0])
    npt.assert_allclose(pr[1], [0.5 - 0.5, 0.5 + 0.5], atol=1e-7)
    npt.assert_allclose(pr[2], [0.0, 10.0])


def test_priors_json_roundtrip(tmp_path, mixed_pack):
    pack, plist = mixed_pack
    path = str(tmp_path / "priors.json")
    P.save_priors(path, pack)
    loaded = P.load_priors(path)
    npt.assert_array_equal(np.asarray(loaded.is_gauss), np.asarray(pack.is_gauss))
    npt.assert_allclose(np.asarray(loaded.arg1), np.asarray(pack.arg1))
