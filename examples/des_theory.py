"""Synthetic survey-analysis theory plugins: DES-Y1-3x2pt-shaped by default
(27 parameters -> 457-point data vector), parametrizable to the other
analysis classes the reference validates (reference README.rst:23-27: DES
3x2pt, 4x2pt+N, LSST-Y10 6x2pt+N) — see examples/lsst_theory.py for the
LSST-scale instantiation.

Stands in for the external cosmolike C library (reference
cosmolike_run.py:27) with the same interface scale and smoothness
characteristics: the vector is a set of power-law-like "angular" templates
whose amplitudes/tilts respond nonlinearly to the parameters, so the
emulator has to learn genuine parameter->data-vector structure.

Used by examples/des_synthetic.yaml via ``theory: examples.des_theory:make_theory``.
"""

from __future__ import annotations

import numpy as np


class SyntheticSurveyTheory:
    """A deterministic smooth nonlinear map R^ndim -> R^ndata built from
    orthonormalized power-law/oscillatory templates with dense random
    parameter couplings.

    The template count sets the rank of the parameter->data-vector map: it
    must exceed ``ndim`` or the map is rank-deficient and the true posterior
    has exactly flat directions (a 12-template version left a 15-dim
    degenerate manifold — unconvergeable R-hat by construction).  Dense
    couplings over >ndim templates give a full-rank, reasonably conditioned
    Fisher matrix (checked in tests/test_driver.py).

    Instances are picklable (plain ndarray attributes), so they can serve
    directly as the pool-layer theory callable shipped to multiprocess/MPI
    workers (a nested closure would crash the fan-out).

    The RNG draw order below is frozen: the DES flagship artifacts
    (EXACT_POSTERIOR.json, FLAGSHIP_*.json) are only comparable across runs
    while seed=2026 reproduces the exact templates/couplings this file has
    always produced.
    """

    def __init__(self, ndim: int, ndata: int, n_templates: int, seed: int):
        self.ndim = ndim
        self.ndata = ndata
        self.n_templates = n_templates
        rng = np.random.default_rng(seed)
        t = np.linspace(0.0, 1.0, ndata)
        # smooth log-spaced templates (power laws + oscillatory pieces)
        slopes = rng.uniform(-1.5, 1.5, n_templates)
        phases = rng.uniform(0, 2 * np.pi, n_templates)
        freqs = rng.uniform(1.0, 25.0, n_templates)
        raw = np.stack(
            [
                (1.0 + t) ** slopes[k]
                * (1.0 + 0.3 * np.sin(freqs[k] * np.pi * t + phases[k]))
                for k in range(n_templates)
            ]
        )  # (K, ndata)
        # Smooth curves are numerically collinear (effective rank ~15 even
        # for K=40), which would leave the parameter->data map rank-deficient
        # and the posterior exactly degenerate.  Orthonormalize the span
        # (rows of Q are smooth linear combinations of the raw curves) and
        # rescale each row to per-point RMS 1 so the data vector keeps O(1)
        # entries.
        q, _ = np.linalg.qr(raw.T)  # (ndata, K), orthonormal columns
        self.templates = q.T * np.sqrt(ndata)
        # parameter coupling matrices
        self.lin = rng.standard_normal((n_templates, ndim)) * 0.5
        self.quad = rng.standard_normal((n_templates, ndim)) * 0.15

    def data_vector(self, x: np.ndarray) -> np.ndarray:
        """Deterministic smooth nonlinear map R^ndim -> R^ndata."""
        x = np.asarray(x, dtype=np.float64)
        u = self.lin @ x
        amps = u + self.quad @ (x * x) + 0.2 * np.tanh(3.0 * u)
        return amps @ self.templates / np.sqrt(self.n_templates)

    def data_vector_jax(self, x):
        """``data_vector`` as a differentiable jax computation (batched rows
        OK).

        The single source of truth for the flagship theory math in jax-land
        (exact-posterior sampling needs gradients): any change to
        :meth:`data_vector` must be mirrored here — pinned by the parity
        test in tests/test_driver.py.  Computes in ``x``'s dtype (f32 on
        default jax)."""
        import jax.numpy as jnp

        x = jnp.asarray(x)
        lin = jnp.asarray(self.lin, x.dtype)
        quad = jnp.asarray(self.quad, x.dtype)
        templates = jnp.asarray(self.templates, x.dtype)
        u = x @ lin.T
        amps = u + (x * x) @ quad.T + 0.2 * jnp.tanh(3.0 * u)
        return (amps @ templates) / np.sqrt(self.n_templates).astype(x.dtype)

    def noise_sigma(self, truth_vec: np.ndarray) -> np.ndarray:
        """The flagship noise level: ~1-4% posterior width per parameter
        (examples/make_des_inputs.py rationale)."""
        return 1.0 * (np.abs(np.asarray(truth_vec)) + 0.1)

    def cov_triplet_rows(self, sigma: np.ndarray) -> np.ndarray:
        """The flagship covariance: banded (diagonal + 0.25 nearest-neighbor
        correlation) in the driver's triplet format.  Shared by
        make_des_inputs.py, bench_full.py and bench_exact_posterior.py — the
        emulator-bias decomposition is only valid while all three use the
        SAME posterior, so the recipe lives here once."""
        sigma = np.asarray(sigma, dtype=np.float64)
        rows = []
        for i in range(len(sigma)):
            rows.append([i, i, 0.0, sigma[i] ** 2])
            if i + 1 < len(sigma):
                rows.append([i, i + 1, 0.0, 0.25 * sigma[i] * sigma[i + 1]])
        return np.asarray(rows)

    def fiducial(self) -> np.ndarray:
        return np.zeros(self.ndim)

    def __call__(self, x, outdirs):
        """Pool-layer theory callable: evaluates the data vector at the
        sampled point (``x`` is the reference's ``[index, params]`` pair,
        reference util.py:768)."""
        return self.data_vector(x[1])


# ---------------------------------------------------------------------------
# The DES-Y1-3x2pt-scale default instance, exposed through the original
# module-level API (tests, bench_full.py and bench_exact_posterior.py use
# these names; seed 2026 reproduces the historical templates exactly).

NDIM = 27
NDATA = 457
N_TEMPLATES = 40

_DES = SyntheticSurveyTheory(NDIM, NDATA, N_TEMPLATES, seed=2026)

_TEMPLATES, _LIN, _QUAD = _DES.templates, _DES.lin, _DES.quad


def data_vector(x: np.ndarray) -> np.ndarray:
    return _DES.data_vector(x)


def data_vector_jax(x):
    return _DES.data_vector_jax(x)


def noise_sigma(truth_vec: np.ndarray) -> np.ndarray:
    return _DES.noise_sigma(truth_vec)


def cov_triplet_rows(sigma: np.ndarray) -> np.ndarray:
    return _DES.cov_triplet_rows(sigma)


def fiducial() -> np.ndarray:
    return _DES.fiducial()


class _Theory:
    """Module-level callable kept for pickle-compatibility with artifacts
    that recorded ``examples.des_theory._Theory`` as the theory class."""

    def __call__(self, x, outdirs):
        return data_vector(x[1])


def make_theory(params: dict):
    return _Theory()
