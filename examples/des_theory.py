"""Synthetic DES-Y1-3x2pt-shaped theory plugin: 27 parameters -> 457-point
data vector.

Stands in for the external cosmolike C library (reference
cosmolike_run.py:27) with the same interface scale and smoothness
characteristics: the vector is a set of power-law-like "angular" templates
whose amplitudes/tilts respond nonlinearly to the parameters, so the
emulator has to learn genuine parameter->data-vector structure.

Used by examples/des_synthetic.yaml via ``theory: examples.des_theory:make_theory``.
"""

from __future__ import annotations

import numpy as np

NDIM = 27
NDATA = 457
# The template count sets the rank of the parameter->data-vector map:
# it must exceed NDIM or the map is rank-deficient and the true posterior
# has exactly flat directions (a 12-template version left a 15-dim
# degenerate manifold — unconvergeable R-hat by construction).  40 smooth
# templates with dense random couplings give a full-rank-27, reasonably
# conditioned Fisher matrix (checked in tests/test_driver.py).
N_TEMPLATES = 40


def _bases(seed: int = 2026):
    rng = np.random.default_rng(seed)
    t = np.linspace(0.0, 1.0, NDATA)
    # smooth log-spaced templates (power laws + oscillatory pieces)
    slopes = rng.uniform(-1.5, 1.5, N_TEMPLATES)
    phases = rng.uniform(0, 2 * np.pi, N_TEMPLATES)
    freqs = rng.uniform(1.0, 25.0, N_TEMPLATES)
    raw = np.stack(
        [
            (1.0 + t) ** slopes[k] * (1.0 + 0.3 * np.sin(freqs[k] * np.pi * t + phases[k]))
            for k in range(N_TEMPLATES)
        ]
    )  # (K, NDATA)
    # Smooth curves are numerically collinear (effective rank ~15 even for
    # K=40), which would leave the parameter->data map rank-deficient and
    # the posterior exactly degenerate.  Orthonormalize the span (rows of Q
    # are smooth linear combinations of the raw curves) and rescale each
    # row to per-point RMS 1 so the data vector keeps O(1) entries.
    q, _ = np.linalg.qr(raw.T)  # (NDATA, K), orthonormal columns
    templates = q.T * np.sqrt(NDATA)
    # parameter coupling matrices
    lin = rng.standard_normal((N_TEMPLATES, NDIM)) * 0.5
    quad = rng.standard_normal((N_TEMPLATES, NDIM)) * 0.15
    return templates, lin, quad


_TEMPLATES, _LIN, _QUAD = _bases()


def data_vector(x: np.ndarray) -> np.ndarray:
    """Deterministic smooth nonlinear map R^27 -> R^457."""
    x = np.asarray(x, dtype=np.float64)
    amps = _LIN @ x + _QUAD @ (x * x) + 0.2 * np.tanh(3.0 * (_LIN @ x))
    return amps @ _TEMPLATES / np.sqrt(N_TEMPLATES)


def data_vector_jax(x):
    """``data_vector`` as a differentiable jax computation (batched rows OK).

    The single source of truth for the flagship theory math in jax-land
    (exact-posterior sampling needs gradients): any change to
    :func:`data_vector` must be mirrored here — pinned by the parity test in
    tests/test_driver.py.  Computes in ``x``'s dtype (f32 on default jax)."""
    import jax.numpy as jnp

    x = jnp.asarray(x)
    lin = jnp.asarray(_LIN, x.dtype)
    quad = jnp.asarray(_QUAD, x.dtype)
    templates = jnp.asarray(_TEMPLATES, x.dtype)
    u = x @ lin.T
    amps = u + (x * x) @ quad.T + 0.2 * jnp.tanh(3.0 * u)
    return (amps @ templates) / np.sqrt(N_TEMPLATES).astype(x.dtype)


def noise_sigma(truth_vec: np.ndarray) -> np.ndarray:
    """The flagship noise level: ~1-4% posterior width per parameter
    (examples/make_des_inputs.py rationale)."""
    return 1.0 * (np.abs(np.asarray(truth_vec)) + 0.1)


def cov_triplet_rows(sigma: np.ndarray) -> np.ndarray:
    """The flagship covariance: banded (diagonal + 0.25 nearest-neighbor
    correlation) in the driver's triplet format.  Shared by
    make_des_inputs.py, bench_full.py and bench_exact_posterior.py — the
    emulator-bias decomposition is only valid while all three use the SAME
    posterior, so the recipe lives here once."""
    sigma = np.asarray(sigma, dtype=np.float64)
    rows = []
    for i in range(len(sigma)):
        rows.append([i, i, 0.0, sigma[i] ** 2])
        if i + 1 < len(sigma):
            rows.append([i, i + 1, 0.0, 0.25 * sigma[i] * sigma[i + 1]])
    return np.asarray(rows)


class _Theory:
    """Module-level callable: the pool layer pickles theory callables to ship
    them to multiprocess/MPI workers (a nested closure is unpicklable and
    would crash the fan-out)."""

    def __call__(self, x, outdirs):
        return data_vector(x[1])


def make_theory(params: dict):
    return _Theory()


def fiducial() -> np.ndarray:
    return np.zeros(NDIM)
