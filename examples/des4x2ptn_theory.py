"""Synthetic DES-4x2pt+N-scale theory plugin: 31 parameters -> 630-point
data vector.

The middle analysis class the reference validates (reference
README.rst:23-27: "DES 4x2pt+N" — 3x2pt plus cluster lensing and cluster
counts, which adds ~40% data points and the cluster mass-observable
parameters).  Same synthetic construction as examples/des_theory.py,
instantiated between the DES-3x2pt (27/457) and LSST (40/1560) shapes.

Used by examples/des4x2ptn_synthetic.yaml via
``theory: examples.des4x2ptn_theory:make_theory``.
"""

from __future__ import annotations

from examples.des_theory import SyntheticSurveyTheory

NDIM = 31
NDATA = 630
N_TEMPLATES = 48

_T = SyntheticSurveyTheory(NDIM, NDATA, N_TEMPLATES, seed=2028)

data_vector = _T.data_vector
data_vector_jax = _T.data_vector_jax
noise_sigma = _T.noise_sigma
cov_triplet_rows = _T.cov_triplet_rows
fiducial = _T.fiducial


def make_theory(params: dict):
    return _T
