"""Synthetic LSST-Y10-6x2pt+N-scale theory plugin: 40 parameters -> 1560-point
data vector.

The largest analysis class the reference validates (reference
README.rst:23-27: "LSST-Y10 6x2pt+N") — a 6-probe data vector roughly 3.4x
the DES-Y1 3x2pt size with ~1.5x the sampled parameters.  Same synthetic
construction as examples/des_theory.py (orthonormalized smooth templates,
dense nonlinear couplings, full-rank Fisher), instantiated at LSST scale so
the pipeline, emulator width rule (out>30 caps the trunk at 1000,
linna_tpu/nn.py) and sampler all run at the bigger shape.

Used by examples/lsst_synthetic.yaml via
``theory: examples.lsst_theory:make_theory``.
"""

from __future__ import annotations

from examples.des_theory import SyntheticSurveyTheory

NDIM = 40
NDATA = 1560
# >ndim templates keep the parameter->data map full-rank (des_theory
# rationale); 64 gives a 1.6x margin (DES uses 40/27 = 1.5x).
N_TEMPLATES = 64

_LSST = SyntheticSurveyTheory(NDIM, NDATA, N_TEMPLATES, seed=2027)

data_vector = _LSST.data_vector
data_vector_jax = _LSST.data_vector_jax
noise_sigma = _LSST.noise_sigma
cov_triplet_rows = _LSST.cov_triplet_rows
fiducial = _LSST.fiducial


def make_theory(params: dict):
    # the instance itself is the pool-safe callable (picklable ndarrays)
    return _LSST
