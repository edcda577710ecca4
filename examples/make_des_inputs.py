"""Generate data/cov inputs for the synthetic DES-shaped run
(examples/des_synthetic.yaml)."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from examples import des_theory as T

outdir = "/tmp/linna_des_inputs"
os.makedirs(outdir, exist_ok=True)
fid = T.fiducial()
truth = T.data_vector(fid + 0.05)  # "observed" universe slightly off-fiducial
# Noise level chosen so the 27-dim posterior is ~1-4% of the prior box per
# parameter (wide enough for the emulator to resolve, narrow enough to be a
# genuine inference test).  The data vector is NOISELESS so the true
# posterior centers exactly on the truth: any |mean-truth| in the recovered
# chain measures emulator-induced bias, not the noise realization's pull.
data = truth
np.savetxt(os.path.join(outdir, "data.txt"),
           np.stack([np.arange(T.NDATA), data], 1))
# banded covariance with short-range correlations (triplet format) — the
# shared flagship recipe (des_theory.noise_sigma/cov_triplet_rows)
np.savetxt(os.path.join(outdir, "cov_triplet.txt"),
           T.cov_triplet_rows(T.noise_sigma(truth)))
print("wrote", outdir)
