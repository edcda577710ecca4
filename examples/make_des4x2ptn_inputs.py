"""Generate data/cov inputs for the synthetic DES-4x2pt+N-scale run
(examples/des4x2ptn_synthetic.yaml).  Same recipe as make_des_inputs.py: a
noiseless data vector at truth = fiducial + 0.05 so any |mean-truth| in the
recovered chain measures emulator-induced bias plus the posterior's own
nonlinear skew, not a noise realization's pull."""

import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from examples import des4x2ptn_theory as T

outdir = "/tmp/linna_des4x2ptn_inputs"
os.makedirs(outdir, exist_ok=True)
truth = T.data_vector(T.fiducial() + 0.05)
np.savetxt(os.path.join(outdir, "data.txt"),
           np.stack([np.arange(T.NDATA), truth], 1))
np.savetxt(os.path.join(outdir, "cov_triplet.txt"),
           T.cov_triplet_rows(T.noise_sigma(truth)))
print("wrote", outdir)
