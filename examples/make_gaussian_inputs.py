"""Generate the data/cov inputs for examples/gaussian_3d.yaml."""

import os

import numpy as np

outdir = "/tmp/linna_gaussian_3d_inputs"
os.makedirs(outdir, exist_ok=True)
means = np.array([0.3, -0.2, 0.5])
var = np.array([0.3, 0.5, 0.2])
np.savetxt(os.path.join(outdir, "data.txt"),
           np.stack([np.arange(3), means], axis=1))
rows = [[i, i, 0.0, var[i]] for i in range(3)]  # triplet: i j gauss nongauss
np.savetxt(os.path.join(outdir, "cov_triplet.txt"), np.asarray(rows))
print("wrote", outdir)
