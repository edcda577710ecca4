"""Application driver: YAML-configured LINNA runs from the command line.

TPU-native rebuild of the reference's cosmology driver
(reference linna/cosmolike_run.py, 343 LoC).  The reference hard-wires the
external cosmolike C library from user-specific paths
(cosmolike_run.py:5-8,27); here the theory model is a *plugin*: the config
names a ``theory`` entry point (``package.module:factory``) whose factory
receives the config dict and returns the theory callable
``theory([index, x], outdir) -> data vector``.  Everything else matches the
reference driver's behavior:

- CLI ``python -m linna_tpu.driver <method> <gpunode> <yaml> <yamldir>``
  (cosmolike_run.py:168-177; ``gpunode`` accepted for compatibility —
  training runs in process on the accelerator);
- YAML config with ``include:`` merging (:mod:`linna_tpu.config`);
- triplet-file covariance read + symmetrization, |C|>1e10 zeroing
  (``readcov``, cosmolike_run.py:258-266);
- mask loading and mask/cov size alignment (cosmolike_run.py:288-297);
- prior + init construction from the config's parameter blocks
  (``get_prior_dic_init``, cosmolike_run.py:56-104, reimplemented over a
  self-contained schema);
- external likelihood terms summed into the posterior
  (``Externalloglike``, cosmolike_run.py:50-55);
- MPI worker lifecycle: non-master ranks wait on the pool then exit
  (cosmolike_run.py:299-308);
- wall-clock saved to ``time.npy`` (cosmolike_run.py:321-323).
"""

from __future__ import annotations

import importlib
import os
import sys
import time
from copy import deepcopy
from typing import Callable, Optional, Sequence

import numpy as np

from .config import yaml_load
from .orchestrator import ml_sampler_core

__all__ = [
    "ExternalLogLike",
    "ModelFunc",
    "read_triplet_cov",
    "align_mask",
    "priors_and_init_from_config",
    "resolve_theory",
    "run_from_config",
    "main",
]


class ExternalLogLike:
    """Sum of extra likelihood terms evaluated in physical space
    (reference cosmolike_run.py:50-55)."""

    def __init__(self, like_arr: Sequence[Callable]):
        self.like_arr = list(like_arr)

    def __call__(self, x):
        total = 0.0
        for like in self.like_arr:
            total = total + like(x)
        return total


class ModelFunc:
    """Theory wrapper with file-gated caching and masking
    (reference ``Model_func``, cosmolike_run.py:107-130): each evaluation
    writes ``data_<i>`` into the scratch dir, skips if it exists, masks the
    result, and returns zeros on failure (fault tolerance — the loss masks
    sentinel rows)."""

    def __init__(self, datavector_writer: Callable, mask: np.ndarray):
        self.datavector_writer = datavector_writer
        self.mask = np.asarray(mask, dtype=bool)

    def __call__(self, x, outdirs):
        index, params = x[0], x[1]
        data_file = os.path.join(outdirs, f"data_{index}")
        if os.path.isfile(data_file):
            return np.loadtxt(data_file)[self.mask, 1]
        try:
            self.datavector_writer(params, data_file)
            data = np.loadtxt(data_file)
            mask = self.mask
            if len(mask) > len(data):
                mask = mask[: len(data)]
            data = data[mask, 1]
        except Exception:
            data = np.zeros(int(np.sum(self.mask)))
        if len(data) == 0:
            data = np.zeros(int(np.sum(self.mask)))
        return data


class CompressedModel:
    """Apply the driver's linear data compression to theory outputs.

    When ``transform_matrix_file`` compresses the data vector and covariance
    (data <- T data, cov <- T cov T^T), every model evaluation must be
    compressed identically — the emulator trains on, and the likelihood
    compares, vectors in the compressed space (the reference's Y-statistics
    analyses emit already-compressed model vectors while cosmolike_run.py:
    268-282 compresses data/cov).  A class, not a closure: theory callables
    must pickle for the multiprocess/MPI pools."""

    def __init__(self, fn: Callable, t: np.ndarray):
        self.fn = fn
        self.t = np.asarray(t, dtype=np.float64)

    def __call__(self, x, outdirs):
        return self.t @ np.asarray(self.fn(x, outdirs), dtype=np.float64)


def read_triplet_cov(covin: np.ndarray) -> np.ndarray:
    """(i, j, ..., gauss, non-gauss) triplet rows -> dense symmetric
    covariance; |C| > 1e10 entries zeroed (reference
    cosmolike_run.py:258-266)."""
    covin = np.atleast_2d(np.asarray(covin, dtype=np.float64))
    n = int(np.max(covin[:, 0])) + 1
    cov = np.zeros((n, n))
    ii = covin[:, 0].astype(int)
    jj = covin[:, 1].astype(int)
    vv = covin[:, -2] + covin[:, -1]
    cov[ii, jj] = vv
    cov[jj, ii] = vv
    cov[np.abs(cov) > 1e10] = 0
    return cov


def align_mask(mask: np.ndarray, n: int) -> np.ndarray:
    """Pad/truncate a boolean mask to length ``n``
    (reference cosmolike_run.py:288-297)."""
    mask = np.asarray(mask, dtype=bool)
    if len(mask) > n:
        return mask[:n]
    if len(mask) < n:
        out = np.zeros(n, dtype=bool)
        out[: len(mask)] = mask
        return out
    return mask


def priors_and_init_from_config(params: dict):
    """Build (priors, init) from the config's ``sampled_params`` list.

    Schema (self-contained analogue of the reference's cosmolike prior
    parsing, cosmolike_run.py:56-104): each entry is
    ``{param, dist: flat|gauss, arg1, arg2, fid?}``; a gauss prior's init is
    its mean (arg1), a flat prior's init is ``fid`` or the interval center.
    """
    entries = params.get("sampled_params")
    if not entries:
        raise KeyError("config needs a 'sampled_params' list")
    priors, init = [], []
    for e in entries:
        dist = e.get("dist", "flat")
        priors.append(
            {
                "param": e.get("param", f"p{len(priors)}"),
                "dist": dist,
                "arg1": float(e["arg1"]),
                "arg2": float(e["arg2"]),
            }
        )
        if "fid" in e:
            init.append(float(e["fid"]))
        elif dist == "gauss":
            init.append(float(e["arg1"]))
        else:
            init.append(0.5 * (float(e["arg1"]) + float(e["arg2"])))
    return priors, np.asarray(init)


def resolve_theory(params: dict) -> Callable:
    """Resolve the theory plugin.

    ``theory: "pkg.module:factory"`` — imported; the factory is called with
    the config dict and must return ``theory(x, outdir)``.
    ``theory: "identity"`` — built-in test theory returning the parameters
    themselves (the reference tests' canonical stand-in,
    reference tests/test_main.py:22-24).
    """
    spec = params.get("theory")
    if spec is None:
        raise KeyError("config needs a 'theory' entry point")
    if spec == "identity":
        return lambda x, outdirs: deepcopy(np.asarray(x[1], dtype=np.float64))
    mod_name, _, attr = spec.partition(":")
    if not attr:
        raise ValueError(f"theory {spec!r} must be 'module:factory'")
    factory = getattr(importlib.import_module(mod_name), attr)
    return factory(params)


def _load_data_cov(params: dict):
    base = params.get("base_dir", "")
    cov_path = os.path.join(base, params["cov_file"])
    cov_raw = np.loadtxt(cov_path)
    if cov_raw.ndim == 2 and cov_raw.shape[0] == cov_raw.shape[1] and (
        params.get("cov_format", "triplet") == "dense"
    ):
        cov = np.asarray(cov_raw, dtype=np.float64)
    else:
        cov = read_triplet_cov(cov_raw)
    data = np.loadtxt(os.path.join(base, params["data_file"]))
    if data.ndim == 2:  # (index, value) rows as in cosmolike outputs
        data = data[:, 1]
    if "mask_file" in params:
        mask = np.loadtxt(os.path.join(base, params["mask_file"]))
        if mask.ndim == 2:
            mask = mask[:, 1]
        mask = mask > 0
    else:
        mask = np.ones(len(cov), dtype=bool)
    mask = align_mask(mask, len(cov))
    cov = cov[mask][:, mask]
    if len(data) == len(mask):
        data = data[mask]  # full-length vector: mask applied here
    elif len(data) != len(cov):
        # neither the full nor the already-masked length — a silent
        # truncation here would misalign data and covariance downstream
        raise ValueError(
            f"data vector has {len(data)} points; expected the full "
            f"{len(mask)} (masked here) or the pre-masked {len(cov)}"
        )
    # len(data) == len(cov) (and != len(mask)): pre-masked upstream, keep
    if "transform_matrix_file" in params:
        # Generic linear data-compression hook: data <- T data,
        # cov <- T cov T^T.  The reference applied a cosmolike-computed
        # Y-statistics T-matrix here (reference cosmolike_run.py:268-282,
        # ``T_Ytransform_full``); the matrix itself comes from the external
        # C library, so this driver takes any precomputed T from a file
        # (rows = compressed dimension, columns = masked data dimension).
        t = np.loadtxt(os.path.join(base, params["transform_matrix_file"]))
        t = np.atleast_2d(np.asarray(t, dtype=np.float64))
        if t.shape[1] != len(cov):
            raise ValueError(
                f"transform matrix has {t.shape[1]} columns for a "
                f"{len(cov)}-point masked data vector"
            )
        data = t @ data
        cov = t @ cov @ t.T
        return data, cov, mask, t
    return data, cov, mask, None


def run_from_config(
    params: dict,
    method: str = "zeus",
    pool=None,
    gpunode: Optional[str] = None,
    verbose: bool = False,
):
    """Run the full pipeline from a loaded config dict; returns
    (chain, log_prob)."""
    outdir = params["outdir"]
    os.makedirs(outdir, exist_ok=True)

    start = time.time()
    data, cov, mask, tmat = _load_data_cov(params)
    priors, init = priors_and_init_from_config(params)
    theory = resolve_theory(params)
    if params.get("mask_theory", False):
        theory = ModelFunc(theory, mask)
    if tmat is not None:
        # the compression must apply to the MODEL side too, or the emulator
        # would be trained on uncompressed vectors against a compressed
        # data/cov (the reference transformed both: cosmolike_run.py:268-282
        # compresses the data/cov while the Y-statistics theory emits
        # already-compressed model vectors)
        theory = CompressedModel(theory, tmat)

    external = None
    ext_spec = params.get("external_likelihoods")
    if ext_spec:
        likes = []
        for item in ext_spec:
            mod_name, _, attr = item.partition(":")
            factory = getattr(importlib.import_module(mod_name), attr)
            likes.append(factory(params))
        external = ExternalLogLike(likes)

    if pool is not None and not pool.is_master():
        pool.wait()
        sys.exit(0)

    chain, log_prob = ml_sampler_core(
        ntrainArr=params["ntrainArr"],
        nvalArr=params["nvalArr"],
        nkeepArr=params["nkeepArr"],
        ntimesArr=params["ntimesArr"],
        ntautolArr=params["ntautolArr"],
        meanshiftArr=params["meanshiftArr"],
        stdshiftArr=params["stdshiftArr"],
        outdir=outdir,
        theory=theory,
        priors=priors,
        data=data,
        cov=cov,
        init=init,
        pool=pool,
        nwalkers=int(params.get("nwalkers", 128)),
        dolog10index=params.get("dolog10index"),
        ypositive=bool(params.get("ypositive", False)),
        temperatureArr=params["temperatureArr"],
        omegab2cut=params.get("omegab2cut"),
        gpunode=gpunode,
        nnmodel_in=params.get("nnmodel", "chto_v2"),
        params=params,
        # methodArr in the YAML overrides the CLI method with a per-iteration
        # sampler list (e.g. zeus for the annealed iterations, nuts for the
        # final posterior)
        method=params.get("methodArr", method),
        externalloglike=external,
        seed=int(params.get("seed", 0)),
        verbose=verbose,
    )
    from .parallel import multihost as MH

    if MH.is_primary():
        np.save(os.path.join(outdir, "time.npy"), time.time() - start)
    return chain, log_prob


def main(argv: Optional[Sequence[str]] = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if len(argv) < 3:
        print(
            "usage: python -m linna_tpu.driver <method> <gpunode> <yaml> [yamldir]",
            file=sys.stderr,
        )
        return 2
    method, gpunode, yaml_path = argv[0], argv[1], argv[2]
    yaml_dir = argv[3] if len(argv) > 3 else None
    params = yaml_load(yaml_path, parent_dir=yaml_dir)

    pool = None
    if params.get("pool") == "mpi":
        from .pool import MPIPool

        pool = MPIPool()
    elif params.get("pool") == "multiprocess":
        from .pool import MultiprocessPool

        pool = MultiprocessPool(params.get("processes"))

    run_from_config(params, method=method, pool=pool, gpunode=gpunode)
    if pool is not None:
        pool.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
