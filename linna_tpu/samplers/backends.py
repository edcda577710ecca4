"""Incremental HDF5 chain backends, layout-compatible with the reference.

Two layouts are produced so existing analysis tooling keeps working:

- Emcee-style (reference ``Transformbackend``, linna/sampler.py:322-368):
  file ``chemcee_256.h5`` with group ``mcmc`` holding ``chain`` (it, W, D),
  ``chain_transformed`` (physical-space chain), ``log_prob`` (it, W),
  ``accepted`` (W,) and an ``iteration`` attribute.

- Zeus-style (reference ``ZeusTransformCallback``, linna/sampler.py:556-603):
  file ``zeus_256.h5`` with root datasets ``samples``, ``chain_transformed``,
  ``logprob`` appended every ``ncheck`` steps, gzip-compressed.

Both support resume via ``get_last_sample`` (linna/sampler.py:483-487,
600-603,721-725).
"""

from __future__ import annotations

import os
from typing import Callable, Optional

import h5py
import numpy as np

__all__ = ["EmceeBackend", "ZeusBackend"]


class EmceeBackend:
    """Grow-on-write emcee-layout backend."""

    def __init__(self, filename: str, name: str = "mcmc"):
        self.filename = filename
        self.name = name

    @property
    def initialized(self) -> bool:
        if not os.path.isfile(self.filename):
            return False
        with h5py.File(self.filename, "r") as f:
            return self.name in f

    @property
    def iteration(self) -> int:
        with h5py.File(self.filename, "r") as f:
            return int(f[self.name].attrs["iteration"])

    def reset(self, nwalkers: int, ndim: int) -> None:
        with h5py.File(self.filename, "a") as f:
            if self.name in f:
                del f[self.name]
            g = f.create_group(self.name)
            g.attrs["nwalkers"] = nwalkers
            g.attrs["ndim"] = ndim
            g.attrs["iteration"] = 0
            for dsname, shape in (
                ("chain", (0, nwalkers, ndim)),
                ("chain_transformed", (0, nwalkers, ndim)),
                ("log_prob", (0, nwalkers)),
            ):
                g.create_dataset(
                    dsname, shape, maxshape=(None,) + shape[1:], dtype=np.float64
                )
            g.create_dataset("accepted", data=np.zeros(nwalkers))

    def append(
        self,
        chain: np.ndarray,
        log_prob: np.ndarray,
        accepted: np.ndarray,
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ) -> None:
        """Append a chunk: chain (n, W, D), log_prob (n, W), accepted (W,)
        cumulative-delta acceptance counts."""
        n = chain.shape[0]
        transformed = transform(chain) if transform is not None else chain
        with h5py.File(self.filename, "a") as f:
            g = f[self.name]
            it = int(g.attrs["iteration"])
            for dsname, arr in (
                ("chain", chain),
                ("chain_transformed", transformed),
                ("log_prob", log_prob),
            ):
                g[dsname].resize(it + n, axis=0)
                g[dsname][it : it + n] = arr
            g["accepted"][:] = g["accepted"][:] + accepted
            g.attrs["iteration"] = it + n

    def get_chain(self, flat: bool = False, discard: int = 0, thin: int = 1) -> np.ndarray:
        with h5py.File(self.filename, "r") as f:
            g = f[self.name]
            v = g["chain"][: int(g.attrs["iteration"])]
        v = v[discard + thin - 1 : len(v) : thin]
        if flat:
            return v.reshape(-1, v.shape[-1])
        return v

    def get_value(self, name: str, flat: bool = False, discard: int = 0, thin: int = 1):
        with h5py.File(self.filename, "r") as f:
            g = f[self.name]
            v = g[name][: int(g.attrs["iteration"])]
        v = v[discard + thin - 1 : len(v) : thin]
        if flat:
            s = (-1,) + v.shape[2:]
            return v.reshape(s)
        return v

    def get_log_prob(self, **kwargs) -> np.ndarray:
        return self.get_value("log_prob", **kwargs)

    def get_last_sample(self) -> np.ndarray:
        with h5py.File(self.filename, "r") as f:
            g = f[self.name]
            it = int(g.attrs["iteration"])
            return g["chain"][it - 1]

    def get_last_log_prob(self) -> np.ndarray:
        with h5py.File(self.filename, "r") as f:
            g = f[self.name]
            it = int(g.attrs["iteration"])
            return g["log_prob"][it - 1]


class ZeusBackend:
    """Append-only zeus-layout backend (root datasets, gzip)."""

    def __init__(self, filename: str):
        self.filename = filename

    @property
    def initialized(self) -> bool:
        return os.path.isfile(self.filename)

    @property
    def iteration(self) -> int:
        with h5py.File(self.filename, "r") as f:
            return int(f["samples"].shape[0])

    def append(
        self,
        chain: np.ndarray,
        log_prob: np.ndarray,
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ) -> None:
        transformed = transform(chain) if transform is not None else chain
        if not self.initialized:
            with h5py.File(self.filename, "w") as f:
                for dsname, arr in (
                    ("samples", chain),
                    ("chain_transformed", transformed),
                    ("logprob", log_prob),
                ):
                    f.create_dataset(
                        dsname,
                        data=arr,
                        compression="gzip",
                        chunks=True,
                        maxshape=(None,) + arr.shape[1:],
                    )
            return
        with h5py.File(self.filename, "a") as f:
            for dsname, arr in (
                ("samples", chain),
                ("chain_transformed", transformed),
                ("logprob", log_prob),
            ):
                ds = f[dsname]
                n0 = ds.shape[0]
                ds.resize(n0 + arr.shape[0], axis=0)
                ds[n0:] = arr

    def get_value(self, name: str, flat: bool = False, discard: int = 0, thin: int = 1):
        with h5py.File(self.filename, "r") as f:
            v = np.copy(f[name])
        v = v[discard + thin - 1 : len(v) : thin]
        if flat:
            s = (-1,) + v.shape[2:]
            return v.reshape(s)
        return v

    def get_chain(self, **kwargs) -> np.ndarray:
        return self.get_value("samples", **kwargs)

    def get_log_prob(self, **kwargs) -> np.ndarray:
        return self.get_value("logprob", **kwargs)

    def get_last_sample(self) -> np.ndarray:
        with h5py.File(self.filename, "r") as f:
            return np.copy(f["samples"][-1])
