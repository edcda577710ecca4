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

STATE_GROUP = "sampler_state"


class _SamplerStateMixin:
    """Exact-resume state persistence (VERDICT r2 item 5).

    The reference's emcee HDF5 backend stores the move RNG state each
    ``save_step`` so an interrupted chain continues identically
    (linna/sampler.py:346-368 via ``emcee.backends.HDFBackend``).  Here the
    sampler state is a flat NamedTuple of arrays (PRNG key, coords, per-walker
    epsilon, dual-averaging state, slice mu, ...) serialized into a
    ``sampler_state`` group rewritten after every chunk — a superset of the
    reference's contract that also covers the gradient samplers."""

    def save_state(self, blob: dict) -> None:
        with h5py.File(self.filename, "a") as f:
            g = f.require_group(STATE_GROUP)
            for k, v in blob.items():
                v = np.asarray(v)
                ds = g.get(k)
                if (
                    isinstance(ds, h5py.Dataset)
                    and ds.shape == v.shape
                    and ds.dtype == v.dtype
                ):
                    # overwrite in place: HDF5 never reclaims freed space,
                    # so del-group/recreate per chunk would grow the chain
                    # file by one dead state blob per chunk
                    ds[...] = v
                else:
                    if ds is not None:
                        del g[k]
                    g.create_dataset(k, data=v)
            for k in list(g.keys()):  # drop keys the new blob no longer has
                if k not in blob:
                    del g[k]

    def load_state(self) -> Optional[dict]:
        if not os.path.isfile(self.filename):
            return None
        with h5py.File(self.filename, "r") as f:
            if STATE_GROUP not in f:
                return None
            return {k: np.asarray(v) for k, v in f[STATE_GROUP].items()}


class EmceeBackend(_SamplerStateMixin):
    """Grow-on-write emcee-layout backend."""

    def __init__(self, filename: str, name: str = "mcmc"):
        self.filename = filename
        self.name = name

    @property
    def initialized(self) -> bool:
        """True only when the file holds at least one step: a freshly
        ``reset`` (empty) file is not a resumable chain — resuming from it
        would read step -1 — and on a shared filesystem another host may
        observe the file between reset and first append."""
        if not os.path.isfile(self.filename):
            return False
        with h5py.File(self.filename, "r") as f:
            return (
                self.name in f and int(f[self.name].attrs.get("iteration", 0)) > 0
            )

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
            # stock-emcee drop-in attrs (the reference's Transformbackend
            # inherits them from emcee.backends.HDFBackend): has_blobs gates
            # emcee's get_last_sample/get_blobs read path, version is the
            # layout contract the file follows (tests/test_h5_interop.py)
            g.attrs["has_blobs"] = False
            g.attrs["version"] = "3.0.2"
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
            # commit order: iteration attr BEFORE the acceptance counters.
            # The attr bounds every read, so a crash right after it leaves a
            # visible chunk whose acceptance delta is merely missing
            # (bounded undercount).  The reverse order double-counts: the
            # torn chunk is invisible, the resumed run re-appends it, and
            # its delta lands in the cumulative counters twice — forever.
            g.attrs["iteration"] = it + n
            g["accepted"][:] = g["accepted"][:] + accepted

    def get_chain(self, flat: bool = False, discard: int = 0, thin: int = 1) -> np.ndarray:
        v = self.get_value("chain", discard=discard, thin=thin)
        if flat:
            return v.reshape(-1, v.shape[-1])
        return v

    def get_value(self, name: str, flat: bool = False, discard: int = 0, thin: int = 1):
        # slice inside h5py so a windowed read (e.g. the sampler's lazy tau
        # hydration, run.py _hydrate) only touches the needed file chunks
        with h5py.File(self.filename, "r") as f:
            g = f[self.name]
            v = g[name][discard + thin - 1 : int(g.attrs["iteration"]) : thin]
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


class ZeusBackend(_SamplerStateMixin):
    """Append-only zeus-layout backend (root datasets, gzip)."""

    def __init__(self, filename: str):
        self.filename = filename

    @staticmethod
    def _committed(f) -> int:
        """Committed step count: the ``iteration`` root attr, written LAST
        in append so it bounds every read past a torn multi-dataset write
        (the same transactional trick EmceeBackend uses).  Files written
        before the attr existed fall back to the shortest dataset, counting
        a MISSING dataset as length 0: a kill during the first-ever append
        can persist ``samples`` without ``logprob``, and a min over only the
        present keys would commit the torn rows — the next append would then
        create ``logprob`` starting at the new offset, permanently
        misaligning chain and log-prob reads."""
        if "iteration" in f.attrs:
            return int(f.attrs["iteration"])
        return min(
            int(f[k].shape[0]) if k in f else 0
            for k in ("samples", "chain_transformed", "logprob")
        )

    @property
    def initialized(self) -> bool:
        if not os.path.isfile(self.filename):
            return False
        with h5py.File(self.filename, "r") as f:
            return "samples" in f and self._committed(f) > 0

    @property
    def iteration(self) -> int:
        with h5py.File(self.filename, "r") as f:
            return self._committed(f)

    def append(
        self,
        chain: np.ndarray,
        log_prob: np.ndarray,
        transform: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    ) -> None:
        transformed = transform(chain) if transform is not None else chain
        with h5py.File(self.filename, "a") as f:
            n0 = self._committed(f) if "samples" in f else 0
            for dsname, arr in (
                ("samples", chain),
                ("chain_transformed", transformed),
                ("logprob", log_prob),
            ):
                if dsname not in f:
                    f.create_dataset(
                        dsname,
                        data=arr,
                        compression="gzip",
                        chunks=True,
                        maxshape=(None,) + arr.shape[1:],
                    )
                    continue
                ds = f[dsname]
                # resize from the COMMITTED count: rows past it are a torn
                # previous append and are overwritten, not kept
                ds.resize(n0 + arr.shape[0], axis=0)
                ds[n0:] = arr
            f.attrs["iteration"] = n0 + chain.shape[0]

    def get_value(self, name: str, flat: bool = False, discard: int = 0, thin: int = 1):
        # slice inside h5py: a windowed read only inflates the needed gzip
        # chunks (run.py _hydrate reads just the trailing tau window)
        with h5py.File(self.filename, "r") as f:
            v = f[name][discard + thin - 1 : self._committed(f) : thin]
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
            return np.copy(f["samples"][self._committed(f) - 1])
