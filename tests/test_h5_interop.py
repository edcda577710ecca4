"""Write-side HDF5 interchange: chains written by the rebuild must open in
the STOCK ecosystem readers the reference's users already have —
``emcee.backends.HDFBackend`` for ``chemcee_256.h5`` (the reference's
``Transformbackend`` is a subclass of it, linna/sampler.py:322-368) and a
zeus-style root-dataset reader for ``zeus_256.h5`` (reference
``Zeusbackend``, linna/sampler.py:605-630).

When the real ``emcee`` package is importable it is used directly; otherwise
the test runs a faithful inline implementation of emcee 3.x's documented
read semantics (group ``name``; attrs ``nwalkers``/``ndim``/``iteration``/
``has_blobs``/``version``; reads bounded by the ``iteration`` attr with
``[discard + thin - 1 : iteration : thin]`` slicing; ``get_last_sample``
requires ``has_blobs``) so the layout contract is pinned either way.
"""

import os

import h5py
import numpy as np
import numpy.testing as npt
import pytest

from linna_tpu.samplers import run as sampler_run

NDIM = 2
NWALKERS = 8


class _InlineEmceeReader:
    """emcee 3.x HDFBackend read semantics (see module docstring)."""

    def __init__(self, filename, name="mcmc"):
        self.filename = filename
        self.name = name

    @property
    def iteration(self):
        with h5py.File(self.filename, "r") as f:
            return int(f[self.name].attrs["iteration"])

    def get_value(self, name, flat=False, thin=1, discard=0):
        with h5py.File(self.filename, "r") as f:
            g = f[self.name]
            if g.attrs["iteration"] <= 0:
                raise AttributeError("no iterations saved")
            v = g[name][discard + thin - 1 : self.iteration : thin]
        if flat:
            s = list(v.shape[1:])
            s[0] = np.prod(v.shape[:2])
            return v.reshape(s)
        return v

    def get_chain(self, **kw):
        return self.get_value("chain", **kw)

    def get_log_prob(self, **kw):
        return self.get_value("log_prob", **kw)

    def get_last_sample(self):
        # emcee's accessor goes through has_blobs: a file missing that attr
        # KeyErrors inside stock emcee before any chain row is returned
        with h5py.File(self.filename, "r") as f:
            g = f[self.name]
            assert not bool(g.attrs["has_blobs"])
        it = self.iteration
        return self.get_chain(discard=it - 1)[0]


def _open_stock_emcee(filename):
    try:
        import emcee

        return emcee.backends.HDFBackend(filename, read_only=True)
    except ImportError:
        return _InlineEmceeReader(filename)


def _log_prob(x):
    return -0.5 * np.sum(np.asarray(x) ** 2, axis=-1) * 4.0


def _run(outdir, method, seed=0, **kw):
    rng = np.random.default_rng(seed)
    x0 = rng.standard_normal((NWALKERS, NDIM)).astype(np.float32)
    import jax.numpy as jnp

    return sampler_run.run_ensemble(
        lambda x: -0.5 * 4.0 * jnp.sum(x**2, axis=-1),
        x0,
        outdir,
        method=method,
        transform=lambda x: x * 2.0 + 1.0,
        convergence_check=False,
        max_iterations=kw.pop("max_iterations", 150),
        check_every=50,
        seed=seed,
        **kw,
    )


def test_emcee_file_opens_in_stock_reader(tmp_path):
    outdir = str(tmp_path)
    ours = _run(outdir, "emcee")
    path = os.path.join(outdir, sampler_run.EMCEE_FILENAME)
    stock = _open_stock_emcee(path)

    assert stock.iteration == ours.iteration == 150
    chain = stock.get_chain()
    assert chain.shape == (150, NWALKERS, NDIM)
    npt.assert_array_equal(chain, ours.get_chain())
    npt.assert_array_equal(stock.get_log_prob(), ours.get_log_prob())
    npt.assert_array_equal(stock.get_chain(flat=True), ours.get_chain(flat=True))
    npt.assert_array_equal(
        stock.get_chain(discard=100, thin=2), ours.get_chain(discard=100, thin=2)
    )
    last = np.asarray(stock.get_last_sample())
    npt.assert_array_equal(last, ours.get_last_sample())
    # the reference layout's extra physical-space dataset + attrs
    with h5py.File(path, "r") as f:
        g = f["mcmc"]
        assert g.attrs["nwalkers"] == NWALKERS and g.attrs["ndim"] == NDIM
        assert "version" in g.attrs and not bool(g.attrs["has_blobs"])
        npt.assert_allclose(
            g["chain_transformed"][:150], np.asarray(chain) * 2.0 + 1.0,
            rtol=1e-6,
        )
        assert g["accepted"].shape == (NWALKERS,)


def test_emcee_file_stays_stock_readable_after_resume(tmp_path):
    outdir = str(tmp_path)
    _run(outdir, "emcee")
    # resumes from the HDF5 last sample and extends to 300 total steps
    _run(outdir, "emcee", seed=1, max_iterations=300)
    stock = _open_stock_emcee(os.path.join(outdir, sampler_run.EMCEE_FILENAME))
    assert stock.iteration == 300
    chain = stock.get_chain()
    assert chain.shape == (300, NWALKERS, NDIM)
    assert np.all(np.isfinite(chain))
    assert stock.get_last_sample().shape == (NWALKERS, NDIM)


class _ZeusStyleReader:
    """Reference ``Zeusbackend`` read semantics (linna/sampler.py:605-630):
    whole-array reads of the root datasets, no bounding attr."""

    def __init__(self, filename):
        self.filename = filename

    def get_value(self, name):
        key = {"chain": "samples", "log_prob": "logprob"}.get(name, name)
        with h5py.File(self.filename, "r") as f:
            return f[key][:]

    def get_last_sample(self):
        with h5py.File(self.filename, "r") as f:
            return f["samples"][-1]


def test_zeus_file_opens_in_zeus_style_reader(tmp_path):
    try:
        import zeus  # noqa: F401

        pytest.skip("stock zeus installed: wire it in place of the inline reader")
    except ImportError:
        pass
    outdir = str(tmp_path)
    ours = _run(outdir, "zeus")
    path = os.path.join(outdir, sampler_run.ZEUS_FILENAME)
    reader = _ZeusStyleReader(path)
    chain = reader.get_value("chain")
    assert chain.shape == (150, NWALKERS, NDIM)
    npt.assert_array_equal(chain, ours.get_chain())
    npt.assert_array_equal(reader.get_value("log_prob"), ours.get_log_prob())
    npt.assert_allclose(
        reader.get_value("chain_transformed"), chain * 2.0 + 1.0, rtol=1e-6
    )
    npt.assert_array_equal(reader.get_last_sample(), ours.get_last_sample())
    # whole-array root reads see EXACTLY the committed rows: the datasets are
    # sized to the committed count (a stock reader has no iteration bound)
    with h5py.File(path, "r") as f:
        assert f["samples"].shape[0] == int(f.attrs["iteration"])
        # gzip stays on (the reference's callback writes gzip datasets)
        assert f["samples"].compression == "gzip"
