"""Sampler correctness: both ensemble moves recover a known Gaussian, the
convergence diagnostics behave, and the HDF5 backends resume."""

import os

import numpy as np
import numpy.testing as npt
import jax
import jax.numpy as jnp
import pytest

from linna_tpu.samplers import backends, convergence, run, slicemove, stretch


def _gauss_logprob(mean, std):
    mean = jnp.asarray(mean, jnp.float32)
    std = jnp.asarray(std, jnp.float32)

    def lp(x):
        return -0.5 * jnp.sum(((x - mean) / std) ** 2, axis=-1)

    return lp


MEAN = np.array([0.5, -1.0])
STD = np.array([1.0, 2.0])


def test_stretch_recovers_gaussian():
    lp = _gauss_logprob(MEAN, STD)
    key = jax.random.key(0)
    x0 = jax.random.normal(key, (64, 2)) * 0.1
    state = stretch.init_state(key, x0, lp)
    state, chain, lps = stretch.stretch_chunk(lp, state, 500)
    samples = np.asarray(chain[100:]).reshape(-1, 2)
    npt.assert_allclose(samples.mean(axis=0), MEAN, atol=0.15)
    npt.assert_allclose(samples.std(axis=0), STD, rtol=0.15)
    # acceptance fraction sane for a=2 on a Gaussian
    acc = np.asarray(state.accepted) / 500
    assert 0.2 < acc.mean() < 0.9


def test_slice_recovers_gaussian():
    lp = _gauss_logprob(MEAN, STD)
    key = jax.random.key(1)
    x0 = jax.random.normal(key, (32, 2)) * 0.1
    state = slicemove.init_slice_state(key, x0, lp)
    state, chain, lps = slicemove.slice_chunk(lp, state, 300)
    samples = np.asarray(chain[50:]).reshape(-1, 2)
    npt.assert_allclose(samples.mean(axis=0), MEAN, atol=0.2)
    npt.assert_allclose(samples.std(axis=0), STD, rtol=0.2)
    # slice sampling expands and contracts
    assert int(state.n_expand) > 0
    assert int(state.n_contract) > 0


def test_slice_tune_mu():
    lp = _gauss_logprob(MEAN, STD)
    key = jax.random.key(2)
    x0 = jax.random.normal(key, (16, 2))
    state = slicemove.init_slice_state(key, x0, lp, mu=5.0)
    state, _, _ = slicemove.slice_chunk(lp, state, 50)
    tuned = slicemove.tune_mu(state)
    assert float(tuned.mu) != 5.0
    assert int(tuned.n_expand) == 0


def test_integrated_time_white_noise():
    rng = np.random.default_rng(0)
    chain = rng.normal(size=(2000, 8, 2))
    tau = convergence.integrated_time(chain)
    npt.assert_allclose(tau, 1.0, atol=0.3)


def test_integrated_time_correlated():
    # AR(1) with rho=0.9 -> tau ~ (1+rho)/(1-rho) = 19
    rng = np.random.default_rng(1)
    n, w = 20000, 4
    x = np.zeros((n, w, 1))
    for i in range(1, n):
        x[i] = 0.9 * x[i - 1] + rng.normal(size=(w, 1))
    tau = convergence.integrated_time(x)
    assert 10 < tau[0] < 30


def test_integrated_time_max_walkers():
    """The stride-subset estimate agrees with the all-walker estimate well
    within its own statistical error (it is the same estimator over fewer
    iid per-walker ACFs — run.py caps the per-check FFT cost with it)."""
    rng = np.random.default_rng(3)
    n, w = 4000, 64
    x = np.zeros((n, w, 2))
    for i in range(1, n):
        x[i] = 0.8 * x[i - 1] + rng.normal(size=(w, 2))
    tau_full = convergence.integrated_time(x)
    tau_sub = convergence.integrated_time(x, max_walkers=16)
    npt.assert_allclose(tau_sub, tau_full, rtol=0.25)
    # cap >= nwalkers is the identity
    npt.assert_array_equal(
        convergence.integrated_time(x, max_walkers=64), tau_full
    )


def test_check_mean_std():
    rng = np.random.default_rng(2)
    stationary = rng.normal(size=(1000, 4, 2))
    assert convergence.check_mean_std(stationary, 0.2, 0.15)
    drifting = stationary + np.linspace(0, 5, 1000)[:, None, None]
    assert not convergence.check_mean_std(drifting, 0.2, 0.15)


@pytest.mark.parametrize("cls,fname", [(backends.EmceeBackend, "c.h5"), (backends.ZeusBackend, "z.h5")])
def test_backend_append_and_read(tmp_path, cls, fname):
    path = str(tmp_path / fname)
    b = cls(path)
    chain = np.random.default_rng(0).normal(size=(10, 4, 2))
    lp = np.random.default_rng(1).normal(size=(10, 4))
    if isinstance(b, backends.EmceeBackend):
        b.reset(4, 2)
        b.append(chain, lp, np.ones(4), transform=lambda x: x * 2)
        b.append(chain, lp, np.ones(4))
        assert b.iteration == 20
        npt.assert_allclose(b.get_value("accepted" if False else "chain")[0], chain[0])
        npt.assert_allclose(
            b.get_value("chain_transformed")[0], chain[0] * 2
        )
    else:
        b.append(chain, lp, transform=lambda x: x * 2)
        b.append(chain, lp)
        assert b.iteration == 20
        npt.assert_allclose(b.get_chain()[0], chain[0])
        npt.assert_allclose(b.get_value("chain_transformed")[0], chain[0] * 2)
    npt.assert_allclose(b.get_last_sample(), chain[-1])
    flat = b.get_chain(flat=True)
    assert flat.shape == (80, 2)


def test_zeus_backend_torn_append_is_bounded(tmp_path):
    """A crash between the zeus backend's three dataset appends must not
    leave misaligned reads: the ``iteration`` attr (committed last) bounds
    every read and the next append overwrites the torn rows."""
    import h5py

    path = str(tmp_path / "z.h5")
    b = backends.ZeusBackend(path)
    rng = np.random.default_rng(0)
    chain = rng.normal(size=(10, 4, 2))
    lp = rng.normal(size=(10, 4))
    b.append(chain, lp)
    # simulate a torn append: samples grew, logprob and the attr did not
    with h5py.File(path, "a") as f:
        f["samples"].resize(15, axis=0)
        f["samples"][10:] = 999.0
    assert b.iteration == 10
    assert b.get_chain().shape == (10, 4, 2)
    npt.assert_allclose(b.get_last_sample(), chain[-1])
    # the next append overwrites the torn rows, not appends after them
    chain2 = rng.normal(size=(5, 4, 2))
    b.append(chain2, rng.normal(size=(5, 4)))
    assert b.iteration == 15
    npt.assert_allclose(b.get_chain()[10:], chain2)
    assert not np.any(b.get_chain() == 999.0)


def test_zeus_backend_torn_first_append(tmp_path):
    """A kill during the FIRST-ever append (``samples`` persisted, ``logprob``
    and the iteration attr not) must count as zero committed steps: treating
    the torn rows as committed would let the next append create ``logprob``
    at the wrong offset — permanently misaligned chain vs log-prob reads."""
    import h5py

    path = str(tmp_path / "z.h5")
    rng = np.random.default_rng(1)
    torn = rng.normal(size=(10, 4, 2))
    with h5py.File(path, "w") as f:  # simulate the torn first append
        f.create_dataset(
            "samples", data=torn, compression="gzip", chunks=True,
            maxshape=(None, 4, 2),
        )
    b = backends.ZeusBackend(path)
    assert b.iteration == 0
    assert not b.initialized

    chain = rng.normal(size=(5, 4, 2))
    lp = rng.normal(size=(5, 4))
    b.append(chain, lp)
    assert b.iteration == 5
    assert b.get_chain().shape == (5, 4, 2)
    assert b.get_log_prob().shape == (5, 4)  # aligned, torn rows overwritten
    npt.assert_allclose(b.get_chain(), chain)


def test_zeus_requires_four_walkers(tmp_path):
    lp = _gauss_logprob(MEAN, STD)
    x0 = np.zeros((3, 2), np.float32)
    with pytest.raises(ValueError, match="nwalkers >= 4"):
        run.run_ensemble(lp, x0, str(tmp_path), method="zeus")


def test_cross_method_resume_falls_back_statistically(tmp_path):
    """emcee/hmc/nuts share one chain file; a state blob written by another
    method must be discarded (statistical resume from the chain positions),
    not restored into the wrong state class."""
    lp = _gauss_logprob(MEAN, STD)
    x0 = (np.random.default_rng(6).normal(size=(8, 2)) * 0.1 + MEAN).astype(
        np.float32
    )
    kw = dict(ntimes=1, tautol=1e9, meanshift=1e9, stdshift=1e9, nk=1,
              check_every=20, seed=11, shard_walkers=False,
              convergence_check=False)
    b = run.run_ensemble(lp, x0, str(tmp_path), method="emcee",
                         max_iterations=20, **kw)
    n1 = b.iteration
    with pytest.warns(UserWarning, match="written by method 'emcee'"):
        b2 = run.run_ensemble(lp, x0, str(tmp_path), method="nuts",
                              max_iterations=40, **kw)
    assert b2.iteration == n1 + 20


@pytest.mark.parametrize("method", ["emcee", "zeus"])
def test_run_ensemble_converges_and_resumes(tmp_path, method):
    lp = _gauss_logprob(MEAN, STD)
    outdir = str(tmp_path)
    rng = np.random.default_rng(0)
    x0 = rng.normal(size=(16, 2)) * 0.1 + MEAN
    backend = run.run_ensemble(
        lp,
        x0,
        outdir,
        method=method,
        transform=lambda x: x + 100.0,
        ntimes=2,
        tautol=0.5,
        meanshift=100,
        stdshift=100,
        nk=1,
        check_every=50,
        max_iterations=400,
        seed=3,
    )
    n1 = backend.iteration
    assert n1 >= 50
    chain = backend.get_chain(flat=True)
    npt.assert_allclose(chain[n1 // 2 :].mean(axis=0), MEAN, atol=0.4)
    tr = backend.get_value("chain_transformed", flat=True)
    npt.assert_allclose(tr[0], chain[0] + 100.0, rtol=1e-6)

    # resume: loosened convergence since file exists -> continues from last
    backend2 = run.run_ensemble(
        lp,
        x0,
        outdir,
        method=method,
        ntimes=1,
        tautol=1e9,
        meanshift=1e9,
        stdshift=1e9,
        nk=1,
        check_every=50,
        max_iterations=n1 + 50,
        seed=4,
    )
    assert backend2.iteration >= n1


def test_convergence_check_off_runs_exact_steps(tmp_path):
    """convergence_check=False runs exactly max_iterations steps (no tau or
    stationarity evaluation), and a second call extends the finished chain
    by exactly the requested amount — the contract bench_full's R-hat-gated
    polish loop relies on."""
    lp = _gauss_logprob(MEAN, STD)
    x0 = np.random.default_rng(1).normal(size=(16, 2)).astype(np.float32)
    kw = dict(method="zeus", check_every=25, convergence_check=False,
              shard_walkers=False)
    b = run.run_ensemble(lp, x0, str(tmp_path), max_iterations=100, seed=5, **kw)
    assert b.iteration == 100
    b2 = run.run_ensemble(lp, x0, str(tmp_path), max_iterations=150, seed=6, **kw)
    assert b2.iteration == 150


def test_rerun_on_converged_chain_is_noop(tmp_path):
    """Re-running on a chain that already passed the convergence test is an
    idempotent no-op under unchanged criteria (the persisted ``_converged``
    flag triggers an on-resume re-evaluation, run.py), while TIGHTENED
    criteria force the chain to extend."""
    lp = _gauss_logprob(MEAN, STD)
    x0 = (np.random.default_rng(4).normal(size=(16, 2)) * 0.1 + MEAN).astype(
        np.float32
    )
    kw = dict(method="zeus", ntimes=1, tautol=1e9, meanshift=1e9,
              stdshift=1e9, nk=1, check_every=25, seed=9, shard_walkers=False)
    b = run.run_ensemble(lp, x0, str(tmp_path), max_iterations=400, **kw)
    n1 = b.iteration
    assert n1 < 400, "loose criteria must converge before max_iterations"
    chain1 = b.get_chain()

    b2 = run.run_ensemble(lp, x0, str(tmp_path), max_iterations=400, **kw)
    assert b2.iteration == n1
    np.testing.assert_array_equal(b2.get_chain(), chain1)

    # stricter ntimes: the re-evaluation fails -> the chain extends
    b3 = run.run_ensemble(
        lp, x0, str(tmp_path), max_iterations=n1 + 50, **{**kw, "ntimes": 1e6}
    )
    assert b3.iteration > n1
    np.testing.assert_array_equal(b3.get_chain()[:n1], chain1)


@pytest.mark.parametrize("method", ["emcee", "zeus"])
def test_resume_convergence_decisions_match(tmp_path, method):
    """A run interrupted mid-chain and resumed stops at the SAME iteration
    with the SAME chain as the uninterrupted run: the lazily-hydrated tau
    window (run.py _hydrate) sees identical trailing history, so every
    convergence decision is reproduced."""
    lp = _gauss_logprob(MEAN, STD)
    x0 = (np.random.default_rng(2).normal(size=(16, 2)) * 0.1 + MEAN).astype(
        np.float32
    )
    kw = dict(method=method, ntimes=6, tautol=0.5, meanshift=100, stdshift=100,
              nk=1, check_every=50, seed=7, shard_walkers=False)
    full = run.run_ensemble(lp, x0, str(tmp_path / "full"),
                            max_iterations=800, **kw)
    part = run.run_ensemble(lp, x0, str(tmp_path / "part"),
                            max_iterations=100, **kw)
    assert part.iteration == 100
    resumed = run.run_ensemble(lp, x0, str(tmp_path / "part"),
                               max_iterations=800, **kw)
    assert resumed.iteration == full.iteration
    np.testing.assert_array_equal(resumed.get_chain(), full.get_chain())


@pytest.mark.parametrize("method", ["emcee", "zeus", "hmc", "nuts"])
def test_exact_resume_matches_uninterrupted(tmp_path, method, monkeypatch):
    """Interrupting after one chunk and resuming reproduces the
    uninterrupted seeded run bitwise: the full sampler state (PRNG key,
    per-walker epsilons, dual-averaging state, slice mu, acceptance
    counters) persists in the HDF5 ``sampler_state`` group and the
    preconditioner in ``precond.npz`` (VERDICT r2 item 5; reference stores
    the emcee RNG/move state per save_step, linna/sampler.py:346-368)."""
    import jax.numpy as jnp

    from linna_tpu.samplers import precondition

    def log_prob(x):
        return -0.5 * jnp.sum((x - 0.3) ** 2, axis=-1)

    x0 = np.asarray(
        0.2 * np.random.default_rng(0).standard_normal((16, 2)), np.float32
    )
    kw = dict(
        method=method, ntimes=1e6, tautol=1e-8, meanshift=1e-8, stdshift=1e-8,
        check_every=10, seed=3, shard_walkers=False, m_adapt=15,
    )

    full = run.run_ensemble(
        log_prob, x0, str(tmp_path / "full"), max_iterations=30, **kw
    )
    part = run.run_ensemble(
        log_prob, x0, str(tmp_path / "part"), max_iterations=10, **kw
    )
    assert len(part.get_chain()) == 10
    if method in run.GRADIENT_METHODS:
        # resume must reuse precond.npz, never re-pay the MAP search
        def boom(*a, **k):
            raise AssertionError("calc_hess_mass_mat re-ran on resume")

        monkeypatch.setattr(precondition, "calc_hess_mass_mat", boom)
    resumed = run.run_ensemble(
        log_prob, x0, str(tmp_path / "part"), max_iterations=30, **kw
    )
    np.testing.assert_array_equal(resumed.get_chain(), full.get_chain())
    np.testing.assert_array_equal(resumed.get_log_prob(), full.get_log_prob())


def test_corrupt_precond_file_recomputes_instead_of_bricking(tmp_path):
    """A truncated/corrupt precond.npz (pre-atomic-write versions could tear
    it mid-savez) must fall back to a fresh MAP search with a warning, not
    crash every subsequent resume of the chain (np.load -> BadZipFile)."""
    import jax.numpy as jnp

    def log_prob(x):
        return -0.5 * jnp.sum((x - 0.3) ** 2, axis=-1)

    x0 = np.asarray(
        0.2 * np.random.default_rng(0).standard_normal((16, 2)), np.float32
    )
    outdir = str(tmp_path / "nuts")
    kw = dict(
        method="nuts", ntimes=1e6, tautol=1e-8, meanshift=1e-8, stdshift=1e-8,
        check_every=10, seed=3, shard_walkers=False, m_adapt=15,
    )
    run.run_ensemble(log_prob, x0, outdir, max_iterations=10, **kw)
    with open(os.path.join(outdir, run.PRECOND_FILENAME), "wb") as f:
        f.write(b"not an npz")  # simulate a torn write

    with pytest.warns(UserWarning, match="unreadable"):
        backend = run.run_ensemble(log_prob, x0, outdir, max_iterations=20, **kw)
    assert backend.iteration == 20  # extended, not crashed
    # the recomputed preconditioner was rewritten and is loadable again
    z = np.load(os.path.join(outdir, run.PRECOND_FILENAME))
    assert z["center"].shape == (2,)


@pytest.mark.parametrize("method", ["emcee", "zeus"])
def test_resume_tau_window_not_duplicated(tmp_path, method, monkeypatch):
    """Regression: on a resumed run, the lazy hydration of the persisted
    chain into the rolling tau window must read only the PRE-resume rows.
    The backend also holds the post-resume chunks (already pushed into the
    window), so an unbounded ``get_chain`` would duplicate them — the tau /
    stationarity tests would then run on a corrupted, non-monotone series
    on every resumed production run."""
    lp = _gauss_logprob(MEAN, STD)
    x0 = np.random.default_rng(3).normal(size=(8, 2)).astype(np.float32)
    kw = dict(method=method, check_every=50, shard_walkers=False, seed=7)
    # 100 persisted steps, no convergence checks (window never hydrated)
    run.run_ensemble(lp, x0, str(tmp_path), max_iterations=100,
                     convergence_check=False, **kw)

    seen = []
    real = convergence.integrated_time

    def spy(x, **k):
        seen.append(np.asarray(x).shape[0])
        return real(x, **k)

    monkeypatch.setattr(convergence, "integrated_time", spy)
    # resume for one more 50-step chunk; the first tau check hydrates the
    # persisted tail and must see exactly 150 contiguous steps
    run.run_ensemble(lp, x0, str(tmp_path), max_iterations=150,
                     tau_check_growth=1.0, **kw)
    assert seen, "no tau check fired on the resumed run"
    expect = 150 if method != "zeus" else 150 - int(0.2 * 150)
    assert seen[0] == expect, (
        f"tau window has {seen[0]} rows, expected {expect} — persisted tail "
        "duplicated post-resume chunks"
    )


def test_stale_state_blob_falls_back_to_statistical_resume(tmp_path):
    """Chain append and sampler-state save are two HDF5 transactions.  A
    crash between them leaves the saved state one chunk behind the file;
    resuming from that stale state would regenerate and re-append the
    identical chunk (a duplicated 100-step block).  The resume path must
    detect the mismatch and ignore the blob (statistical re-init), exactly
    as if no state had been saved."""
    import shutil

    import h5py

    lp = _gauss_logprob(MEAN, STD)
    x0 = np.random.default_rng(5).normal(size=(8, 2)).astype(np.float32)
    kw = dict(method="emcee", check_every=50, shard_walkers=False, seed=11,
              convergence_check=False)
    dir_a, dir_b = tmp_path / "a", tmp_path / "b"
    run.run_ensemble(lp, x0, str(dir_a), max_iterations=100, **kw)
    (dir_b).mkdir()
    shutil.copy(dir_a / run.EMCEE_FILENAME, dir_b / run.EMCEE_FILENAME)

    # a: stale blob (one chunk behind the chain, as after the crash)
    with h5py.File(dir_a / run.EMCEE_FILENAME, "r+") as f:
        f["sampler_state/_iteration"][...] = 50
    # b: no blob at all (the pre-upgrade fallback path)
    with h5py.File(dir_b / run.EMCEE_FILENAME, "r+") as f:
        del f["sampler_state"]

    ba = run.run_ensemble(lp, x0, str(dir_a), max_iterations=150, **kw)
    bb = run.run_ensemble(lp, x0, str(dir_b), max_iterations=150, **kw)
    ca, cb = np.asarray(ba.get_chain()), np.asarray(bb.get_chain())
    assert len(ca) == len(cb) == 150
    # stale-blob resume == no-blob resume: the blob was ignored, not replayed
    npt.assert_array_equal(ca[100:], cb[100:])
    # and the pre-resume prefix is untouched
    npt.assert_array_equal(ca[:100], cb[:100])


def test_odd_walker_count_rejected_at_init():
    """The (2, W/2, D) chunk layout needs an even ensemble (emcee's own
    contract); an odd count must fail clearly at init, not as a reshape
    error inside the jitted chunk."""
    import pytest

    lp = lambda x: -0.5 * jnp.sum(x**2, axis=-1)
    x0 = jnp.zeros((31, 2))
    key = jax.random.PRNGKey(0)
    with pytest.raises(ValueError, match="even"):
        stretch.init_state(key, x0, lp)
    with pytest.raises(ValueError, match="even"):
        slicemove.init_slice_state(key, x0, lp)


def test_max_iterations_stop_is_terminal(tmp_path):
    """A chain that stops at max_iterations without converging gets the
    ``_finished`` terminal marker, and the orchestrator restart gate treats
    it as complete (the reference's skip-on-existence, linna/main.py:273-274)
    instead of re-extending it on every restart — while a blob missing the
    terminal stamp (process died mid-run) still reads incomplete (ADVICE r4)."""
    from linna_tpu.orchestrator import _chain_incomplete

    lp = _gauss_logprob(MEAN, STD)
    x0 = np.random.default_rng(1).normal(size=(16, 2)).astype(np.float32)
    b = run.run_ensemble(
        lp, x0, str(tmp_path), method="emcee", ntimes=1e6, tautol=1e-9,
        meanshift=1e-9, stdshift=1e-9, nk=1, check_every=25,
        max_iterations=50, seed=5, shard_walkers=False,
    )
    assert b.iteration == 50
    blob = b.load_state()
    assert not bool(np.asarray(blob["_converged"]))
    assert bool(np.asarray(blob["_finished"]))
    chain_path = str(tmp_path / run.EMCEE_FILENAME)
    assert not _chain_incomplete(chain_path, "emcee")

    # simulate a mid-run death: the last persisted save lacks the terminal
    # stamp (exactly what every in-loop save writes)
    blob["_finished"] = np.asarray(False)
    b.save_state(blob)
    assert _chain_incomplete(chain_path, "emcee")

    # converged chains remain complete regardless of the marker (legacy blobs)
    blob["_converged"] = np.asarray(True)
    b.save_state(blob)
    assert not _chain_incomplete(chain_path, "emcee")
