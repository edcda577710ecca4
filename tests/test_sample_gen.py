"""Training-point generation (sample_gen.py): value-level tests of the LHS
semantics, chain-eigenspace sampling, A_s log-space branch, physical cuts,
PSD clipping, best-point Hessian draws and the chi^2 cut
(reference linna/util.py:775-897, 1167-1258, 38-48, 1260-1270)."""

import os

import numpy as np
import numpy.testing as npt

from linna_tpu import data as D
from linna_tpu.sample_gen import (
    NNSampler,
    _apply_omegab2cut,
    _chisqcut_files,
    _generate_best_points,
    _numerical_hessian,
    generate_training_point,
    lhs_center,
    make_positive_definite,
)


def _identity_theory(task, outdir):
    i, x = task
    return np.asarray(x, np.float64).copy()


# ------------------------------------------------------------------ lhs_center


def test_lhs_center_one_point_per_stratum():
    """pyDOE2 lhs(criterion='center') semantics: each dimension's sorted
    values are exactly the stratum centers (reference linna/util.py:790)."""
    rng = np.random.default_rng(0)
    n, d = 16, 3
    pts = lhs_center(d, n, rng)
    centers = (np.arange(n) + 0.5) / n
    for j in range(d):
        npt.assert_allclose(np.sort(pts[:, j]), centers)
    # dimensions permuted independently (not all identical orderings)
    assert not np.array_equal(np.argsort(pts[:, 0]), np.argsort(pts[:, 1]))


# -------------------------------------------------------------- gensample_flat


def test_gensample_flat_covers_prior_box():
    prior = np.array([[-2.0, 4.0], [10.0, 20.0]])
    nn = NNSampler("/tmp/unused", prior)
    s = nn.gensample_flat(32)
    assert s.shape == (32, 2)
    for j, (lo, hi) in enumerate(prior):
        assert np.all((s[:, j] > lo) & (s[:, j] < hi))
        # centred-LHS: sorted marginals are the stratum centres of [lo, hi]
        centers = lo + (hi - lo) * (np.arange(32) + 0.5) / 32
        npt.assert_allclose(np.sort(s[:, j]), centers)


def test_gensample_flat_log_space_param1():
    """Index-1 parameter sampled in log space when its upper bound < 1e-5
    (the A_s convention, reference linna/util.py:795-803)."""
    prior = np.array([[0.1, 0.9], [1e-12, 1e-8]])
    nn = NNSampler("/tmp/unused", prior)
    s = nn.gensample_flat(64)
    assert np.all((s[:, 1] > 1e-12) & (s[:, 1] < 1e-8))
    # log-marginals are the stratum centres of [log lo, log hi]
    lc = np.log(1e-12) + (np.log(1e-8) - np.log(1e-12)) * (np.arange(64) + 0.5) / 64
    npt.assert_allclose(np.sort(np.log(s[:, 1])), lc, rtol=1e-10)


def test_gensample_flat_omegab2cut_regrows_to_n():
    """The physical cut rejects samples and the hypercube is regrown until
    the requested count survives (reference linna/util.py:804-811)."""
    prior = np.array([[0.01, 0.09], [0.4, 1.0], [-1.0, 1.0]])
    cut = [0, 1, 0.02, 0.025]  # narrow Omega_b h^2 window
    nn = NNSampler("/tmp/unused", prior)
    s = nn.gensample_flat(50, omegab2cut=cut)
    assert s.shape == (50, 3)
    ombh2 = s[:, 0] * s[:, 1] ** 2
    assert np.all((ombh2 > 0.02) & (ombh2 < 0.025))


def test_apply_omegab2cut_extra_windows():
    samples = np.array(
        [[0.05, 0.7, 0.5], [0.05, 0.7, 2.0], [0.5, 0.7, 0.5]]
    )
    keep = _apply_omegab2cut(samples, [0, 1, 0.01, 0.1, 2, 0.0, 1.0])
    npt.assert_array_equal(keep, [True, False, False])


# ------------------------------------------------------------- gensample_chain


def test_gensample_chain_matches_chain_covariance():
    """Eigenspace LHS: sample covariance ~ (nsigma^2/3) * chain covariance
    (variance of centred-LHS on [-1,1] is 1/3), samples inside the prior
    (replaces the external sample_generator dep, reference
    linna/util.py:816-861)."""
    rng = np.random.default_rng(1)
    cov_true = np.array([[1.0, 0.6], [0.6, 1.0]])
    chain = rng.multivariate_normal([0.5, -0.5], cov_true, size=4000)
    prior = np.array([[-50.0, 50.0], [-50.0, 50.0]])
    nn = NNSampler("/tmp/unused", prior)
    nsigma = 3.0
    s = nn.gensample_chain(2000, chain, nsigma)
    assert s.shape == (2000, 2)
    npt.assert_allclose(s.mean(axis=0), chain.mean(axis=0), atol=0.15)
    cov_s = np.cov(s.T)
    expected = (nsigma**2 / 3.0) * np.cov(chain.T)
    npt.assert_allclose(cov_s, expected, rtol=0.15, atol=0.05)


def test_gensample_chain_rejects_outside_prior():
    rng = np.random.default_rng(2)
    chain = rng.normal(0.0, 1.0, size=(2000, 2))
    prior = np.array([[-0.5, 0.5], [-0.5, 0.5]])
    nn = NNSampler("/tmp/unused", prior)
    s = nn.gensample_chain(100, chain, nsigma=3)
    assert np.all((s > -0.5) & (s < 0.5))


def test_gensample_chain_log_param1_roundtrip():
    """The A_s branch maps chain/prior through log(1e10 x) and back
    (reference linna/util.py:836-840)."""
    rng = np.random.default_rng(3)
    chain = np.stack(
        [rng.normal(0.3, 0.05, 3000), np.exp(rng.normal(-20.7, 0.1, 3000))],
        axis=1,
    )
    prior = np.array([[0.0, 1.0], [1e-10, 1e-8]])
    nn = NNSampler("/tmp/unused", prior)
    s = nn.gensample_chain(500, chain, nsigma=2)
    assert np.all((s[:, 1] > 1e-10) & (s[:, 1] < 1e-8))
    # spread in log space comparable to the chain's (2 sigma / sqrt(3))
    assert 0.05 < np.std(np.log(s[:, 1])) < 0.3


def test_gensample_chain_randomsample_draws_chain_rows():
    rng = np.random.default_rng(4)
    chain = rng.normal(0, 1, size=(500, 2))
    prior = np.array([[-10.0, 10.0], [-10.0, 10.0]])
    nn = NNSampler("/tmp/unused", prior)
    s = nn.gensample_chain_randomsample(50, chain)
    assert s.shape == (50, 2)
    # every sample is literally a row of the chain
    for row in s:
        assert np.any(np.all(np.isclose(chain, row), axis=1))


# ------------------------------------------------------ make_positive_definite


def test_make_positive_definite_floors_spectrum():
    """Reference semantics (linna/util.py:38-49): negatives zeroed, tail
    eigenvalues FLOORED at the 99%-cumulative eigenvalue — the result is
    strictly positive definite and invertible, and an already-healthy matrix
    passes through unchanged."""
    rng = np.random.default_rng(5)
    a = rng.normal(size=(4, 4))
    m = a @ a.T
    # inject a negative eigenvalue
    vals, vecs = np.linalg.eigh(m)
    vals[0] = -0.5
    m_bad = (vecs * vals) @ vecs.T
    m_fixed = make_positive_definite(m_bad)
    fixed_vals = np.linalg.eigvalsh(m_fixed)
    assert np.all(fixed_vals > 0)  # invertible, not rank-deficient
    # dominant directions preserved
    top_bad = np.linalg.eigh(m_bad)[1][:, -1]
    top_fix = np.linalg.eigh(m_fixed)[1][:, -1]
    assert abs(np.dot(top_bad, top_fix)) > 0.99
    # a healthy well-spread PSD matrix is (near-)unchanged
    healthy = np.diag([18.0, 8.0])
    npt.assert_allclose(make_positive_definite(healthy), healthy)


# ------------------------------------------------------------------ best points


def test_numerical_hessian_quadratic():
    A = np.array([[2.0, 0.3], [0.3, 1.0]])

    def f(x):
        return float(x @ A @ x)

    H = _numerical_hessian(f, np.array([0.3, -0.2]))
    npt.assert_allclose(H, 2 * A, rtol=1e-4, atol=1e-4)


def test_generate_best_points_artifacts_and_distribution(tmp_path):
    """MAP + PSD-clipped Hessian + MVN draws, with the reference's artifact
    names incl. best_samples_{x,y}_val.* (linna/util.py:1234-1252)."""
    outdir = str(tmp_path)
    A = np.array([[4.0, 0.0], [0.0, 9.0]])
    center = np.array([0.5, -0.25])

    def negloglike(x):
        d = np.asarray(x) - center
        return float(d @ A @ d)

    np.savetxt(
        D.sample_x_path(outdir, "train"), np.random.default_rng(6).normal(size=(5, 2))
    )
    nn = NNSampler(outdir, np.array([[-5.0, 5.0]] * 2))
    _generate_best_points(
        _identity_theory, nn, None, outdir, ntrain=1000, nval=200,
        negloglike=negloglike, nbest_in=1500,
    )
    for name in ("best", "best_val"):
        assert os.path.isfile(D.sample_x_path(outdir, name)), name
        assert os.path.isfile(D.sample_y_path(outdir, name)), name
    # reference-parity filenames on disk (suffix _val, not prefix)
    assert os.path.isfile(os.path.join(outdir, "best_samples_x_val.txt"))
    assert os.path.isfile(os.path.join(outdir, "best_samples_y_val.npy"))
    bx = np.loadtxt(D.sample_x_path(outdir, "best"))
    assert bx.shape == (1500, 2)
    npt.assert_allclose(bx.mean(axis=0), center, atol=0.06)
    # draw covariance ~ inv(Hessian) = inv(2A)
    npt.assert_allclose(np.cov(bx.T), np.linalg.inv(2 * A), rtol=0.25, atol=0.01)
    nval_expected = max(int(1500 / 1000 * 200), 1)
    bvx = np.loadtxt(D.sample_x_path(outdir, "best_val"))
    assert bvx.shape == (nval_expected, 2)


# -------------------------------------------------------------------- chisqcut


def test_chisqcut_files_cuts_on_raw_prediction_norm(tmp_path):
    """The cut is on raw y^T C^-1 y — NOT the residual to the data vector
    (reference linna/util.py:1260-1270)."""
    y = np.array([[0.1, 0.0], [3.0, 0.0], [0.0, 0.2]])
    x = np.arange(6, dtype=float).reshape(3, 2)
    ypath = str(tmp_path / "y.npy")
    xpath = str(tmp_path / "x.txt")
    np.save(ypath, y)
    np.savetxt(xpath, x)
    _chisqcut_files(
        data=np.array([3.0, 0.0]),  # residual cut would keep row 1 instead
        invcov=np.eye(2),
        chisqcut=1.0,
        fnamey=ypath,
        fnamex=xpath,
    )
    y2 = np.load(ypath)
    x2 = np.loadtxt(xpath)
    npt.assert_array_equal(y2, y[[0, 2]])
    npt.assert_array_equal(x2, x[[0, 2]])


# ------------------------------------------------------ file-gated idempotence


def test_generate_training_point_file_gated(tmp_path):
    outdir = str(tmp_path / "iter_0")
    prior = np.array([[-1.0, 1.0]] * 2)
    nn = NNSampler(outdir, prior)
    data = np.zeros(2)
    invcov = np.eye(2)
    generate_training_point(
        _identity_theory, nn, None, outdir, 10, 4, data, invcov
    )
    x1 = np.loadtxt(D.sample_x_path(outdir, "train"))
    mtime = os.path.getmtime(D.sample_y_path(outdir, "train"))
    # second call is a no-op: all artifacts exist
    generate_training_point(
        _identity_theory, nn, None, outdir, 10, 4, data, invcov
    )
    npt.assert_array_equal(np.loadtxt(D.sample_x_path(outdir, "train")), x1)
    assert os.path.getmtime(D.sample_y_path(outdir, "train")) == mtime


def test_val_split_not_a_copy_of_train(tmp_path):
    """The validation draw is salted: with the reference's identical
    per-call reseed (linna/util.py:881), the chain-randomsample val set is
    the EXACT first-nval prefix of the train draw — validating on training
    rows.  Deliberate deviation, pinned here."""
    outdir = str(tmp_path / "iter_1")
    prior = np.array([[-5.0, 5.0]] * 2)
    nn = NNSampler(outdir, prior)
    chain = np.random.default_rng(8).normal(0, 1, size=(4000, 2))
    generate_training_point(
        _identity_theory, nn, None, outdir, 200, 50,
        np.zeros(2), np.eye(2), chain=chain, options=1,
    )
    train = np.loadtxt(D.sample_x_path(outdir, "train"))
    val = np.loadtxt(D.sample_x_path(outdir, "val"))
    assert not np.array_equal(train[: len(val)], val)
    # overlap by chance is fine; wholesale duplication is not
    dup = sum(np.any(np.all(np.isclose(train, v), axis=1)) for v in val)
    assert dup < len(val)
