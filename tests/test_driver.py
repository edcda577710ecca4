"""Application driver: YAML include merging, triplet covariance, masks,
prior construction, and the CLI end to end (reference linna/cosmolike_run.py)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from linna_tpu import config as C
from linna_tpu import driver as D

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_yaml_include_merge(tmp_path):
    (tmp_path / "base.yaml").write_text("a: 1\nb: 2\nnested: {x: 1}\n")
    (tmp_path / "run.yaml").write_text("include: base.yaml\nb: 3\nc: 4\n")
    params = C.yaml_load(str(tmp_path / "run.yaml"))
    assert params == {"a": 1, "b": 3, "c": 4, "nested": {"x": 1}}
    # explicit parent_dir resolution (the CLI's yamldir argument)
    sub = tmp_path / "sub"
    sub.mkdir()
    (sub / "run2.yaml").write_text("include: base.yaml\nd: 5\n")
    params = C.yaml_load(str(sub / "run2.yaml"), parent_dir=str(tmp_path))
    assert params["a"] == 1 and params["d"] == 5


def test_read_triplet_cov_symmetrizes_and_clips():
    rows = np.array(
        [
            [0, 0, 1.0, 0.5],
            [0, 1, 0.1, 0.0],
            [1, 1, 2.0, 0.0],
            [2, 2, 1e11, 0.0],  # clipped to 0
        ]
    )
    cov = D.read_triplet_cov(rows)
    assert cov.shape == (3, 3)
    assert cov[0, 0] == 1.5 and cov[0, 1] == 0.1 and cov[1, 0] == 0.1
    assert cov[2, 2] == 0.0


def test_align_mask():
    m = np.array([True, False, True])
    np.testing.assert_array_equal(D.align_mask(m, 2), [True, False])
    np.testing.assert_array_equal(
        D.align_mask(m, 5), [True, False, True, False, False]
    )


def test_priors_and_init_from_config():
    params = {
        "sampled_params": [
            {"param": "om", "dist": "gauss", "arg1": 0.3, "arg2": 0.02},
            {"param": "s8", "dist": "flat", "arg1": 0.6, "arg2": 1.0},
            {"param": "w", "dist": "flat", "arg1": -2.0, "arg2": 0.0, "fid": -1.0},
        ]
    }
    priors, init = D.priors_and_init_from_config(params)
    assert [p["dist"] for p in priors] == ["gauss", "flat", "flat"]
    np.testing.assert_allclose(init, [0.3, 0.8, -1.0])


def test_resolve_theory_errors():
    with pytest.raises(KeyError):
        D.resolve_theory({})
    with pytest.raises(ValueError):
        D.resolve_theory({"theory": "no_colon_here"})
    with pytest.raises(ModuleNotFoundError):
        D.resolve_theory({"theory": "definitely.not.a.module:f"})


def test_model_func_caches_and_masks(tmp_path):
    calls = []

    def writer(params, outfile):
        calls.append(1)
        np.savetxt(outfile, np.stack([np.arange(4), np.asarray(params)], 1))

    mf = D.ModelFunc(writer, np.array([True, True, False, True]))
    out1 = mf([0, np.array([1.0, 2.0, 3.0, 4.0])], str(tmp_path))
    np.testing.assert_allclose(out1, [1.0, 2.0, 4.0])
    out2 = mf([0, np.array([9.0, 9.0, 9.0, 9.0])], str(tmp_path))  # cached
    np.testing.assert_allclose(out2, out1)
    assert len(calls) == 1

    def bad_writer(params, outfile):
        raise RuntimeError("theory exploded")

    mf_bad = D.ModelFunc(bad_writer, np.array([True, True, False, True]))
    out3 = mf_bad([1, np.zeros(4)], str(tmp_path))
    np.testing.assert_allclose(out3, np.zeros(3))  # zeros on failure


@pytest.mark.slow
def test_driver_cli_end_to_end(tmp_path):
    """The full CLI surface: generate inputs, write configs, run
    ``python -m linna_tpu.driver`` as a user would."""
    inputs = tmp_path / "inputs"
    inputs.mkdir()
    means = np.array([0.3, -0.2])
    np.savetxt(inputs / "data.txt", np.stack([np.arange(2), means], 1))
    np.savetxt(
        inputs / "cov_triplet.txt",
        np.array([[0, 0, 0.0, 0.3], [1, 1, 0.25, 0.25]]),
    )
    (tmp_path / "base.yaml").write_text(
        "nwalkers: 8\nnnmodel: chto_v2\ntrainingoption: 1\n"
        "num_epochs: 30\nbatch_size: 16\nntrainArr: [60]\nnvalArr: [15]\n"
        "nkeepArr: [2]\nntimesArr: [2]\nntautolArr: [0.5]\n"
        "meanshiftArr: [100]\nstdshiftArr: [100]\ntemperatureArr: [1.0]\nseed: 7\n"
    )
    (tmp_path / "run.yaml").write_text(
        "include: base.yaml\n"
        f"outdir: {tmp_path}/out\n"
        "theory: identity\n"
        f"base_dir: {inputs}\n"
        "data_file: data.txt\ncov_file: cov_triplet.txt\n"
        "sampled_params:\n"
        "  - {param: x0, dist: flat, arg1: -2.0, arg2: 2.0}\n"
        "  - {param: x1, dist: flat, arg1: -2.0, arg2: 2.0}\n"
    )
    env = dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO)
    proc = subprocess.run(
        [sys.executable, "-m", "linna_tpu.driver", "emcee", "None",
         str(tmp_path / "run.yaml"), str(tmp_path)],
        capture_output=True, text=True, timeout=900, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    out = tmp_path / "out"
    assert (out / "time.npy").exists()
    assert (out / "iter_0" / "chemcee_256.h5").exists()


def test_driver_cli_usage_error():
    proc = subprocess.run(
        [sys.executable, "-m", "linna_tpu.driver"],
        capture_output=True, text=True, timeout=120,
        env=dict(os.environ, JAX_PLATFORMS="cpu", PYTHONPATH=REPO),
    )
    assert proc.returncode == 2
    assert "usage" in proc.stderr


def test_run_from_config_method_arr(tmp_path):
    """methodArr in the config overrides the CLI method with a per-iteration
    sampler list; each iteration's chain layout follows its own method."""
    inputs = tmp_path / "inputs"
    inputs.mkdir()
    means = np.array([0.3, -0.2])
    np.savetxt(inputs / "data.txt", np.stack([np.arange(2), means], 1))
    np.savetxt(
        inputs / "cov_triplet.txt",
        np.array([[0, 0, 0.0, 0.3], [1, 1, 0.25, 0.25]]),
    )
    params = {
        "outdir": str(tmp_path / "out"),
        "base_dir": str(inputs),
        "data_file": "data.txt",
        "cov_file": "cov_triplet.txt",
        "theory": "identity",
        "nwalkers": 6,
        "trainingoption": 1,
        "num_epochs": 10,
        "batch_size": 16,
        "ntrainArr": [25, 25],
        "nvalArr": [6, 6],
        "nkeepArr": [1, 1],
        "ntimesArr": [2, 2],
        "ntautolArr": [0.5, 0.5],
        "meanshiftArr": [100, 100],
        "stdshiftArr": [100, 100],
        "temperatureArr": [2.0, 1.0],
        "seed": 3,
        "methodArr": ["emcee", "zeus"],
        "sampled_params": [
            {"param": "x0", "dist": "flat", "arg1": -2.0, "arg2": 2.0},
            {"param": "x1", "dist": "flat", "arg1": -2.0, "arg2": 2.0},
        ],
    }
    chain, _ = D.run_from_config(params, method="zeus")
    out = tmp_path / "out"
    assert (out / "iter_0" / "chemcee_256.h5").exists()
    assert (out / "iter_1" / "zeus_256.h5").exists()
    assert np.all(np.isfinite(chain))


def test_load_data_cov_transform_matrix(tmp_path):
    """``transform_matrix_file``: data <- T data, cov <- T cov T^T after
    masking (the reference's Y-statistics compression shape,
    cosmolike_run.py:268-282, with the matrix supplied from a file)."""
    from linna_tpu.driver import _load_data_cov

    rng = np.random.default_rng(0)
    n, m = 6, 3
    a = rng.standard_normal((n, n))
    cov = a @ a.T + n * np.eye(n)
    data = rng.standard_normal(n)
    t = rng.standard_normal((m, n))
    np.savetxt(tmp_path / "cov.txt", cov)
    np.savetxt(tmp_path / "data.txt", data)
    np.savetxt(tmp_path / "t.txt", t)
    params = {
        "base_dir": str(tmp_path),
        "cov_file": "cov.txt",
        "cov_format": "dense",
        "data_file": "data.txt",
        "transform_matrix_file": "t.txt",
    }
    d, c, mask, tmat = _load_data_cov(params)
    np.testing.assert_allclose(d, t @ data, rtol=1e-12)
    np.testing.assert_allclose(c, t @ cov @ t.T, rtol=1e-12)
    np.testing.assert_allclose(tmat, t, rtol=1e-12)

    params["transform_matrix_file"] = "bad.txt"
    np.savetxt(tmp_path / "bad.txt", np.ones((2, n + 1)))
    try:
        _load_data_cov(params)
    except ValueError as e:
        assert "columns" in str(e)
    else:
        raise AssertionError("shape mismatch must raise")


def test_load_data_cov_premasked_data(tmp_path):
    """A data vector already cut to the masked length passes through
    unchanged; a length matching neither the full nor masked size raises
    instead of silently truncating."""
    from linna_tpu.driver import _load_data_cov

    rng = np.random.default_rng(1)
    n = 6
    a = rng.standard_normal((n, n))
    cov = a @ a.T + n * np.eye(n)
    mask = np.array([1, 1, 0, 1, 0, 1], dtype=float)
    np.savetxt(tmp_path / "cov.txt", cov)
    np.savetxt(tmp_path / "mask.txt", np.stack([np.arange(n), mask], 1))
    params = {
        "base_dir": str(tmp_path),
        "cov_file": "cov.txt",
        "cov_format": "dense",
        "data_file": "data.txt",
        "mask_file": "mask.txt",
    }

    # full-length data: masked here
    full = rng.standard_normal(n)
    np.savetxt(tmp_path / "data.txt", full)
    d, c, m, _ = _load_data_cov(params)
    np.testing.assert_allclose(d, full[mask > 0])
    assert c.shape == (4, 4)

    # pre-masked data (the reference's Y-statistics pipeline hands the
    # driver an already-compressed vector): passes through unchanged
    pre = rng.standard_normal(4)
    np.savetxt(tmp_path / "data.txt", pre)
    d, c, m, _ = _load_data_cov(params)
    np.testing.assert_allclose(d, pre)

    # any other length is an error, not a silent truncation
    np.savetxt(tmp_path / "data.txt", rng.standard_normal(5))
    with pytest.raises(ValueError, match="data vector has 5"):
        _load_data_cov(params)


def test_transform_matrix_end_to_end(tmp_path):
    """The compression hook must run through the FULL pipeline: theory
    outputs are compressed with the same T as data/cov (the emulator trains
    in the compressed space), not just the data loading.  4 raw points
    compressed to 2 by pair-averaging an identity theory on 2 parameters."""
    inputs = tmp_path / "inputs"
    inputs.mkdir()
    means4 = np.array([0.3, 0.3, -0.2, -0.2])  # raw 4-point data vector
    np.savetxt(inputs / "data.txt", np.stack([np.arange(4), means4], 1))
    np.savetxt(inputs / "cov.txt", 0.25 * np.eye(4))
    t = np.array([[0.5, 0.5, 0.0, 0.0], [0.0, 0.0, 0.5, 0.5]])
    np.savetxt(inputs / "t.txt", t)

    def theory4(params):
        def fn(x, outdirs):
            p = np.asarray(x[1], dtype=np.float64)
            return np.repeat(p, 2)  # 2 params -> 4 raw points

        return fn

    import sys

    sys.modules["_t4"] = type(sys)("_t4")
    sys.modules["_t4"].factory = theory4
    params = {
        "outdir": str(tmp_path / "out"),
        "base_dir": str(inputs),
        "data_file": "data.txt",
        "cov_file": "cov.txt",
        "cov_format": "dense",
        "transform_matrix_file": "t.txt",
        "theory": "_t4:factory",
        "nwalkers": 8,
        "trainingoption": 1,
        "num_epochs": 300,
        "batch_size": 25,
        "ntrainArr": [150, 150],
        "nvalArr": [30, 30],
        "nkeepArr": [1, 2],
        "ntimesArr": [2, 3],
        "ntautolArr": [0.5, 0.5],
        "meanshiftArr": [100, 100],
        "stdshiftArr": [100, 100],
        "temperatureArr": [2.0, 1.0],
        "seed": 3,
        "sampled_params": [
            {"param": "x0", "dist": "flat", "arg1": -2.0, "arg2": 2.0},
            {"param": "x1", "dist": "flat", "arg1": -2.0, "arg2": 2.0},
        ],
    }
    chain, _ = D.run_from_config(params, method="zeus")
    assert np.all(np.isfinite(chain))
    # training y files live in the COMPRESSED space (width 2, not 4)
    ty = np.load(tmp_path / "out" / "iter_0" / "train_samples_y.npy")
    assert ty.shape[1] == 2, ty.shape
    # posterior recovers the compressed data vector (identity-like problem;
    # compressed noise std ~0.35 per point, so 1.0 is a ~3-sigma guard at
    # this small budget)
    err = np.abs(chain.mean(axis=0) - np.array([0.3, -0.2]))
    assert np.all(err < 1.0), err




@pytest.mark.parametrize(
    "mod_name,shape",
    [("examples.des_theory", (27, 457)),
     ("examples.lsst_theory", (40, 1560)),
     ("examples.des4x2ptn_theory", (31, 630))],
)
def test_scaled_theory_full_rank_and_parity(mod_name, shape):
    """Every synthetic analysis class (DES-3x2pt, LSST-Y10-6x2pt+N,
    DES-4x2pt+N) must satisfy the same contracts: full-rank, moderately
    conditioned Fisher matrix (a rank-deficient map makes the true posterior
    exactly degenerate — unconvergeable by construction, as an earlier
    12-template version was); jax mirror agreeing with the numpy map;
    picklable theory callable for the pool fan-out."""
    import importlib
    import pickle

    import jax.numpy as jnp

    T = importlib.import_module(mod_name)

    assert (T.NDIM, T.NDATA) == shape
    truth = T.fiducial() + 0.05
    tv = T.data_vector(truth)
    sigma = T.noise_sigma(tv)
    eps = 1e-5
    J = np.zeros((T.NDATA, T.NDIM))
    for j in range(T.NDIM):
        e = np.zeros(T.NDIM)
        e[j] = eps
        J[:, j] = (T.data_vector(truth + e) - T.data_vector(truth - e)) / (2 * eps)
    F = J.T @ np.diag(1.0 / sigma**2) @ J
    w = np.linalg.eigvalsh(F)
    assert w[0] > 0
    assert w[-1] / w[0] < 1e4, f"ill-conditioned Fisher: {w[-1]/w[0]:.1e}"
    s = np.sqrt(np.diag(np.linalg.inv(F)))
    assert 0.005 < np.median(s) < 0.2

    # jax mirror parity (batched + single row)
    rng = np.random.default_rng(8)
    xs = rng.uniform(-0.5, 0.5, size=(3, T.NDIM))
    ref = np.stack([T.data_vector(x) for x in xs])
    got = np.asarray(T.data_vector_jax(jnp.asarray(xs, jnp.float32)))
    np.testing.assert_allclose(got, ref, rtol=2e-4, atol=2e-4)

    # the theory callable survives pickling (pool contract) and follows the
    # ([index, x], outdir) calling convention (reference util.py:768)
    theory = T.make_theory({})
    theory2 = pickle.loads(pickle.dumps(theory))
    np.testing.assert_array_equal(theory2([0, truth], None), tv)


@pytest.mark.parametrize(
    "yaml_name,theory_mod",
    [("des_synthetic.yaml", "examples.des_theory"),
     ("lsst_synthetic.yaml", "examples.lsst_theory"),
     ("des4x2ptn_synthetic.yaml", "examples.des4x2ptn_theory")],
)
def test_scaled_config_loads(yaml_name, theory_mod):
    """The scaled-analysis YAMLs are valid driver configs with shapes
    matching their theory modules."""
    import importlib

    from linna_tpu.config import yaml_load

    T = importlib.import_module(theory_mod)
    params = yaml_load(
        os.path.join(REPO, "examples", yaml_name),
        parent_dir=os.path.join(REPO, "examples"),
    )
    assert len(params["sampled_params"]) == T.NDIM
    assert params["theory"] == f"{theory_mod}:make_theory"
    mod_name, _, factory = params["theory"].partition(":")

    theory = getattr(importlib.import_module(mod_name), factory)(params)
    out = theory([0, np.zeros(T.NDIM)], None)
    assert out.shape == (T.NDATA,)


def test_bench_naming_contract():
    """bench_full and bench_exact_posterior link through bench_common's
    naming: the tag, the exact-posterior artifact filename and the default
    config must agree for every analysis class, or the emulator-bias
    decomposition silently compares different posteriors."""
    import bench_common as B

    assert B.theory_tag("examples.des_theory") == "des"
    assert B.theory_tag("examples.lsst_theory") == "lsst"
    assert B.exact_posterior_filename("des") == "EXACT_POSTERIOR.json"
    assert B.exact_posterior_filename("lsst") == "EXACT_POSTERIOR_LSST.json"
    for mod in ["examples.des_theory", "examples.lsst_theory",
                "examples.des4x2ptn_theory"]:
        tag = B.theory_tag(mod)
        cfg = os.path.join(REPO, B.default_config_yaml(tag))
        assert os.path.isfile(cfg), cfg
