"""Training-data loader robustness (linna_tpu/data.py): per-iteration best
points, one-parameter problems, artifact misalignment.  The reference's
loader (linna/util.py:1342-1408) crashes on the first two and silently
trains on the third."""

import numpy as np
import numpy.testing as npt
import pytest

from linna_tpu import data as D


def _write_split(outdir, name, x, y):
    outdir.mkdir(parents=True, exist_ok=True)
    np.savetxt(D.sample_x_path(str(outdir), name), x)
    np.save(D.sample_y_path(str(outdir), name), y)


def _write_iteration(outdir, n, ndim=2, ndata=3, seed=0):
    rng = np.random.default_rng(seed)
    for name, rows in (("train", n), ("val", max(n // 4, 1))):
        x = rng.uniform(-1, 1, (rows, ndim))
        _write_split(outdir, name, x, x @ rng.standard_normal((ndim, ndata)))


def test_usebest_skips_iterations_without_best_files(tmp_path):
    """Per-iteration nbest: iterations that ran with best points disabled
    contribute none instead of crashing the stack load."""
    dirs = [tmp_path / f"iter_{i}" for i in range(3)]
    for i, d in enumerate(dirs):
        _write_iteration(d, 8, seed=i)
    # only the last iteration generated optimizer-centred points
    rng = np.random.default_rng(9)
    bx = rng.uniform(-1, 1, (4, 2))
    by = bx @ rng.standard_normal((2, 3))
    _write_split(dirs[2], "best", bx, by)
    _write_split(dirs[2], "best_val", bx[:1], by[:1])

    stack = D.load_iteration_stack([str(d) for d in dirs], usebest=True)
    assert len(stack.train_x) == 3 * 8 + 4
    npt.assert_array_equal(stack.train_x[:4], bx)
    assert len(stack.val_x) == 3 * 2 + 1


def test_usebest_falls_back_to_best_when_no_best_val(tmp_path):
    d = tmp_path / "iter_0"
    _write_iteration(d, 8)
    rng = np.random.default_rng(3)
    bx = rng.uniform(-1, 1, (4, 2))
    _write_split(d, "best", bx, bx @ rng.standard_normal((2, 3)))
    stack = D.load_iteration_stack([str(d)], usebest=True)
    npt.assert_array_equal(stack.val_x[:4], bx)


def test_one_parameter_problem_loads_2d(tmp_path):
    """A single sampled parameter writes one-column files; np.loadtxt
    squeezes them to 1-D — the loader must restore (N, 1)."""
    d = tmp_path / "iter_0"
    _write_iteration(d, 6, ndim=1)
    stack = D.load_iteration_stack([str(d)])
    assert stack.train_x.shape == (6, 1)
    assert stack.val_x.shape[1] == 1


def test_single_row_files_are_kept(tmp_path):
    """The reference dropped single-row sample files (a workaround for the
    loadtxt squeeze); they are real data and must survive."""
    d0, d1 = tmp_path / "iter_0", tmp_path / "iter_1"
    _write_iteration(d0, 8, seed=0)
    rng = np.random.default_rng(5)
    x1 = rng.uniform(-1, 1, (1, 2))
    _write_split(d1, "train", x1, x1 @ rng.standard_normal((2, 3)))
    _write_split(d1, "val", x1, x1 @ rng.standard_normal((2, 3)))
    stack = D.load_iteration_stack([str(d0), str(d1)])
    assert len(stack.train_x) == 9
    npt.assert_array_equal(stack.train_x[-1:], x1)


def test_misaligned_artifacts_raise(tmp_path):
    d = tmp_path / "iter_0"
    _write_iteration(d, 8)
    # corrupt: y has one fewer row than x
    y = np.load(D.sample_y_path(str(d), "train"))
    np.save(D.sample_y_path(str(d), "train"), y[:-1])
    with pytest.raises(ValueError, match="misaligned"):
        D.load_iteration_stack([str(d)])


def test_empty_stack_raises_clearly(tmp_path):
    d = tmp_path / "iter_0"
    _write_split(d, "train", np.empty((0, 2)), np.empty((0, 3)))
    _write_split(d, "val", np.empty((0, 2)), np.empty((0, 3)))
    with pytest.raises(ValueError, match="no 'train' sample rows"):
        D.load_iteration_stack([str(d)])


def _write_iteration_with_sentinels(outdir, n, ndim=2, ndata=3, seed=0):
    rng = np.random.default_rng(seed)
    for name, rows in (("train", n), ("val", max(n // 4, 1))):
        x = rng.uniform(-1, 1, (rows, ndim))
        y = x @ rng.standard_normal((ndim, ndata))
        y[0, 0] = 5e10  # above the clip ceiling
        y[-1, -1] = -2e5  # below the clip floor
        _write_split(outdir, name, x, y)


def test_load_curated_stack_matches_uncached(tmp_path):
    """The cached fast path must reproduce curate(load_iteration_stack(...))
    exactly (up to the documented f32 y dtype)."""
    dirs = []
    for i in range(3):
        d = tmp_path / f"iter_{i}"
        _write_iteration_with_sentinels(d, 8 + i, seed=i)
        dirs.append(str(d))
    ref = D.curate(D.load_iteration_stack(dirs), ypositive=False)
    fast = D.load_curated_stack(dirs, ypositive=False)
    npt.assert_array_equal(fast.train_x, ref.train_x)
    npt.assert_array_equal(fast.val_x, ref.val_x)
    npt.assert_array_equal(fast.train_y, np.asarray(ref.train_y, np.float32))
    npt.assert_array_equal(fast.val_y, np.asarray(ref.val_y, np.float32))
    npt.assert_array_equal(fast.train_y_for_stats, ref.train_y_for_stats)


def test_load_curated_stack_matches_uncached_ypositive(tmp_path):
    """ypositive mode: failed rows dropped, stats sentinels median-replaced —
    identical to the uncached path."""
    dirs = []
    for i in range(2):
        d = tmp_path / f"iter_{i}"
        rng = np.random.default_rng(10 + i)
        for name, rows in (("train", 8), ("val", 3)):
            x = rng.uniform(-1, 1, (rows, 2))
            y = np.abs(x @ rng.standard_normal((2, 3))) + 0.1
            y[0] = 1e-30  # failed theory row (dropped)
            y[1, 2] = 1e-30  # surviving sentinel entry (stats median-replaced)
            _write_split(d, name, x, y)
        dirs.append(str(d))
    ref = D.curate(D.load_iteration_stack(dirs), ypositive=True)
    fast = D.load_curated_stack(dirs, ypositive=True)
    npt.assert_array_equal(fast.train_x, ref.train_x)
    npt.assert_array_equal(fast.train_y, np.asarray(ref.train_y, np.float32))
    npt.assert_array_equal(fast.val_y, np.asarray(ref.val_y, np.float32))
    npt.assert_allclose(fast.train_y_for_stats, ref.train_y_for_stats, rtol=2e-7)


def test_load_curated_stack_cache_invalidates_on_rewrite(tmp_path):
    d = tmp_path / "iter_0"
    _write_iteration(d, 6, seed=1)
    first = D.load_curated_stack([str(d)])
    # rewrite the training y with different content -> cache must refresh
    y2 = np.load(D.sample_y_path(str(d), "train")) + 1.0
    import os, time
    time.sleep(0.01)  # ensure a distinct mtime_ns
    np.save(D.sample_y_path(str(d), "train"), y2)
    second = D.load_curated_stack([str(d)])
    npt.assert_allclose(
        np.asarray(second.train_y, np.float64),
        np.asarray(first.train_y, np.float64) + 1.0,
        rtol=1e-6,
    )


def test_load_curated_stack_entries_are_readonly(tmp_path):
    d = tmp_path / "iter_0"
    _write_iteration(d, 6, seed=2)
    D.load_curated_stack([str(d)])
    entry = D._DIR_CACHE[str(d)][1]
    with pytest.raises(ValueError):
        entry[1][0, 0] = 99.0


def test_load_curated_stack_tolerates_empty_iteration(tmp_path):
    """A chisqcut can empty an iteration's split files in place; the cached
    loader must skip the (0, 1)-shaped arrays exactly as load_iteration_stack
    does instead of crashing the concatenate."""
    d0, d1 = tmp_path / "iter_0", tmp_path / "iter_1"
    _write_iteration(d0, 6, seed=0)
    _write_split(d1, "train", np.empty((0, 2)), np.empty((0, 3)))
    _write_split(d1, "val", np.empty((0, 2)), np.empty((0, 3)))
    dirs = [str(d0), str(d1)]
    ref = D.curate(D.load_iteration_stack(dirs))
    fast = D.load_curated_stack(dirs)
    npt.assert_array_equal(fast.train_x, ref.train_x)
    npt.assert_array_equal(fast.train_y, np.asarray(ref.train_y, np.float32))
    # every-iteration-empty still raises the clear error
    with pytest.raises(ValueError, match="no 'train' sample rows"):
        D.load_curated_stack([str(d1)])


def test_load_curated_stack_empty_first_iter_ypositive_stats(tmp_path):
    """Empty-first-iteration fallback: the stats set is rebuilt from the RAW
    f64 stack so the ypositive 1e-30 sentinel comparisons stay exact (an f32
    round-trip makes them silently never match)."""
    d0, d1 = tmp_path / "iter_0", tmp_path / "iter_1"
    _write_split(d0, "train", np.empty((0, 2)), np.empty((0, 3)))
    _write_split(d0, "val", np.empty((0, 2)), np.empty((0, 3)))
    rng = np.random.default_rng(7)
    x = rng.uniform(-1, 1, (8, 2))
    y = np.abs(x @ rng.standard_normal((2, 3))) + 0.1
    y[0] = 1e-30       # failed row: dropped everywhere
    y[1, 2] = 1e-30    # surviving sentinel: stats median-replaced
    _write_split(d1, "train", x, y)
    _write_split(d1, "val", x[:2], y[:2])
    dirs = [str(d0), str(d1)]
    ref = D.curate(D.load_iteration_stack(dirs), ypositive=True)
    fast = D.load_curated_stack(dirs, ypositive=True)
    assert np.all(fast.train_y_for_stats > 1e-29), "sentinel not replaced"
    npt.assert_allclose(fast.train_y_for_stats, ref.train_y_for_stats, rtol=2e-7)


def test_load_curated_stack_cache_catches_same_size_rewrite(tmp_path):
    """An in-place rewrite that preserves byte size and mtime must still
    invalidate the cache (content CRC in the key)."""
    import os
    d = tmp_path / "iter_0"
    _write_iteration(d, 6, seed=3)
    first = D.load_curated_stack([str(d)])
    ypath = D.sample_y_path(str(d), "train")
    st = os.stat(ypath)
    y2 = np.load(ypath) + 1.0
    np.save(ypath, y2)  # same shape/dtype -> same byte size
    os.utime(ypath, ns=(st.st_atime_ns, st.st_mtime_ns))  # forge mtime back
    second = D.load_curated_stack([str(d)])
    npt.assert_allclose(
        np.asarray(second.train_y, np.float64),
        np.asarray(first.train_y, np.float64) + 1.0,
        rtol=1e-6,
    )


def test_cache_key_covers_tail_and_middle_windows(tmp_path):
    """Same-size rewrites of a >12 KiB y file touching ONLY the final 4 KiB
    (tail-CRC path) or ONLY interior bytes outside head/tail (middle-CRC
    window) must each invalidate the cache."""
    import os
    d = tmp_path / "iter_0"
    n = 64  # 64 rows x 40 f64 cols = 20 KiB .npy body (> 12288 gate)
    rng = np.random.default_rng(11)
    x = rng.uniform(-1, 1, (n, 2))
    y = rng.standard_normal((n, 40))
    _write_split(d, "train", x, y)
    _write_split(d, "val", x[:4], y[:4])
    ypath = D.sample_y_path(str(d), "train")
    assert os.stat(ypath).st_size > 12288

    def rewrite(row):
        st = os.stat(ypath)
        y2 = np.load(ypath)
        y2[row] = y2[row] + 1.0
        np.save(ypath, y2)
        os.utime(ypath, ns=(st.st_atime_ns, st.st_mtime_ns))
        return y2

    D.load_curated_stack([str(d)])
    y_tail = rewrite(n - 1)  # last row lives in the final 4 KiB
    after_tail = D.load_curated_stack([str(d)])
    npt.assert_allclose(
        np.asarray(after_tail.train_y, np.float64), y_tail, rtol=1e-6
    )
    y_mid = rewrite(n // 2)  # interior row: outside head AND tail windows
    after_mid = D.load_curated_stack([str(d)])
    npt.assert_allclose(
        np.asarray(after_mid.train_y, np.float64), y_mid, rtol=1e-6
    )


def test_clear_cache_empties_dir_cache(tmp_path):
    d = tmp_path / "iter_0"
    _write_iteration(d, 4, seed=4)
    D.load_curated_stack([str(d)])
    assert D._DIR_CACHE
    D.clear_cache()
    assert not D._DIR_CACHE


def test_usebest_tolerates_empty_best_files(tmp_path):
    """chisqcut can legitimately empty the best-point files (the MAP search
    landed far off-data); the stack loader must then train on the ordinary
    rows instead of raising — the reference's len(_)>1 guards tolerate this
    (linna/util.py:1342-1373; found by the all-options flagship run)."""
    d = tmp_path / "iter_0"
    _write_iteration(d, 8, seed=9)
    # empty best split, as _chisqcut_files leaves it
    np.savetxt(D.sample_x_path(str(d), "best"), np.empty((0, 2)))
    np.save(D.sample_y_path(str(d), "best"), np.empty((0, 3)))
    np.savetxt(D.sample_x_path(str(d), "best_val"), np.empty((0, 2)))
    np.save(D.sample_y_path(str(d), "best_val"), np.empty((0, 3)))
    stack = D.load_iteration_stack([str(d)], usebest=True)
    assert len(stack.train_x) == 8
    fast = D.load_curated_stack([str(d)], usebest=True)
    assert len(fast.train_x) == 8
