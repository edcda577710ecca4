"""Training-data artifacts and curation.

File contract (kept byte-compatible with the reference so runs resume across
implementations): per-iteration directory ``iter_i/`` holding
``train_samples_x.txt`` / ``train_samples_y.npy`` / ``val_samples_x.txt`` /
``val_samples_y.npy`` (+ ``best_samples_*`` when optimizer-centred points are
enabled).  Reference: linna/util.py:1167-1258 (writers),
linna/util.py:1342-1438 (reader + outlier curation).

Curation mirrors linna/util.py:1410-1438: clip runaway theory outputs to
sentinel values, and in ``ypositive`` mode drop rows whose theory evaluation
failed entirely (all-1e-30).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import List, Optional, Sequence, Tuple

import numpy as np

__all__ = [
    "TrainingData",
    "sample_x_path",
    "sample_y_path",
    "save_samples_x",
    "save_samples_y",
    "load_iteration_stack",
    "curate",
]


def sample_x_path(outdir: str, name: str) -> str:
    """Parameter-sample filename for a split.  The reference names the
    best-point validation split ``best_samples_x_val.txt`` — suffix, not
    prefix (linna/util.py:1243-1252) — kept for byte-compatible resume."""
    if name == "best_val":
        return os.path.join(outdir, "best_samples_x_val.txt")
    return os.path.join(outdir, f"{name}_samples_x.txt")


def sample_y_path(outdir: str, name: str) -> str:
    """Theory-output filename for a split (see :func:`sample_x_path`)."""
    if name == "best_val":
        return os.path.join(outdir, "best_samples_y_val.npy")
    return os.path.join(outdir, f"{name}_samples_y.npy")


@dataclass
class TrainingData:
    """Curated training/validation arrays plus the subset used to fit the
    Y-standardization (the reference's ``train_y_last``: the *first*
    iteration's training outputs, linna/util.py:1365-1367,1449)."""

    train_x: np.ndarray
    train_y: np.ndarray
    val_x: np.ndarray
    val_y: np.ndarray
    train_y_for_stats: np.ndarray


def save_samples_x(outdir: str, name: str, x: np.ndarray) -> None:
    np.savetxt(os.path.join(outdir, f"{name}_samples_x.txt"), x)


def save_samples_y(outdir: str, name: str, y: np.ndarray) -> None:
    np.save(os.path.join(outdir, f"{name}_samples_y.npy"), y)


def _load_pairs(
    outdir_list: Sequence[str], name: str, skip_missing: bool = False
) -> Tuple[np.ndarray, np.ndarray]:
    """Stack a split across iteration directories.

    ``ndmin=2`` keeps one-parameter (single-column) and single-row files 2-D
    — the reference's ``len(_) > 1`` skip (linna/util.py:1347-1357) existed
    to work around np.loadtxt's squeeze and silently dropped both cases.
    ``skip_missing`` tolerates directories without the split's files (an
    iteration that ran with best points disabled).
    """
    xs: List[np.ndarray] = []
    ys: List[np.ndarray] = []
    for outdir in outdir_list:
        xpath = sample_x_path(outdir, name)
        ypath = sample_y_path(outdir, name)
        if skip_missing and not (os.path.isfile(xpath) and os.path.isfile(ypath)):
            continue
        x = np.loadtxt(xpath, ndmin=2)
        if x.size:
            xs.append(x)
        y = np.atleast_2d(np.load(ypath))
        if y.size:
            ys.append(y)
    if not xs or not ys:
        raise ValueError(
            f"no '{name}' sample rows found under {list(outdir_list)}"
        )
    x_all, y_all = np.concatenate(xs), np.concatenate(ys)
    if len(x_all) != len(y_all):
        raise ValueError(
            f"misaligned '{name}' artifacts: {len(x_all)} x rows vs "
            f"{len(y_all)} y rows across {list(outdir_list)}"
        )
    return x_all, y_all


def load_iteration_stack(
    outdir_list: Sequence[str], usebest: bool = False
) -> TrainingData:
    """Concatenate all iterations' train/val sets (reference
    linna/util.py:1342-1408); optionally prepend optimizer-centred ``best``
    points.  Iterations that ran with best points disabled (per-iteration
    ``nbest``) simply contribute none — the reference crashed on the missing
    files."""
    train_x, train_y = _load_pairs(outdir_list, "train")
    val_x, val_y = _load_pairs(outdir_list, "val")
    y_stats = np.load(os.path.join(outdir_list[0], "train_samples_y.npy"))
    if len(y_stats) == 0:
        y_stats = train_y
    if usebest:
        bx, by = _load_pairs(outdir_list, "best", skip_missing=True)
        train_x = np.concatenate([bx, train_x])
        train_y = np.concatenate([by, train_y])
        try:
            bvx, bvy = _load_pairs(outdir_list, "best_val", skip_missing=True)
        except ValueError:
            # pre-best_val artifact layout: validate on the best points
            bvx, bvy = bx, by
        val_x = np.concatenate([bvx, val_x])
        val_y = np.concatenate([bvy, val_y])
    return TrainingData(train_x, train_y, val_x, val_y, y_stats)


def curate(data: TrainingData, ypositive: bool = False) -> TrainingData:
    """Outlier clipping + failed-row removal (reference linna/util.py:1410-1438).

    ypositive: clip to [1e-30, 1e10]; rows whose mean equals 1e-30 (theory
    failure sentinel) are removed, and sentinel entries in the stats set are
    replaced by the per-column training median.
    default: train clipped to [-1e5, 1e10], val to [-1e5, 1e8].
    """
    train_x = np.array(data.train_x, dtype=np.float64)
    train_y = np.array(data.train_y, dtype=np.float64)
    val_x = np.array(data.val_x, dtype=np.float64)
    val_y = np.array(data.val_y, dtype=np.float64)
    y_stats = np.array(data.train_y_for_stats, dtype=np.float64)

    if ypositive:
        train_y = np.clip(train_y, 1e-30, 1e10)
        val_y = np.clip(val_y, 1e-30, 1e10)
        y_stats = np.clip(y_stats, 1e-30, None)
        good = np.mean(train_y, axis=1) != 1e-30
        train_x, train_y = train_x[good], train_y[good]
        goodv = np.mean(val_y, axis=1) != 1e-30
        val_x, val_y = val_x[goodv], val_y[goodv]
        good_s = np.mean(y_stats, axis=1) != 1e-30
        y_stats = y_stats[good_s]
        # surviving sentinel entries -> per-column median of the full train set
        # (linna/util.py:1446)
        col_median = np.median(train_y, axis=0)
        rows, cols = np.where(y_stats == 1e-30)
        y_stats[rows, cols] = col_median[cols]
    else:
        train_y = np.clip(train_y, -1e5, 1e10)
        val_y = np.clip(val_y, -1e5, 1e8)
        y_stats = np.clip(y_stats, -1e5, 1e10)
    return TrainingData(train_x, train_y, val_x, val_y, y_stats)
