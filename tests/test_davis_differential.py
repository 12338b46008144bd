"""Differential J&F battery vs the ACTUAL reference davis2017 package.

The reference DAVIS evaluation (`/root/reference/davis2017/`) is pure
numpy/scipy/cv2 — unlike the torch model code it can be imported and run
directly as the oracle. These tests drive the repo's clean-room rebuild
(`neurips2023_soc_tpu/evaluation/davis.py`) and the reference package on the
same randomized masks and assert exact protocol agreement: per-frame J
(metrics.py:6-37), per-frame boundary F (metrics.py:40-121), db_statistics
mean/recall/decay incl. its +1e-10 binning quirk (utils.py:135-157), and the
unsupervised Hungarian proposal matching (evaluation.py:44-66).
"""
from __future__ import annotations

import sys
import types

import numpy as np
import pytest

from neurips2023_soc_tpu.evaluation.davis import (
    db_eval_boundary,
    db_eval_iou,
    db_statistics,
    evaluate_unsupervised,
)
from tests.ref_harness import install_reference

install_reference()

# The reference's F-measure imports skimage only for its disk footprint
# (metrics.py:84-87). skimage isn't in this image; provide the documented
# 3-line equivalent (skimage.morphology.disk: x^2+y^2 <= r^2 grid) so the
# reference code itself remains the oracle for everything else.
if "skimage" not in sys.modules:
    skimage = types.ModuleType("skimage")
    morph = types.ModuleType("skimage.morphology")

    def _disk(radius, dtype=np.uint8):
        L = np.arange(-radius, radius + 1)
        x, y = np.meshgrid(L, L)
        return ((x ** 2 + y ** 2) <= radius ** 2).astype(dtype)

    morph.disk = _disk
    skimage.morphology = morph
    sys.modules["skimage"] = skimage
    sys.modules["skimage.morphology"] = morph

from davis2017.evaluation import DAVISEvaluation as RefDAVISEvaluation  # noqa: E402
from davis2017.metrics import db_eval_boundary as ref_db_eval_boundary  # noqa: E402
from davis2017.metrics import db_eval_iou as ref_db_eval_iou  # noqa: E402
from davis2017.utils import db_statistics as ref_db_statistics  # noqa: E402


def _blob_masks(rng, T, H, W, n_blobs=2, p_empty=0.15):
    """(T, H, W) binary masks of random rectangles+disks; some frames empty."""
    out = np.zeros((T, H, W), bool)
    yy, xx = np.mgrid[:H, :W]
    for t in range(T):
        if rng.rand() < p_empty:
            continue
        for _ in range(rng.randint(1, n_blobs + 1)):
            if rng.rand() < 0.5:
                y0, x0 = rng.randint(0, H), rng.randint(0, W)
                h, w = rng.randint(1, H // 2 + 1), rng.randint(1, W // 2 + 1)
                out[t, y0 : y0 + h, x0 : x0 + w] = True
            else:
                cy, cx = rng.randint(0, H), rng.randint(0, W)
                r = rng.randint(1, max(2, min(H, W) // 3))
                out[t] |= (yy - cy) ** 2 + (xx - cx) ** 2 <= r ** 2
    return out


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize("use_void", [False, True])
def test_iou_differential(seed, use_void):
    rng = np.random.RandomState(seed)
    T, H, W = 7, 37, 53
    gt = _blob_masks(rng, T, H, W)
    pred = _blob_masks(rng, T, H, W)
    void = _blob_masks(rng, T, H, W, p_empty=0.5) if use_void else None
    ours = db_eval_iou(gt, pred, void)
    with np.errstate(divide="ignore", invalid="ignore"):
        ref = ref_db_eval_iou(gt, pred, void)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)
    # per-frame 2D scalar case must agree too (reference returns a 0-d value)
    for t in range(T):
        with np.errstate(divide="ignore", invalid="ignore"):
            r = ref_db_eval_iou(gt[t], pred[t], None if void is None else void[t])
        o = db_eval_iou(gt[t], pred[t], None if void is None else void[t])
        np.testing.assert_allclose(float(o), float(r), rtol=0, atol=1e-12)


@pytest.mark.parametrize("seed", [0, 1])
@pytest.mark.parametrize("bound_th", [0.008, 2])
def test_boundary_differential(seed, bound_th):
    rng = np.random.RandomState(seed)
    T, H, W = 5, 41, 61
    gt = _blob_masks(rng, T, H, W)
    pred = _blob_masks(rng, T, H, W)
    ours = db_eval_boundary(gt, pred, bound_th=bound_th)
    ref = ref_db_eval_boundary(gt, pred, bound_th=bound_th)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


def test_boundary_void_differential():
    rng = np.random.RandomState(7)
    T, H, W = 4, 29, 43
    gt = _blob_masks(rng, T, H, W)
    pred = _blob_masks(rng, T, H, W)
    void = _blob_masks(rng, T, H, W, p_empty=0.5)
    ours = db_eval_boundary(gt, pred, void)
    ref = ref_db_eval_boundary(gt, pred, void)
    np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


def test_boundary_empty_cases_differential():
    H, W = 24, 31
    empty = np.zeros((H, W), bool)
    full = np.zeros((H, W), bool)
    full[5:15, 6:20] = True
    for gt, pred in [(empty, empty), (empty, full), (full, empty), (full, full)]:
        ours = db_eval_boundary(gt[None], pred[None])
        ref = ref_db_eval_boundary(gt[None], pred[None])
        np.testing.assert_allclose(ours, ref, rtol=0, atol=1e-12)


@pytest.mark.parametrize("n", [1, 2, 4, 5, 9, 33])
def test_db_statistics_differential(n):
    rng = np.random.RandomState(n)
    vals = rng.rand(n)
    if n > 4:
        vals[rng.randint(0, n)] = np.nan  # void-frame NaNs hit the nanmean path
    ours = db_statistics(vals.copy())
    ref = ref_db_statistics(vals.copy())
    np.testing.assert_allclose(np.asarray(ours, float), np.asarray(ref, float),
                               rtol=0, atol=1e-12, equal_nan=True)


@pytest.mark.parametrize("seed,n_obj,n_prop", [(0, 2, 3), (1, 3, 2), (2, 1, 5), (3, 4, 4)])
def test_unsupervised_matching_differential(seed, n_obj, n_prop):
    """Proposal->object Hungarian matching incl. the pad-with-zero-proposals
    branch (reference evaluation.py:48-51)."""
    rng = np.random.RandomState(seed)
    T, H, W = 6, 33, 47
    gt = np.stack([_blob_masks(rng, T, H, W) for _ in range(n_obj)])
    pred = np.stack([_blob_masks(rng, T, H, W) for _ in range(n_prop)])
    ours_j, ours_f = evaluate_unsupervised(gt, pred)
    with np.errstate(divide="ignore", invalid="ignore"):
        ref_j, ref_f = RefDAVISEvaluation._evaluate_unsupervised(
            gt, pred.astype(float), None, ("J", "F")
        )
    np.testing.assert_allclose(ours_j, ref_j, rtol=0, atol=1e-12)
    np.testing.assert_allclose(ours_f, ref_f, rtol=0, atol=1e-12)
