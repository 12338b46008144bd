"""DAVIS J&F evaluation tests."""
import numpy as np

from neurips2023_soc_tpu.evaluation.davis import (
    db_eval_boundary,
    db_eval_iou,
    db_statistics,
    evaluate_sequences,
    evaluate_unsupervised,
)


def _clip_with_square(T, H, W, y0, x0, s):
    m = np.zeros((T, H, W), np.uint8)
    m[:, y0 : y0 + s, x0 : x0 + s] = 1
    return m


def test_iou_perfect_and_empty():
    gt = _clip_with_square(3, 32, 32, 4, 4, 10)
    np.testing.assert_allclose(db_eval_iou(gt, gt), 1.0)
    empty = np.zeros_like(gt)
    np.testing.assert_allclose(db_eval_iou(empty, empty), 1.0)  # empty == empty
    np.testing.assert_allclose(db_eval_iou(gt, empty), 0.0)


def test_boundary_perfect():
    gt = _clip_with_square(2, 64, 64, 10, 10, 20)
    np.testing.assert_allclose(db_eval_boundary(gt, gt), 1.0)


def test_boundary_offset_less_than_one():
    gt = _clip_with_square(1, 64, 64, 10, 10, 20)
    pred = _clip_with_square(1, 64, 64, 30, 30, 20)  # far away
    f = db_eval_boundary(gt, pred)
    assert f[0] < 0.2


def test_db_statistics_decay():
    vals = np.linspace(1.0, 0.0, 20)  # degrading quality
    m, r, d = db_statistics(vals)
    assert 0.45 < m < 0.55
    assert abs(r - 0.5) < 0.11
    assert d > 0.5  # strong decay


def test_unsupervised_matching_picks_best_proposal():
    gt = _clip_with_square(3, 32, 32, 4, 4, 10)[None]  # (1, T, H, W)
    good = _clip_with_square(3, 32, 32, 4, 4, 10)
    bad = _clip_with_square(3, 32, 32, 20, 20, 8)
    props = np.stack([bad, good])  # proposal 1 is the right one
    j, f = evaluate_unsupervised(gt, props)
    np.testing.assert_allclose(j[0], 1.0)
    np.testing.assert_allclose(f[0], 1.0)


def test_evaluate_sequences_global():
    gt = _clip_with_square(4, 32, 32, 4, 4, 10)[None]
    seqs = {"seq1": (gt, gt.copy())}
    out = evaluate_sequences(seqs, task="unsupervised")
    assert abs(out["global"]["J&F-Mean"] - 1.0) < 1e-6
    assert out["global"]["J-Recall"] == 1.0
