"""COCO-protocol mAP evaluator tests against hand-computable scenarios."""
import numpy as np

from neurips2023_soc_tpu.evaluation.coco_eval import (
    evaluate_coco_map,
    precision_at_k_and_iou,
)
from neurips2023_soc_tpu.evaluation.rle import encode


def _sq(y0, x0, y1, x1, hw=(64, 64)):
    m = np.zeros(hw, np.uint8)
    m[y0:y1, x0:x1] = 1
    return encode(m)


def test_perfect_predictions_map_one():
    gts, dts = [], []
    for i in range(4):
        seg = _sq(5 * i, 5 * i, 5 * i + 20, 5 * i + 20)
        gts.append({"image_id": i, "segmentation": seg, "iscrowd": 0})
        dts.append({"image_id": i, "segmentation": seg, "score": 0.9})
    res = evaluate_coco_map(gts, dts)
    assert abs(res["mAP 0.5:0.95"] - 1.0) < 1e-6
    assert abs(res["AP 0.5"] - 1.0) < 1e-6


def test_three_of_four_correct():
    gts, dts = [], []
    for i in range(4):
        seg = _sq(10, 10, 40, 40)
        gts.append({"image_id": i, "segmentation": seg, "iscrowd": 0})
        if i < 3:
            dts.append({"image_id": i, "segmentation": seg, "score": 0.9})
        else:
            dts.append({"image_id": i, "segmentation": _sq(50, 50, 60, 60),
                        "score": 0.8})
    res = evaluate_coco_map(gts, dts)
    # precision 1.0 up to recall 0.75, zero beyond -> 76/101
    assert abs(res["AP 0.5"] - 76 / 101) < 1e-6
    assert abs(res["mAP 0.5:0.95"] - 76 / 101) < 1e-6


def test_lower_iou_prediction_drops_at_high_thresholds():
    gt_seg = _sq(0, 0, 30, 30)
    dt_seg = _sq(0, 0, 30, 24)  # IoU = 24/30 = 0.8
    gts = [{"image_id": 0, "segmentation": gt_seg, "iscrowd": 0}]
    dts = [{"image_id": 0, "segmentation": dt_seg, "score": 0.9}]
    res = evaluate_coco_map(gts, dts)
    assert abs(res["AP 0.5"] - 1.0) < 1e-6
    # thresholds above 0.8 fail: 7 of 10 pass
    assert abs(res["mAP 0.5:0.95"] - 0.7) < 1e-6


def test_precision_at_k_and_iou():
    gt_seg = _sq(0, 0, 30, 30)
    dt_seg = _sq(0, 0, 30, 24)  # IoU 0.8
    gts = [{"image_id": 0, "segmentation": gt_seg}]
    dts = [
        {"image_id": 0, "segmentation": dt_seg, "score": 0.9},
        {"image_id": 0, "segmentation": _sq(40, 40, 50, 50), "score": 0.1},
    ]
    out = precision_at_k_and_iou(gts, dts)
    assert out["P@0.5"] == 1.0 and out["P@0.7"] == 1.0
    # iou = 0.8 + eps counts as > 0.8 (reference's +1e-6 smoothing), 0.9 fails
    assert out["P@0.8"] == 1.0 and out["P@0.9"] == 0.0
    np.testing.assert_allclose(out["mean_iou"], 0.8, atol=1e-5)
    np.testing.assert_allclose(out["overall_iou"], 0.8, atol=1e-5)
