"""Differential test of evaluation/coco_eval.py against an INDEPENDENT
clean-room transcription of the pycocotools COCOeval(useCats=0) algorithm
(reference protocol at /root/reference/datasets/coco/coco_eval.py +
pycocotools cocoeval.py). pycocotools itself is not installed in this image,
so the oracle here is a direct nested-loop transcription of its published
evaluateImg/accumulate logic operating on dense masks — structured completely
differently from the implementation under test — plus hand-derived exact AP
values for the simplest cases. Covers the adversarial corners VERDICT r2
named: crowd GT, break-on-ignored-gt, area-range ignores, score ties,
detections on GT-less images, maxDets truncation.

To close BASELINE.md obligations-ledger row 7 once pycocotools is
installable: replace `_oracle_map` below with a thin adapter that feeds the
same dense-mask cases through `pycocotools.cocoeval.COCOeval` (RLE-encode
dets/gts via evaluation.rle, useCats=0, the IOU_THRS/RECALL_THRS/AREA_RNGS
constants above match its defaults) and rerun this module unchanged — every
property/fuzz case then differentials against the REAL implementation."""
from collections import defaultdict

import numpy as np
import pytest

from neurips2023_soc_tpu.evaluation.coco_eval import evaluate_coco_map
from neurips2023_soc_tpu.evaluation.rle import encode as rle_encode

IOU_THRS = np.linspace(0.5, 0.95, 10)
RECALL_THRS = np.linspace(0.0, 1.0, 101)
AREA_RNGS = [("all", 0.0, 1e10), ("small", 0.0, 32.0 ** 2),
             ("medium", 32.0 ** 2, 96.0 ** 2), ("large", 96.0 ** 2, 1e10)]


# ---------------------------------------------------------------------------
# Oracle: nested-loop pycocotools transcription on dense masks
# ---------------------------------------------------------------------------

def _mask_iou(d, g, crowd):
    inter = float(np.logical_and(d, g).sum())
    if crowd:
        den = float(d.sum())  # crowd: intersection over DT area
    else:
        den = float(d.sum() + g.sum() - inter)
    return inter / den if den > 0 else 0.0


def _oracle_evaluate_img(dts, gts, a0, a1, max_dets=100):
    """pycocotools.cocoeval.COCOeval.evaluateImg, transcribed."""
    gtIg = [g["iscrowd"] == 1 or g["area"] < a0 or g["area"] > a1
            for g in gts]
    # sort gt: non-ignored first (stable)
    gtind = sorted(range(len(gts)), key=lambda i: gtIg[i])
    gts = [gts[i] for i in gtind]
    gtIg = [gtIg[i] for i in gtind]
    # sort dt by score desc (stable), truncate to maxDets
    dtind = sorted(range(len(dts)), key=lambda i: -dts[i]["score"])[:max_dets]
    dts = [dts[i] for i in dtind]

    T, D, G = len(IOU_THRS), len(dts), len(gts)
    gtm = np.zeros((T, G))
    dtm = np.zeros((T, D))
    dtIg = np.zeros((T, D), bool)
    for tind, t in enumerate(IOU_THRS):
        for dind, d in enumerate(dts):
            iou = min(t, 1 - 1e-10)
            m = -1
            for gind, g in enumerate(gts):
                if gtm[tind, gind] > 0 and g["iscrowd"] != 1:
                    continue
                if m > -1 and gtIg[m] == 0 and gtIg[gind] == 1:
                    break
                ov = _mask_iou(d["mask"], g["mask"], g["iscrowd"] == 1)
                if ov < iou:
                    continue
                iou = ov
                m = gind
            if m == -1:
                continue
            dtIg[tind, dind] = gtIg[m]
            dtm[tind, dind] = 1
            gtm[tind, m] = 1
    for dind, d in enumerate(dts):
        out = d["area"] < a0 or d["area"] > a1
        for tind in range(T):
            if dtm[tind, dind] == 0 and out:
                dtIg[tind, dind] = True
    return (dtm, dtIg, np.array([d["score"] for d in dts]),
            sum(1 for ig in gtIg if not ig))


def _oracle_map(gt_list, dt_list):
    """COCOeval.accumulate + summarize (useCats=0), transcribed."""
    gt_by_img, dt_by_img = defaultdict(list), defaultdict(list)
    for g in gt_list:
        gt_by_img[g["image_id"]].append(g)
    for d in dt_list:
        dt_by_img[d["image_id"]].append(d)
    img_ids = sorted(set(gt_by_img) | set(dt_by_img))

    out = {}
    for rng_name, a0, a1 in AREA_RNGS:
        per_img = [_oracle_evaluate_img(dt_by_img[i], gt_by_img[i], a0, a1)
                   for i in img_ids]
        npig = sum(e[3] for e in per_img)
        if npig == 0:
            out[rng_name] = -1.0
            continue
        dtm = np.concatenate([e[0] for e in per_img], 1)
        dtIg = np.concatenate([e[1] for e in per_img], 1)
        scores = np.concatenate([e[2] for e in per_img])
        order = np.argsort(-scores, kind="mergesort")
        dtm, dtIg = dtm[:, order], dtIg[:, order]
        aps = np.zeros(len(IOU_THRS))
        for tind in range(len(IOU_THRS)):
            tps = np.cumsum(np.logical_and(dtm[tind] == 1, ~dtIg[tind]))
            fps = np.cumsum(np.logical_and(dtm[tind] == 0, ~dtIg[tind]))
            rc = tps / npig
            pr = tps / (fps + tps + np.spacing(1))
            pr = pr.tolist()
            for i in range(len(pr) - 1, 0, -1):
                if pr[i] > pr[i - 1]:
                    pr[i - 1] = pr[i]
            q = np.zeros(len(RECALL_THRS))
            inds = np.searchsorted(rc, RECALL_THRS, side="left")
            for ri, pi in enumerate(inds):
                if pi < len(pr):
                    q[ri] = pr[pi]
            aps[tind] = q.mean()
        out[rng_name] = float(aps.mean())
    return out


# ---------------------------------------------------------------------------
# mask/annotation builders
# ---------------------------------------------------------------------------

def _box_mask(h, w, y0, y1, x0, x1):
    m = np.zeros((h, w), np.uint8)
    m[y0:y1, x0:x1] = 1
    return m


def _gt(image_id, mask, iscrowd=0):
    return {"image_id": image_id, "mask": mask.astype(bool),
            "segmentation": rle_encode(mask), "area": float(mask.sum()),
            "iscrowd": iscrowd}


def _dt(image_id, mask, score):
    return {"image_id": image_id, "mask": mask.astype(bool),
            "segmentation": rle_encode(mask), "area": float(mask.sum()),
            "score": score}


def _compare(gts, dts):
    got = evaluate_coco_map(gts, dts)
    want = _oracle_map(gts, dts)
    assert got["mAP 0.5:0.95"] == pytest.approx(want["all"], abs=1e-9)
    assert got["AP 0.5:0.95 S"] == pytest.approx(want["small"], abs=1e-9)
    assert got["AP 0.5:0.95 M"] == pytest.approx(want["medium"], abs=1e-9)
    assert got["AP 0.5:0.95 L"] == pytest.approx(want["large"], abs=1e-9)
    return got


def test_simple_exact_ap():
    """One perfect detection -> AP 1.0 (hand-derived)."""
    m = _box_mask(40, 40, 5, 25, 5, 25)
    got = _compare([_gt(1, m)], [_dt(1, m, 0.9)])
    assert got["mAP 0.5:0.95"] == pytest.approx(1.0)


def test_crowd_gt_absorbs_extra_detections():
    """Detections matching a crowd GT are neither TP nor FP, and a crowd GT
    can match any number of detections."""
    crowd = _box_mask(64, 64, 0, 40, 0, 40)
    real = _box_mask(64, 64, 44, 60, 44, 60)
    gts = [_gt(1, crowd, iscrowd=1), _gt(1, real)]
    dts = [
        _dt(1, real, 0.95),  # TP
        _dt(1, _box_mask(64, 64, 0, 20, 0, 20), 0.9),   # inside crowd
        _dt(1, _box_mask(64, 64, 20, 40, 20, 40), 0.85),  # also inside crowd
    ]
    got = _compare(gts, dts)
    # both crowd-matched dets ignored; one real TP over one real GT -> AP 1.0
    assert got["mAP 0.5:0.95"] == pytest.approx(1.0)


def test_break_on_ignored_gt_prefers_real_match():
    """Once a detection has a candidate non-ignored match, ignored GTs
    (sorted last) must not steal it even at higher IoU (the `break` in
    evaluateImg)."""
    # small real gt at IoU ~0.55 with det; crowd gt at IoU ~0.9 with det
    det = _box_mask(64, 64, 0, 30, 0, 22)
    real = _box_mask(64, 64, 0, 30, 0, 40)   # IoU(det, real) = 660/1200=0.55
    crowd = _box_mask(64, 64, 0, 30, 0, 24)  # crowd IoU = inter/area(det)=1.0
    gts = [_gt(1, real), _gt(1, crowd, iscrowd=1)]
    got = _compare(gts, [_dt(1, det, 0.9)])
    # at thresholds <=0.55 the det is a real TP (not ignored); above, it
    # falls to the crowd and is ignored -> AP = mean over thrs of 1[thr<=.55]
    n_tp_thrs = int((IOU_THRS <= 0.55 + 1e-9).sum())
    assert got["mAP 0.5:0.95"] == pytest.approx(n_tp_thrs / 10)


def test_area_range_ignores():
    """GT outside the range is ignored there; its matched det is removed
    rather than counted as FP."""
    small = _box_mask(100, 100, 0, 10, 0, 10)       # area 100 (small)
    large = _box_mask(100, 100, 0, 100, 0, 100)     # area 10000 (large)
    gts = [_gt(1, small), _gt(1, large)]
    dts = [_dt(1, small, 0.9), _dt(1, large, 0.8)]
    got = _compare(gts, dts)
    assert got["mAP 0.5:0.95"] == pytest.approx(1.0)
    assert got["AP 0.5:0.95 S"] == pytest.approx(1.0)
    assert got["AP 0.5:0.95 L"] == pytest.approx(1.0)
    assert got["AP 0.5:0.95 M"] == pytest.approx(-1.0)  # no gt in range


def test_detections_on_gtless_image_are_fps():
    """An image with detections but no GT contributes false positives
    (pycocotools walks the full image list)."""
    m = _box_mask(40, 40, 5, 25, 5, 25)
    gts = [_gt(1, m)]
    dts = [_dt(1, m, 0.9), _dt(2, m, 0.95)]  # image 2 has no GT
    got = _compare(gts, dts)
    # FP at rank 1 (higher score), TP at rank 2: precision at recall>0 = 1/2
    assert got["mAP 0.5:0.95"] == pytest.approx(0.5)


def test_score_ties_are_stable():
    """Equal scores must keep a deterministic (stable mergesort) order
    across the global accumulate."""
    m1 = _box_mask(40, 40, 0, 20, 0, 20)
    m2 = _box_mask(40, 40, 20, 40, 20, 40)
    gts = [_gt(1, m1), _gt(2, m2)]
    dts = [_dt(1, m1, 0.5), _dt(1, m2, 0.5), _dt(2, m2, 0.5)]
    _compare(gts, dts)


def test_maxdets_truncation():
    """Only the top-100 detections per image are evaluated."""
    m = _box_mask(40, 40, 5, 25, 5, 25)
    gts = [_gt(1, m)]
    # 120 junk detections above the real one in score
    junk = _box_mask(40, 40, 30, 32, 30, 32)
    dts = [_dt(1, junk, 0.99 - i * 1e-4) for i in range(120)]
    dts.append(_dt(1, m, 0.5))
    got = _compare(gts, dts)
    assert got["mAP 0.5:0.95"] == pytest.approx(0.0)  # TP truncated away


def test_randomized_differential():
    """Fuzz: random rectangles, scores, crowds and image sets must agree
    with the oracle exactly."""
    rng = np.random.RandomState(0)
    for trial in range(6):
        gts, dts = [], []
        for img in range(1, 4):
            for _ in range(rng.randint(0, 4)):
                y0, x0 = rng.randint(0, 40, 2)
                h, w = rng.randint(4, 60, 2)
                gts.append(_gt(img, _box_mask(96, 96, y0, min(y0 + h, 96),
                                              x0, min(x0 + w, 96)),
                               iscrowd=int(rng.rand() < 0.25)))
            for _ in range(rng.randint(0, 6)):
                y0, x0 = rng.randint(0, 40, 2)
                h, w = rng.randint(4, 60, 2)
                dts.append(_dt(img, _box_mask(96, 96, y0, min(y0 + h, 96),
                                              x0, min(x0 + w, 96)),
                               float(np.round(rng.rand(), 2))))
        if not any(g["iscrowd"] == 0 for g in gts):
            continue
        _compare(gts, dts)
