"""End-to-end A2D-protocol evaluation over the synthetic center-frame dataset."""
import numpy as np
import pytest

import jax

from neurips2023_soc_tpu.data.collate import collate_batch
from neurips2023_soc_tpu.data.synthetic import SyntheticRVOSDataset
from neurips2023_soc_tpu.evaluators import (
    build_a2d_evaluator,
    build_a2d_gt_annotations,
)
from neurips2023_soc_tpu.models.soc import SOC
from neurips2023_soc_tpu.models.text_encoder import build_tokenizer
from neurips2023_soc_tpu.training.train_step import make_forward_fn


def test_a2d_protocol_end_to_end():
    ds = SyntheticRVOSDataset(num_samples=4, num_frames=4,
                              frame_size=(48, 64), center_frame_only=True)
    tok = build_tokenizer("roberta-tiny", text_bucket=12)
    model = SOC(
        backbone_name="video-swin-t", d_model=64, num_queries=5,
        dim_feedforward=128, enc_layers=1, dec_layers=2,
        voc_enc_layers=1, voc_dec_layers=1, text_encoder_type="roberta-tiny",
        dropout=0.0,
    )
    b0 = collate_batch([ds[0], ds[1]], tok, size_buckets=((48, 64),),
                       time_buckets=(4,))
    params = model.init(jax.random.PRNGKey(0), b0["pixels"], b0["pad_mask"],
                        b0["text_ids"], b0["text_mask"])

    gts = build_a2d_gt_annotations(ds)
    assert len(gts) == 4
    assert all(g["area"] > 0 for g in gts)

    evaluate = build_a2d_evaluator(
        ds, tok, eval_batch_size=2,
        collate_kwargs=dict(size_buckets=((48, 64),), time_buckets=(4,)),
    )
    forward = make_forward_fn(model)
    metrics = evaluate(forward, params, epoch=0)

    assert "mAP 0.5:0.95" in metrics and "P@0.5" in metrics
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)
    # random weights -> near-zero mAP, but the protocol must run end to end
    assert 0.0 <= metrics["mAP 0.5:0.95"] <= 1.0


def test_write_coco_gt_json_round_trip(tmp_path):
    """The dataset_coco_gt_format_path JSON matches the reference's layout
    (create_gt_in_coco_format.py:43-95) and its RLEs decode back exactly."""
    import json

    from neurips2023_soc_tpu.evaluation.rle import decode, encode
    from neurips2023_soc_tpu.evaluators import write_coco_gt_json

    rng = np.random.RandomState(0)
    gts = []
    masks = []
    for i in range(3):
        m = (rng.rand(17, 23) > 0.6).astype(np.uint8)
        masks.append(m)
        gts.append({"image_id": f"img_{i}", "segmentation": encode(m),
                    "iscrowd": 0, "area": int(m.sum())})
    out = tmp_path / "gt.json"
    write_coco_gt_json(gts, str(out))
    d = json.loads(out.read_text())
    assert d["categories"] == [{"id": 1, "name": "dummy_class"}]
    assert [im["id"] for im in d["images"]] == ["img_0", "img_1", "img_2"]
    for i, ann in enumerate(d["annotations"]):
        assert ann["category_id"] == 1 and ann["iscrowd"] == 0
        assert isinstance(ann["segmentation"]["counts"], str)  # ascii, not bytes
        np.testing.assert_array_equal(decode(ann["segmentation"]), masks[i])
        ys, xs = np.nonzero(masks[i])
        assert ann["bbox"] == [float(xs.min()), float(ys.min()),
                               float(xs.max() - xs.min()),
                               float(ys.max() - ys.min())]


def test_predict_visualize(tmp_path):
    """-rm pred workflow (reference main.py:43 + predict.py:25-97): best
    mask overlaid on the denormalized annotated frame, one JPG per sample."""
    from neurips2023_soc_tpu.evaluators import run_predict_visualize

    ds = SyntheticRVOSDataset(num_samples=3, num_frames=4,
                              frame_size=(48, 64), center_frame_only=True)
    tok = build_tokenizer("roberta-tiny", text_bucket=12)
    model = SOC(
        backbone_name="video-swin-t", d_model=64, num_queries=5,
        dim_feedforward=128, enc_layers=1, dec_layers=2,
        voc_enc_layers=1, voc_dec_layers=1, text_encoder_type="roberta-tiny",
        dropout=0.0,
    )
    b0 = collate_batch([ds[0]], tok, size_buckets=((48, 64),),
                       time_buckets=(4,))
    params = model.init(jax.random.PRNGKey(0), b0["pixels"], b0["pad_mask"],
                        b0["text_ids"], b0["text_mask"])
    n = run_predict_visualize(
        make_forward_fn(model), params, ds, tok, str(tmp_path / "vis"),
        eval_batch_size=2,
        collate_kwargs=dict(size_buckets=((48, 64),), time_buckets=(4,)))
    assert n == 3
    files = sorted((tmp_path / "vis").rglob("*.jpg"))
    assert [f.name for f in files] == [f"synthetic_{i}.jpg" for i in range(3)]
    from PIL import Image

    for f, s in zip(files, [ds[i] for i in range(3)]):
        img = np.asarray(Image.open(f))
        assert img.shape == tuple(s["orig_size"]) + (3,)
