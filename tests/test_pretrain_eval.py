"""End-to-end RefCOCO-pretrain evaluation protocol over synthetic data."""
import numpy as np
import pytest

import jax

from neurips2023_soc_tpu.data.collate import collate_batch
from neurips2023_soc_tpu.data.synthetic import SyntheticRVOSDataset
from neurips2023_soc_tpu.evaluators import (
    build_a2d_gt_annotations,
    evaluate_coco_pretrain_batches,
)
from neurips2023_soc_tpu.models.soc import SOC
from neurips2023_soc_tpu.models.text_encoder import build_tokenizer
from neurips2023_soc_tpu.training.train_step import make_forward_fn


def test_pretrain_eval_protocol():
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
    forward = make_forward_fn(model)

    gt_anns = build_a2d_gt_annotations(ds)
    gt_boxes = {}
    for i in range(len(ds)):
        s = ds[i]
        gt_boxes[s["image_id"]] = s["boxes"][0]  # (1, 4) xyxy

    def batches():
        for start in range(0, len(ds), 2):
            yield collate_batch([ds[start], ds[start + 1]], tok,
                                size_buckets=((48, 64),), time_buckets=(4,))

    metrics = evaluate_coco_pretrain_batches(
        forward, params, batches(), gt_anns, gt_boxes
    )
    for key in ("mAP 0.5:0.95", "P@0.5", "recall@1", "recall@5",
                "bbox P@0.5", "bbox mean_iou"):
        assert key in metrics, key
        assert np.isfinite(metrics[key]), (key, metrics[key])
