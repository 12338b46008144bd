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
