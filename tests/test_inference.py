"""Inference engine + submission plumbing tests (tiny model, CPU)."""
import numpy as np
import pytest

import jax

from neurips2023_soc_tpu.inference import (
    InferenceEngine,
    merge_davis_annotator,
    save_ytvos_predictions,
    shard_videos,
    zip_submission,
)
from neurips2023_soc_tpu.models.soc import SOC


@pytest.fixture(scope="module")
def engine():
    model = SOC(
        backbone_name="video-swin-t", d_model=64, num_queries=5,
        dim_feedforward=128, enc_layers=1, dec_layers=2,
        voc_enc_layers=1, voc_dec_layers=1, text_encoder_type="roberta-tiny",
        dropout=0.0,
    )
    px = np.zeros((4, 1, 48, 64, 3), np.float32)
    pad = np.zeros((4, 1, 48, 64), bool)
    ids = np.ones((1, 8), np.int32)
    msk = np.ones((1, 8), np.int32)
    params = model.init(jax.random.PRNGKey(0), px, pad, ids, msk)
    return InferenceEngine(
        model, params, text_encoder_type="roberta-tiny", text_bucket=8,
        time_buckets=(4,), size_buckets=((48, 64),),
    )


def test_whole_video_chunking(engine):
    frames = np.random.RandomState(0).randn(7, 40, 56, 3).astype(np.float32)
    masks = engine.infer_video(frames, "a thing", original_size=(80, 112))
    assert masks.shape == (7, 80, 112)
    assert masks.dtype == np.uint8
    probs = engine.infer_video(frames[:3], "a thing", original_size=(40, 56),
                               return_probs=True)
    assert probs.shape == (3, 40, 56) and probs.min() >= 0 and probs.max() <= 1


def test_whole_video_single_forward_fidelity(engine):
    """A video that fits the largest time bucket must produce EXACTLY the
    output of one whole-video forward (reference infer_refytb.py:206-214
    runs the entire video in one pass so VOC clusters over all T frames),
    and must NOT equal the chunked computation — demonstrating that VOC
    context length is a real behavioral degree of freedom the engine now
    preserves by defaulting to whole-video buckets."""
    frames = np.random.RandomState(1).randn(8, 48, 64, 3).astype(np.float32)

    whole = InferenceEngine(
        engine.model, engine.params, text_encoder_type="roberta-tiny",
        text_bucket=8, time_buckets=(4, 8), size_buckets=((48, 64),),
    )
    probs_whole = whole.infer_video(frames, "a thing", return_probs=True)

    # oracle: drive the model directly on the full 8-frame clip
    ids, msk = whole.tokenizer(["a thing"])
    run = whole._get_program()
    px = frames[:, None]
    pad = np.zeros((8, 1, 48, 64), bool)
    scores, logits, _ = run(whole.params, px, pad, ids, msk)
    q = int(np.asarray(scores).mean(0).argmax())
    from neurips2023_soc_tpu.ops import resize_bilinear
    import jax.numpy as jnp

    up = np.asarray(resize_bilinear(
        jnp.asarray(np.asarray(logits)[:, q]).astype(jnp.float32)[..., None],
        48, 64))[..., 0]
    want = 1.0 / (1.0 + np.exp(-np.clip(up, -30.0, 30.0)))
    np.testing.assert_allclose(probs_whole, want, rtol=1e-4, atol=1e-4)

    # chunked (2 x 4-frame forwards) diverges: VOC saw less temporal context
    probs_chunked = engine.infer_video(frames, "a thing", return_probs=True)
    assert np.abs(probs_chunked - probs_whole).max() > 1e-6


def test_davis_merge_background_wins_on_low_scores():
    t, h, w = 2, 8, 8
    obj1 = np.full((t, h, w), 0.4, np.float32)  # below 0.5 -> zeroed
    obj2 = np.zeros((t, h, w), np.float32)
    obj2[:, :4] = 0.9
    merged = merge_davis_annotator([obj1, obj2])
    assert (merged[:, :4] == 2).all()
    assert (merged[:, 4:] == 0).all()  # background (0.1) beats zeroed obj1


def test_ytvos_submission_zip(tmp_path):
    preds = [{
        "video_id": "vid1", "exp_id": "0",
        "frame_indices": ["00000", "00005"],
        "pred_masks": np.ones((2, 8, 8), np.uint8),
    }]
    save_ytvos_predictions(preds, str(tmp_path))
    z = zip_submission(str(tmp_path))
    import zipfile

    names = zipfile.ZipFile(z).namelist()
    assert "Annotations/vid1/0/00000.png" in names


def test_multi_expression_backbone_reuse_parity(engine):
    """infer_video_multi (backbone once + per-expression head on shared
    device features) must equal per-expression infer_video (fused clip
    program) — model.head(model.backbone_features(x)) == model(x)."""
    frames = np.random.RandomState(2).randn(6, 40, 56, 3).astype(np.float32)
    texts = ["a thing", "another longer thing"]
    multi = engine.infer_video_multi(
        frames, texts, original_size=(40, 56), return_probs=True)
    assert len(multi) == 2
    for text, got in zip(texts, multi):
        want = engine.infer_video(
            frames, text, original_size=(40, 56), return_probs=True)
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    # different expressions genuinely produce different outputs
    assert np.abs(multi[0] - multi[1]).max() > 1e-6


def test_group_davis_annotator_order():
    """The converted DAVIS exp-id layout is object-major (exp = obj*4 +
    anno, reference convert_davis_to_ytbs.py:165-177); the reference's
    annotator loop consumes i = obj_id*4 + anno_id (infer_davis.py:199).
    The stream reorder must therefore be annotator-major."""
    from neurips2023_soc_tpu.inference import group_davis_annotator_order

    # 2 objects x 4 annotation variants
    assert group_davis_annotator_order(list(range(8))) == [
        0, 4, 1, 5, 2, 6, 3, 7]
    # 1 object: identity (the regime the old sequential consumption
    # happened to get right)
    assert group_davis_annotator_order([10, 11, 12, 13]) == [10, 11, 12, 13]
    with pytest.raises(ValueError):
        group_davis_annotator_order(list(range(6)))


def test_shard_videos():
    items = list(range(10))
    s0 = shard_videos(items, num_shards=3, shard_id=0)
    s1 = shard_videos(items, num_shards=3, shard_id=1)
    s2 = shard_videos(items, num_shards=3, shard_id=2)
    assert sorted(s0 + s1 + s2) == items


def test_infer_video_return_boxes(engine):
    """Chosen-trajectory boxes come back as xyxy pixels at original size
    (reference infer_refytb.py:247 rescale_bboxes), clipped in-bounds."""
    frames = np.random.RandomState(0).rand(3, 48, 64, 3).astype(np.float32)
    masks, boxes = engine.infer_video(
        frames, "a thing", original_size=(96, 128), return_boxes=True)
    assert masks.shape == (3, 96, 128)
    assert boxes.shape == (3, 4) and boxes.dtype == np.float32
    assert (boxes[:, 0] <= boxes[:, 2]).all()
    assert (boxes[:, 1] <= boxes[:, 3]).all()
    assert boxes.min() >= 0
    assert (boxes[:, 0::2] <= 128).all() and (boxes[:, 1::2] <= 96).all()


def test_finish_video_box_rescale_content_smaller_than_bucket():
    """Boxes are cxcywh normalized by the resized CONTENT size (collate
    normalizes targets per-sample; reference datasets/transforms.py:383-400),
    so original-size pixels are box * (ow, oh) regardless of the padded
    bucket — regression for an extra W/fw over-scale that only showed when
    the content did not fill the size bucket (e.g. 4:3 video in a 16:9
    bucket)."""
    from neurips2023_soc_tpu.inference import InferenceEngine

    t, nq, fh, fw, H, W = 2, 3, 48, 64, 64, 128  # content fills half the W
    rs = np.random.RandomState(3)
    scores = rs.rand(t, nq).astype(np.float32)
    scores[:, 1] = 1.0  # query 1 wins
    logits = rs.randn(t, nq, H // 4, W // 4).astype(np.float32)
    boxes = np.zeros((t, nq, 4), np.float32)
    boxes[:, 1] = [0.5, 0.5, 0.5, 0.5]  # centered half-extent box
    oh, ow = 96, 128  # original is 2x the resized content
    _, got = InferenceEngine._finish_video(
        None, [scores], [logits], [boxes], fh, fw, H, W,
        (oh, ow), False, "video", True)
    want = np.array([[0.25 * ow, 0.25 * oh, 0.75 * ow, 0.75 * oh]] * t,
                    np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)
