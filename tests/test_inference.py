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


def test_eval_size_buckets_cover_both_orientations():
    from neurips2023_soc_tpu.inference import eval_size_buckets
    from neurips2023_soc_tpu.utils.padded import pick_size_bucket

    buckets = eval_size_buckets(360, 640)
    assert buckets == ((360, 640), (640, 360))
    assert pick_size_bucket(360, 640, buckets) == (360, 640)  # landscape
    assert pick_size_bucket(391, 360, buckets) == (640, 360)  # portrait
    assert pick_size_bucket(360, 360, buckets) == (360, 640)  # square
    assert eval_size_buckets(416, 416) == ((416, 416),)


def test_portrait_video_inference(engine):
    """A portrait video (resized long-side-vertical, the orientation the
    reference's dynamic NestedTensor padding absorbs implicitly) must route
    to the transposed size bucket and produce output identical to an engine
    whose ONLY bucket is the portrait one."""
    frames = np.random.RandomState(9).randn(3, 60, 44, 3).astype(np.float32)

    both = InferenceEngine(
        engine.model, engine.params, text_encoder_type="roberta-tiny",
        text_bucket=8, time_buckets=(4,), size_buckets=((48, 64), (64, 48)),
    )
    got = both.infer_video(frames, "a thing", original_size=(120, 88),
                           return_probs=True)
    assert got.shape == (3, 120, 88)

    portrait_only = InferenceEngine(
        engine.model, engine.params, text_encoder_type="roberta-tiny",
        text_bucket=8, time_buckets=(4,), size_buckets=((64, 48),),
    )
    want = portrait_only.infer_video(frames, "a thing",
                                     original_size=(120, 88),
                                     return_probs=True)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)

    # landscape frames through the same two-bucket engine still work
    land = np.random.RandomState(10).randn(3, 44, 60, 3).astype(np.float32)
    assert both.infer_video(land, "a thing").shape == (3, 44, 60)


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


def test_box_rescale_content_smaller_than_bucket():
    """Boxes are cxcywh normalized by the resized CONTENT size (collate
    normalizes targets per-sample; reference datasets/transforms.py:383-400),
    so original-size pixels are box * (ow, oh) regardless of the padded
    bucket — regression for an extra W/fw over-scale that only showed when
    the content did not fill the size bucket (e.g. 4:3 video in a 16:9
    bucket)."""
    from neurips2023_soc_tpu.inference import _cxcywh_to_xyxy_pixels

    t = 2
    boxes = np.tile(np.array([0.5, 0.5, 0.5, 0.5], np.float32), (t, 1))
    oh, ow = 96, 128  # original is 2x the resized content
    got = _cxcywh_to_xyxy_pixels(boxes, oh, ow)
    want = np.array([[0.25 * ow, 0.25 * oh, 0.75 * ow, 0.75 * oh]] * t,
                    np.float32)
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_device_resident_logits_and_finalize(engine):
    """VERDICT r4 #1: the engine must not fetch all-Nq mask logits to the
    host. _collect_video fetches only (t, Nq) scores + (t, Nq, 4) boxes per
    chunk; masks come back already finalized (gathered/upsampled/thresholded
    on device). Verify by intercepting the handle mid-flight and checking
    types, then that 'video' and 'chunk' trajectories both work end-to-end."""
    frames = np.random.RandomState(5).randn(7, 48, 64, 3).astype(np.float32)
    handle = engine._dispatch_video(frames, ["a thing"],
                                    original_size=(96, 128))
    # the dispatched chunk outputs are device arrays, not numpy
    for outs, _t in handle["chunks"]:
        for sc, lg, bx in outs:
            assert isinstance(lg, jax.Array)
    (masks,) = engine._collect_video(handle)
    assert masks.shape == (7, 96, 128) and masks.dtype == np.uint8

    # per-chunk trajectory (DAVIS path) through the same machinery
    probs = engine.infer_video(frames, "a thing", original_size=(48, 64),
                               trajectory="chunk", return_probs=True)
    assert probs.shape == (7, 48, 64)
    assert probs.min() >= 0 and probs.max() <= 1


def test_uint8_frames_normalize_on_device_parity(engine):
    """uint8 frames (raw resized pixels) must produce the same result as the
    float path fed the SAME pixels normalized on the host — the on-device
    normalize + zeroed padding is bit-compatible with the dataset's
    normalize + zero pad buffer (host->device transfer shrinks 4x)."""
    from neurips2023_soc_tpu.inference import _IMAGENET_MEAN, _IMAGENET_STD

    rs = np.random.RandomState(8)
    u8 = rs.randint(0, 256, (5, 40, 56, 3)).astype(np.uint8)
    f32 = ((u8.astype(np.float32) / 255.0) - _IMAGENET_MEAN) / _IMAGENET_STD

    got = engine.infer_video(u8, "a thing", original_size=(40, 56),
                             return_probs=True)
    want = engine.infer_video(f32, "a thing", original_size=(40, 56),
                              return_probs=True)
    # the in-graph normalize differs from the host pass by float rounding
    # (~1e-7 on inputs), which the network amplifies to ~2e-3 on output
    # probabilities — identical semantics, loose float tolerance
    np.testing.assert_allclose(got, want, rtol=1e-2, atol=5e-3)

    # multi-expression split path too
    (got2,) = engine.infer_video_multi(u8, ["a thing", "b thing"][:1],
                                       original_size=(40, 56),
                                       return_probs=True)
    np.testing.assert_allclose(got2, want, rtol=1e-2, atol=5e-3)
    multi = engine.infer_video_multi(u8, ["a thing", "another thing"],
                                     original_size=(40, 56),
                                     return_probs=True)
    np.testing.assert_allclose(multi[0], want, rtol=1e-2, atol=5e-3)


def test_pack_masks_parity(engine):
    """pack_masks=True (the default: device bit-pack, 8x smaller fetch,
    np.unpackbits on host) must return masks IDENTICAL to the plain uint8
    path (pack_masks=False), including a width that is not a multiple of 8
    and an original-size resize."""
    from neurips2023_soc_tpu.inference import InferenceEngine

    plain_engine = InferenceEngine(
        engine.model, engine.params, text_encoder_type="roberta-tiny",
        text_bucket=8, time_buckets=(4,), size_buckets=((48, 64),),
        pack_masks=False,
    )
    frames = np.random.RandomState(9).randn(5, 40, 56, 3).astype(np.float32)
    for osize in ((40, 56), (77, 101)):  # 101 % 8 != 0
        want = plain_engine.infer_video(frames, "a thing", original_size=osize)
        got = engine.infer_video(frames, "a thing", original_size=osize)
        assert got.dtype == np.uint8 and got.shape == want.shape
        np.testing.assert_array_equal(got, want)
    # probs path is unaffected by the flag
    pw = plain_engine.infer_video(frames, "a thing", original_size=(40, 56),
                                  return_probs=True)
    pg = engine.infer_video(frames, "a thing", original_size=(40, 56),
                            return_probs=True)
    np.testing.assert_allclose(pg, pw, rtol=1e-5, atol=1e-6)


def test_infer_videos_pipelined_order(engine):
    """infer_videos yields results in input order and matches the sync
    path exactly (depth-1 pipelining must not change numerics)."""
    rs = np.random.RandomState(6)
    vids = [rs.randn(t, 48, 64, 3).astype(np.float32) for t in (3, 5, 4)]
    items = [dict(frames=v, texts=["a thing"], original_size=(48, 64),
                  return_probs=True) for v in vids]
    got = list(engine.infer_videos(iter(items), depth=1))
    for item, res in zip(items, got):
        (want,) = engine.infer_video_multi(**item)
        np.testing.assert_allclose(res[0], want, rtol=1e-5, atol=1e-5)


def test_engine_pool_multi_device_parity(engine):
    """EnginePool: engines pinned per device produce identical results to a
    single engine, every device's params replica is actually committed to
    its device, and the jitted programs execute there (VERDICT r4 #2:
    single-process multi-chip must not leave chips idle)."""
    from neurips2023_soc_tpu.inference import EnginePool

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs >=2 devices (virtual CPU mesh)")
    pool = EnginePool(
        engine.model, engine.params, devices=devices[:4],
        text_encoder_type="roberta-tiny", text_bucket=8,
        time_buckets=(4,), size_buckets=((48, 64),),
    )
    for eng, dev in zip(pool.engines, devices[:4]):
        leaf = jax.tree_util.tree_leaves(eng.params)[0]
        assert leaf.devices() == {dev}

    rs = np.random.RandomState(7)
    vids = [rs.randn(4, 48, 64, 3).astype(np.float32) for _ in range(6)]
    items = [dict(frames=v, texts=["a thing"], original_size=(48, 64),
                  return_probs=True) for v in vids]

    def fn(eng, item):
        return eng.infer_video_multi(**item)

    got = pool.map_videos(items, fn)
    for item, res in zip(items, got):
        (want,) = engine.infer_video_multi(**item)
        np.testing.assert_allclose(res[0], want, rtol=1e-4, atol=1e-4)
    # engines 0..3 all saw work (6 items round-robin over 4 engines) and
    # their finalize outputs were computed on their own devices
    for eng in pool.engines[:2]:
        assert any(k.startswith(("clip_sel", "clip")) for k in eng._jitted)


def test_engine_pool_update_params_skips_identical(engine):
    """update_params with the very object the pool already pinned is a no-op
    (the trainer's first per-epoch eval used to repeat a multi-GB
    host->device transfer per chip right after construction); a NEW params
    object re-pins every engine."""
    import jax.numpy as jnp

    from neurips2023_soc_tpu.inference import EnginePool

    devices = jax.devices()
    if len(devices) < 2:
        pytest.skip("needs >=2 devices (virtual CPU mesh)")
    pool = EnginePool(
        engine.model, engine.params, devices=devices[:2],
        text_encoder_type="roberta-tiny", text_bucket=8,
        time_buckets=(4,), size_buckets=((48, 64),),
    )
    sentinels = [eng.params for eng in pool.engines]
    pool.update_params(engine.params)  # same object -> nothing re-pinned
    for eng, s in zip(pool.engines, sentinels):
        assert eng.params is s
    fresh = jax.tree_util.tree_map(lambda x: x + 0, engine.params)
    pool.update_params(fresh)  # new object -> every engine re-pinned
    for eng, s, d in zip(pool.engines, sentinels, devices[:2]):
        assert eng.params is not s
        leaf = jax.tree_util.tree_leaves(eng.params)[0]
        assert leaf.devices() == {d}
    del jnp


def test_engine_pool_sharded_params_fallback(engine, monkeypatch):
    """Model-parallel (genuinely sharded) params have no per-device replica:
    the pool degrades to ONE engine executing the global arrays instead of
    raising mid-training (per-epoch YTVOS eval under a sharded run). The
    sharded condition itself only arises multi-host, so it is simulated by
    forcing _local_replica's no-replica signal."""
    from neurips2023_soc_tpu.inference import EnginePool

    monkeypatch.setattr(EnginePool, "_local_replica",
                        staticmethod(lambda params: None))
    pool = EnginePool(
        engine.model, engine.params,
        text_encoder_type="roberta-tiny", text_bucket=8,
        time_buckets=(4,), size_buckets=((48, 64),),
    )
    assert len(pool.engines) == 1 and pool.devices == [None]
    rs = np.random.RandomState(3)
    v = rs.randn(4, 48, 64, 3).astype(np.float32)
    (res,) = pool.engines[0].infer_video_multi(
        frames=v, texts=["a thing"], original_size=(48, 64),
        return_probs=True)
    want = engine.infer_video(v, "a thing", original_size=(48, 64),
                              return_probs=True)
    np.testing.assert_allclose(res, want, rtol=1e-5, atol=1e-5)
    # update_params keeps working in the degraded mode
    fresh = jax.tree_util.tree_map(lambda x: x + 0, engine.params)
    pool.update_params(fresh)
    assert pool.engines[0].params is fresh


def test_run_videos_pipelined_parity_and_order(engine):
    """run_videos_pipelined (the CLI/evaluator consumption loop): results
    come back in input order, match the sync path exactly, the item_fn
    aux-stash pattern works, and the EnginePool variant fans over devices
    with identical outputs."""
    from neurips2023_soc_tpu.inference import EnginePool, run_videos_pipelined

    rs = np.random.RandomState(11)
    vids = [rs.randn(t, 48, 64, 3).astype(np.float32) for t in (3, 4, 2, 4, 3)]
    items = [{"i": i, "frames": v} for i, v in enumerate(vids)]

    def item_fn(w):
        w["aux"] = w["i"] * 10  # side data for post_fn, stashed on the item
        return dict(frames=w["frames"], texts=["a thing"],
                    original_size=(48, 64), return_probs=True)

    def post_fn(w, results):
        return (w["aux"], results[0])

    got = run_videos_pipelined(engine, items, item_fn, post_fn)
    for i, (aux, probs) in enumerate(got):
        assert aux == i * 10
        want = engine.infer_video(vids[i], "a thing", original_size=(48, 64),
                                  return_probs=True)
        np.testing.assert_allclose(probs, want, rtol=1e-5, atol=1e-5)

    if len(jax.devices()) >= 2:
        pool = EnginePool(
            engine.model, engine.params, devices=jax.devices()[:3],
            text_encoder_type="roberta-tiny", text_bucket=8,
            time_buckets=(4,), size_buckets=((48, 64),),
        )
        got_pool = run_videos_pipelined(pool, items, item_fn, post_fn)
        for (a, p), (b, q) in zip(got, got_pool):
            assert a == b
            np.testing.assert_allclose(p, q, rtol=1e-4, atol=1e-4)


def test_run_videos_pipelined_engines_run_concurrently():
    """The pool variant of run_videos_pipelined must actually OVERLAP
    engine execution (one worker thread per engine), not serialize the
    round-robin shares — the property that makes one host's N chips ~N×
    one-chip video throughput (VERDICT r4 #2). Instrumented fake engines
    record execution windows; with 4 engines × 2 items each of ~0.15 s,
    overlap is asserted structurally (windows on different engines
    intersect), not via a flaky total-wall-time bound."""
    import time

    from neurips2023_soc_tpu.inference import EnginePool, run_videos_pipelined

    windows = []  # (engine_id, start, end) — appends are GIL-atomic

    class FakeEngine:
        def __init__(self, eid):
            self.eid = eid

        def infer_videos(self, items, depth=1):
            for item in items:
                t0 = time.monotonic()
                time.sleep(0.15)
                windows.append((self.eid, t0, time.monotonic()))
                yield [("done", self.eid, item["tag"])]

    pool = EnginePool.__new__(EnginePool)  # bypass __init__: fakes, no model
    pool.engines = [FakeEngine(i) for i in range(4)]

    items = [{"tag": i} for i in range(8)]
    got = run_videos_pipelined(
        pool, items,
        lambda w: {"tag": w["tag"]},
        lambda w, res: res[0])

    # results in input order, item i handled by engine i % 4 (round-robin)
    assert [r[2] for r in got] == list(range(8))
    assert [r[1] for r in got] == [i % 4 for i in range(8)]
    # execution windows on DIFFERENT engines overlap in time
    overlaps = sum(
        1
        for i, (e1, s1, f1) in enumerate(windows)
        for e2, s2, f2 in windows[i + 1:]
        if e1 != e2 and max(s1, s2) < min(f1, f2)
    )
    assert overlaps >= 4, f"engines serialized: {windows}"


def test_fused_single_chunk_parity(engine):
    """Single-chunk videos run the FUSED program (in-graph selection +
    finalize, one dispatch / one fetch per expression). It must be
    bit-identical to the generic chunked path (fuse=False) across masks,
    probs, boxes, t < bucket (masked score mean), and multi-expression."""
    frames = np.random.RandomState(7).randn(3, 48, 64, 3).astype(np.float32)
    texts = ["a red thing", "something on the left"]

    fused = engine.infer_video_multi(
        frames, texts, original_size=(80, 112), return_boxes=True)
    handle = engine._dispatch_video(
        frames, texts, original_size=(80, 112), return_boxes=True,
        fuse=False)
    legacy = engine._collect_video(handle)

    for (mf, bf), (ml, bl) in zip(fused, legacy):
        np.testing.assert_array_equal(mf, ml)
        np.testing.assert_allclose(bf, bl, atol=1e-5)

    # probs path (DAVIS merging) — float outputs, no packing
    pf = engine.infer_video(frames, texts[0], return_probs=True)
    h = engine._dispatch_video(frames, [texts[0]], return_probs=True,
                               fuse=False)
    pl = engine._collect_video(h)[0]
    np.testing.assert_array_equal(pf, pl)


def test_fused_uint8_and_pad_cache(engine):
    """Fused path with uint8 frames (normalize-on-device) matches the
    fuse=False path, and the device pad-mask cache is populated and reused
    across dispatches of the same bucket geometry."""
    rng = np.random.RandomState(9)
    frames = rng.randint(0, 256, (4, 48, 64, 3), np.uint8)
    a = engine.infer_video(frames, "a thing")
    n_pads = len(engine._pad_cache)
    assert n_pads >= 1
    h = engine._dispatch_video(frames, ["a thing"], fuse=False)
    b = engine._collect_video(h)[0]
    np.testing.assert_array_equal(a, b)
    # same geometry -> no new pad buffer
    engine.infer_video(frames, "a different thing")
    assert len(engine._pad_cache) == n_pads


def test_yuv420_input_parity(engine):
    """(y, u, v) uint8 YUV420p plane input — HALF the host->device pixel
    bytes — must match feeding the host-converted equivalent through the
    f32 path: the nearest-upsample + BT.601 matrix moves onto the device,
    the information content is identical."""
    from neurips2023_soc_tpu.inference import rgb_to_yuv420

    rng = np.random.RandomState(13)
    rgb = rng.randint(0, 256, (4, 48, 64, 3), np.uint8)
    y, u, v = rgb_to_yuv420(rgb)
    assert y.shape == (4, 48, 64) and u.shape == v.shape == (4, 24, 32)

    # host reference of the SAME decode (nearest chroma upsample, JFIF
    # full-range BT.601, clip, ImageNet normalize) through the f32 path
    uf = np.repeat(np.repeat(u.astype(np.float32), 2, 1), 2, 2) - 128.0
    vf = np.repeat(np.repeat(v.astype(np.float32), 2, 1), 2, 2) - 128.0
    yf = y.astype(np.float32)
    r = yf + 1.402 * vf
    g = yf - 0.344136 * uf - 0.714136 * vf
    b = yf + 1.772 * uf
    rgbf = np.clip(np.stack([r, g, b], -1), 0, 255) / 255.0
    mean = np.array([0.485, 0.456, 0.406], np.float32)
    std = np.array([0.229, 0.224, 0.225], np.float32)
    f32_frames = ((rgbf - mean) / std).astype(np.float32)

    p_yuv = engine.infer_video((y, u, v), "a thing", return_probs=True)
    p_f32 = engine.infer_video(f32_frames, "a thing", return_probs=True)
    np.testing.assert_allclose(p_yuv, p_f32, atol=2e-3)
    assert ((p_yuv > 0.5) == (p_f32 > 0.5)).mean() > 0.999

    # multi-chunk (7 frames, bucket 4) yuv path: shape/protocol sanity
    rgb2 = rng.randint(0, 256, (7, 48, 64, 3), np.uint8)
    out = engine.infer_video(rgb_to_yuv420(rgb2), "a thing")
    assert out.shape == (7, 48, 64) and out.dtype == np.uint8


def test_pixel_format_yuv420_option(engine):
    """pixel_format='yuv420' converts incoming uint8 RGB to YUV420p planes
    on the host before upload (half the bytes) — identical to converting
    explicitly and passing the planes."""
    from neurips2023_soc_tpu.inference import InferenceEngine, rgb_to_yuv420

    eng = InferenceEngine(
        engine.model, engine.params, text_encoder_type="roberta-tiny",
        text_bucket=8, time_buckets=(4,), size_buckets=((48, 64),),
        pixel_format="yuv420",
    )
    rgb = np.random.RandomState(21).randint(0, 256, (4, 48, 64, 3), np.uint8)
    got = eng.infer_video(rgb, "a thing")
    want = engine.infer_video(rgb_to_yuv420(rgb), "a thing")
    np.testing.assert_array_equal(got, want)
    with pytest.raises(ValueError):
        InferenceEngine(engine.model, engine.params,
                        text_encoder_type="roberta-tiny", text_bucket=8,
                        pixel_format="bgr")


def test_probs_dtype_wire_formats(engine):
    """probs_dtype='bfloat16'/'uint8' shrink the probability fetch 2x/4x;
    results convert back to float32 in [0, 1] within the quantization step
    of the wire format (exact default stays float32)."""
    from neurips2023_soc_tpu.inference import InferenceEngine

    frames = np.random.RandomState(3).randn(4, 48, 64, 3).astype(np.float32)
    want = engine.infer_video(frames, "a thing", return_probs=True)
    kw = dict(text_encoder_type="roberta-tiny", text_bucket=8,
              time_buckets=(4,), size_buckets=((48, 64),))
    for dtype, atol in (("bfloat16", 4e-3), ("uint8", 1.0 / 509)):
        eng = InferenceEngine(engine.model, engine.params,
                              probs_dtype=dtype, **kw)
        got = eng.infer_video(frames, "a thing", return_probs=True)
        assert got.dtype == np.float32
        assert got.min() >= 0.0 and got.max() <= 1.0
        np.testing.assert_allclose(got, want, atol=atol)
        # thresholded masks are NOT affected by probs_dtype
        np.testing.assert_array_equal(
            eng.infer_video(frames, "a thing"),
            engine.infer_video(frames, "a thing"))
    with pytest.raises(ValueError):
        InferenceEngine(engine.model, engine.params, probs_dtype="f16", **kw)


def test_unknown_trajectory_rejected(engine):
    frames = np.zeros((2, 48, 64, 3), np.float32)
    with pytest.raises(ValueError, match="trajectory"):
        engine.infer_video(frames, "a thing", trajectory="Video")


def test_chunk_trajectory_fused_parity(engine):
    """trajectory='chunk' selection never crosses chunks, so MULTI-chunk
    videos also run the fused per-chunk path (eager finalize: at most one
    chunk's all-query logits device-resident, zero score/boxes fetches).
    Must match the legacy fuse=False computation exactly."""
    frames = np.random.RandomState(17).randn(7, 48, 64, 3).astype(np.float32)
    fm, fb = engine.infer_video(frames, "a thing", trajectory="chunk",
                                return_boxes=True)
    h = engine._dispatch_video(frames, ["a thing"], trajectory="chunk",
                               return_boxes=True, fuse=False)
    lm, lb = engine._collect_video(h)[0]
    np.testing.assert_array_equal(fm, lm)
    np.testing.assert_allclose(fb, lb, atol=1e-5)


def test_multichunk_video_selection_on_device(engine):
    """Multi-chunk trajectory='video' selects the trajectory ON DEVICE
    (masked per-chunk score sums + argmax, zero score fetches). Must match
    a host-numpy transcription of the reference protocol — fetch every
    chunk's scores, mean over all real frames, argmax
    (infer_refytb.py:221-226) — including the boxes of the chosen query."""
    rs = np.random.RandomState(31)
    frames = rs.randn(7, 48, 64, 3).astype(np.float32)  # chunks of 4 + 3
    got, got_boxes = engine.infer_video(
        frames, "a thing", return_probs=True, return_boxes=True)

    # independent host-side oracle over the raw all-query clip program
    ids, msk = engine.tokenizer(["a thing"])
    run = engine._get_program("f32")
    scores, logits, boxes = [], [], []
    for start, t in ((0, 4), (4, 3)):
        clip = frames[start : start + t]
        px = engine._pixel_buffer(clip, 4, 48, 64, 48, 64, "f32", None)
        pad = engine._get_pad(4, 48, 64, 48, 64, None)
        sc, lg, bx = run(engine.params, px, pad, ids, msk)
        scores.append(np.asarray(sc)[:t])
        logits.append(np.asarray(lg).astype(np.float32)[:t])
        boxes.append(np.asarray(bx).astype(np.float32)[:t])
    q = int(np.concatenate(scores, 0).mean(0).argmax())
    import jax.numpy as jnp

    from neurips2023_soc_tpu.inference import _cxcywh_to_xyxy_pixels
    from neurips2023_soc_tpu.ops import resize_bilinear

    up = np.concatenate([
        np.asarray(resize_bilinear(
            jnp.asarray(lg[:, q])[..., None], 48, 64))[..., 0]
        for lg in logits], 0)
    want = 1.0 / (1.0 + np.exp(-np.clip(up, -30.0, 30.0)))
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-4)
    want_boxes = _cxcywh_to_xyxy_pixels(
        np.concatenate(boxes, 0)[:, q], 48, 64)
    np.testing.assert_allclose(got_boxes, want_boxes, atol=1e-4)


def test_engine_geometry_corner_sweep(engine):
    """Fused-vs-unfused parity across geometry corners in one sweep: odd
    content dims (bit-packing pads width to a byte multiple), time padding
    (t < bucket), original-size DOWNsizing, full-bucket content, and odd
    content under YUV420 (chroma planes at ceil(dim/2), replicate-padded).
    Catches any corner where the fused single-chunk program and the generic
    chunked path could diverge."""
    from neurips2023_soc_tpu.inference import rgb_to_yuv420

    rs = np.random.RandomState(23)
    cases = [
        # (t, fh, fw, (oh, ow), fmt, probs)
        (3, 47, 63, (94, 126), "u8", False),   # odd dims, packed masks
        (4, 33, 64, (20, 40), "f32", True),    # full width, downsized probs
        (2, 45, 59, (90, 118), "yuv", False),  # odd dims through YUV420
        (4, 48, 64, (48, 64), "yuv", True),    # full bucket through YUV420
    ]
    for t, fh, fw, osize, fmt, probs in cases:
        if fmt == "f32":
            frames = rs.randn(t, fh, fw, 3).astype(np.float32)
        else:
            rgb = rs.randint(0, 256, (t, fh, fw, 3)).astype(np.uint8)
            frames = rgb_to_yuv420(rgb) if fmt == "yuv" else rgb
        fused = engine.infer_video_multi(
            frames, ["a thing"], original_size=osize, return_probs=probs)[0]
        h = engine._dispatch_video(
            frames, ["a thing"], original_size=osize, return_probs=probs,
            fuse=False)
        legacy = engine._collect_video(h)[0]
        assert fused.shape == (t,) + osize, (fmt, fused.shape)
        if probs:
            np.testing.assert_allclose(fused, legacy, rtol=1e-5, atol=1e-5,
                                       err_msg=str((t, fh, fw, osize, fmt)))
        else:
            np.testing.assert_array_equal(fused, legacy)
            assert fused.dtype == np.uint8 and set(np.unique(fused)) <= {0, 1}


def test_no_model_recompile_across_geometries(engine):
    """Video geometry (content fh/fw, original oh/ow) must never be a
    static of the FULL model program — only the tiny standalone finalize
    recompiles per unique geometry (review finding: fh/fw/oh/ow statics on
    the fused program recompiled the whole network per original size)."""
    rs = np.random.RandomState(19)
    engine.infer_video(rs.randn(4, 48, 64, 3).astype(np.float32), "a thing",
                       original_size=(96, 128))
    sel = engine._jitted["clip_sel_f32"]
    n0 = sel._cache_size()
    assert n0 >= 1
    # different content extent AND original size, same bucket
    engine.infer_video(rs.randn(4, 40, 56, 3).astype(np.float32), "a thing",
                       original_size=(70, 101))
    assert sel._cache_size() == n0
