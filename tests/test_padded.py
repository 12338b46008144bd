"""Bucketed padded-batch utilities (utils/padded.py — the NestedTensor
replacement, reference misc.py:103-160)."""
import numpy as np
import pytest

from neurips2023_soc_tpu.utils.padded import (
    batch_videos,
    eval_size_buckets,
    pick_size_bucket,
    pick_time_bucket,
    train_size_buckets,
)


def test_pick_size_bucket_smallest_fit():
    buckets = ((256, 448), (320, 576), (384, 640))
    assert pick_size_bucket(200, 400, buckets) == (256, 448)
    assert pick_size_bucket(256, 448, buckets) == (256, 448)  # exact fit
    # height fits the first bucket but width doesn't -> next bucket
    assert pick_size_bucket(200, 500, buckets) == (320, 576)


def test_pick_bucket_overflow_is_a_clear_error():
    """Content larger than every bucket used to clamp to buckets[-1] and
    fail later with a cryptic numpy broadcast error inside batch_videos /
    the engine's pixel-buffer copy; now it raises immediately."""
    with pytest.raises(ValueError, match="exceeds every size bucket"):
        pick_size_bucket(700, 700, ((360, 640),))
    with pytest.raises(ValueError, match="exceeds every time bucket"):
        pick_time_bucket(9, (4, 8))


def test_orientation_bucket_helpers():
    """eval buckets cover both orientations of short-side-resized frames;
    train buckets add the (max, max) square that a batch mixing portrait and
    landscape samples pads to (what the reference's NestedTensor does
    dynamically, misc.py:143-160)."""
    assert eval_size_buckets(360, 640) == ((360, 640), (640, 360))
    assert eval_size_buckets(416, 416) == ((416, 416),)
    assert train_size_buckets(360, 640) == (
        (360, 640), (640, 360), (640, 640))
    # every short-side-360/max-640 resize outcome fits one of the buckets
    for h, w in [(360, 640), (640, 360), (360, 360), (391, 360), (203, 640)]:
        pick_size_bucket(h, w, eval_size_buckets(360, 640))
    # a mixed batch's per-dim max only fits the square train bucket
    assert pick_size_bucket(640, 640, train_size_buckets(360, 640)) == \
        (640, 640)


def test_collate_mixed_orientation_batch_lands_in_square_bucket():
    """One portrait + one landscape sample in a batch: per-dim max is
    (max, max); the collator must produce that square bucket rather than
    crash (reference pads to the batch max dynamically)."""
    from neurips2023_soc_tpu.data.collate import collate_batch

    def sample(h, w):
        return dict(
            frames=np.zeros((2, h, w, 3), np.float32),
            text="a thing",
            masks=np.zeros((2, 1, h, w), np.uint8),
            boxes=np.tile(np.array([1.0, 1.0, 5.0, 5.0], np.float32),
                          (2, 1, 1)),
            labels=np.zeros((1,), np.int64),
            is_visible=np.ones((2, 1), bool),
            referred_instance_idx=0,
        )

    class Tok:
        def __call__(self, texts):
            n = len(texts)
            return (np.ones((n, 4), np.int32), np.ones((n, 4), np.int32))

    batch = collate_batch(
        [sample(32, 48), sample(48, 32)], Tok(),
        size_buckets=train_size_buckets(32, 48), time_buckets=(2,))
    assert batch["pixels"].shape == (2, 2, 48, 48, 3)
    assert not batch["pad_mask"][0, 0, :32, :48].any()
    assert not batch["pad_mask"][0, 1, :48, :32].any()
    assert batch["pad_mask"][0, 0, 32:, :].all()


def test_resize_target_never_exceeds_max_size():
    """size_with_aspect_ratio caps BOTH output dims at max_size: the
    reference's rounding can overshoot by a few pixels at extreme aspect
    ratios (its dynamic padding absorbs that; our static buckets cannot)."""
    from neurips2023_soc_tpu.data.transforms import size_with_aspect_ratio

    for h in range(1, 900, 13):
        for w in range(1, 900, 17):
            oh, ow = size_with_aspect_ratio(h, w, 360, 640)
            assert max(oh, ow) <= 640, (h, w, oh, ow)
    # the common cases are unchanged
    assert size_with_aspect_ratio(720, 1280, 360, 640) == (360, 640)
    assert size_with_aspect_ratio(1280, 720, 360, 640) == (640, 360)
    assert size_with_aspect_ratio(480, 480, 360, 640) == (360, 360)


def test_batch_videos_shapes_and_mask():
    rs = np.random.RandomState(0)
    videos = [
        [rs.randn(30, 40, 3).astype(np.float32) for _ in range(3)],
        [rs.randn(20, 48, 3).astype(np.float32) for _ in range(2)],
    ]
    pixels, pad = batch_videos(
        videos, size_buckets=((32, 40), (64, 64)), time_buckets=(4,))
    # h_max=30, w_max=48: width overflows the (32, 40) bucket -> (64, 64)
    assert pixels.shape == (4, 2, 64, 64, 3) and pad.shape == (4, 2, 64, 64)
    # content regions unmasked, everything else masked
    assert not pad[:3, 0, :30, :40].any() and pad[3, 0].all()
    assert not pad[:2, 1, :20, :48].any() and pad[2:, 1].all()
    assert pad[0, 0, 30:, :].all() and pad[0, 0, :, 40:].all()
    np.testing.assert_array_equal(pixels[0, 0, :30, :40], videos[0][0])
    # padded pixels are zero
    assert pixels[0, 0, 30:, :].sum() == 0.0
