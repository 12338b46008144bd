"""Photometric distortion (reference datasets/transforms.py:17-126):
HSV round-trip exactness, cv2 parity of the color conversions, hue
wraparound, lighting-noise channel permutations, and distribution-level
behavior of photometric_distort."""
import random

import numpy as np
import pytest

from neurips2023_soc_tpu.data.transforms import (
    _LIGHTING_PERMS, hsv_to_rgb, photometric_distort, rgb_to_hsv)


def rand_img(rng, h=13, w=17):
    return rng.random((h, w, 3)).astype(np.float32)


def test_hsv_round_trip():
    rng = np.random.default_rng(0)
    img = rand_img(rng)
    back = hsv_to_rgb(rgb_to_hsv(img))
    np.testing.assert_allclose(back, img, atol=1e-6)


def test_hsv_matches_cv2():
    cv2 = pytest.importorskip("cv2")
    rng = np.random.default_rng(1)
    img = rand_img(rng)
    ours = rgb_to_hsv(img)
    # cv2 float32 RGB2HSV: H in [0,360), S in [0,1], V = max channel
    ref = cv2.cvtColor(img, cv2.COLOR_RGB2HSV)
    # H is on the 0..360 degree scale -> f32 epsilon there is ~4e-4
    np.testing.assert_allclose(ours, ref, atol=1e-3)
    back = cv2.cvtColor(ours.astype(np.float32), cv2.COLOR_HSV2RGB)
    np.testing.assert_allclose(hsv_to_rgb(ours), back, atol=1e-5)
    # supersaturated (S > 1, as RandomSaturation produces): the reference
    # converts without clamping — negative channels appear and are clipped
    # only at the end; our conversion must match cv2 there too
    over = ours.copy()
    over[..., 1] *= 1.5
    back_over = cv2.cvtColor(over.astype(np.float32), cv2.COLOR_HSV2RGB)
    np.testing.assert_allclose(hsv_to_rgb(over), back_over, atol=1e-4)
    assert back_over.min() < 0  # the case is actually exercised


def test_hue_shift_360_is_identity():
    rng = np.random.default_rng(2)
    img = rand_img(rng)
    hsv = rgb_to_hsv(img)
    hsv2 = hsv.copy()
    hsv2[..., 0] = (hsv2[..., 0] + 360.0) % 360.0
    np.testing.assert_allclose(hsv_to_rgb(hsv2), hsv_to_rgb(hsv), atol=1e-5)


def test_lighting_perms_complete():
    import itertools

    assert sorted(_LIGHTING_PERMS) == sorted(itertools.permutations(range(3)))


def test_distort_per_frame_independent():
    """The reference draws fresh randomness per frame (PhotometricDistort
    loops over the clip, transforms.py:32-42) — identical input frames must
    be able to diverge."""
    rng = np.random.default_rng(3)
    base = rand_img(rng, 9, 9)
    frames = [base.copy() for _ in range(8)]
    out = photometric_distort(frames, random.Random(0))
    assert any(not np.allclose(out[0], o) for o in out[1:])


def test_distort_shapes_range_and_some_identity():
    rng = np.random.default_rng(4)
    frames = [rand_img(rng) for _ in range(4)]
    out = photometric_distort(frames, random.Random(7))
    for f, o in zip(frames, out):
        assert o.shape == f.shape and o.dtype == np.float32
        assert o.min() >= 0.0 and o.max() <= 1.0
    # with every coin flip losing, the frame passes through unchanged
    class NeverRandom(random.Random):
        def random(self):
            return 0.99
    out_id = photometric_distort([frames[0]], NeverRandom())
    np.testing.assert_allclose(out_id[0], frames[0], atol=1e-5)


def test_distort_exercises_hue_and_channel_swap():
    """Over many draws some frame must show a pure channel permutation
    effect and a hue rotation (statistical smoke: mean channel identity
    broken while luminance structure preserved)."""
    rng = np.random.default_rng(5)
    base = rand_img(rng, 7, 7)
    outs = photometric_distort([base.copy() for _ in range(64)],
                               random.Random(11))
    swapped = sum(
        1 for o in outs
        if not np.array_equal(np.argsort(o.mean((0, 1))),
                              np.argsort(base.mean((0, 1)))))
    assert swapped > 0


def _load_ref_transforms():
    """Load the reference datasets/transforms.py by file path (its package
    __init__ drags in torchvision.io which the harness does not stub)."""
    import importlib.util
    import sys

    sys.path.insert(0, "/root/repo")
    from tests.ref_harness import install_reference

    install_reference()
    spec = importlib.util.spec_from_file_location(
        "ref_datasets_transforms", "/root/reference/datasets/transforms.py")
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_crop_sample_vs_reference():
    """Box clamp + keep semantics parity vs the reference DETR-style crop
    (reference transforms.py:128-165), driven through the actual reference
    function on a torch target."""
    ref_T = _load_ref_transforms()
    import torch
    from PIL import Image

    from neurips2023_soc_tpu.data.transforms import crop_sample

    rng = np.random.default_rng(0)
    H, W, N = 24, 32, 3
    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    boxes = np.array([[2, 3, 12, 15], [20, 18, 31, 23], [28, 2, 31, 6]],
                     np.float32)
    masks = np.zeros((N, H, W), np.uint8)
    for n, (x0, y0, x1, y1) in enumerate(boxes.astype(int)):
        masks[n, y0:y1, x0:x1] = 1
    region = (4, 6, 14, 20)  # i, j, h, w

    target = {
        "boxes": torch.from_numpy(boxes.copy()),
        "masks": torch.from_numpy(masks.copy()),
        "labels": torch.arange(N),
        "area": torch.ones(N),
        "iscrowd": torch.zeros(N),
        "size": torch.tensor([H, W]),
    }
    ref_img, ref_tg = ref_T.crop(Image.fromarray(img), dict(target), region)

    frames, m2, b2, keep = crop_sample(
        [img.astype(np.float32) / 255.0], masks[None].astype(np.uint8),
        boxes[None], region)
    assert frames[0].shape[:2] == (14, 20)
    keep0 = keep[0]
    # reference removed the dropped instances; ours flags them
    np.testing.assert_allclose(b2[0][keep0], ref_tg["boxes"].numpy(),
                               atol=1e-5)
    np.testing.assert_array_equal(m2[0][keep0],
                                  ref_tg["masks"].numpy().astype(np.uint8))
    assert keep0.sum() == len(ref_tg["labels"])


def test_pad_sample_vs_reference():
    ref_T = _load_ref_transforms()
    import torch
    from PIL import Image

    from neurips2023_soc_tpu.data.transforms import pad_sample

    rng = np.random.default_rng(1)
    H, W = 10, 12
    img = (rng.random((H, W, 3)) * 255).astype(np.uint8)
    masks = (rng.random((2, H, W)) > 0.5).astype(np.uint8)
    target = {"masks": torch.from_numpy(masks.copy().astype(bool)),
              "size": torch.tensor([H, W])}
    ref_img, ref_tg = ref_T.pad(Image.fromarray(img), dict(target), (3, 5))

    frames, m2, _ = pad_sample([img.astype(np.float32)], masks[None], None,
                               pad_x=3, pad_y=5)
    assert frames[0].shape[:2] == (H + 5, W + 3)
    np.testing.assert_array_equal(np.asarray(ref_img).shape[:2],
                                  frames[0].shape[:2])
    np.testing.assert_array_equal(m2[0],
                                  ref_tg["masks"].numpy().astype(np.uint8))


def test_center_and_random_crop_regions():
    from neurips2023_soc_tpu.data.transforms import (
        center_crop_region, random_size_crop_region, random_select)

    assert center_crop_region(20, 30, 10, 14) == (5, 8, 10, 14)
    rng = random.Random(0)
    for _ in range(50):
        i, j, h, w = random_size_crop_region(rng, 20, 30, 5, 40)
        assert 5 <= h <= 20 and 5 <= w <= 30
        assert 0 <= i <= 20 - h and 0 <= j <= 30 - w
    picks = {random_select(random.Random(s), "a", "b", 0.5)
             for s in range(20)}
    assert picks == {"a", "b"}
