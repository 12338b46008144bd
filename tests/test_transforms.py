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
