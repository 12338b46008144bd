"""Overlay visualization helpers (reference infer_refytb.py:240-266/320-328,
infer_davis.py:274-283) and InferenceEngine box output."""
import numpy as np

from neurips2023_soc_tpu.utils.colormap import colormap
from neurips2023_soc_tpu.utils.visualize import (
    draw_box,
    overlay_prediction,
    vis_add_index_mask,
    vis_add_mask,
)


def test_vis_add_mask_blend():
    frame = np.full((4, 6, 3), 100, np.uint8)
    mask = np.zeros((4, 6), np.uint8)
    mask[1:3, 2:5] = 1
    out = vis_add_mask(frame, mask, (200, 0, 50))
    # reference blend is 0.5*img + 0.5*color (infer_refytb.py:327)
    np.testing.assert_array_equal(out[1, 2], [150, 50, 75])
    np.testing.assert_array_equal(out[0, 0], [100, 100, 100])  # untouched
    assert out.dtype == np.uint8


def test_vis_add_index_mask_per_object_colors():
    frame = np.zeros((4, 4, 3), np.uint8)
    idx = np.zeros((4, 4), np.uint8)
    idx[0, 0] = 1
    idx[1, 1] = 2
    out = vis_add_index_mask(frame, idx, alpha=1.0)
    colors = colormap(rgb=True)
    np.testing.assert_allclose(out[0, 0], colors[0].astype(np.uint8))
    np.testing.assert_allclose(out[1, 1], colors[1].astype(np.uint8))
    np.testing.assert_array_equal(out[3, 3], [0, 0, 0])


def test_draw_box_outline_and_clipping():
    frame = np.zeros((10, 12, 3), np.uint8)
    out = draw_box(frame, (2, 1, 8, 7), (255, 0, 0), width=1)
    assert (out[1, 2:9] == [255, 0, 0]).all()  # top edge
    assert (out[7, 2:9] == [255, 0, 0]).all()  # bottom edge
    assert (out[1:8, 2] == [255, 0, 0]).all()  # left edge
    assert (out[1:8, 8] == [255, 0, 0]).all()  # right edge
    assert (out[0] == 0).all() and (out[4, 5] == 0).all()
    # out-of-bounds boxes clip instead of raising
    out2 = draw_box(frame, (-5, -5, 100, 100), (0, 255, 0), width=2)
    assert (out2[0, :] == [0, 255, 0]).all()


def test_overlay_prediction_composes():
    frame = np.full((8, 8, 3), 10, np.uint8)
    mask = np.zeros((8, 8), np.uint8)
    mask[4:6, 4:6] = 1
    out = overlay_prediction(frame, mask, (1, 1, 6, 6), color_index=3)
    color = colormap(rgb=True)[3]
    # box edge painted solid, mask area blended 50/50
    np.testing.assert_array_equal(out[1, 3], color.astype(np.uint8))
    np.testing.assert_array_equal(
        out[4, 4], (0.5 * 10 + 0.5 * color).astype(np.uint8))
