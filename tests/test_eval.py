"""RLE + postprocessing tests."""
import numpy as np
import pytest

from neurips2023_soc_tpu.evaluation.rle import area, decode, encode, iou


@pytest.mark.parametrize("case", ["random", "zeros", "ones", "single", "stripes"])
def test_rle_roundtrip(case):
    rng = np.random.RandomState(0)
    if case == "random":
        m = (rng.rand(37, 53) > 0.5).astype(np.uint8)
    elif case == "zeros":
        m = np.zeros((10, 7), np.uint8)
    elif case == "ones":
        m = np.ones((10, 7), np.uint8)
    elif case == "single":
        m = np.zeros((5, 5), np.uint8)
        m[2, 3] = 1
    else:
        m = np.tile(np.array([[0, 1]], np.uint8), (8, 4))
    r = encode(m)
    assert isinstance(r["counts"], bytes)
    np.testing.assert_array_equal(decode(r), m)
    assert area(r) == int(m.sum())


def test_rle_iou():
    a = np.zeros((20, 20), np.uint8)
    a[:10, :10] = 1
    b = np.zeros((20, 20), np.uint8)
    b[5:15, :10] = 1
    m = iou([encode(a)], [encode(b)])
    np.testing.assert_allclose(m[0, 0], 50 / 150, atol=1e-9)


def test_ytvos_device_step_selects_best_trajectory():
    import jax.numpy as jnp

    from neurips2023_soc_tpu.models.postprocessing import ytvos_device_step

    T, B, Nq, h, w = 3, 2, 4, 8, 8
    rng = np.random.RandomState(0)
    pred_cls = np.full((T, B, Nq, 1), -5.0, np.float32)
    pred_cls[:, :, 2] = 5.0  # query 2 is the referred trajectory
    pred_masks = np.full((T, B, Nq, h, w), -10.0, np.float32)
    pred_masks[:, :, 2, :4, :4] = 10.0
    masks = np.asarray(ytvos_device_step(jnp.asarray(pred_cls),
                                         jnp.asarray(pred_masks), 16, 16))
    assert masks.shape == (B, T, 16, 16)
    assert masks[:, :, :7, :7].all()
    assert not masks[:, :, 10:, 10:].any()


def test_a2d_postprocess_shapes():
    from neurips2023_soc_tpu.models.postprocessing import a2d_postprocess

    Lyr, T, B, Nq, h, w = 2, 1, 2, 4, 8, 8
    rng = np.random.RandomState(0)
    outputs = {
        "pred_cls": rng.randn(Lyr, T, B, Nq, 1).astype(np.float32),
        "pred_masks": rng.randn(Lyr, T, B, Nq, h, w).astype(np.float32),
    }
    preds = a2d_postprocess(
        outputs, (32, 32), [(28, 30), (32, 26)], [(55, 61), (64, 50)]
    )
    assert len(preds) == 2
    assert preds[0]["masks"].shape == (Nq, 55, 61)
    assert len(preds[0]["rle_masks"]) == Nq
    assert preds[1]["scores"].shape == (Nq,)
