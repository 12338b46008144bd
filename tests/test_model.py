"""Shape/finiteness smoke tests of the SOC model stack on a virtual CPU mesh."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from neurips2023_soc_tpu.models.soc import SOC
from neurips2023_soc_tpu.models.voc import VOC
from neurips2023_soc_tpu.models.video_swin import VideoSwinBackbone


def tiny_soc(**kw):
    defaults = dict(
        backbone_name="video-swin-t",
        d_model=64,
        num_queries=5,
        dim_feedforward=128,
        enc_layers=2,
        dec_layers=2,
        voc_enc_layers=1,
        voc_dec_layers=2,
        text_encoder_type="roberta-tiny",
        num_classes=1,
    )
    defaults.update(kw)
    return SOC(**defaults)


T, B, H, W = 4, 2, 64, 96
S_TXT = 8


def make_inputs(seed=0):
    rng = np.random.RandomState(seed)
    pixels = rng.randn(T, B, H, W, 3).astype(np.float32)
    pad_mask = np.zeros((T, B, H, W), bool)
    pad_mask[:, :, -8:, :] = True  # bottom padding
    ids = rng.randint(3, 1000, size=(B, S_TXT)).astype(np.int32)
    mask = np.ones((B, S_TXT), np.int32)
    mask[:, -2:] = 0
    ids[mask == 0] = 1
    return pixels, pad_mask, ids, mask


@pytest.fixture(scope="module")
def soc_outputs():
    model = tiny_soc()
    pixels, pad_mask, ids, mask = make_inputs()
    params = model.init(jax.random.PRNGKey(0), pixels, pad_mask, ids, mask)
    out = model.apply(params, pixels, pad_mask, ids, mask)
    return model, params, out


def test_soc_forward_shapes(soc_outputs):
    model, params, out = soc_outputs
    # inference with vl_loss emits exactly one layer — the reference's
    # zip-truncation quirk (reference models/soc.py:377): layer-0 heads on
    # layer-0 queries + the last-layer VOC residual
    Lyr, Nq = 1, 5
    assert out["pred_masks"].shape == (Lyr, T, B, Nq, H // 4, W // 4)
    assert out["pred_cls"].shape == (Lyr, T, B, Nq, 1)
    assert out["pred_boxes"].shape == (Lyr, T, B, Nq, 4)
    assert out["pred_logit"].shape == (Lyr, B, Nq, 64)
    assert out["text_sentence_feature"].shape == (B, 64)
    for k, v in out.items():
        assert np.all(np.isfinite(np.asarray(v))), k
    boxes = np.asarray(out["pred_boxes"])
    assert boxes.min() >= 0.0 and boxes.max() <= 1.0


def test_soc_training_mode_runs(soc_outputs):
    model, params, _ = soc_outputs
    pixels, pad_mask, ids, mask = make_inputs(1)
    out = model.apply(
        params, pixels, pad_mask, ids, mask, training=True,
        rngs={"dropout": jax.random.PRNGKey(1)},
    )
    assert np.all(np.isfinite(np.asarray(out["pred_masks"])))


def test_soc_valid_indices_selects_frames(soc_outputs):
    model, params, _ = soc_outputs
    pixels, pad_mask, ids, mask = make_inputs(2)
    vidx = np.array([1, 3], np.int32)
    out = model.apply(params, pixels, pad_mask, ids, mask, valid_indices=vidx)
    assert out["pred_masks"].shape[1] == 1  # T collapses to annotated frame


def test_video_swin_level_shapes():
    m = VideoSwinBackbone(embed_dim=32, depths=(1, 1, 1, 1), num_heads=(1, 2, 4, 8))
    x = np.random.RandomState(0).randn(1, 3, 32, 48, 3).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    outs = m.apply(params, x)
    assert [o.shape for o in outs] == [
        (3, 8, 12, 32), (3, 4, 6, 64), (3, 2, 3, 128), (3, 1, 2, 256),
    ]


@pytest.mark.parametrize("window_size", [0, 2])
def test_voc_shapes(window_size):
    voc = VOC(input_dim=32, window_size=window_size, num_frame_queries=6,
              num_queries=6, num_heads=4, dim_feedforward=64,
              enc_layers=2, dec_layers=2)
    fq = np.random.RandomState(0).randn(3, 5, 2, 6, 32).astype(np.float32)
    lq = np.random.RandomState(1).randn(2, 32).astype(np.float32)
    params = voc.init(jax.random.PRNGKey(0), fq, lq, training=True)
    out_train = voc.apply(params, fq, lq, training=True)
    assert out_train.shape == (3, 2, 6, 32)
    out_eval = voc.apply(params, fq, lq, training=False)
    assert out_eval.shape == (1, 2, 6, 32)
    assert np.all(np.isfinite(np.asarray(out_train)))


def test_resnet50_level_shapes_and_frozen_bn():
    """ResNet-50 backbone (reference models/backbone.py:20-101): 4 maps at
    strides 4/8/16/32 with 256/512/1024/2048 channels; FrozenBatchNorm folds
    running stats as constants and its params are masked out of the optimizer
    (torch buffers never receive gradients)."""
    from neurips2023_soc_tpu.models.resnet import FrozenBN, ResNet50Backbone
    from neurips2023_soc_tpu.training.optim import _label_tree

    m = ResNet50Backbone()
    x = np.random.RandomState(0).randn(1, 2, 64, 96, 3).astype(np.float32)
    params = m.init(jax.random.PRNGKey(0), x)
    outs = jax.eval_shape(lambda p, v: m.apply(p, v), params, x)
    assert [tuple(o.shape) for o in outs] == [
        (2, 16, 24, 256), (2, 8, 12, 512), (2, 4, 6, 1024), (2, 2, 3, 2048),
    ]

    # FrozenBN math: y = (x - mean) / sqrt(var + eps) * scale + bias
    bn = FrozenBN(3)
    xb = np.random.RandomState(1).randn(4, 3).astype(np.float32)
    p = {"params": {
        "frozen_bn_scale": np.float32([2.0, 1.0, 0.5]),
        "frozen_bn_bias": np.float32([0.1, -0.2, 0.0]),
        "frozen_bn_mean": np.float32([0.5, 0.0, -1.0]),
        "frozen_bn_var": np.float32([4.0, 1.0, 0.25]),
    }}
    got = np.asarray(bn.apply(p, xb))
    pp = p["params"]
    want = (xb - pp["frozen_bn_mean"]) / np.sqrt(pp["frozen_bn_var"] + 1e-5) \
        * pp["frozen_bn_scale"] + pp["frozen_bn_bias"]
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)

    # every frozen-BN param routes to the zero-update optimizer group
    labels = _label_tree(params, freeze_text=False)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    bn_labels = [leaf for path, leaf in flat
                 if any("frozen_bn" in str(k) for k in path)]
    # stem + 16 bottlenecks x 3 + 4 downsamples, 4 stat tensors each
    assert len(bn_labels) == 4 * (1 + 3 * (3 + 4 + 6 + 3) + 4)
    assert set(bn_labels) == {"frozen"}


def test_colormap_palette():
    """79-color detectron palette (reference tools/colormap.py): BGR default,
    RGB opt-in, scaled by `maximum`."""
    from neurips2023_soc_tpu.utils.colormap import colormap

    bgr = colormap()
    rgb = colormap(rgb=True)
    assert bgr.shape == rgb.shape == (79, 3)
    np.testing.assert_array_equal(bgr, rgb[:, ::-1])
    np.testing.assert_allclose(
        rgb[0], np.float32([0.000, 0.447, 0.741]) * 255, rtol=1e-6)
    unit = colormap(rgb=True, maximum=1)
    assert unit.max() <= 1.0 and unit.min() >= 0.0
    np.testing.assert_allclose(unit * 255, rgb, rtol=1e-6)
