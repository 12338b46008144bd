"""Matcher + criterion tests on synthetic outputs/targets."""
import numpy as np

import jax
import jax.numpy as jnp

from neurips2023_soc_tpu.losses import (
    CriterionConfig,
    MatchCosts,
    compute_criterion,
    hungarian_match,
    total_loss,
)

T, B, Nq, N, H, W = 3, 2, 6, 2, 32, 32
Lyr, C = 2, 16


def make_targets(rng):
    masks = np.zeros((T, B, N, H, W), np.float32)
    masks[:, :, 0, 4:16, 4:16] = 1.0  # instance 0: a square
    masks[:, :, 1, 20:28, 20:28] = 1.0
    boxes = np.zeros((T, B, N, 4), np.float32)
    boxes[:, :, 0] = [10 / W, 10 / H, 12 / W, 12 / H]
    boxes[:, :, 1] = [24 / W, 24 / H, 8 / W, 8 / H]
    return {
        "masks": masks,
        "boxes": boxes,
        "labels": np.zeros((B, N), np.int32),
        "inst_valid": np.array([[True, True], [True, False]]),
        "is_ref_inst_visible": np.ones((T, B, N), bool),
        "referred_instance_idx": np.zeros((B,), np.int32),
    }


def make_outputs(rng, targets, planted_query=2):
    """Query `planted_query` predicts instance 0 perfectly; rest are noise."""
    pred_masks = rng.randn(Lyr, T, B, Nq, H // 4, W // 4).astype(np.float32) - 4.0
    m0 = targets["masks"][:, :, 0][:, :, ::4, ::4]  # coarse instance-0 mask
    pred_masks[:, :, :, planted_query] = np.where(m0 > 0, 8.0, -8.0)
    pred_boxes = rng.rand(Lyr, T, B, Nq, 4).astype(np.float32) * 0.3 + 0.4
    pred_boxes[:, :, :, planted_query] = targets["boxes"][:, :, 0]
    pred_cls = rng.randn(Lyr, T, B, Nq, 1).astype(np.float32) - 3
    pred_cls[:, :, :, planted_query] = 3.0
    return {
        "pred_masks": jnp.asarray(pred_masks),
        "pred_boxes": jnp.asarray(pred_boxes),
        "pred_cls": jnp.asarray(pred_cls),
        "pred_logit": jnp.asarray(rng.randn(Lyr, B, Nq, C).astype(np.float32)),
        "text_sentence_feature": jnp.asarray(rng.randn(B, C).astype(np.float32)),
    }


def test_matcher_picks_planted_query():
    rng = np.random.RandomState(0)
    tgts = make_targets(rng)
    outs = make_outputs(rng, tgts, planted_query=2)
    layer = {k: v[-1] for k, v in outs.items() if k != "text_sentence_feature"}
    layer["text_sentence_feature"] = outs["text_sentence_feature"]
    from neurips2023_soc_tpu.ops import resize_bilinear

    up = resize_bilinear(layer["pred_masks"][..., None], H, W)[..., 0]
    assign = np.asarray(hungarian_match(layer, tgts, up, MatchCosts()))
    assert assign.shape == (B, N)
    assert assign[0, 0] == 2 and assign[1, 0] == 2
    assert assign[1, 1] == -1  # invalid slot stays unmatched


def test_criterion_losses_finite_and_ordered():
    rng = np.random.RandomState(1)
    tgts = make_targets(rng)
    good = make_outputs(rng, tgts, planted_query=2)
    cfg = CriterionConfig()
    losses = jax.jit(
        lambda o, t: compute_criterion(o, t, cfg), static_argnums=()
    )(good, tgts)
    expected = {"loss_dice", "loss_sigmoid_focal", "loss_cls", "loss_bbox",
                "loss_giou", "loss_con"}
    assert expected <= set(losses.keys())
    assert {k + "_0" for k in expected} <= set(losses.keys())  # aux layer
    for k, v in losses.items():
        assert np.isfinite(float(v)), k
    # instance 0 is predicted perfectly, instance 1 by noise -> mean dice loss
    # sits well below the all-noise value of ~1.0
    assert float(losses["loss_dice"]) < 0.6
    tot = total_loss(losses, cfg)
    assert np.isfinite(float(tot)) and float(tot) > 0


def test_criterion_grads_flow():
    rng = np.random.RandomState(2)
    tgts = make_targets(rng)
    outs = make_outputs(rng, tgts)
    cfg = CriterionConfig()

    def loss_fn(o):
        return total_loss(compute_criterion(o, tgts, cfg), cfg)

    g = jax.grad(lambda o: loss_fn(o))(outs)
    gm = np.asarray(g["pred_masks"])
    assert np.all(np.isfinite(gm)) and np.abs(gm).sum() > 0
    assert np.abs(np.asarray(g["pred_logit"])).sum() > 0  # vl loss flows
