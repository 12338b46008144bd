"""Numeric parity vs the ACTUAL /root/reference torch modules on CPU.

Round-1 tests validated against independently rewritten oracles; these tests
instantiate the reference's own modules with random weights, convert them with
`training/convert.py`, and assert activation parity — so a layout-convention
bug in either the converter or any module semantics fails loudly
(VERDICT.md round 1, "Next round" item 2).
"""
from __future__ import annotations

import numpy as np
import pytest
import torch

import jax
import jax.numpy as jnp

from tests.ref_harness import (
    convert_submodule, install_reference, seed_all, torch_sd, zero_dropout,
)

install_reference()

RTOL = 2e-4
ATOL = 2e-4


def allclose(a, b, rtol=RTOL, atol=ATOL, msg=""):
    a = np.asarray(a)
    b = np.asarray(b)
    assert a.shape == b.shape, f"{msg}: shape {a.shape} vs {b.shape}"
    err = np.max(np.abs(a - b)) if a.size else 0.0
    assert np.allclose(a, b, rtol=rtol, atol=atol), f"{msg}: max abs err {err}"


# ---------------------------------------------------------------- msda


def _msda_inputs(seed=0, B=2, M=4, D=8, Lq=11, P=4,
                 shapes=((9, 12), (5, 6), (3, 3))):
    rng = np.random.RandomState(seed)
    S = sum(h * w for h, w in shapes)
    L = len(shapes)
    value = rng.randn(B, S, M, D).astype(np.float32)
    # include out-of-range locations to exercise zero-padding semantics
    loc = rng.uniform(-0.2, 1.2, size=(B, Lq, M, L, P, 2)).astype(np.float32)
    attn = rng.rand(B, Lq, M, L, P).astype(np.float32)
    attn /= attn.reshape(B, Lq, M, -1).sum(-1).reshape(B, Lq, M, 1, 1)
    return value, shapes, loc, attn


def _ref_msda(value, shapes, loc, attn):
    from models.ops.functions.ms_deform_attn_func import ms_deform_attn_core_pytorch

    out = ms_deform_attn_core_pytorch(
        torch.from_numpy(value),
        torch.as_tensor(shapes, dtype=torch.long),
        torch.from_numpy(loc),
        torch.from_numpy(attn),
    )
    return out.detach().numpy()


def test_msda_forward_vs_reference_oracle():
    from neurips2023_soc_tpu.ops import ms_deform_attn

    value, shapes, loc, attn = _msda_inputs()
    ref = _ref_msda(value, shapes, loc, attn)
    mine = np.asarray(ms_deform_attn(value, shapes, loc, attn))
    allclose(mine, ref, msg="msda forward")


def test_msda_grads_vs_reference_oracle():
    from models.ops.functions.ms_deform_attn_func import ms_deform_attn_core_pytorch
    from neurips2023_soc_tpu.ops import ms_deform_attn

    value, shapes, loc, attn = _msda_inputs(seed=3, B=1, Lq=7)
    g = np.random.RandomState(1).randn(1, 7, 32).astype(np.float32)

    tv = torch.from_numpy(value).requires_grad_(True)
    tl = torch.from_numpy(loc).requires_grad_(True)
    ta = torch.from_numpy(attn).requires_grad_(True)
    out = ms_deform_attn_core_pytorch(
        tv, torch.as_tensor(shapes, dtype=torch.long), tl, ta
    )
    (out * torch.from_numpy(g)).sum().backward()

    def f(v, l, a):
        return (ms_deform_attn(v, shapes, l, a) * g).sum()

    gv, gl, ga = jax.grad(f, argnums=(0, 1, 2))(value, loc, attn)
    allclose(gv, tv.grad.numpy(), atol=5e-4, msg="msda dvalue")
    allclose(gl, tl.grad.numpy(), rtol=2e-3, atol=2e-3, msg="msda dloc")
    allclose(ga, ta.grad.numpy(), atol=5e-4, msg="msda dattn")


# ------------------------------------------------- position encodings


def test_position_encoding_2d_vs_reference():
    from misc import NestedTensor
    from models.position_encoding import PositionEmbeddingSine2D
    from neurips2023_soc_tpu.models.position_encoding import (
        position_embedding_sine_2d,
    )

    rng = np.random.RandomState(0)
    B, H, W = 3, 13, 17
    mask = np.zeros((B, H, W), bool)
    mask[0, 9:, :] = True  # bottom pad
    mask[1, :, 12:] = True  # right pad
    ref = PositionEmbeddingSine2D(num_pos_feats=64, normalize=True)(
        NestedTensor(torch.zeros(B, 1, H, W), torch.from_numpy(mask))
    ).numpy()  # (B, C, H, W)
    mine = np.asarray(position_embedding_sine_2d(jnp.asarray(mask), 64))
    allclose(mine.transpose(0, 3, 1, 2), ref, msg="2d sine PE")


def test_position_encoding_1d_vs_reference():
    from misc import NestedTensor
    from models.position_encoding import PositionEmbeddingSine1D
    from neurips2023_soc_tpu.models.position_encoding import (
        position_embedding_sine_1d,
    )

    B, S = 2, 9
    mask = np.zeros((B, S), bool)
    mask[0, 6:] = True
    ref = PositionEmbeddingSine1D(num_pos_feats=256, normalize=True)(
        NestedTensor(torch.zeros(B, 4, S), torch.from_numpy(mask))
    ).numpy()  # (B, C, S)
    mine = np.asarray(position_embedding_sine_1d(jnp.asarray(mask), 256))
    allclose(mine.transpose(0, 2, 1), ref, msg="1d sine PE")


# ------------------------------------------------------- resize ops


def test_aligned_bilinear_vs_reference():
    from models.soc import aligned_bilinear as ref_aligned
    from neurips2023_soc_tpu.ops import aligned_bilinear

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 9, 11).astype(np.float32)  # torch NCHW
    for factor in (1, 2, 4):
        ref = ref_aligned(torch.from_numpy(x), factor).numpy()
        mine = np.asarray(
            aligned_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), factor)
        ).transpose(0, 3, 1, 2)
        allclose(mine, ref, msg=f"aligned_bilinear x{factor}")


def test_resize_bilinear_matches_torch_interpolate():
    from neurips2023_soc_tpu.ops import resize_bilinear

    rng = np.random.RandomState(0)
    x = rng.randn(2, 1, 7, 9).astype(np.float32)
    ref = torch.nn.functional.interpolate(
        torch.from_numpy(x), size=(20, 26), mode="bilinear", align_corners=False
    ).numpy()
    mine = np.asarray(
        resize_bilinear(jnp.asarray(x.transpose(0, 2, 3, 1)), 20, 26,
                        align_corners=False)
    ).transpose(0, 3, 1, 2)
    allclose(mine, ref, msg="resize_bilinear align_corners=False")


# ---------------------------------------------------------------- MMF


def test_mmf_vs_reference():
    from models.vla import MMF as RefMMF
    from neurips2023_soc_tpu.models.common import MMF

    seed_all(0)
    C, heads, B, St, Sm = 32, 4, 2, 5, 7
    ref = RefMMF(C, heads).eval()

    rng = np.random.RandomState(1)
    tgt = rng.randn(B, St, C).astype(np.float32)
    mem = rng.randn(B, Sm, C).astype(np.float32)
    pos = rng.randn(B, Sm, C).astype(np.float32)
    kpm = np.zeros((B, Sm), bool)
    kpm[0, 5:] = True

    with torch.no_grad():
        # reference MMF is seq-major: (S, B, C)
        ref_out = ref(
            torch.from_numpy(tgt.transpose(1, 0, 2)),
            torch.from_numpy(mem.transpose(1, 0, 2)),
            memory_key_padding_mask=torch.from_numpy(kpm),
            pos=torch.from_numpy(pos.transpose(1, 0, 2)),
        ).numpy().transpose(1, 0, 2)

    model = MMF(C, heads)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(tgt),
                           jnp.asarray(mem))
    variables, _ = convert_submodule(variables, torch_sd(ref, "vlf."),
                                     flax_prefix="vlf")
    mine = np.asarray(
        model.apply(variables, jnp.asarray(tgt), jnp.asarray(mem),
                    memory_key_padding_mask=jnp.asarray(kpm),
                    pos=jnp.asarray(pos))
    )
    allclose(mine, ref_out, msg="MMF fusion")


# ---------------------------------------------------------- video swin


def test_video_swin_vs_reference():
    from models.video_swin_transformer import VideoSwinTransformerBackbone
    from neurips2023_soc_tpu.models.video_swin import VideoSwinBackbone

    seed_all(0)
    cfg = dict(
        patch_size=(1, 4, 4), embed_dim=16, depths=[1, 1, 2, 1],
        num_heads=[1, 2, 4, 8], window_size=(8, 7, 7), mlp_ratio=4.0,
        qkv_bias=True, qk_scale=None, drop_rate=0.0, attn_drop_rate=0.0,
        drop_path_rate=0.2, patch_norm=True, use_checkpoint=False,
    )
    ref = VideoSwinTransformerBackbone(False, None, True, **cfg).eval()

    B, T, H, W = 2, 3, 32, 48
    rng = np.random.RandomState(1)
    video = rng.randn(B, T, H, W, 3).astype(np.float32)

    with torch.no_grad():
        # reference folds time b-major: (b t) c h w
        samples = torch.from_numpy(
            video.reshape(B * T, H, W, 3).transpose(0, 3, 1, 2)
        )
        ref_out = ref(samples, num_frames=T)  # dict {'0': (B*T, C, h, w), ...}

    model = VideoSwinBackbone(
        patch_size=(1, 4, 4), embed_dim=16, depths=(1, 1, 2, 1),
        num_heads=(1, 2, 4, 8), window=(8, 7, 7), drop_path_rate=0.2,
        patch_norm=True,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(video))
    variables, report = convert_submodule(
        variables, torch_sd(ref, "backbone.0.body."), flax_prefix="backbone"
    )
    mine = model.apply(variables, jnp.asarray(video))
    for lvl in range(4):
        allclose(
            np.asarray(mine[lvl]).transpose(0, 3, 1, 2),
            ref_out[str(lvl)].numpy(),
            rtol=1e-3, atol=1e-3,
            msg=f"video swin level {lvl}",
        )


# ----------------------------------------------------------------- VOC


def _voc_pair(window_size, T, enc_layers=2, dec_layers=2, C=32, Nq=6, Lyr=2):
    from models.voc import VOC as RefVOC
    from neurips2023_soc_tpu.models.voc import VOC

    seed_all(0)
    cfg = dict(
        input_dim=C, window_size=window_size, num_frame_queries=Nq,
        num_queries=Nq, nheads=4, dim_feedforward=64,
        enc_layers=enc_layers, dec_layers=dec_layers, num_frames=T,
    )
    ref = RefVOC(cfg).eval()
    model = VOC(
        input_dim=C, window_size=window_size, num_frame_queries=Nq,
        num_queries=Nq, num_heads=4, dim_feedforward=64,
        enc_layers=enc_layers, dec_layers=dec_layers,
    )
    return ref, model


@pytest.mark.parametrize("window_size,T,training",
                         [(0, 5, True), (0, 5, False), (3, 7, True),
                          (3, 7, False)])
def test_voc_vs_reference(window_size, T, training):
    # B=1: the reference's (L,T,B,..)->(L*B,T,..) reshape is only correct for
    # B==1 (models/voc.py:282); ours implements the intended regroup, so
    # parity is only defined there.
    B, Nq, C, Lyr = 1, 6, 32, 2
    ref, model = _voc_pair(window_size, T)

    rng = np.random.RandomState(2)
    fq = rng.randn(Lyr, T, B, Nq, C).astype(np.float32)
    lang = rng.randn(B, C).astype(np.float32)

    ref.train(training)
    zero_dropout(ref)
    with torch.no_grad():
        ref_out = ref(torch.from_numpy(fq), torch.from_numpy(lang)).numpy()

    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(fq), jnp.asarray(lang)
    )
    variables, _ = convert_submodule(variables, torch_sd(ref, "voc."),
                                     flax_prefix="voc")
    mine = np.asarray(
        model.apply(variables, jnp.asarray(fq), jnp.asarray(lang),
                    training=training, deterministic=True)
    )
    if not training:
        # reference returns L=1 (last layer only); ours the same
        assert mine.shape[0] == 1 and ref_out.shape[0] == 1
    allclose(mine, ref_out, rtol=1e-3, atol=1e-3,
             msg=f"VOC ws={window_size} training={training}")


# --------------------------------------------- deformable transformer


def test_deformable_transformer_vs_reference():
    from models.deformable_transformer import DeformableTransformer as RefDT
    from models.soc import MLP as RefMLP, _get_clones
    from neurips2023_soc_tpu.models.deformable_transformer import (
        DeformableTransformer,
    )

    seed_all(0)
    C, heads, L, Nq = 32, 4, 3, 5
    ref = RefDT(
        d_model=C, nhead=heads, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=64, dropout=0.1, return_intermediate_dec=True,
        num_feature_levels=L, dec_n_points=4, enc_n_points=4, two_stage=False,
    ).eval()
    # SOC attaches the box-refinement heads onto the decoder
    # (reference models/soc.py:91-96)
    bbox_embed = _get_clones(RefMLP(C, C, 4, 3), 2)
    torch.nn.init.constant_(bbox_embed[0].layers[-1].bias.data[2:], -2.0)
    ref.decoder.bbox_embed = bbox_embed

    shapes = ((8, 12), (4, 6), (2, 3))
    B = 2
    rng = np.random.RandomState(3)
    srcs = [rng.randn(B, h, w, C).astype(np.float32) for h, w in shapes]
    poses = [rng.randn(B, h, w, C).astype(np.float32) for h, w in shapes]
    masks = [np.zeros((B, h, w), bool) for h, w in shapes]
    masks[0][0, 6:, :] = True  # bottom pad on sample 0, level 0
    masks[1][0, 3:, :] = True
    masks[2][0, 1:, :] = True
    qe = rng.randn(Nq, C).astype(np.float32)

    with torch.no_grad():
        tgt = torch.zeros(B, 1, Nq, C)
        ref_hs, ref_mem, ref_init, ref_inter, _, _, _ = ref(
            [torch.from_numpy(s.transpose(0, 3, 1, 2)) for s in srcs],
            tgt,
            [torch.from_numpy(m) for m in masks],
            [torch.from_numpy(p.transpose(0, 3, 1, 2)) for p in poses],
            torch.from_numpy(qe),
        )

    model = DeformableTransformer(
        d_model=C, n_heads=heads, num_encoder_layers=2, num_decoder_layers=2,
        dim_feedforward=64, num_feature_levels=L, with_box_refine=True,
    )
    jsrcs = [jnp.asarray(s) for s in srcs]
    jposes = [jnp.asarray(p) for p in poses]
    jmasks = [jnp.asarray(m) for m in masks]
    variables = model.init(jax.random.PRNGKey(0), jsrcs, jmasks, jposes,
                           jnp.asarray(qe))
    sd = torch_sd(ref, "transformer.")
    # the bbox heads live at SOC top level in the checkpoint layout
    for i, m in enumerate(bbox_embed):
        sd.update(torch_sd(m, f"bbox_embed.{i}."))
    variables, _ = convert_submodule(variables, sd, flax_prefix="transformer")

    hs, mem, init_ref, inter_ref, enc_outputs = model.apply(
        variables, jsrcs, jmasks, jposes, jnp.asarray(qe)
    )
    assert enc_outputs is None  # single-stage
    allclose(np.asarray(init_ref), ref_init.numpy(), msg="init_reference")
    allclose(np.asarray(hs), ref_hs.numpy(), rtol=1e-3, atol=1e-3, msg="hs")
    allclose(np.asarray(inter_ref), ref_inter.numpy(), rtol=1e-3, atol=1e-3,
             msg="inter_references")
    for lvl in range(L - 1):
        allclose(np.asarray(mem[lvl]).transpose(0, 3, 1, 2),
                 ref_mem[lvl].numpy(), rtol=1e-3, atol=1e-3,
                 msg=f"memory level {lvl}")


# ------------------------------------------------------- FPN decoder


def test_fpn_spatial_decoder_vs_reference():
    from models.segmentation import FPNSpatialDecoder as RefFPN
    from neurips2023_soc_tpu.models.segmentation import FPNSpatialDecoder

    seed_all(0)
    C = 128
    fpn_dims = [C, C, 24]
    ref = RefFPN(C, fpn_dims, mask_kernels_dim=8).eval()

    rng = np.random.RandomState(4)
    B = 2
    x = rng.randn(B, 2, 3, C).astype(np.float32)
    feats = [
        rng.randn(B, 4, 6, C).astype(np.float32),
        rng.randn(B, 8, 12, C).astype(np.float32),
        rng.randn(B, 16, 24, 24).astype(np.float32),
    ]
    with torch.no_grad():
        ref_out = ref(
            torch.from_numpy(x.transpose(0, 3, 1, 2)),
            [torch.from_numpy(f.transpose(0, 3, 1, 2)) for f in feats],
        ).numpy()

    model = FPNSpatialDecoder(C, fpn_dims, 8)
    jx = jnp.asarray(x)
    jf = [jnp.asarray(f) for f in feats]
    variables = model.init(jax.random.PRNGKey(0), jx, jf)
    variables, _ = convert_submodule(variables, torch_sd(ref, "spatial_decoder."),
                                     flax_prefix="spatial_decoder")
    mine = np.asarray(model.apply(variables, jx, jf))
    allclose(mine.transpose(0, 3, 1, 2), ref_out, rtol=1e-3, atol=1e-3,
             msg="FPN spatial decoder")


# --------------------------------------- two-stage proposal generation


def test_two_stage_proposals_vs_reference():
    """gen_encoder_output_proposals + get_proposal_pos_embed parity against
    the actual reference module (reference deformable_transformer.py:77-122).
    Only these pieces can be parity-tested: the reference's full two-stage
    forward crashes as shipped (decoder.class_embed is None, see
    neurips2023_soc_tpu/models/deformable_transformer.py docstring)."""
    from models.deformable_transformer import DeformableTransformer as RefDT
    from neurips2023_soc_tpu.models.deformable_transformer import (
        DeformableTransformer,
    )

    seed_all(0)
    C, heads, L, K = 32, 4, 3, 7
    ref = RefDT(
        d_model=C, nhead=heads, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=64, dropout=0.0, return_intermediate_dec=True,
        num_feature_levels=L, two_stage=True, two_stage_num_proposals=K,
    ).eval()

    shapes = ((8, 12), (4, 6), (2, 3))
    B = 2
    S = sum(h * w for h, w in shapes)
    rng = np.random.RandomState(5)
    memory = rng.randn(B, S, C).astype(np.float32)
    masks = [np.zeros((B, h, w), bool) for h, w in shapes]
    masks[0][0, 6:, :] = True
    masks[1][0, 3:, :] = True
    masks[2][0, 1:, :] = True
    mask_flat = np.concatenate([m.reshape(B, -1) for m in masks], 1)

    with torch.no_grad():
        ref_mem, ref_props = ref.gen_encoder_output_proposals(
            torch.from_numpy(memory), torch.from_numpy(mask_flat),
            torch.as_tensor(shapes, dtype=torch.long),
        )

    model = DeformableTransformer(
        d_model=C, n_heads=heads, num_encoder_layers=1, num_decoder_layers=1,
        dim_feedforward=64, num_feature_levels=L, with_box_refine=True,
        two_stage=True, two_stage_num_proposals=K,
    )
    srcs = [rng.randn(B, h, w, C).astype(np.float32) for h, w in shapes]
    poses = [rng.randn(B, h, w, C).astype(np.float32) for h, w in shapes]
    jmasks = [jnp.asarray(m) for m in masks]
    variables = model.init(
        jax.random.PRNGKey(0), [jnp.asarray(s) for s in srcs], jmasks,
        [jnp.asarray(p) for p in poses], jnp.zeros((1, C), jnp.float32),
    )
    # the box-refinement heads live at SOC level in the checkpoint layout and
    # are irrelevant to the two methods under test
    variables, _ = convert_submodule(variables, torch_sd(ref, "transformer."),
                                     flax_prefix="transformer",
                                     allow_missing=("transformer/bbox_embed",))

    my_mem, my_props = model.apply(
        variables, jnp.asarray(memory), jnp.asarray(mask_flat), shapes,
        method=DeformableTransformer.gen_encoder_output_proposals,
    )
    my_props, my_mem = np.asarray(my_props), np.asarray(my_mem)
    # masked (padded / out-of-frame) rows are +inf in both (the reference's
    # may also be NaN where log() saw a negative argument before the mask)
    ref_props_np = ref_props.numpy()
    ref_bad = ~np.isfinite(ref_props_np)
    my_bad = ~np.isfinite(my_props)
    np.testing.assert_array_equal(my_bad, ref_bad)
    assert np.all(my_props[my_bad] == np.inf)
    allclose(my_props[~my_bad], ref_props_np[~ref_bad], msg="proposals")
    allclose(my_mem, ref_mem.numpy(), rtol=1e-3, atol=1e-3,
             msg="output_memory")

    # proposal pos embed on arbitrary finite unactivated boxes. The
    # reference hardcodes num_pos_feats=128 (4*128 = 2*d_model only at
    # d_model=256 — its two-stage is shape-inconsistent at any other
    # width), so compare at 256 where it is well-defined. The method is
    # parameter-free, so apply with an empty tree.
    from neurips2023_soc_tpu.models.deformable_transformer import (
        proposal_pos_embed,
    )

    props_in = rng.randn(B, K, 4).astype(np.float32)
    with torch.no_grad():
        ref_pe = ref.get_proposal_pos_embed(torch.from_numpy(props_in))
    my_pe = proposal_pos_embed(jnp.asarray(props_in), 256)
    allclose(np.asarray(my_pe), ref_pe.numpy(), rtol=1e-3, atol=1e-3,
             msg="proposal pos embed")


def test_two_stage_forward_functional():
    """Full two-stage forward (ours): top-k proposal queries drive the
    decoder — Nq becomes two_stage_num_proposals, reference points are
    4-d boxes from the start, outputs stay finite."""
    from neurips2023_soc_tpu.models.deformable_transformer import (
        DeformableTransformer,
    )

    C, L, K = 32, 3, 6
    shapes = ((8, 12), (4, 6), (2, 3))
    B = 2
    rng = np.random.RandomState(7)
    srcs = [rng.randn(B, h, w, C).astype(np.float32) for h, w in shapes]
    poses = [rng.randn(B, h, w, C).astype(np.float32) for h, w in shapes]
    masks = [np.zeros((B, h, w), bool) for h, w in shapes]
    masks[0][1, 5:, :] = True
    masks[1][1, 2:, :] = True
    masks[2][1, 1:, :] = True

    model = DeformableTransformer(
        d_model=C, n_heads=4, num_encoder_layers=1, num_decoder_layers=2,
        dim_feedforward=64, num_feature_levels=L, with_box_refine=True,
        two_stage=True, two_stage_num_proposals=K,
    )
    args = ([jnp.asarray(s) for s in srcs], [jnp.asarray(m) for m in masks],
            [jnp.asarray(p) for p in poses], jnp.zeros((1, C), jnp.float32))
    variables = model.init(jax.random.PRNGKey(1), *args)
    hs, mem, init_ref, inter_ref, enc_outputs = model.apply(variables, *args)
    assert hs.shape == (2, B, K, C)
    assert init_ref.shape == (B, K, 4)
    assert inter_ref.shape == (2, B, K, 4)
    enc_cls, enc_coord = enc_outputs
    S = sum(h * w for h, w in shapes)
    assert enc_cls.shape == (B, S, 1) and enc_coord.shape == (B, S, 4)
    for x in (hs, init_ref, inter_ref):
        assert np.isfinite(np.asarray(x)).all()
    # selected proposals must come from valid (finite-coordinate) tokens
    assert np.isfinite(np.asarray(init_ref)).all()
    assert (np.asarray(init_ref) > 0).all() and (np.asarray(init_ref) < 1).all()


# ------------------------------------------------------------ 2D Swin


def test_swin2d_vs_reference():
    """2D image Swin (reference models/swin_transformer.py:446-641) == our
    Video-Swin machinery with temporal window 1 + per-stage output norms,
    loaded through the swin2d_to_backbone checkpoint adapter. The reference
    never wires this backbone into SOC (models/soc.py:42-45); we support it
    end-to-end."""
    from models.swin_transformer import SwinTransformer as RefSwin2D
    from neurips2023_soc_tpu.models.video_swin import VideoSwinBackbone
    from neurips2023_soc_tpu.training.convert import swin2d_to_backbone

    seed_all(0)
    ref = RefSwin2D(
        pretrain_img_size=224, patch_size=4, in_chans=3, embed_dim=16,
        depths=[1, 1, 2, 1], num_heads=[1, 2, 4, 8], window_size=7,
        mlp_ratio=4.0, qkv_bias=True, qk_scale=None, drop_rate=0.0,
        attn_drop_rate=0.0, drop_path_rate=0.2, ape=False, patch_norm=True,
        out_indices=(0, 1, 2, 3), use_checkpoint=False,
    )
    # note: not chained — the reference's overridden train() (swin
    # transformer :620-623) forgets `return self`, so .eval() returns None
    ref.eval()

    # all four levels (56/28/14/7) are >= the 7x7 window: below the window
    # size the two lineages legitimately diverge — 2D Swin pads the map up
    # to a full window (swin_transformer.py:216-219) while Video Swin clamps
    # the window to the map (video_swin_transformer.py:71-84). Every real
    # workload resolution (shorter side >= 224) keeps all levels >= 7.
    B, T, H, W = 1, 2, 224, 224
    rng = np.random.RandomState(6)
    video = rng.randn(B, T, H, W, 3).astype(np.float32)

    with torch.no_grad():
        frames = torch.from_numpy(
            video.reshape(B * T, H, W, 3).transpose(0, 3, 1, 2))
        ref_out = ref(frames)  # {'0': (B*T, C, h, w), ...}

    model = VideoSwinBackbone(
        patch_size=(1, 4, 4), embed_dim=16, depths=(1, 1, 2, 1),
        num_heads=(1, 2, 4, 8), window=(1, 7, 7), out_norms=True,
        drop_path_rate=0.2,
    )
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(video))
    sd = swin2d_to_backbone(torch_sd(ref))
    variables, _ = convert_submodule(variables, sd, flax_prefix="backbone")
    mine = model.apply(variables, jnp.asarray(video))
    for lvl in range(4):
        allclose(
            np.asarray(mine[lvl]).transpose(0, 3, 1, 2),
            ref_out[str(lvl)].numpy(),
            rtol=1e-3, atol=1e-3,
            msg=f"2d swin level {lvl}",
        )


# --------------------------------------------------- criterion + matcher


def _dense_targets(rng, T=3, B=2, N=1, H=32, W=32, invisible=()):  # noqa: C901
    """Dense target dict in our layout; every reference training workload has
    exactly one annotated instance per sample (the referred object)."""
    masks = np.zeros((T, B, N, H, W), np.float32)
    boxes = np.zeros((T, B, N, 4), np.float32)
    for b in range(B):
        y0, x0 = 4 + 3 * b, 6 + 2 * b
        masks[:, b, 0, y0:y0 + 12, x0:x0 + 10] = 1.0
        boxes[:, b, 0] = [(x0 + 5) / W, (y0 + 6) / H, 10 / W, 12 / H]
    vis = np.ones((T, B, N), bool)
    for (t, b) in invisible:
        vis[t, b, 0] = False
    return {
        "masks": masks,
        "boxes": boxes,
        "labels": np.zeros((B, N), np.int32),
        "inst_valid": np.ones((B, N), bool),
        "is_ref_inst_visible": vis,
        "referred_instance_idx": np.zeros((B,), np.int32),
    }


def _stacked_outputs(rng, Lyr=2, T=3, B=2, Nq=6, C=16, hm=8, wm=8):
    return {
        "pred_masks": rng.randn(Lyr, T, B, Nq, hm, wm).astype(np.float32),
        "pred_boxes": (rng.rand(Lyr, T, B, Nq, 4).astype(np.float32) * 0.5
                       + 0.25),
        "pred_cls": rng.randn(Lyr, T, B, Nq, 1).astype(np.float32),
        "pred_logit": rng.randn(Lyr, B, Nq, C).astype(np.float32),
        "text_sentence_feature": rng.randn(B, C).astype(np.float32),
    }


def _targets_to_reference(tg):
    T, B, N = tg["is_ref_inst_visible"].shape
    out = []
    for t in range(T):
        row = []
        for b in range(B):
            ref_idx = int(tg["referred_instance_idx"][b])
            row.append({
                "masks": torch.from_numpy(tg["masks"][t, b]),
                "boxes": torch.from_numpy(tg["boxes"][t, b]),
                "labels": torch.from_numpy(
                    tg["labels"][b].astype(np.int64)[:, None]),
                "referred_instance_idx": torch.tensor(ref_idx),
                "is_ref_inst_visible": torch.tensor(
                    bool(tg["is_ref_inst_visible"][t, b, ref_idx])),
            })
        out.append(tuple(row))
    return out


@pytest.mark.parametrize("T,invisible", [
    (3, ()), (3, ((1, 0), (2, 1))),
    # T=1 exercises the reference's separate A2D/pretrain label-cost branch
    # (models/matcher.py:160-168) and frames_size=1 label loss
    (1, ()),
])
def test_criterion_vs_reference(T, invisible):
    """Loss-value parity of matcher + SetCriterion against the actual
    reference modules (reference models/criterion.py:47-216,
    models/matcher.py:38-112), including aux layers, the visual-linguistic
    contrastive loss, and per-frame visibility gating."""
    from models.matcher import HungarianMatcher
    from models.criterion import SetCriterion
    from neurips2023_soc_tpu.losses import (
        CriterionConfig, compute_criterion)

    rng = np.random.RandomState(11)
    tg = _dense_targets(rng, T=T, invisible=invisible)
    outs = _stacked_outputs(rng, T=T)
    Lyr = outs["pred_masks"].shape[0]

    matcher = HungarianMatcher(cost_con=0.0, cost_dice=5.0, cost_cls=2.0,
                               cost_box=2.0, cost_giou=2.0, num_classes=1)
    weight_dict = {"loss_dice": 5.0, "loss_sigmoid_focal": 2.0,
                   "loss_con": 1.0, "loss_cls": 2.0, "loss_bbox": 2.0,
                   "loss_giou": 2.0}
    ref_criterion = SetCriterion(matcher, weight_dict, eos_coef=0.1,
                                 text_refer=True, num_classes=1)

    def ref_layer(i):
        return {
            "pred_masks": torch.from_numpy(outs["pred_masks"][i]),
            "pred_boxes": torch.from_numpy(outs["pred_boxes"][i]),
            "pred_cls": torch.from_numpy(outs["pred_cls"][i]),
            "pred_logit": torch.from_numpy(outs["pred_logit"][i]),
            "text_sentence_feature": torch.from_numpy(
                outs["text_sentence_feature"]),
        }

    ref_out = ref_layer(Lyr - 1)
    ref_out["aux_outputs"] = [ref_layer(i) for i in range(Lyr - 1)]
    with torch.no_grad():
        ref_losses = {k: float(v)
                      for k, v in ref_criterion(
                          ref_out, _targets_to_reference(tg)).items()}

    cfg = CriterionConfig()
    mine = compute_criterion(
        {k: jnp.asarray(v) for k, v in outs.items()},
        {k: jnp.asarray(v) for k, v in tg.items()},
        cfg,
    )
    mine = {k: float(v) for k, v in mine.items()}

    assert set(mine) == set(ref_losses), (
        sorted(set(mine) ^ set(ref_losses)))
    for k in sorted(ref_losses):
        assert abs(mine[k] - ref_losses[k]) <= 1e-3 + 1e-3 * abs(ref_losses[k]), (
            k, mine[k], ref_losses[k])


# ------------------------------------------------------ SOC end-to-end


def test_soc_end_to_end_vs_reference():
    """Full-model activation parity: the actual reference SOC (video-swin-t
    backbone, tiny RoBERTa, deformable transformer, VOC, dynamic mask head —
    reference models/soc.py:184-394) vs our flax SOC with weights converted
    by training/convert.py. Locks every layout convention in the converter
    and every module's semantics end to end. B=1 because the reference VOC
    regroup is only correct there (models/voc.py:282)."""
    import types

    import models.soc as ref_soc_mod
    from misc import NestedTensor
    import transformers

    from neurips2023_soc_tpu.models.soc import SOC

    seed_all(0)
    # d_model=128: the reference FPN decoder GroupNorms d_model//16 channels
    # with 8 groups (segmentation.py), so smaller widths cannot instantiate
    C, Nq, heads = 128, 5, 8
    T, B, H, W = 3, 1, 64, 96
    S = 8

    hf_cfg = transformers.RobertaConfig(
        vocab_size=1024, hidden_size=64, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=128,
        max_position_embeddings=514, type_vocab_size=1, pad_token_id=1,
        layer_norm_eps=1e-5,
    )
    ids = np.array([[0, 5, 9, 200, 7, 2, 1, 1]], np.int64)
    attn_mask = np.array([[1, 1, 1, 1, 1, 1, 0, 0]], np.int64)

    class FakeRobertaModel:
        @staticmethod
        def from_pretrained(name):
            return transformers.RobertaModel(hf_cfg)

    class FakeTokenizer:
        @staticmethod
        def from_pretrained(name):
            tok = types.SimpleNamespace()

            def batch_encode_plus(texts, **kw):
                return transformers.BatchEncoding({
                    "input_ids": torch.from_numpy(ids),
                    "attention_mask": torch.from_numpy(attn_mask),
                }, tensor_type="pt")

            tok.batch_encode_plus = batch_encode_plus
            return tok

    ref_config = types.SimpleNamespace(
        backbone="video-swin-t",
        use_checkpoint=False,
        backbone_pretrained_path=None,
        DeformTransformer=dict(
            d_model=C, nheads=heads, enc_layers=2, dec_layers=2,
            dim_feedforward=64, dropout=0.0, num_feature_levels=4,
            dec_n_points=4, enc_n_points=4, two_stage=False, num_queries=Nq,
        ),
        VOC=dict(input_dim=C, window_size=0, num_frame_queries=Nq,
                 num_frames=T, num_queries=Nq, nheads=heads,
                 dim_feedforward=64, enc_layers=2, dec_layers=2),
        num_classes=1, rel_coord=True, with_box_refine=True,
        mask_kernels_dim=8, controller_layers=3, dynamic_mask_channels=8,
        vl_loss=True, aux_loss=True,
        text_encoder_type="roberta-tiny", freeze_text_encoder=True,
    )

    saved = (ref_soc_mod.RobertaModel, ref_soc_mod.RobertaTokenizerFast)
    ref_soc_mod.RobertaModel = FakeRobertaModel
    ref_soc_mod.RobertaTokenizerFast = FakeTokenizer
    try:
        ref = ref_soc_mod.SOC(ref_config)
    finally:
        ref_soc_mod.RobertaModel, ref_soc_mod.RobertaTokenizerFast = saved
    ref.eval()

    rng = np.random.RandomState(9)
    pixels = rng.randn(T, B, H, W, 3).astype(np.float32)
    pad_mask = np.zeros((T, B, H, W), bool)

    with torch.no_grad():
        samples = NestedTensor(
            torch.from_numpy(pixels.transpose(0, 1, 4, 2, 3)).clone(),
            torch.from_numpy(pad_mask.copy()),
        )
        # the reference needs only targets[0][i]['size'] (input size) for
        # rel-coord scaling (models/soc.py:420-426)
        size_targets = [({"size": torch.tensor([H, W])},) for _ in range(T)]
        ref_out = ref(samples, None, ["the parity probe"], size_targets)

    model = SOC(
        backbone_name="video-swin-t", d_model=C, num_queries=Nq,
        dim_feedforward=64, enc_layers=2, dec_layers=2,
        voc_enc_layers=2, voc_dec_layers=2,
        text_encoder_type="roberta-tiny", dropout=0.0,
    )
    jp = jnp.asarray(pixels)
    jm = jnp.asarray(pad_mask)
    jids = jnp.asarray(ids.astype(np.int32))
    jmask = jnp.asarray(attn_mask.astype(np.int32))
    sizes = jnp.asarray([[H, W]], jnp.float32)
    variables = model.init(jax.random.PRNGKey(0), jp, jm, jids, jmask,
                           sample_sizes=sizes)
    variables, report = convert_submodule(variables, torch_sd(ref))
    mine = model.apply(variables, jp, jm, jids, jmask, sample_sizes=sizes,
                       training=False)

    # at inference VOC emits one layer which broadcasts over the decoder
    # stack on both sides; the reference's top-level dict is the LAST layer
    # (models/soc.py:385-393), earlier layers live in aux_outputs
    allclose(np.asarray(mine["pred_cls"][-1]), ref_out["pred_cls"].numpy(),
             rtol=2e-3, atol=2e-3, msg="e2e pred_cls")
    allclose(np.asarray(mine["pred_boxes"][-1]), ref_out["pred_boxes"].numpy(),
             rtol=2e-3, atol=2e-3, msg="e2e pred_boxes")
    allclose(np.asarray(mine["pred_masks"][-1]), ref_out["pred_masks"].numpy(),
             rtol=5e-3, atol=5e-3, msg="e2e pred_masks")
    allclose(np.asarray(mine["pred_logit"][-1]), ref_out["pred_logit"].numpy(),
             rtol=2e-3, atol=2e-3, msg="e2e pred_logit")
    for i, aux in enumerate(ref_out.get("aux_outputs", [])):
        allclose(np.asarray(mine["pred_masks"][i]), aux["pred_masks"].numpy(),
                 rtol=5e-3, atol=5e-3, msg=f"e2e aux {i} pred_masks")
