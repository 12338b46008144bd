"""SOC — Semantic-assisted Object Cluster, the composition root.

Behavioral twin of reference models/soc.py:31-394, rebuilt TPU-first:
  * one flax module; the whole clip forward is a single jitted program;
  * channels-last, batch-major; time folded into batch (b-major `(b t)` rows)
    for all per-frame stages;
  * the dynamic mask head runs as clip-batched einsums (models/segmentation.py);
  * all shapes static — variable T/H/W/text handled by bucketing upstream.

Outputs are stacked over decoder layers (Lyr leading axis) instead of the
reference's list-of-dicts:
  pred_masks:  (Lyr, T, B, Nq, H/4, W/4)
  pred_cls:    (Lyr, T, B, Nq, K)
  pred_boxes:  (Lyr, T, B, Nq, 4)
  pred_logit:  (Lyr, B, Nq, C)      (VOC video-query embeddings)
  text_sentence_feature: (B, C)     (mean of fused level-3 text tokens,
                                     reference models/soc.py:296-310)
"""
from __future__ import annotations

import math
from typing import Any, Dict, Optional, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..ops import downsample_mask_nearest
from ..utils.boxes import inverse_sigmoid
from .common import MLP, FeatureResizer, MMF
from .deformable_transformer import DeformableTransformer
from .position_encoding import position_embedding_sine_1d, position_embedding_sine_2d
from .segmentation import (
    FPNSpatialDecoder,
    dynamic_mask_with_coords,
    mask_head_param_split,
)
from .text_encoder import ROBERTA_CONFIGS, RobertaEncoder
from .video_swin import SWIN_CONFIGS, build_video_swin
from .voc import VOC


class SOC(nn.Module):
    backbone_name: str = "video-swin-t"
    num_classes: int = 1
    d_model: int = 256
    num_queries: int = 20
    num_feature_levels: int = 4
    nheads: int = 8
    enc_layers: int = 3
    dec_layers: int = 3
    dim_feedforward: int = 2048
    dropout: float = 0.1
    enc_n_points: int = 4
    dec_n_points: int = 4
    with_box_refine: bool = True
    two_stage: bool = False
    two_stage_num_proposals: int = 300
    rel_coord: bool = True
    mask_kernels_dim: int = 8
    controller_layers: int = 3
    dynamic_mask_channels: int = 8
    voc_window_size: int = 0
    voc_enc_layers: int = 3
    voc_dec_layers: int = 3
    text_encoder_type: str = "roberta-base"
    freeze_text_encoder: bool = True
    vl_loss: bool = True
    aux_loss: bool = True
    use_remat: bool = False
    msda_impl: str = "auto"
    swin_attn_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C = self.d_model
        if self.backbone_name in SWIN_CONFIGS:
            self.backbone = build_video_swin(
                self.backbone_name, use_remat=self.use_remat,
                attn_impl=self.swin_attn_impl, dtype=self.dtype,
            )
            embed = SWIN_CONFIGS[self.backbone_name]["embed_dim"]
            self.backbone_channels = [embed * 2 ** i for i in range(4)]
        elif self.backbone_name == "resnet50":
            from .resnet import ResNet50Backbone

            self.backbone = ResNet50Backbone(dtype=self.dtype)
            self.backbone_channels = [256, 512, 1024, 2048]
        else:
            raise ValueError(f"unknown backbone {self.backbone_name}")

        self.transformer = DeformableTransformer(
            d_model=C,
            n_heads=self.nheads,
            num_encoder_layers=self.enc_layers,
            num_decoder_layers=self.dec_layers,
            dim_feedforward=self.dim_feedforward,
            dropout=self.dropout,
            num_feature_levels=self.num_feature_levels,
            dec_n_points=self.dec_n_points,
            enc_n_points=self.enc_n_points,
            with_box_refine=self.with_box_refine,
            two_stage=self.two_stage,
            two_stage_num_proposals=self.two_stage_num_proposals,
            num_classes=self.num_classes,
            impl=self.msda_impl,
            dtype=self.dtype,
            name="transformer",
        )
        # two-stage replaces the Nq learned queries with top-k encoder
        # proposals, so every per-query module downstream sizes to that
        eff_nq = (self.two_stage_num_proposals if self.two_stage
                  else self.num_queries)
        self.voc = VOC(
            input_dim=C,
            window_size=self.voc_window_size,
            num_frame_queries=eff_nq,
            num_queries=eff_nq,
            num_heads=self.nheads,
            dim_feedforward=self.dim_feedforward,
            enc_layers=self.voc_enc_layers,
            dec_layers=self.voc_dec_layers,
            dtype=self.dtype,
            name="voc",
        )
        self.text_encoder = RobertaEncoder(
            ROBERTA_CONFIGS[self.text_encoder_type.split("/")[-1]]
            if self.text_encoder_type.split("/")[-1] in ROBERTA_CONFIGS
            else ROBERTA_CONFIGS["roberta-base"],
            dtype=self.dtype,
            name="text_encoder",
        )
        self.txt_proj = FeatureResizer(C, dropout=0.1, name="txt_proj")
        self.vlf = MMF(C, self.nheads, dtype=self.dtype, name="vlf")
        self.lvf = MMF(C, self.nheads, dtype=self.dtype, name="lvf")

        # input projections: 1x1 conv + GN(32) for backbone levels 2..4, plus a
        # stride-2 3x3 conv for the extra pyramid level (reference soc.py:56-71)
        n_backbone = 3
        projs = []
        for i in range(n_backbone):
            projs.append(
                (
                    nn.Conv(C, (1, 1), dtype=self.dtype, name=f"input_proj_{i}_conv"),
                    nn.GroupNorm(32, dtype=self.dtype, name=f"input_proj_{i}_gn"),
                )
            )
        for i in range(n_backbone, self.num_feature_levels):
            projs.append(
                (
                    nn.Conv(C, (3, 3), strides=2, padding=1, dtype=self.dtype,
                            name=f"input_proj_{i}_conv"),
                    nn.GroupNorm(32, dtype=self.dtype, name=f"input_proj_{i}_gn"),
                )
            )
        self.input_proj = projs

        if not self.two_stage:
            self.query_embed = self.param(
                "query_embed", nn.initializers.normal(1.0),
                (self.num_queries, C), jnp.float32,
            )
        else:
            # two-stage derives its queries from top-k encoder proposals —
            # a learned query embedding would be a dead, trained-nowhere
            # parameter (mirrors the transformer's reference_points gating)
            self.query_embed = None

        bias_value = -math.log((1 - 0.01) / 0.01)
        num_pred = self.dec_layers
        if self.with_box_refine:
            self.class_embed = [
                nn.Dense(
                    self.num_classes,
                    dtype=self.dtype,
                    bias_init=nn.initializers.constant(bias_value),
                    name=f"class_embed_{i}",
                )
                for i in range(num_pred)
            ]
        else:
            shared = nn.Dense(
                self.num_classes, dtype=self.dtype,
                bias_init=nn.initializers.constant(bias_value),
                name="class_embed_shared",
            )
            self.class_embed = [shared] * num_pred

        weight_nums, bias_nums = mask_head_param_split(
            self.mask_kernels_dim, self.dynamic_mask_channels,
            self.controller_layers, self.rel_coord,
        )
        self.num_gen_params = sum(weight_nums) + sum(bias_nums)
        self.controller = MLP(C, self.num_gen_params, 3, dtype=self.dtype,
                              name="controller")
        self.spatial_decoder = FPNSpatialDecoder(
            C, [C, C, self.backbone_channels[0]], self.mask_kernels_dim,
            dtype=self.dtype, name="spatial_decoder",
        )

    def encode_text(self, text_ids, text_mask, deterministic=True):
        """RoBERTa -> txt_proj'd token sequence + sentence feature
        (reference models/soc.py:167-181)."""
        last_hidden, pooled = self.text_encoder(
            text_ids, text_mask,
            deterministic=deterministic or self.freeze_text_encoder,
        )
        if self.freeze_text_encoder:
            last_hidden = jax.lax.stop_gradient(last_hidden)
            pooled = jax.lax.stop_gradient(pooled)
        txt_memory = self.txt_proj(last_hidden, deterministic=deterministic)
        sentence = self.txt_proj(pooled, deterministic=deterministic)
        txt_pad_mask = text_mask == 0  # True on padding
        return txt_memory, sentence, txt_pad_mask

    def backbone_features(
        self,
        pixels: jnp.ndarray,  # (T, B, H, W, 3)
        pad_mask: jnp.ndarray,  # (T, B, H, W) True=pad (unused; kept so the
        #                         stage signature matches the clip program)
        training: bool = False,
    ):
        """The text-INDEPENDENT stage: backbone over the whole clip, b-major
        (B*T, Hi, Wi, Ci) per-level features. Split from `head` so
        multi-expression inference runs it once per video and reuses the
        features for every expression (reference infer_refytb.py/infer_davis.py
        re-run the full model per expression; the backbone is ~55% of the
        forward, see BENCH_NOTES.md)."""
        video = jnp.transpose(pixels, (1, 0, 2, 3, 4)).astype(self.dtype)
        return self.backbone(video, deterministic=not training)

    def head(
        self,
        features,  # tuple of (B*T, Hi, Wi, Ci) from backbone_features
        pad_mask: jnp.ndarray,  # (T, B, H, W) True=pad
        text_ids: jnp.ndarray,  # (B, S)
        text_mask: jnp.ndarray,  # (B, S) 1=real
        sample_sizes: Optional[jnp.ndarray] = None,  # (B, 2) resized (h, w)
        valid_indices: Optional[jnp.ndarray] = None,  # (B,) frame idx per sample
        training: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        """The text-DEPENDENT stage: text encoding, bidirectional fusion,
        deformable transformer, VOC, heads, dynamic masks."""
        deterministic = not training
        Tfull, B, H, W = pad_mask.shape
        C = self.d_model

        text_word_features, text_sentence_feature, txt_pad_mask = self.encode_text(
            text_ids, text_mask, deterministic
        )
        text_pos = position_embedding_sine_1d(txt_pad_mask, C).astype(self.dtype)

        # per-level pad masks from the input mask
        pad_bt = jnp.transpose(pad_mask, (1, 0, 2, 3)).reshape(B * Tfull, H, W)
        feat_masks = [
            downsample_mask_nearest(pad_bt, f.shape[1], f.shape[2]) for f in features
        ]

        if valid_indices is not None:
            # keep only annotated frames (A2D center frames); T collapses to 1
            rows = jnp.arange(B) * Tfull + valid_indices
            features = [f[rows] for f in features]
            feat_masks = [m[rows] for m in feat_masks]
            pad_bt = pad_bt[rows]
            T = 1
        else:
            T = Tfull

        # levels 2..4 of the backbone: project + bidirectional text fusion
        srcs, masks, poses, langs = [], [], [], []
        for l, (feat, fmask) in enumerate(zip(features[-3:], feat_masks[-3:])):
            conv, gn = self.input_proj[l]
            src = gn(conv(feat))  # (B*T, h, w, C)
            n, h, w, _ = src.shape
            pos_l = position_embedding_sine_2d(fmask, C // 2).astype(self.dtype)

            seq = src.reshape(B, T * h * w, C)
            mask_seq = fmask.reshape(B, T * h * w)
            fused = self.vlf(
                tgt=seq, memory=text_word_features,
                memory_key_padding_mask=txt_pad_mask, pos=text_pos,
                deterministic=deterministic,
            )
            # the reference passes the vision 2D sine PE as the memory pos
            # (models/soc.py:234,242-248)
            lan = self.lvf(
                tgt=text_word_features, memory=seq,
                memory_key_padding_mask=mask_seq,
                pos=pos_l.reshape(B, T * h * w, C),
                deterministic=deterministic,
            )
            srcs.append(fused.reshape(B * T, h, w, C))
            masks.append(fmask)
            poses.append(pos_l)
            langs.append(lan)  # (B, S, C)

        # extra pyramid level(s): stride-2 conv + text->vision fusion only
        for l in range(3, self.num_feature_levels):
            conv, gn = self.input_proj[l]
            src = gn(conv(features[-1] if l == 3 else srcs[-1]))
            n, h, w, _ = src.shape
            m = downsample_mask_nearest(pad_bt, h, w)
            pos_l = position_embedding_sine_2d(m, C // 2).astype(self.dtype)
            seq = src.reshape(B, T * h * w, C)
            fused = self.vlf(
                tgt=seq, memory=text_word_features,
                memory_key_padding_mask=txt_pad_mask, pos=text_pos,
                deterministic=deterministic,
            )
            srcs.append(fused.reshape(B * T, h, w, C))
            masks.append(m)
            poses.append(pos_l)

        hs, memory_features, init_reference, inter_references, enc_outputs = (
            self.transformer(
                srcs, masks, poses, self.query_embed,
                deterministic=deterministic,
            )
        )
        Lyr = hs.shape[0]
        # two-stage replaces the Nq learned queries with top-k encoder
        # proposals (reference models/deformable_transformer.py:181-190)
        Nq = hs.shape[2]

        # text feature for the contrastive vl loss: mean of the last fused
        # level's non-pad text tokens (reference models/soc.py:296-310)
        valid = (~txt_pad_mask).astype(jnp.float32)[..., None]
        text_features = (langs[-1].astype(jnp.float32) * valid).sum(1) / jnp.maximum(
            valid.sum(1), 1.0
        )

        # VOC temporal clustering + residual broadcast over T
        hs_tb = hs.reshape(Lyr, B, T, Nq, C).transpose(0, 2, 1, 3, 4)  # (L,T,B,Nq,C)
        voc_hs = self.voc(
            hs_tb, text_sentence_feature, training=training,
            deterministic=deterministic,
        )  # (Lyr_eff, B, Nq, C)
        # Reference inference quirk, reproduced exactly: with vl_loss on,
        # layer_outputs is built by zip()ing the L-layer head outputs with
        # the SINGLE-layer inference VOC output (reference models/soc.py:377),
        # so zip truncates to one entry — the deployed model scores layer-0
        # queries (+ the last-layer VOC residual) with the layer-0 heads.
        # With vl_loss off the zipped lists have equal length and the last
        # layer is kept. `emit_layers` is the static set of layers that reach
        # the (expensive) dynamic mask head and the output dict; the cheap
        # cls/box heads still run for every layer so all head params exist
        # regardless of mode.
        if training:
            emit_layers = tuple(range(Lyr))
        elif self.vl_loss:
            emit_layers = (0,)
        else:
            emit_layers = tuple(range(Lyr))
        if not training:
            # inference VOC consumed only the last layer; broadcast it back
            voc_hs = jnp.broadcast_to(voc_hs, (Lyr, B, Nq, C))
        hs_voc = hs_tb + voc_hs[:, None]  # (Lyr, T, B, Nq, C)
        hs_voc_flat = hs_voc.transpose(0, 2, 1, 3, 4).reshape(Lyr, B * T, Nq, C)

        # classification + box heads with inverse-sigmoid refinement
        cls_list, box_list = [], []
        for lvl in range(Lyr):
            reference = init_reference if lvl == 0 else inter_references[lvl - 1]
            reference = inverse_sigmoid(reference)
            out_cls = self.class_embed[lvl](hs_voc_flat[lvl])
            tmp = self.transformer.bbox_head(hs_voc_flat[lvl], lvl).astype(jnp.float32)
            if reference.shape[-1] == 4:
                tmp = tmp + reference
            else:
                tmp = jnp.concatenate([tmp[..., :2] + reference, tmp[..., 2:]], -1)
            box_list.append(nn.sigmoid(tmp))
            cls_list.append(out_cls)
        outputs_class = jnp.stack(
            [cls_list[i] for i in emit_layers])  # (L_emit, B*T, Nq, K)
        outputs_coord = jnp.stack(
            [box_list[i] for i in emit_layers])  # (L_emit, B*T, Nq, 4)

        # FPN mask features at stride 4
        fpn_inputs = list(memory_features)  # strides 8, 16, 32 (B*T, h, w, C)
        mask_feat = self.spatial_decoder(
            fpn_inputs[-1], [fpn_inputs[1], fpn_inputs[0], features[0]]
        )  # (B*T, H/4, W/4, mask_dim)
        hm, wm = mask_feat.shape[1:3]
        mask_features = mask_feat.reshape(B, T, hm, wm, self.mask_kernels_dim)

        if sample_sizes is None:
            sample_sizes = jnp.broadcast_to(
                jnp.asarray([H, W], jnp.float32)[None], (B, 2)
            )

        # dynamic mask head per emitted decoder layer
        mask_list = []
        for lvl in emit_layers:
            params = self.controller(hs_voc_flat[lvl])  # (B*T, Nq, P)
            params = params.reshape(B, T * Nq, self.num_gen_params)
            refs = inter_references[lvl][..., :2].reshape(B, T * Nq, 2)
            seg = dynamic_mask_with_coords(
                mask_features, params, refs, sample_sizes,
                channels=self.dynamic_mask_channels,
                num_layers=self.controller_layers,
                rel_coord=self.rel_coord,
            )  # (B, T*Nq, hm, wm)
            seg = seg.reshape(B, T, Nq, hm, wm).transpose(1, 0, 2, 3, 4)
            mask_list.append(seg)
        output_masks = jnp.stack(mask_list)  # (L_emit, T, B, Nq, hm, wm)

        Le = len(emit_layers)
        out = {
            "pred_masks": output_masks,
            "pred_cls": outputs_class.reshape(Le, B, T, Nq, -1).transpose(0, 2, 1, 3, 4),
            "pred_boxes": outputs_coord.reshape(Le, B, T, Nq, 4).transpose(0, 2, 1, 3, 4),
            "pred_logit": voc_hs[jnp.asarray(emit_layers)],  # (L_emit, B, Nq, C)
            "text_sentence_feature": text_features,  # (B, C)
        }
        if enc_outputs is not None:
            # exposed for inspection; no loss consumes them, matching the
            # reference which drops the two-stage encoder outputs
            # (reference models/soc.py:288)
            out["enc_outputs"] = {
                "pred_cls": enc_outputs[0],
                "pred_boxes_unact": enc_outputs[1],
            }
        return out

    def __call__(
        self,
        pixels: jnp.ndarray,  # (T, B, H, W, 3)
        pad_mask: jnp.ndarray,  # (T, B, H, W) True=pad
        text_ids: jnp.ndarray,  # (B, S)
        text_mask: jnp.ndarray,  # (B, S) 1=real
        sample_sizes: Optional[jnp.ndarray] = None,  # (B, 2) resized (h, w)
        valid_indices: Optional[jnp.ndarray] = None,  # (B,) frame idx per sample
        training: bool = False,
    ) -> Dict[str, jnp.ndarray]:
        features = self.backbone_features(pixels, pad_mask, training=training)
        return self.head(
            features, pad_mask, text_ids, text_mask,
            sample_sizes=sample_sizes, valid_indices=valid_indices,
            training=training,
        )
