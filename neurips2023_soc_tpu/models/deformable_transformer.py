"""Deformable-DETR transformer, TPU-native.

Behavioral twin of the reference's encoder/decoder stack
(reference models/deformable_transformer.py:25-444) with these TPU-first
changes:
  * spatial shapes are static python tuples (compiled into the program);
  * all sequences are batch-major (B*T, S, C);
  * the CUDA MSDeformAttn is the `ops.ms_deform_attn` op;
  * per-layer box refinement runs under jit with `stop_gradient` standing in
    for `.detach()`.
Two-stage mode (disabled in every shipped config,
configs/refer_youtube_vos.yaml:61) follows the reference's
`gen_encoder_output_proposals` + top-k proposal decoder init
(reference models/deformable_transformer.py:77-122,172-190) with one
necessary repair: the reference's own two-stage forward is broken as
shipped — it indexes `self.decoder.class_embed[self.decoder.num_layers]`
but `decoder.class_embed` is initialized to None (:359) and never assigned
by SOC (models/soc.py:89-100 only assigns `decoder.bbox_embed`, and with
only `num_layers` clones, one short of the index). We give the transformer
dedicated encoder-stage heads (`enc_class_embed`/`enc_bbox_embed`, the
`num_pred = dec_layers + 1` arrangement of upstream Deformable-DETR), and
mask padded/out-of-frame proposals out of the top-k so their +inf logit
coordinates can never be selected (the reference would propagate them into
`sigmoid` -> 1.0 and `sin(inf)` -> NaN). The encoder-stage outputs are
returned but, like the reference (models/soc.py:288 drops them), not fed
to any loss.
"""
from __future__ import annotations

import math
from typing import List, Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops import ms_deform_attn
from ..utils.boxes import inverse_sigmoid
from .common import MLP, FFNLayer, MultiheadAttention

SpatialShapes = Tuple[Tuple[int, int], ...]


def _offset_grid_bias(n_heads: int, n_levels: int, n_points: int) -> np.ndarray:
    """Direction-grid bias init for sampling offsets
    (reference models/ops/modules/ms_deform_attn.py:63-71)."""
    thetas = np.arange(n_heads, dtype=np.float32) * (2.0 * math.pi / n_heads)
    grid = np.stack([np.cos(thetas), np.sin(thetas)], -1)  # (M, 2)
    grid = grid / np.abs(grid).max(-1, keepdims=True)
    grid = np.tile(grid[:, None, None, :], (1, n_levels, n_points, 1))
    for i in range(n_points):
        grid[:, :, i, :] *= i + 1
    return grid.reshape(-1)


class MSDeformAttnModule(nn.Module):
    """Query -> sampling offsets + attention weights -> deformable sampling."""

    d_model: int = 256
    n_levels: int = 4
    n_heads: int = 8
    n_points: int = 4
    impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, Lq, C)
        reference_points: jnp.ndarray,  # (B, Lq, L, 2|4)
        input_flatten: jnp.ndarray,  # (B, S, C)
        spatial_shapes: SpatialShapes,
        padding_mask: Optional[jnp.ndarray] = None,  # (B, S) True=pad
    ):
        M, L, P, C = self.n_heads, self.n_levels, self.n_points, self.d_model
        D = C // M
        B, Lq, _ = query.shape
        S = input_flatten.shape[1]

        value = nn.Dense(C, dtype=self.dtype, name="value_proj")(input_flatten)
        if padding_mask is not None:
            value = jnp.where(padding_mask[..., None], 0.0, value)
        value = value.reshape(B, S, M, D)

        offsets = nn.Dense(
            2 * M * L * P,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            bias_init=lambda key, shape, dtype=jnp.float32: jnp.asarray(
                _offset_grid_bias(M, L, P), dtype
            ),
            name="sampling_offsets",
        )(query).reshape(B, Lq, M, L, P, 2)
        attn = nn.Dense(
            M * L * P,
            dtype=self.dtype,
            kernel_init=nn.initializers.zeros,
            name="attention_weights",
        )(query).reshape(B, Lq, M, L * P)
        attn = nn.softmax(attn.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = attn.reshape(B, Lq, M, L, P)

        if reference_points.shape[-1] == 2:
            normalizer = jnp.asarray(
                [[w, h] for h, w in spatial_shapes], dtype=jnp.float32
            )  # (L, 2) xy
            loc = (
                reference_points[:, :, None, :, None, :]
                + offsets / normalizer[None, None, None, :, None, :]
            )
        else:
            loc = (
                reference_points[:, :, None, :, None, :2]
                + offsets / P * reference_points[:, :, None, :, None, 2:] * 0.5
            )

        out = ms_deform_attn(value, spatial_shapes, loc, attn, impl=self.impl)
        out = nn.Dense(C, dtype=self.dtype, name="output_proj")(out)
        return out, loc, attn


class EncoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dropout: float = 0.1
    activation: str = "relu"
    impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, src, pos, reference_points, spatial_shapes, padding_mask,
                 deterministic: bool = True):
        q = src if pos is None else src + pos
        src2, _, _ = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            impl=self.impl, dtype=self.dtype, name="self_attn",
        )(q, reference_points, src, spatial_shapes, padding_mask)
        src = src + nn.Dropout(self.dropout)(src2, deterministic=deterministic)
        src = nn.LayerNorm(dtype=self.dtype, name="norm1")(src)
        src = FFNLayer(
            self.d_model, self.d_ffn, self.dropout, self.activation,
            dtype=self.dtype, name="ffn",
        )(src, deterministic=deterministic)
        return src


class DecoderLayer(nn.Module):
    d_model: int
    d_ffn: int
    n_levels: int
    n_heads: int
    n_points: int
    dropout: float = 0.1
    activation: str = "relu"
    impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, tgt, query_pos, reference_points, src, spatial_shapes,
                 src_padding_mask, deterministic: bool = True):
        q = tgt if query_pos is None else tgt + query_pos
        tgt2 = MultiheadAttention(
            self.d_model, self.n_heads, self.dropout, dtype=self.dtype,
            name="self_attn",
        )(q, q, tgt, deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm2")(tgt)

        q = tgt if query_pos is None else tgt + query_pos
        tgt2, loc, attn = MSDeformAttnModule(
            self.d_model, self.n_levels, self.n_heads, self.n_points,
            impl=self.impl, dtype=self.dtype, name="cross_attn",
        )(q, reference_points, src, spatial_shapes, src_padding_mask)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        tgt = nn.LayerNorm(dtype=self.dtype, name="norm1")(tgt)

        tgt = FFNLayer(
            self.d_model, self.d_ffn, self.dropout, self.activation,
            dtype=self.dtype, name="ffn",
        )(tgt, deterministic=deterministic)
        return tgt, loc, attn


def encoder_reference_points(
    spatial_shapes: SpatialShapes, valid_ratios: jnp.ndarray
) -> jnp.ndarray:
    """(B, S, L, 2) per-token reference points
    (reference models/deformable_transformer.py:272-285)."""
    ref_list = []
    for lvl, (H, W) in enumerate(spatial_shapes):
        ry = (jnp.arange(H, dtype=jnp.float32) + 0.5)[:, None]
        rx = (jnp.arange(W, dtype=jnp.float32) + 0.5)[None, :]
        ry = jnp.broadcast_to(ry, (H, W)).reshape(-1)
        rx = jnp.broadcast_to(rx, (H, W)).reshape(-1)
        ry = ry[None] / (valid_ratios[:, None, lvl, 1] * H)
        rx = rx[None] / (valid_ratios[:, None, lvl, 0] * W)
        ref_list.append(jnp.stack([rx, ry], -1))  # (B, H*W, 2)
    ref = jnp.concatenate(ref_list, 1)  # (B, S, 2)
    return ref[:, :, None] * valid_ratios[:, None]  # (B, S, L, 2)


def proposal_pos_embed(proposals: jnp.ndarray, d_model: int) -> jnp.ndarray:
    """Sine embedding of (B, Nq, 4) unactivated proposal boxes ->
    (B, Nq, 2*d_model) (reference models/deformable_transformer.py:77-90,
    which hardcodes num_pos_feats=128 — consistent only at d_model=256;
    we scale it so two-stage works at any width)."""
    num_pos_feats = d_model // 2
    dim_t = jnp.arange(num_pos_feats, dtype=jnp.float32)
    dim_t = 10000.0 ** (2.0 * jnp.floor(dim_t / 2.0) / num_pos_feats)
    p = nn.sigmoid(proposals.astype(jnp.float32)) * (2.0 * math.pi)
    pos = p[..., None] / dim_t  # (B, Nq, 4, F)
    pos = jnp.stack(
        [jnp.sin(pos[..., 0::2]), jnp.cos(pos[..., 1::2])], axis=-1
    )  # (B, Nq, 4, F/2, 2)
    return pos.reshape(pos.shape[0], pos.shape[1], -1)


def compute_valid_ratios(masks: Sequence[jnp.ndarray]) -> jnp.ndarray:
    """masks: per-level (B, H, W) True=pad -> (B, L, 2) xy valid fraction
    (reference models/deformable_transformer.py:123-130)."""
    ratios = []
    for m in masks:
        H, W = m.shape[1:]
        valid_h = jnp.sum(~m[:, :, 0], axis=1).astype(jnp.float32)
        valid_w = jnp.sum(~m[:, 0, :], axis=1).astype(jnp.float32)
        ratios.append(jnp.stack([valid_w / W, valid_h / H], -1))
    return jnp.stack(ratios, 1)


class DeformableTransformer(nn.Module):
    d_model: int = 256
    n_heads: int = 8
    num_encoder_layers: int = 3
    num_decoder_layers: int = 3
    dim_feedforward: int = 2048
    dropout: float = 0.1
    activation: str = "relu"
    num_feature_levels: int = 4
    dec_n_points: int = 4
    enc_n_points: int = 4
    with_box_refine: bool = True
    two_stage: bool = False
    two_stage_num_proposals: int = 300
    num_classes: int = 1  # encoder-stage class head width (two-stage only)
    impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        kw = dict(
            d_model=self.d_model,
            d_ffn=self.dim_feedforward,
            n_levels=self.num_feature_levels,
            n_heads=self.n_heads,
            dropout=self.dropout,
            activation=self.activation,
            impl=self.impl,
            dtype=self.dtype,
        )
        self.encoder_layers = [
            EncoderLayer(n_points=self.enc_n_points, **kw, name=f"encoder_layers_{i}")
            for i in range(self.num_encoder_layers)
        ]
        self.decoder_layers = [
            DecoderLayer(n_points=self.dec_n_points, **kw, name=f"decoder_layers_{i}")
            for i in range(self.num_decoder_layers)
        ]
        self.level_embed = self.param(
            "level_embed",
            nn.initializers.normal(1.0),
            (self.num_feature_levels, self.d_model),
            jnp.float32,
        )
        if self.two_stage:
            # reference models/deformable_transformer.py:55-58
            self.enc_output = nn.Dense(self.d_model, dtype=self.dtype,
                                       name="enc_output")
            self.enc_output_norm = nn.LayerNorm(dtype=self.dtype,
                                                name="enc_output_norm")
            self.pos_trans = nn.Dense(self.d_model * 2, dtype=self.dtype,
                                      name="pos_trans")
            self.pos_trans_norm = nn.LayerNorm(dtype=self.dtype,
                                               name="pos_trans_norm")
            # encoder-stage heads (see module docstring on the reference's
            # broken head sharing)
            self.enc_class_embed = nn.Dense(self.num_classes, dtype=self.dtype,
                                            name="enc_class_embed")
            self.enc_bbox_embed = MLP(self.d_model, 4, 3, dtype=self.dtype,
                                      name="enc_bbox_embed")
        else:
            self.reference_points_proj = nn.Dense(
                2, dtype=self.dtype, name="reference_points"
            )
        if self.with_box_refine:
            self.bbox_embed = [
                MLP(self.d_model, 4, 3, dtype=self.dtype, name=f"bbox_embed_{i}")
                for i in range(self.num_decoder_layers)
            ]
        else:
            shared = MLP(self.d_model, 4, 3, dtype=self.dtype, name="bbox_embed_shared")
            self.bbox_embed = [shared] * self.num_decoder_layers

    def gen_encoder_output_proposals(
        self,
        memory: jnp.ndarray,  # (B, S, C)
        padding_mask: jnp.ndarray,  # (B, S) True=pad
        spatial_shapes: SpatialShapes,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Per-token anchor proposals + projected memory for the two-stage
        region-proposal head (reference models/deformable_transformer.py:91-122).

        Returns (output_memory (B,S,C), output_proposals (B,S,4) in
        unactivated logit space, +inf at padded / out-of-frame tokens)."""
        B = memory.shape[0]
        proposals = []
        cur = 0
        for lvl, (H, W) in enumerate(spatial_shapes):
            m = padding_mask[:, cur:cur + H * W].reshape(B, H, W)
            valid_h = jnp.sum(~m[:, :, 0], axis=1).astype(jnp.float32)
            valid_w = jnp.sum(~m[:, 0, :], axis=1).astype(jnp.float32)
            gy, gx = jnp.meshgrid(
                jnp.arange(H, dtype=jnp.float32),
                jnp.arange(W, dtype=jnp.float32), indexing="ij",
            )
            grid = jnp.stack([gx, gy], -1)  # (H, W, 2) xy
            scale = jnp.stack([valid_w, valid_h], -1).reshape(B, 1, 1, 2)
            grid = (grid[None] + 0.5) / scale
            wh = jnp.full_like(grid, 0.05 * (2.0 ** lvl))
            proposals.append(
                jnp.concatenate([grid, wh], -1).reshape(B, H * W, 4))
            cur += H * W
        props = jnp.concatenate(proposals, axis=1)  # (B, S, 4)
        valid = jnp.all((props > 0.01) & (props < 0.99), -1, keepdims=True)
        # reference takes log(p/(1-p)) unguarded then masks the (NaN/inf)
        # out-of-range rows with +inf; we clip first so no NaN ever exists
        # in the graph — masked positions end up +inf either way.
        safe = jnp.clip(props, 1e-6, 1.0 - 1e-6)
        props_unact = jnp.log(safe / (1.0 - safe))
        drop = padding_mask[..., None] | ~valid
        props_unact = jnp.where(drop, jnp.inf, props_unact)
        out_mem = jnp.where(drop, 0.0, memory)
        out_mem = self.enc_output_norm(self.enc_output(out_mem))
        return out_mem, props_unact

    def get_proposal_pos_embed(self, proposals: jnp.ndarray) -> jnp.ndarray:
        return proposal_pos_embed(proposals, self.d_model)

    def bbox_head(self, x: jnp.ndarray, lvl: int) -> jnp.ndarray:
        """Expose the (shared) per-layer box head so the composition root can
        apply it to VOC-refined queries (reference models/soc.py:333)."""
        return self.bbox_embed[lvl](x)

    def __call__(
        self,
        srcs: List[jnp.ndarray],  # per level (B*T, H, W, C)
        masks: List[jnp.ndarray],  # per level (B*T, H, W) True=pad
        pos_embeds: List[jnp.ndarray],  # per level (B*T, H, W, C)
        query_embed: Optional[jnp.ndarray],  # (Nq, C); None when two_stage
        deterministic: bool = True,
    ):
        spatial_shapes = tuple((s.shape[1], s.shape[2]) for s in srcs)
        src_flat = jnp.concatenate(
            [s.reshape(s.shape[0], -1, s.shape[-1]) for s in srcs], axis=1
        )
        mask_flat = jnp.concatenate([m.reshape(m.shape[0], -1) for m in masks], axis=1)
        pos_flat = jnp.concatenate(
            [
                p.reshape(p.shape[0], -1, p.shape[-1])
                + self.level_embed[lvl][None, None].astype(self.dtype)
                for lvl, p in enumerate(pos_embeds)
            ],
            axis=1,
        )
        valid_ratios = compute_valid_ratios(masks)  # (B*T, L, 2)

        # encoder
        enc_ref = encoder_reference_points(spatial_shapes, valid_ratios)
        memory = src_flat
        for layer in self.encoder_layers:
            memory = layer(
                memory, pos_flat, enc_ref, spatial_shapes, mask_flat,
                deterministic=deterministic,
            )

        # decoder
        B = memory.shape[0]
        enc_outputs = None
        if self.two_stage:
            # reference models/deformable_transformer.py:172-190
            output_memory, output_proposals = self.gen_encoder_output_proposals(
                memory, mask_flat, spatial_shapes)
            enc_class = self.enc_class_embed(output_memory).astype(jnp.float32)
            enc_coord_unact = (
                self.enc_bbox_embed(output_memory).astype(jnp.float32)
                + output_proposals
            )
            # the reference top-ks the raw logit; we exclude +inf-coordinate
            # (padded/out-of-frame) proposals — see module docstring
            score = jnp.where(
                jnp.isfinite(output_proposals[..., 0]),
                enc_class[..., 0], -jnp.inf,
            )
            # clamp to the token count (tiny inputs can have fewer encoder
            # tokens than the configured proposal count; torch.topk would
            # raise the same way jax.lax.top_k does)
            k = min(self.two_stage_num_proposals, score.shape[1])
            _, topk_idx = jax.lax.top_k(score, k)
            topk_coords_unact = jnp.take_along_axis(
                enc_coord_unact, topk_idx[..., None], axis=1)
            topk_coords_unact = jax.lax.stop_gradient(topk_coords_unact)
            reference_points = nn.sigmoid(topk_coords_unact)  # (B, K, 4)
            pos_trans_out = self.pos_trans_norm(self.pos_trans(
                self.get_proposal_pos_embed(topk_coords_unact)
                .astype(self.dtype)))
            qe, tgt = jnp.split(pos_trans_out, 2, axis=-1)
            enc_outputs = (enc_class, enc_coord_unact)
        else:
            Nq = query_embed.shape[0]
            qe = jnp.broadcast_to(
                query_embed[None], (B, Nq, query_embed.shape[1]))
            qe = qe.astype(self.dtype)
            tgt = jnp.zeros_like(qe)
            reference_points = nn.sigmoid(
                self.reference_points_proj(qe).astype(jnp.float32)
            )  # (B, Nq, 2)
        init_reference = reference_points

        hs_list, ref_list = [], []
        for lid, layer in enumerate(self.decoder_layers):
            if reference_points.shape[-1] == 4:
                ref_input = (
                    reference_points[:, :, None]
                    * jnp.concatenate([valid_ratios, valid_ratios], -1)[:, None]
                )
            else:
                ref_input = reference_points[:, :, None] * valid_ratios[:, None]
            tgt, _, _ = layer(
                tgt, qe, ref_input, memory, spatial_shapes, mask_flat,
                deterministic=deterministic,
            )
            if self.with_box_refine:
                tmp = self.bbox_embed[lid](tgt).astype(jnp.float32)
                if reference_points.shape[-1] == 4:
                    new_ref = nn.sigmoid(tmp + inverse_sigmoid(reference_points))
                else:
                    xy = tmp[..., :2] + inverse_sigmoid(reference_points)
                    new_ref = nn.sigmoid(
                        jnp.concatenate([xy, tmp[..., 2:]], axis=-1)
                    )
                reference_points = jax.lax.stop_gradient(new_ref)
            hs_list.append(tgt)
            ref_list.append(reference_points)

        hs = jnp.stack(hs_list)  # (Lyr, B*T, Nq, C)
        inter_references = jnp.stack(ref_list)  # (Lyr, B*T, Nq, 2|4)

        # re-assemble encoder memory into FPN maps for the first L-1 levels
        # (reference models/deformable_transformer.py:202-210)
        memory_features = []
        start = 0
        for lvl in range(self.num_feature_levels - 1):
            H, W = spatial_shapes[lvl]
            memory_features.append(
                memory[:, start : start + H * W].reshape(B, H, W, self.d_model)
            )
            start += H * W

        return hs, memory_features, init_reference, inter_references, enc_outputs
