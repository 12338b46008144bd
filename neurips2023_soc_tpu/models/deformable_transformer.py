"""Deformable-DETR transformer, TPU-native.

Behavioral twin of the reference's encoder/decoder stack
(reference models/deformable_transformer.py:25-444) with these TPU-first
changes:
  * spatial shapes are static python tuples (compiled into the program);
  * all sequences are batch-major (B*T, S, C);
  * the CUDA MSDeformAttn is the `ops.ms_deform_attn` op;
  * per-layer box refinement runs under jit with `stop_gradient` standing in
    for `.detach()`.
Two-stage mode is not implemented (disabled in every shipped config,
configs/refer_youtube_vos.yaml:61).
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

    def bbox_head(self, x: jnp.ndarray, lvl: int) -> jnp.ndarray:
        """Expose the (shared) per-layer box head so the composition root can
        apply it to VOC-refined queries (reference models/soc.py:333)."""
        return self.bbox_embed[lvl](x)

    def __call__(
        self,
        srcs: List[jnp.ndarray],  # per level (B*T, H, W, C)
        masks: List[jnp.ndarray],  # per level (B*T, H, W) True=pad
        pos_embeds: List[jnp.ndarray],  # per level (B*T, H, W, C)
        query_embed: jnp.ndarray,  # (Nq, C)
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
        Nq = query_embed.shape[0]
        qe = jnp.broadcast_to(query_embed[None], (B, Nq, query_embed.shape[1]))
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

        return hs, memory_features, init_reference, inter_references
