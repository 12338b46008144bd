"""VOC — Video Object Cluster (reference models/voc.py:181-414), the paper's
temporal aggregation module.

Takes per-decoder-layer frame queries (Lyr, T, B, Nq, C) plus the pooled
sentence feature (B, C); runs an optional (shifted-)window temporal
self-attention encoder over frames, then a cross-attention decoder whose
video-level queries are *initialized from the language feature* and attend
over all T*Nq frame queries.

Note: the reference merges (Lyr, T, B) via a raw `.reshape(L*B, T, ...)`
(models/voc.py:282) which only has the intended semantics for B == 1; we
implement the intended `(t, nq, l*b, c)` regrouping explicitly, batch-major.
"""
from __future__ import annotations

import math
from typing import Optional

import flax.linen as nn
import jax.numpy as jnp

from .common import CrossAttentionLayer, FFNLayer, SelfAttentionLayer


class VOC(nn.Module):
    input_dim: int = 256
    window_size: int = 0
    num_frame_queries: int = 20
    num_queries: int = 20
    num_heads: int = 8
    dim_feedforward: int = 2048
    enc_layers: int = 3
    dec_layers: int = 3
    dropout: float = 0.1
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        C = self.input_dim
        self.fq_pos = self.param(
            "fq_pos", nn.initializers.normal(1.0), (self.num_frame_queries, C),
            jnp.float32,
        )
        self.query_embed = self.param(
            "query_embed", nn.initializers.normal(1.0), (self.num_queries, C),
            jnp.float32,
        )
        self.decoder_norm = nn.LayerNorm(dtype=self.dtype, name="decoder_norm")
        kw = dict(d_model=C, num_heads=self.num_heads, dropout=self.dropout,
                  dtype=self.dtype)
        self.enc_self_attn = [
            SelfAttentionLayer(**kw, name=f"enc_self_attn_{i}")
            for i in range(self.enc_layers)
        ]
        self.enc_ffn = [
            FFNLayer(C, self.dim_feedforward, self.dropout, dtype=self.dtype,
                     name=f"enc_ffn_{i}")
            for i in range(self.enc_layers)
        ]
        self.dec_cross = [
            CrossAttentionLayer(**kw, name=f"dec_cross_{i}")
            for i in range(self.dec_layers)
        ]
        self.dec_self = [
            SelfAttentionLayer(**kw, name=f"dec_self_{i}")
            for i in range(self.dec_layers)
        ]
        self.dec_ffn = [
            FFNLayer(C, self.dim_feedforward, self.dropout, dtype=self.dtype,
                     name=f"dec_ffn_{i}")
            for i in range(self.dec_layers)
        ]

    def _encode_full(self, fq: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        """Full temporal attention over all T*Nq tokens (window_size == 0)."""
        LB, T, Nq, C = fq.shape
        x = fq.reshape(LB, T * Nq, C)
        for i in range(self.enc_layers):
            x = self.enc_self_attn[i](x, deterministic=deterministic)
            x = self.enc_ffn[i](x, deterministic=deterministic)
        return x.reshape(LB, T, Nq, C)

    def _encode_windowed(
        self, fq: jnp.ndarray, t_valid: int, training: bool, deterministic: bool
    ) -> jnp.ndarray:
        """(Shifted-)window temporal attention (reference models/voc.py:356-414).

        fq: (LB, T, Nq, C) with T already padded to a multiple of window_size;
        frames >= t_valid are padding.
        """
        LB, T, Nq, C = fq.shape
        W = self.window_size
        Nw = T // W
        half = math.ceil(W / 2)

        frame_pad = jnp.arange(T) >= t_valid  # (T,) True on padded frames

        # plain-window key padding mask: (LB*Nw, W*Nq)
        win_pad = jnp.repeat(frame_pad.reshape(Nw, W), Nq, axis=1).reshape(
            Nw, W * Nq
        )
        win_pad = jnp.broadcast_to(win_pad[None], (LB, Nw, W * Nq)).reshape(
            LB * Nw, W * Nq
        )

        # shifted-window additive mask: (Nw, W, W) frame-level -> token-level.
        # Mask padded frames as keys everywhere, symmetrize in the first/last
        # windows, and block cross-half attention in the wrap-around window 0
        # (reference models/voc.py:364-371).
        rolled_pad = jnp.roll(frame_pad, half).reshape(Nw, W)
        m = jnp.broadcast_to(rolled_pad[:, None, :], (Nw, W, W))
        m = m | (m.transpose(0, 2, 1) & (jnp.arange(Nw) % (max(Nw - 1, 1)) == 0)[:, None, None])
        first = jnp.zeros((W, W), dtype=bool)
        first = first.at[:half, half:].set(True)
        first = first.at[half:, :half].set(True)
        m = m.at[0].set(m[0] | first)
        shift_mask = jnp.where(m, -1000.0, 0.0)  # (Nw, W, W)
        shift_mask = jnp.repeat(jnp.repeat(shift_mask, Nq, axis=1), Nq, axis=2)
        shift_mask = jnp.broadcast_to(
            shift_mask[None], (LB, Nw, W * Nq, W * Nq)
        ).reshape(LB * Nw, 1, W * Nq, W * Nq)
        shift_mask = jnp.broadcast_to(
            shift_mask, (LB * Nw, self.num_heads, W * Nq, W * Nq)
        ).reshape(LB * Nw * self.num_heads, W * Nq, W * Nq)

        def to_windows(x):
            return x.reshape(LB, Nw, W * Nq, C).reshape(LB * Nw, W * Nq, C)

        def from_windows(x):
            return x.reshape(LB, Nw, W, Nq, C).reshape(LB, T, Nq, C)

        x = fq
        for i in range(self.enc_layers):
            if training or i % 2 == 0:
                xw = to_windows(x)
                xw = self.enc_self_attn[i](
                    xw, tgt_key_padding_mask=win_pad, deterministic=deterministic
                )
                xw = self.enc_ffn[i](xw, deterministic=deterministic)
                x = from_windows(xw)
            else:
                xs = jnp.roll(x, half, axis=1)
                xw = to_windows(xs)
                xw = self.enc_self_attn[i](
                    xw, tgt_mask=shift_mask, deterministic=deterministic
                )
                xw = self.enc_ffn[i](xw, deterministic=deterministic)
                x = jnp.roll(from_windows(xw), -half, axis=1)
        return x

    def __call__(
        self,
        frame_query: jnp.ndarray,  # (Lyr, T, B, Nq, C)
        language_query: jnp.ndarray,  # (B, C)
        training: bool = False,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        if not training:
            frame_query = frame_query[-1:]  # inference uses the last layer only
        Lyr, T, B, Nq, C = frame_query.shape
        LB = Lyr * B
        # (Lyr, T, B, Nq, C) -> (LB, T, Nq, C)
        fq = jnp.transpose(frame_query, (0, 2, 1, 3, 4)).reshape(LB, T, Nq, C)
        fq = fq.astype(self.dtype)

        if self.window_size > 0:
            pad = (-T) % self.window_size
            fq_p = jnp.pad(fq, ((0, 0), (0, pad), (0, 0), (0, 0)))
            fq_p = self._encode_windowed(fq_p, T, training, deterministic)
            fq = fq_p[:, :T]
        else:
            fq = self._encode_full(fq, deterministic)

        src = fq.reshape(LB, T * Nq, C)
        # pos for token (t, nq) is fq_pos[nq] (reference models/voc.py:298)
        dec_pos = jnp.tile(
            self.fq_pos.astype(self.dtype)[None, :Nq], (LB, T, 1)
        )  # (LB, T*Nq, C)
        qe = jnp.broadcast_to(
            self.query_embed.astype(self.dtype)[None], (LB, self.num_queries, C)
        )
        # language-initialized video queries: (B, C) -> (Lyr*B, Nq, C)
        out = jnp.broadcast_to(
            language_query.astype(self.dtype)[None, :, None, :],
            (Lyr, B, self.num_queries, C),
        ).reshape(LB, self.num_queries, C)

        for i in range(self.dec_layers):
            out = self.dec_cross[i](
                out, src, pos=dec_pos, query_pos=qe, deterministic=deterministic
            )
            out = self.dec_self[i](out, query_pos=qe, deterministic=deterministic)
            out = self.dec_ffn[i](out, deterministic=deterministic)

        out = self.decoder_norm(out)
        return out.reshape(Lyr, B, self.num_queries, C)
