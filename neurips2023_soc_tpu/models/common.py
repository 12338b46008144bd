"""Shared flax building blocks.

All sequence tensors are batch-major (B, S, C) — TPU-friendly — unlike the
reference's torch seq-major convention. `MultiheadAttention` reproduces
torch.nn.MultiheadAttention's parameterization (packed qkv projection) so the
released checkpoints convert 1:1.
"""
from __future__ import annotations

from typing import Callable, Optional

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

Dtype = jnp.dtype


def get_activation(name: str) -> Callable:
    return {"relu": nn.relu, "gelu": nn.gelu, "glu": nn.glu}[name]


class MultiheadAttention(nn.Module):
    """torch.nn.MultiheadAttention-compatible attention (batch-major).

    Params mirror torch: `in_proj` Dense(3*C) applied as packed q/k/v when
    embed dims match, `out_proj` Dense(C). key_padding_mask: (B, S_k) True on
    padding.
    """

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        query: jnp.ndarray,  # (B, S_q, C)
        key: jnp.ndarray,  # (B, S_k, C)
        value: jnp.ndarray,  # (B, S_k, C)
        key_padding_mask: Optional[jnp.ndarray] = None,  # (B, S_k) bool
        attn_mask: Optional[jnp.ndarray] = None,  # (S_q,S_k) or (B*H,S_q,S_k) additive or bool
        deterministic: bool = True,
    ) -> jnp.ndarray:
        C, H = self.d_model, self.num_heads
        Dh = C // H
        # torch keeps one packed (3C, C) in_proj; store it the same way so
        # checkpoint conversion is a transpose, then slice into q/k/v parts.
        kernel = self.param(
            "in_proj_kernel",
            nn.initializers.xavier_uniform(),
            (C, 3 * C),
            jnp.float32,
        )
        bias = self.param("in_proj_bias", nn.initializers.zeros, (3 * C,), jnp.float32)
        kernel = kernel.astype(self.dtype)
        bias = bias.astype(self.dtype)
        wq, wk, wv = kernel[:, :C], kernel[:, C : 2 * C], kernel[:, 2 * C :]
        bq, bk, bv = bias[:C], bias[C : 2 * C], bias[2 * C :]

        q = query @ wq + bq
        k = key @ wk + bk
        v = value @ wv + bv

        B, Sq, _ = q.shape
        Sk = k.shape[1]
        q = q.reshape(B, Sq, H, Dh).transpose(0, 2, 1, 3)
        k = k.reshape(B, Sk, H, Dh).transpose(0, 2, 1, 3)
        v = v.reshape(B, Sk, H, Dh).transpose(0, 2, 1, 3)

        logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(Dh)
        if attn_mask is not None:
            if attn_mask.dtype == jnp.bool_:
                logits = jnp.where(attn_mask, -1e9, logits)
            else:
                m = attn_mask
                if m.ndim == 3:  # (B*H, Sq, Sk) torch convention
                    m = m.reshape(B, H, Sq, Sk)
                logits = logits + m.astype(logits.dtype)
        if key_padding_mask is not None:
            logits = jnp.where(
                key_padding_mask[:, None, None, :], -1e9, logits
            )
        attn = nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        if self.dropout > 0.0 and not deterministic:
            attn = nn.Dropout(self.dropout)(attn, deterministic=False)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(B, Sq, C)
        return nn.Dense(C, dtype=self.dtype, name="out_proj")(out)


class MLP(nn.Module):
    """DETR-style relu MLP (reference models/soc.py:552-564)."""

    hidden_dim: int
    output_dim: int
    num_layers: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        for i in range(self.num_layers):
            last = i == self.num_layers - 1
            dim = self.output_dim if last else self.hidden_dim
            x = nn.Dense(dim, dtype=self.dtype, name=f"layers_{i}")(x)
            if not last:
                x = nn.relu(x)
        return x


class FeatureResizer(nn.Module):
    """Linear + LayerNorm(eps=1e-12) + dropout (reference models/soc.py:566-585)."""

    output_dim: int
    dropout: float = 0.1
    do_ln: bool = True
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        x = nn.Dense(self.output_dim, dtype=self.dtype, name="fc")(x)
        if self.do_ln:
            x = nn.LayerNorm(epsilon=1e-12, dtype=self.dtype, name="layer_norm")(x)
        return nn.Dropout(self.dropout)(x, deterministic=deterministic)


class MMF(nn.Module):
    """Multimodal multiplicative fusion (reference models/vla.py:8-25):
    one cross-attention, output multiplied into the target."""

    d_model: int
    num_heads: int = 8
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,  # (B, S_t, C)
        memory: jnp.ndarray,  # (B, S_m, C)
        memory_key_padding_mask: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q = tgt if query_pos is None else tgt + query_pos
        k = memory if pos is None else memory + pos
        tgt2 = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            name="multihead_attn",
        )(q, k, memory, key_padding_mask=memory_key_padding_mask,
          deterministic=deterministic)
        return tgt * tgt2


class FFNLayer(nn.Module):
    """Post-norm transformer FFN block (reference models/voc.py:19-59)."""

    d_model: int
    dim_feedforward: int = 2048
    dropout: float = 0.0
    activation: str = "relu"
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        h = nn.Dense(self.dim_feedforward, dtype=self.dtype, name="linear1")(x)
        h = get_activation(self.activation)(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        h = nn.Dense(self.d_model, dtype=self.dtype, name="linear2")(h)
        h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
        x = x + h
        return nn.LayerNorm(dtype=self.dtype, name="norm")(x)


class SelfAttentionLayer(nn.Module):
    """Post-norm self-attention block (reference models/voc.py:61-116)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        tgt_mask: Optional[jnp.ndarray] = None,
        tgt_key_padding_mask: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q = tgt if query_pos is None else tgt + query_pos
        tgt2 = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            name="self_attn",
        )(q, q, tgt, key_padding_mask=tgt_key_padding_mask, attn_mask=tgt_mask,
          deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(tgt)


class CrossAttentionLayer(nn.Module):
    """Post-norm cross-attention block (reference models/voc.py:118-178)."""

    d_model: int
    num_heads: int
    dropout: float = 0.0
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        tgt: jnp.ndarray,
        memory: jnp.ndarray,
        memory_key_padding_mask: Optional[jnp.ndarray] = None,
        pos: Optional[jnp.ndarray] = None,
        query_pos: Optional[jnp.ndarray] = None,
        deterministic: bool = True,
    ) -> jnp.ndarray:
        q = tgt if query_pos is None else tgt + query_pos
        k = memory if pos is None else memory + pos
        tgt2 = MultiheadAttention(
            self.d_model, self.num_heads, self.dropout, dtype=self.dtype,
            name="multihead_attn",
        )(q, k, memory, key_padding_mask=memory_key_padding_mask,
          deterministic=deterministic)
        tgt = tgt + nn.Dropout(self.dropout)(tgt2, deterministic=deterministic)
        return nn.LayerNorm(dtype=self.dtype, name="norm")(tgt)
