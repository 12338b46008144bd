"""RoBERTa text encoder, flax implementation + tokenizer front-end.

The reference instantiates HF `RobertaModel` + `RobertaTokenizerFast` inside
SOC (models/soc.py:104-106). Here the encoder is a self-contained flax module
(so released torch checkpoints convert 1:1 and everything jits), and
tokenization happens on the host before the jitted step.

Offline story (zero-egress TPU pods): if `text_encoder_type` points at a local
pretrained directory we use HF's fast tokenizer; otherwise a deterministic
hash tokenizer stands in (tests / synthetic benches only).
"""
from __future__ import annotations

import dataclasses
from typing import List, Optional, Tuple

import flax.linen as nn
import jax.numpy as jnp
import numpy as np


@dataclasses.dataclass(frozen=True)
class RobertaConfig:
    vocab_size: int = 50265
    hidden_size: int = 768
    num_layers: int = 12
    num_heads: int = 12
    intermediate_size: int = 3072
    max_position_embeddings: int = 514
    type_vocab_size: int = 1
    pad_token_id: int = 1
    layer_norm_eps: float = 1e-5
    dropout: float = 0.1


ROBERTA_CONFIGS = {
    "roberta-base": RobertaConfig(),
    "roberta-large": RobertaConfig(hidden_size=1024, num_layers=24, num_heads=16,
                                   intermediate_size=4096),
    "distilroberta-base": RobertaConfig(num_layers=6),
    # small config for CPU tests
    "roberta-tiny": RobertaConfig(vocab_size=1024, hidden_size=64, num_layers=2,
                                  num_heads=4, intermediate_size=128),
}


class RobertaEncoder(nn.Module):
    config: RobertaConfig = RobertaConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(
        self,
        input_ids: jnp.ndarray,  # (B, S) int32
        attention_mask: jnp.ndarray,  # (B, S) 1 for real tokens
        deterministic: bool = True,
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Returns (last_hidden_state (B,S,H), pooler_output (B,H))."""
        cfg = self.config
        eps = cfg.layer_norm_eps

        # RoBERTa position ids: incremental over non-pad tokens, offset by
        # padding_idx (so the first real token gets index 2).
        mask_i = attention_mask.astype(jnp.int32)
        position_ids = jnp.cumsum(mask_i, axis=1) * mask_i + cfg.pad_token_id

        we = nn.Embed(cfg.vocab_size, cfg.hidden_size, dtype=self.dtype,
                      name="word_embeddings")(input_ids)
        pe = nn.Embed(cfg.max_position_embeddings, cfg.hidden_size,
                      dtype=self.dtype, name="position_embeddings")(position_ids)
        te = nn.Embed(cfg.type_vocab_size, cfg.hidden_size, dtype=self.dtype,
                      name="token_type_embeddings")(
            jnp.zeros_like(input_ids)
        )
        h = we + pe + te
        h = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name="emb_ln")(h)
        h = nn.Dropout(cfg.dropout)(h, deterministic=deterministic)

        pad_bias = jnp.where(attention_mask[:, None, None, :] == 0, -1e9, 0.0)
        Hn, Dh = cfg.num_heads, cfg.hidden_size // cfg.num_heads
        for i in range(cfg.num_layers):
            ln = f"layer_{i}_"
            q = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=ln + "q")(h)
            k = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=ln + "k")(h)
            v = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=ln + "v")(h)
            B, S, _ = q.shape
            q = q.reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
            k = k.reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
            v = v.reshape(B, S, Hn, Dh).transpose(0, 2, 1, 3)
            logits = jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(Dh)
            logits = logits + pad_bias.astype(logits.dtype)
            attn = nn.softmax(logits.astype(jnp.float32), -1).astype(self.dtype)
            attn = nn.Dropout(cfg.dropout)(attn, deterministic=deterministic)
            ctx = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
            ctx = ctx.transpose(0, 2, 1, 3).reshape(B, S, cfg.hidden_size)
            ctx = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=ln + "attn_out")(ctx)
            ctx = nn.Dropout(cfg.dropout)(ctx, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name=ln + "attn_ln")(
                h + ctx
            )
            inter = nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                             name=ln + "inter")(h)
            inter = nn.gelu(inter, approximate=False)
            out = nn.Dense(cfg.hidden_size, dtype=self.dtype, name=ln + "out")(inter)
            out = nn.Dropout(cfg.dropout)(out, deterministic=deterministic)
            h = nn.LayerNorm(epsilon=eps, dtype=self.dtype, name=ln + "out_ln")(
                h + out
            )

        pooled = nn.Dense(cfg.hidden_size, dtype=self.dtype, name="pooler")(h[:, 0])
        pooled = jnp.tanh(pooled)
        return h, pooled


class HashTokenizer:
    """Deterministic offline stand-in tokenizer (tests/synthetic only).

    bos=0, pad=1, eos=2; words hash into [10, vocab_size)."""

    def __init__(self, vocab_size: int = 50265):
        self.vocab_size = vocab_size

    def __call__(self, texts: List[str], max_len: Optional[int] = None):
        import hashlib

        seqs = []
        for t in texts:
            ids = [0]
            for w in t.lower().split():
                hv = int(hashlib.md5(w.encode()).hexdigest()[:8], 16)
                ids.append(10 + hv % (self.vocab_size - 10))
            ids.append(2)
            seqs.append(ids)
        L = max_len or max(len(s) for s in seqs)
        input_ids = np.full((len(seqs), L), 1, np.int32)
        attn = np.zeros((len(seqs), L), np.int32)
        for i, s in enumerate(seqs):
            s = s[:L]
            input_ids[i, : len(s)] = s
            attn[i, : len(s)] = 1
        return input_ids, attn


def build_tokenizer(text_encoder_type: str, text_bucket: int = 32):
    """HF fast tokenizer when a local pretrained dir exists; hash fallback.

    Returns fn(texts) -> (input_ids, attention_mask) padded to a static
    bucket length (recompile-free under jit)."""
    import os

    tok = None
    # Only trust an on-disk pretrained directory — name-based resolution can
    # silently pick up an incompatible cached tokenizer whose ids overflow the
    # model vocab (Embed then fills with NaN).
    if os.path.isdir(text_encoder_type):
        try:
            from transformers import RobertaTokenizerFast

            tok = RobertaTokenizerFast.from_pretrained(
                text_encoder_type, local_files_only=True
            )
        except Exception:
            tok = None

    if tok is not None:
        def encode(texts: List[str]):
            enc = tok.batch_encode_plus(
                texts, padding="max_length", truncation=True,
                max_length=text_bucket, return_tensors="np",
            )
            return (enc["input_ids"].astype(np.int32),
                    enc["attention_mask"].astype(np.int32))
        return encode

    name = text_encoder_type.split("/")[-1]
    vocab = ROBERTA_CONFIGS.get(name, RobertaConfig()).vocab_size
    hasher = HashTokenizer(vocab_size=vocab)

    def encode(texts: List[str]):
        return hasher(texts, max_len=text_bucket)

    return encode
