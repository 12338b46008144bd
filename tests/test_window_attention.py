"""Pallas fused window attention vs the XLA composition (interpret mode on CPU)."""
import numpy as np
import pytest

import jax.numpy as jnp

from neurips2023_soc_tpu.ops.window_attention import (
    window_attention_pallas,
    window_attention_xla,
)

B_, H, N, Dh, nW = 6, 2, 56, 32, 3


def _inputs(seed=0, with_mask=True):
    rng = np.random.RandomState(seed)
    q = rng.randn(B_, H, N, Dh).astype(np.float32)
    k = rng.randn(B_, H, N, Dh).astype(np.float32)
    v = rng.randn(B_, H, N, Dh).astype(np.float32)
    bias = rng.randn(H, N, N).astype(np.float32) * 0.1
    mask = None
    if with_mask:
        mask = np.where(rng.rand(nW, N, N) > 0.8, -100.0, 0.0).astype(np.float32)
    return q, k, v, bias, mask


@pytest.mark.parametrize("with_mask", [False, True])
def test_pallas_matches_xla(with_mask):
    q, k, v, bias, mask = _inputs(with_mask=with_mask)
    want = np.asarray(window_attention_xla(q, k, v, bias, mask))
    got = np.asarray(
        window_attention_pallas(q, k, v, bias, mask, interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_pallas_bf16():
    q, k, v, bias, mask = _inputs(seed=1)
    cast = lambda x: jnp.asarray(x, jnp.bfloat16)
    want = np.asarray(
        window_attention_xla(cast(q), cast(k), cast(v), bias, mask)
    ).astype(np.float32)
    got = np.asarray(
        window_attention_pallas(cast(q), cast(k), cast(v), bias, mask,
                                interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.08)
