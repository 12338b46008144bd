"""Pallas fused window attention vs the XLA composition (interpret mode on CPU).

The v2 kernel takes compact (nW, N) shift-region labels and rebuilds the
additive mask in VMEM; parity is asserted against the XLA path fed the
materialized mask derived from the same labels."""
import numpy as np
import pytest

import jax.numpy as jnp

from neurips2023_soc_tpu.ops.window_attention import (
    mask_from_ids,
    window_attention,
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
    ids = None
    if with_mask:
        # region labels like compute_mask's img labels (up to 27 regions)
        ids = rng.randint(0, 9, size=(nW, N)).astype(np.int32)
    return q, k, v, bias, ids


@pytest.mark.parametrize("with_mask", [False, True])
def test_pallas_matches_xla(with_mask):
    q, k, v, bias, ids = _inputs(with_mask=with_mask)
    mask = None if ids is None else np.asarray(mask_from_ids(jnp.asarray(ids)))
    want = np.asarray(window_attention_xla(q, k, v, bias, mask))
    got = np.asarray(
        window_attention_pallas(q, k, v, bias,
                                None if ids is None else jnp.asarray(ids),
                                interpret=True)
    )
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_pallas_bf16():
    q, k, v, bias, ids = _inputs(seed=1)
    mask = np.asarray(mask_from_ids(jnp.asarray(ids)))
    cast = lambda x: jnp.asarray(x, jnp.bfloat16)
    want = np.asarray(
        window_attention_xla(cast(q), cast(k), cast(v), bias, mask)
    ).astype(np.float32)
    got = np.asarray(
        window_attention_pallas(cast(q), cast(k), cast(v), bias,
                                jnp.asarray(ids), interpret=True)
    ).astype(np.float32)
    np.testing.assert_allclose(got, want, atol=0.08, rtol=0.08)


def test_pallas_nondivisible_batch_padding():
    """B_=6 pads to the Wb=4 block multiple; padded windows must be sliced
    off without corrupting real outputs."""
    q, k, v, bias, ids = _inputs(seed=2)
    mask = np.asarray(mask_from_ids(jnp.asarray(ids)))
    want = np.asarray(window_attention_xla(q, k, v, bias, mask))
    got = np.asarray(
        window_attention_pallas(q, k, v, bias, jnp.asarray(ids),
                                interpret=True))
    assert got.shape == want.shape == (B_, H, N, Dh)
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)


def test_dispatch_falls_back_to_xla_with_mask_only():
    """window_attention with a materialized mask and no ids must produce the
    XLA result regardless of impl (the kernel needs ids)."""
    q, k, v, bias, ids = _inputs(seed=3)
    mask = np.asarray(mask_from_ids(jnp.asarray(ids)))
    want = np.asarray(window_attention_xla(q, k, v, bias, mask))
    # ids=None: the kernel cannot run (it rebuilds the mask from ids), so
    # impl='pallas' must route through the XLA fallback branch
    got = np.asarray(
        window_attention(q, k, v, bias, mask=mask, ids=None,
                         impl="pallas", interpret=True))
    np.testing.assert_allclose(got, want, atol=2e-5, rtol=2e-5)
