"""Pallas msda kernel: parity vs the XLA path (interpret mode on CPU) and
gradient routing through the custom_vjp.

The real-TPU (compiled Mosaic) parity run lives in the driver scripts; this
exercises the same kernel logic through the Pallas interpreter so CI catches
semantic drift (reference op semantics: ms_deform_attn_func.py:41-61).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from neurips2023_soc_tpu.ops.ms_deform_attn import ms_deform_attn_xla
from neurips2023_soc_tpu.ops.pallas_msda import (
    ms_deform_attn_pallas, ms_deform_attn_pallas_op, _tile_major_perm)

SHAPES = ((9, 17), (5, 9), (3, 5))


def _inputs(B=2, M=2, D=8, Lq=None, P=3, seed=0, uniform=False):
    rng = np.random.RandomState(seed)
    L = len(SHAPES)
    S = sum(h * w for h, w in SHAPES)
    Lq = S if Lq is None else Lq
    v = rng.randn(B, S, M, D).astype(np.float32)
    if uniform:
        loc = (rng.rand(B, Lq, M, L, P, 2) * 1.4 - 0.2).astype(np.float32)
    else:
        pts = []
        for h, w in SHAPES:
            yy, xx = np.meshgrid(np.arange(h) + .5, np.arange(w) + .5,
                                 indexing="ij")
            pts.append(np.stack([xx.ravel() / w, yy.ravel() / h], -1))
        rp = np.concatenate(pts, 0)
        if Lq != S:
            rp = rng.rand(Lq, 2)
        loc = np.clip(rp[None, :, None, None, None, :]
                      + rng.randn(B, Lq, M, L, P, 2) * 0.05, 0, 1).astype(
                          np.float32)
    a = rng.rand(B, Lq, M, L, P).astype(np.float32)
    a = a / a.sum((-1, -2), keepdims=True)
    return v, loc, a


@pytest.mark.parametrize("case", ["encoder", "uniform", "decoder"])
def test_parity_vs_xla(case):
    kw = dict(uniform=(case == "uniform"))
    if case == "decoder":
        kw["Lq"] = 7
    v, loc, a = _inputs(**kw)
    want = ms_deform_attn_xla(v, SHAPES, loc, a)
    got = ms_deform_attn_pallas(v, SHAPES, loc, a, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


def test_perm_is_padded_permutation():
    perm, inv = _tile_major_perm(SHAPES)
    S = sum(h * w for h, w in SHAPES)
    assert len(inv) == S and len(perm) % 128 == 0
    # every real query appears, and inv round-trips through perm
    assert set(perm.tolist()) == set(range(S))
    np.testing.assert_array_equal(perm[inv], np.arange(S))


def test_custom_vjp_grads_match_xla():
    v, loc, a = _inputs(B=1, M=2, D=4, P=2)

    def loss_p(v, loc, a):
        return (ms_deform_attn_pallas_op(v, SHAPES, loc, a) ** 2).sum()

    def loss_x(v, loc, a):
        return (ms_deform_attn_xla(v, SHAPES, loc, a) ** 2).sum()

    gp = jax.grad(loss_p, argnums=(0, 1, 2))(v, loc, a)
    gx = jax.grad(loss_x, argnums=(0, 1, 2))(v, loc, a)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x),
                                   rtol=2e-4, atol=2e-4)
