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


def test_packed_table_roundtrip():
    """bf16 two-channels-per-int32 packing (production default on TPU) must
    be a bit-exact re-arrangement of the unpacked bf16 table: low 16 bits =
    even channel, high 16 = odd (pltpu.bitcast unpacks int32 sublane r into
    bf16 sublanes 2r/2r+1) — ADVICE r2: this path was previously untested in
    CI."""
    from neurips2023_soc_tpu.ops.pallas_msda import _build_tables

    rng = np.random.RandomState(7)
    B, M, D = 2, 3, 8
    S = sum(h * w for h, w in SHAPES)
    v = rng.randn(B, S, M, D).astype(np.float32)

    unpacked = np.asarray(_build_tables(jnp.asarray(v, jnp.bfloat16),
                                        SHAPES, packed=False))
    packed = np.asarray(_build_tables(jnp.asarray(v, jnp.bfloat16),
                                      SHAPES, packed=True))
    BM, NT, CR, LN = packed.shape
    assert unpacked.shape == (BM, NT, 2 * CR, LN)

    u = packed.view(np.uint32)
    lo = (u & 0xFFFF).astype(np.uint16)          # even channels
    hi = (u >> 16).astype(np.uint16)             # odd channels
    re = np.empty((BM, NT, 2 * CR, LN), np.uint16)
    re[:, :, 0::2] = lo
    re[:, :, 1::2] = hi
    # unpacked table is f32 holding bf16-rounded values; compare as bf16 bits
    want = np.asarray(jnp.asarray(unpacked, jnp.bfloat16)).view(np.uint16)
    np.testing.assert_array_equal(re, want)


def test_spmd_batch_partition_parity():
    """Under a multi-device pjit the custom_partitioning rule must run the
    kernel per batch shard and reproduce the XLA oracle exactly (the CPU-mesh
    analog of multi-chip TPU inference keeping the Pallas kernel); gradients
    route through the custom_vjp's XLA backward, which partitions natively."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_dev = len(jax.devices())
    assert n_dev == 8, "conftest provides a virtual 8-device CPU platform"
    v, loc, a = _inputs(B=8, M=2, D=8, Lq=7, P=2, seed=3)
    want = np.asarray(ms_deform_attn_xla(v, SHAPES, loc, a))

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data"))
    vd, ld, ad = (jax.device_put(x, sh) for x in (v, loc, a))

    fn = jax.jit(lambda v, l, a: ms_deform_attn_pallas_op(v, SHAPES, l, a))
    got = fn(vd, ld, ad)
    assert got.sharding.spec == P("data")  # output stays batch-sharded
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-5)

    # gradient parity through the sharded custom_vjp
    def loss_p(v, l, a):
        return ms_deform_attn_pallas_op(v, SHAPES, l, a).sum()

    def loss_x(v, l, a):
        return ms_deform_attn_xla(v, SHAPES, l, a).sum()

    gp = jax.jit(jax.grad(loss_p, argnums=(0, 1, 2)))(vd, ld, ad)
    gx = jax.jit(jax.grad(loss_x, argnums=(0, 1, 2)))(v, loc, a)
    for p, x in zip(gp, gx):
        np.testing.assert_allclose(np.asarray(p), np.asarray(x),
                                   rtol=1e-4, atol=1e-5)


@pytest.mark.parametrize("case", ["encoder", "uniform", "decoder"])
def test_bwd_kernel_parity_vs_xla_autodiff(case):
    """The Pallas backward kernel (one-hot-matmul d_value scatter + gather
    d_loc/d_attn) must match XLA autodiff of the oracle formulation exactly
    (shared anchor/slot-weight math; reference CUDA backward semantics at
    ms_deform_im2col_cuda.cuh:302-1030)."""
    from neurips2023_soc_tpu.ops.pallas_msda import ms_deform_attn_pallas_bwd

    kw = dict(uniform=(case == "uniform"))
    if case == "decoder":
        kw["Lq"] = 7
    v, loc, a = _inputs(B=2, M=2, D=8, P=2, seed=11, **kw)
    rng = np.random.RandomState(5)
    g = rng.randn(v.shape[0], loc.shape[1], 2 * 8).astype(np.float32)

    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_xla(v, SHAPES, l, a), v, loc, a)
    want = vjp(jnp.asarray(g))
    got = ms_deform_attn_pallas_bwd(v, SHAPES, loc, a, jnp.asarray(g),
                                    interpret=True)
    for name, gg, ww in zip(("d_value", "d_loc", "d_attn"), got, want):
        # atol covers f32 association differences (kernel contracts
        # slot-major, autodiff contracts sample-major)
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_spmd_backward_partition_parity():
    """The TPU training backward (`_spmd_backward`: custom_partitioning over
    the Pallas backward kernel) must reproduce XLA autodiff on a batch-sharded
    8-device mesh — validates multi-chip training keeps the backward kernel."""
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    from neurips2023_soc_tpu.ops.pallas_msda import _spmd_backward

    v, loc, a = _inputs(B=8, M=2, D=8, Lq=7, P=2, seed=13)
    rng = np.random.RandomState(6)
    g = rng.randn(8, 7, 16).astype(np.float32)
    _, vjp = jax.vjp(
        lambda v, l, a: ms_deform_attn_xla(v, SHAPES, l, a), v, loc, a)
    want = vjp(jnp.asarray(g))

    mesh = Mesh(np.array(jax.devices()).reshape(8), ("data",))
    sh = NamedSharding(mesh, P("data"))
    vd, ld, ad, gd = (jax.device_put(x, sh) for x in (v, loc, a, g))
    got = jax.jit(lambda v, l, a, g: _spmd_backward(v, SHAPES, l, a, g))(
        vd, ld, ad, gd)
    assert got[0].sharding.spec == P("data")
    for name, gg, ww in zip(("d_value", "d_loc", "d_attn"), got, want):
        np.testing.assert_allclose(np.asarray(gg), np.asarray(ww),
                                   rtol=1e-4, atol=1e-4, err_msg=name)


def test_mxu_forward_parity():
    """The one-hot MXU matmul formulation of the forward sample must equal
    the gather formulation exactly (documented perf experiment: measured
    SLOWER than the packed gather on v5e — 201 vs 218M samples/s — so it
    stays opt-in; see BENCH_NOTES.md)."""
    for case in ({"uniform": True}, {"Lq": 7}):
        v, loc, a = _inputs(M=2, D=8, P=2, **case)
        want = ms_deform_attn_xla(v, SHAPES, loc, a)
        got = ms_deform_attn_pallas(v, SHAPES, loc, a, interpret=True,
                                    mxu=True)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case", ["encoder", "uniform", "decoder"])
def test_fuse_points_forward_parity(case):
    """The fused-points visit loop (one union-bbox loop per level with P
    gathers per visit, instead of P separate bounds-loops) must equal the
    per-point formulation exactly."""
    kw = dict(uniform=(case == "uniform"))
    if case == "decoder":
        kw["Lq"] = 7
    v, loc, a = _inputs(**kw)
    want = ms_deform_attn_xla(v, SHAPES, loc, a)
    got = ms_deform_attn_pallas(v, SHAPES, loc, a, interpret=True,
                                fuse_points=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("case", ["encoder", "decoder"])
def test_fuse_points_backward_parity(case):
    """Fused-points backward (one union-bbox loop per level, P one-hot
    scatters concatenated into a single MXU dot per visit) must match XLA
    autodiff of the oracle."""
    import jax
    import jax.numpy as jnp

    from neurips2023_soc_tpu.ops.pallas_msda import ms_deform_attn_pallas_bwd

    kw = {} if case == "encoder" else {"Lq": 7}
    v, loc, a = _inputs(M=2, D=8, P=4, **kw)
    g = np.random.RandomState(1).randn(*v.shape[:1], loc.shape[1],
                                       v.shape[2] * v.shape[3]).astype(
                                           np.float32)

    def f(v_, loc_, a_):
        return (ms_deform_attn_xla(v_, SHAPES, loc_, a_) * g).sum()

    want = jax.grad(f, argnums=(0, 1, 2))(
        jnp.asarray(v), jnp.asarray(loc), jnp.asarray(a))
    got = ms_deform_attn_pallas_bwd(v, SHAPES, loc, a, g, interpret=True,
                                    fuse_points=True)
    for gw, go in zip(want, got):
        np.testing.assert_allclose(np.asarray(go), np.asarray(gw),
                                   rtol=2e-5, atol=2e-5)
