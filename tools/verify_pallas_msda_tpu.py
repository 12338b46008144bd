"""Parity: pallas msda vs XLA path on the real TPU, then a perf run."""
import time
import numpy as np
import jax
import jax.numpy as jnp
from neurips2023_soc_tpu.ops.ms_deform_attn import ms_deform_attn_xla
from neurips2023_soc_tpu.ops.pallas_msda import ms_deform_attn_pallas

rng = np.random.RandomState(0)


def check(shapes, B, M, D, Lq, P=4, local=True, label=""):
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    v = rng.randn(B, S, M, D).astype(np.float32)
    if local:
        pts = []
        for h, w in shapes:
            yy, xx = np.meshgrid(np.arange(h) + .5, np.arange(w) + .5, indexing="ij")
            pts.append(np.stack([xx.ravel() / w, yy.ravel() / h], -1))
        rp = np.concatenate(pts, 0)[:Lq] if Lq <= S else None
        if rp is None or len(rp) < Lq:
            rp = rng.rand(Lq, 2)
        loc = np.clip(rp[None, :, None, None, None, :]
                      + rng.randn(B, Lq, M, L, P, 2) * 0.02, -0.1, 1.1)
    else:
        loc = rng.rand(B, Lq, M, L, P, 2) * 1.4 - 0.2  # incl out-of-range
    loc = loc.astype(np.float32)
    a = rng.rand(B, Lq, M, L, P).astype(np.float32)
    a = a / a.sum((-1, -2), keepdims=True)

    fx = jax.jit(lambda v, l, a: ms_deform_attn_xla(v, shapes, l, a))
    fp = jax.jit(lambda v, l, a: ms_deform_attn_pallas(v, shapes, l, a))
    ox = np.asarray(fx(v, loc, a))
    op = np.asarray(fp(v, loc, a))
    err = np.abs(ox - op).max() / (np.abs(ox).max() + 1e-9)
    print(f"parity {label}: rel-max-err {err:.2e} {'OK' if err < 1e-5 else 'FAIL'}")
    return err < 1e-5


def check_bf16(shapes, B, M, D, Lq, P=4, label=""):
    """Packed-path parity: bf16 values route through the int32 channel-pair
    packing + pltpu.bitcast on the real chip (packed=False in interpret mode,
    so only this script exercises it compiled). Oracle = the XLA path on the
    SAME bf16 inputs; tolerance sized for bf16 products with f32 accumulation
    over L*P*4 terms."""
    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    v = rng.randn(B, S, M, D).astype(np.float32)
    loc = (rng.rand(B, Lq, M, L, P, 2) * 1.2 - 0.1).astype(np.float32)
    a = rng.rand(B, Lq, M, L, P).astype(np.float32)
    a = a / a.sum((-1, -2), keepdims=True)
    vb = jnp.asarray(v, jnp.bfloat16)
    ab = jnp.asarray(a, jnp.bfloat16)
    fx = jax.jit(lambda v, l, a: ms_deform_attn_xla(v, shapes, l, a))
    fp = jax.jit(lambda v, l, a: ms_deform_attn_pallas(v, shapes, l, a))
    ox = np.asarray(fx(vb, loc, ab)).astype(np.float32)
    op = np.asarray(fp(vb, loc, ab)).astype(np.float32)
    err = np.abs(ox - op).max() / (np.abs(ox).max() + 1e-9)
    print(f"bf16 packed parity {label}: rel-max-err {err:.2e} "
          f"{'OK' if err < 2e-2 else 'FAIL'}")
    return err < 2e-2


def check_bwd_packed(shapes, B, M, D, Lq, P=4, label=""):
    """Packed-input-table backward parity on chip: bf16 values gather from
    the int32-packed table (MSDA_BWD_PACKED=1 default) — compare all three
    gradients against the unpacked-table kernel, which is exact vs packed
    (bf16->f32 promotion is lossless; only the gather layout differs)."""
    import os

    from neurips2023_soc_tpu.ops.pallas_msda import ms_deform_attn_pallas_bwd

    L = len(shapes)
    S = sum(h * w for h, w in shapes)
    v = jnp.asarray(rng.randn(B, S, M, D), jnp.bfloat16)
    loc = (rng.rand(B, Lq, M, L, P, 2) * 1.2 - 0.1).astype(np.float32)
    a = jnp.asarray(rng.rand(B, Lq, M, L, P), jnp.bfloat16)
    g = rng.randn(B, Lq, M * D).astype(np.float32)
    outs = {}
    prior = os.environ.get("MSDA_BWD_PACKED")
    try:
        for flag in ("0", "1"):
            os.environ["MSDA_BWD_PACKED"] = flag
            outs[flag] = jax.jit(
                lambda v, l, a, g: ms_deform_attn_pallas_bwd(v, shapes, l, a, g)
            )(v, loc, a, g)
    finally:
        # restore the caller's setting so the perf section below measures
        # the configuration the user exported, not the default
        if prior is None:
            os.environ.pop("MSDA_BWD_PACKED", None)
        else:
            os.environ["MSDA_BWD_PACKED"] = prior
    ok = True
    for name, ou, op in zip(("d_value", "d_loc", "d_attn"), outs["0"], outs["1"]):
        ou = np.asarray(ou, np.float32)
        op = np.asarray(op, np.float32)
        err = np.abs(ou - op).max() / (np.abs(ou).max() + 1e-9)
        ok &= err < 1e-6
        print(f"bwd packed-table parity {label} {name}: rel-max-err "
              f"{err:.2e} {'OK' if err < 1e-6 else 'FAIL'}")
    return ok


shapes = ((45, 80), (23, 40), (12, 20), (6, 10))
ok = True
ok &= check(shapes, 2, 8, 32, 4820, label="flagship-shape local")
ok &= check(shapes, 2, 8, 32, 4820, local=False, label="uniform+out-of-range")
ok &= check(shapes, 2, 8, 32, 20, label="decoder Lq=20")
ok &= check(((7, 9), (4, 5)), 3, 4, 16, 63, local=False, label="odd shapes")
ok &= check_bf16(shapes, 2, 8, 32, 4820, label="flagship-shape")
ok &= check_bf16(((7, 9), (4, 5)), 3, 4, 16, 63, label="odd shapes")
ok &= check_bwd_packed(shapes, 2, 8, 32, 4820, label="flagship")
ok &= check_bwd_packed(((7, 9), (4, 5)), 3, 4, 16, 63, label="odd shapes")
print("ALL OK" if ok else "FAILURES")

# perf at flagship shape
B, M, D, L, P = 16, 8, 32, 4, 4
S = sum(h * w for h, w in shapes)
Lq = S
v = jnp.asarray(rng.randn(B, S, M, D), jnp.bfloat16)
pts = []
for h, w in shapes:
    yy, xx = np.meshgrid(np.arange(h) + .5, np.arange(w) + .5, indexing="ij")
    pts.append(np.stack([xx.ravel() / w, yy.ravel() / h], -1))
rp = np.concatenate(pts, 0)
loc = jnp.asarray(np.clip(rp[None, :, None, None, None, :]
                          + rng.randn(B, Lq, M, L, P, 2) * 0.01, 0, 1), jnp.float32)
a = jnp.asarray(np.full((B, Lq, M, L, P), 1 / 16), jnp.bfloat16)

for name, fn in [("xla", ms_deform_attn_xla), ("pallas", ms_deform_attn_pallas)]:
    @jax.jit
    def jf(v, loc, a, fn=fn):
        acc = jnp.float32(0)
        for r in range(5):
            acc += fn(v + jnp.bfloat16(r), shapes, loc, a).astype(jnp.float32).sum()
        return acc
    float(jf(v, loc, a))
    float(jf(v + jnp.bfloat16(9), loc, a))  # extra warm iteration
    t0 = time.perf_counter()
    for i in range(3):
        float(jf(v + jnp.bfloat16(i + 1), loc, a))
    dt = (time.perf_counter() - t0) / 3 / 5
    rows = B * Lq * M * L * P
    print(f"{name}: {dt*1000:.1f} ms/call -> {rows/dt/1e6:.0f}M samples/s")
