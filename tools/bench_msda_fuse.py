"""Interleaved on-chip A/B of the fused-points msda kernel variants
(forward commit 8e0fdfb, backward 5ccffad) vs the per-point defaults, in
the REALISTIC tight-offset regime (locations around query centers — see
BENCH_NOTES.md "Regime note"). Also asserts on-chip parity of the fused
paths before timing.

Usage: python -u tools/bench_msda_fuse.py [fwd|bwd|both]
Timing protocol per .claude/skills/verify: inputs perturbed per rep
inside one jit, scalar checksum fetched per call, perturbed second warm
call, interleaved rounds, median-of-rounds reported.
"""
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

from neurips2023_soc_tpu.ops.pallas_msda import (
    ms_deform_attn_pallas,
    ms_deform_attn_pallas_bwd,
)

SHAPES = ((45, 80), (23, 40), (12, 20), (6, 10))
B, M, D, L, P = 8, 8, 32, 4, 4
S = sum(h * w for h, w in SHAPES)
Lq = S
REPS = 4
ROUNDS = 5

rng = np.random.RandomState(0)
v = jnp.asarray(rng.randn(B, S, M, D), jnp.bfloat16)
pts = []
for h, w in SHAPES:
    yy, xx = np.meshgrid(np.arange(h) + .5, np.arange(w) + .5, indexing="ij")
    pts.append(np.stack([xx.ravel() / w, yy.ravel() / h], -1))
rp = np.concatenate(pts, 0)
loc = jnp.asarray(np.clip(rp[None, :, None, None, None, :]
                          + rng.randn(B, Lq, M, L, P, 2) * 0.01, 0, 1),
                  jnp.float32)
a = jnp.asarray(np.full((B, Lq, M, L, P), 1 / (L * P)), jnp.bfloat16)
g = jnp.asarray(rng.randn(B, Lq, M * D), jnp.float32)


def make_jit(fn):
    @jax.jit
    def jf(v, loc, a):
        acc = jnp.float32(0)
        for r in range(REPS):
            acc += fn(v + jnp.bfloat16(r), loc, a)
        return acc

    return jf


def fwd_fn(fuse):
    return lambda v, l, a: ms_deform_attn_pallas(
        v, SHAPES, l, a, fuse_points=fuse).astype(jnp.float32).sum()


def bwd_fn(fuse):
    def f(v, l, a):
        dv, dl, da = ms_deform_attn_pallas_bwd(
            v, SHAPES, l, a, g, fuse_points=fuse)
        return (dv.astype(jnp.float32).sum() + dl.sum()
                + da.astype(jnp.float32).sum())

    return f


def parity(name, base_fn, fuse_fn, tol):
    b = np.asarray(base_fn(v, loc, a), np.float64)
    f = np.asarray(fuse_fn(v, loc, a), np.float64)
    rel = abs(f - b) / max(abs(b), 1e-30)
    ok = rel < tol
    print(f"parity {name}: base={b:.6e} fused={f:.6e} rel={rel:.2e} "
          f"{'OK' if ok else 'FAIL'}", flush=True)
    return ok


def run(kind):
    mk = fwd_fn if kind == "fwd" else bwd_fn
    jits = {lbl: make_jit(mk(fuse))
            for lbl, fuse in (("per-point", False), ("fused", True))}
    # checksum parity on-chip (sum over every gradient/output element)
    if not parity(kind, mk(False), mk(True), 5e-3):
        sys.exit(1)
    for jf in jits.values():  # compile + two warm calls each
        float(jf(v, loc, a))
        float(jf(v + jnp.bfloat16(9), loc, a))
    print(f"warmup done ({kind})", flush=True)
    times = {lbl: [] for lbl in jits}
    for r in range(ROUNDS):
        for lbl, jf in jits.items():
            t0 = time.perf_counter()
            for i in range(3):
                float(jf(v + jnp.bfloat16(i + 1), loc, a))
            times[lbl].append((time.perf_counter() - t0) / 3 / REPS)
        print(f"  round {r}: " + "  ".join(
            f"{lbl} {times[lbl][-1]*1e3:7.1f} ms" for lbl in times),
            flush=True)
    for lbl, ts in times.items():
        print(f"{kind} {lbl:10s} median {statistics.median(ts)*1e3:7.1f} ms"
              f"  min {min(ts)*1e3:7.1f}", flush=True)


which = sys.argv[1] if len(sys.argv) > 1 else "both"
print(f"backend={jax.default_backend()} devices={jax.device_count()}",
      flush=True)
if which in ("fwd", "both"):
    run("fwd")
if which in ("bwd", "both"):
    run("bwd")
