"""Microbenchmark: msda forward vs backward cost on the real TPU at the
flagship encoder shape — sizes the payoff of a Pallas backward kernel
(VERDICT r2 weak #1). Timing protocol per .claude/skills/verify: inputs
perturbed per rep inside one jit, scalar checksum fetched per call."""
import time

import numpy as np
import jax
import jax.numpy as jnp

from neurips2023_soc_tpu.ops.ms_deform_attn import ms_deform_attn_xla
from neurips2023_soc_tpu.ops.pallas_msda import (
    ms_deform_attn_pallas,
    ms_deform_attn_pallas_op,
)

SHAPES = ((45, 80), (23, 40), (12, 20), (6, 10))
B, M, D, L, P = 8, 8, 32, 4, 4
S = sum(h * w for h, w in SHAPES)
Lq = S
REPS = 4

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


def timed(name, make_fn):
    @jax.jit
    def jf(v, loc, a):
        acc = jnp.float32(0)
        for r in range(REPS):
            acc += make_fn(v + jnp.bfloat16(r), loc, a)
        return acc

    float(jf(v, loc, a))
    float(jf(v + jnp.bfloat16(9), loc, a))  # second warm call
    t0 = time.perf_counter()
    n = 3
    for i in range(n):
        float(jf(v + jnp.bfloat16(i + 1), loc, a))
    dt = (time.perf_counter() - t0) / n / REPS
    print(f"{name:38s} {dt*1e3:7.1f} ms")
    return dt


def fwd_sum(fn):
    return lambda v, l, a: fn(v, SHAPES, l, a).astype(jnp.float32).sum()


t_fp = timed("pallas forward", fwd_sum(ms_deform_attn_pallas))
t_fx = timed("xla forward", fwd_sum(ms_deform_attn_xla))

for name, op in (("pallas_op (pallas fwd + xla bwd)", ms_deform_attn_pallas_op),
                 ("xla autodiff", ms_deform_attn_xla)):
    loss = fwd_sum(op)
    t_all = timed(f"grad all   | {name}", lambda v, l, a, loss=loss:
                  sum(g.astype(jnp.float32).sum()
                      for g in jax.grad(loss, argnums=(0, 1, 2))(v, l, a)))
    t_v = timed(f"grad value | {name}", lambda v, l, a, loss=loss:
                jax.grad(loss, argnums=0)(v, l, a).astype(jnp.float32).sum())
    t_la = timed(f"grad loc+attn | {name}", lambda v, l, a, loss=loss:
                 sum(g.astype(jnp.float32).sum()
                     for g in jax.grad(loss, argnums=(1, 2))(v, l, a)))

rows = B * Lq * M * L * P
print(f"rows/call: {rows/1e6:.1f}M; pallas fwd rate {rows/t_fp/1e6:.0f}M/s")
