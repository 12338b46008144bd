"""Benchmark: Ref-YTVOS-style whole-clip referring inference throughput on one
TPU chip (the north-star workload, BASELINE.json).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline` compares against the reference's published numbers — the repo
publishes none (BASELINE.md), so we report against the recorded target proxy
when present in baseline_fps.json, else null.
"""
import json
import os
import time

import numpy as np


def main():
    import jax

    from neurips2023_soc_tpu.models.soc import SOC

    T = int(os.environ.get("BENCH_FRAMES", 16))
    H, W = 360, 640  # Ref-YTVOS eval resolution (configs: 360 short side / 640 max)
    S = 16
    backbone = os.environ.get("BENCH_BACKBONE", "video-swin-t")
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    import jax.numpy as jnp

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32

    model = SOC(
        backbone_name=backbone, d_model=256, num_queries=20,
        dim_feedforward=2048, enc_layers=3, dec_layers=3,
        voc_enc_layers=3, voc_dec_layers=3, text_encoder_type="roberta-base",
        msda_impl=os.environ.get("BENCH_MSDA", "auto"),
        swin_attn_impl=os.environ.get("BENCH_SWIN_ATTN", "xla"),
        dtype=dtype,
    )

    rng = np.random.RandomState(0)
    pixels = rng.randn(T, 1, H, W, 3).astype(np.float32)
    pad = np.zeros((T, 1, H, W), bool)
    ids = rng.randint(3, 1000, size=(1, S)).astype(np.int32)
    msk = np.ones((1, S), np.int32)

    params = jax.jit(model.init)(jax.random.PRNGKey(0), pixels, pad, ids, msk)

    @jax.jit
    def forward(params, pixels, pad, ids, msk):
        out = model.apply(params, pixels, pad, ids, msk)
        # trajectory selection fused in-graph (reference infer_refytb.py:221-226)
        scores = jax.nn.sigmoid(out["pred_cls"][-1]).mean(0).max(-1)  # (B, Nq)
        best = jnp.argmax(scores, -1)  # (B,)
        masks = out["pred_masks"][-1]  # (T, B, Nq, h, w)
        sel = jnp.take_along_axis(
            masks, best[None, :, None, None, None], axis=2
        )[:, :, 0]
        # scalar checksum: fetching it each iteration forces real execution —
        # the axon runtime memoizes identical executions and block_until_ready
        # does not imply completion, so naive timing over-reports wildly
        return sel.astype(jnp.float32).mean()

    iters = int(os.environ.get("BENCH_ITERS", 10))
    pad_d = jax.device_put(pad)
    ids_d = jax.device_put(ids)
    msk_d = jax.device_put(msk)
    px_d = jax.device_put(pixels)

    float(forward(params, px_d, pad_d, ids_d, msk_d))  # compile + warm

    t0 = time.perf_counter()
    for i in range(iters):
        # fresh input per iteration (cheap on-device add) defeats memoization
        float(forward(params, px_d + np.float32(i + 1), pad_d, ids_d, msk_d))
    dt = time.perf_counter() - t0
    fps = T * iters / dt

    vs_baseline = None
    try:
        with open(os.path.join(os.path.dirname(__file__), "baseline_fps.json")) as f:
            base = json.load(f).get("ytvos_infer_fps")
            if base:
                vs_baseline = fps / base
    except Exception:
        pass

    print(json.dumps({
        "metric": f"ytvos_whole_clip_infer_fps_{backbone}_{T}f_{H}x{W}_{dtype_name}",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": vs_baseline,
    }))


if __name__ == "__main__":
    main()
