"""Benchmark: Ref-YTVOS-style whole-clip referring inference throughput on one
TPU chip.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...} for the
NORTH-STAR config — Video-Swin-B whole-video inference (BASELINE.json targets
"Ref-YouTube-VOS valid inference ... Video-Swin-B") — plus a "secondary"
field carrying the Video-Swin-T number tracked since round 1 (BENCH_r01/r02
recorded swin-t; the primary metric changed to swin-b per VERDICT r2 weak #3).

`vs_baseline` divides by the PROVISIONAL spec-derived A100 estimate of the
reference torch pipeline recorded in baseline_fps.json (the repo publishes no
fps numbers and no GPU exists here — see that file + BENCH_NOTES.md for the
derivation and error bars; it is an estimate, not a measurement).
"""
import json
import os
import time

import numpy as np


def measure(backbone: str, T: int, dtype_name: str, iters: int) -> dict:
    import jax
    import jax.numpy as jnp

    from neurips2023_soc_tpu.models.soc import SOC

    H, W = 360, 640  # Ref-YTVOS eval resolution (360 short side / 640 max)
    S = 16
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

    pad_d = jax.device_put(pad)
    ids_d = jax.device_put(ids)
    msk_d = jax.device_put(msk)
    px_d = jax.device_put(pixels)

    float(forward(params, px_d, pad_d, ids_d, msk_d))  # compile + warm
    # second warm call with a PERTURBED input: the first non-memoized
    # execution after compile can be 3-5x slow on the tunneled runtime and
    # must not land inside the timing loop
    float(forward(params, px_d + np.float32(0.5), pad_d, ids_d, msk_d))

    times = []
    for i in range(iters):
        # fresh input per iteration (cheap on-device add) defeats memoization
        t0 = time.perf_counter()
        float(forward(params, px_d + np.float32(i + 1), pad_d, ids_d, msk_d))
        times.append(time.perf_counter() - t0)
    # median per-iteration time: robust to transient host-load spikes
    # (observed ±6% drift) without rewarding a single lucky iteration
    sync_fps = T / float(np.median(times))

    # steady-state (pipelined) throughput: dispatch clip i+1 before fetching
    # clip i's checksum, hiding the host<->device round-trip behind device
    # compute — exactly what InferenceEngine's pipelined video loop does in
    # serving. EVERY iteration's checksum is still fetched (the runtime
    # memoizes identical executions and block_until_ready does not imply
    # completion, so only the host fetch forces real work); depth 1 keeps at
    # most two clips in flight. Median over 3 rounds of `iters` clips.
    rounds = []
    seq = 1000
    for _ in range(3):
        pending = []
        t0 = time.perf_counter()
        for _ in range(iters):
            seq += 1
            pending.append(
                forward(params, px_d + np.float32(seq), pad_d, ids_d, msk_d))
            if len(pending) > 1:
                float(pending.pop(0))
        for p in pending:
            float(p)
        rounds.append((time.perf_counter() - t0) / iters)
    pipe_fps = T / float(np.median(rounds))
    return {"pipelined": pipe_fps, "sync_per_call": sync_fps}


def main():
    T = int(os.environ.get("BENCH_FRAMES", 16))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    iters = int(os.environ.get("BENCH_ITERS", 10))

    baselines = {}
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "baseline_fps.json")) as f:
            baselines = json.load(f)
    except Exception:
        pass

    # BENCH_BACKBONE overrides run a single backbone (A/B kernel work);
    # the default driver run measures the north-star swin-b + tracked swin-t
    only = os.environ.get("BENCH_BACKBONE")
    results = {}
    for backbone in ([only] if only else ["video-swin-b", "video-swin-t"]):
        results[backbone] = measure(backbone, T, dtype_name, iters)

    primary = only or "video-swin-b"
    fps = results[primary]["pipelined"]
    base_key = ("ytvos_infer_fps_a100_provisional_swin_b"
                if "swin-b" in primary else
                "ytvos_infer_fps_a100_provisional_swin_t")
    # a per-backbone MEASURED key wins over the provisional estimate; the
    # legacy single-value 'ytvos_infer_fps' slot applies to swin-t only
    measured = baselines.get(f"ytvos_infer_fps_{primary}") or (
        baselines.get("ytvos_infer_fps") if "swin-t" in primary else None)
    base = measured or baselines.get(base_key)
    record = {
        "metric": f"ytvos_whole_clip_infer_fps_{primary}_{T}f_360x640_{dtype_name}",
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / base, 3) if base else None,
        # pipelined = steady-state serving throughput (clip i+1 dispatched
        # before clip i's fetch, every result fetched — the engine's
        # pipeline_videos path); sync = one-clip-at-a-time latency protocol
        # used for BENCH_r01/r02 numbers, includes the full host round-trip
        "protocol": "pipelined_depth1_median_of_3_rounds",
        "sync_per_call_fps": round(results[primary]["sync_per_call"], 3),
    }
    if base and not measured and baselines.get("provisional"):
        record["baseline_provenance"] = (
            f"PROVISIONAL spec-derived A100 estimate ({base} fps, "
            "baseline_fps.json) — not a measurement")
    secondary = {b: v for b, v in results.items() if b != primary}
    if secondary:
        record["secondary"] = {
            f"ytvos_whole_clip_infer_fps_{b}_{T}f_360x640_{dtype_name}":
                {"pipelined": round(v["pipelined"], 3),
                 "sync_per_call": round(v["sync_per_call"], 3)}
            for b, v in secondary.items()}
    print(json.dumps(record))


if __name__ == "__main__":
    main()
