"""Benchmark: Ref-YTVOS-style whole-clip referring inference throughput on one
TPU chip — self-calibrating against the host↔device link it runs over.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

HEADLINE (VERDICT r4 #1 — chip-honest pair): `value` is the DEVICE clip
throughput (the fused proxy program: device-resident input, scalar checksum
out — what the chip itself sustains on the north-star Video-Swin-B 16-frame
360x640 bf16 config), and `engine_vs_roofline` is the SERVING-SOFTWARE
quality: the shipped `InferenceEngine.infer_videos` end-to-end fps divided
by the roofline that the measured link capacity + device throughput permit.
The raw engine fps (a LINK number on this ~23 MB/s tunnel) and its
vs_baseline are carried as secondary fields under `engine_u8`/`engine_yuv420`.

Self-calibration (`link` field): the link is probed IN-SESSION — explicit
`device_put` upload bandwidth (MB/s) and scalar round-trip time (ms), before
and after the engine measurements. Per input format the JSON carries
`roofline_fps` = T / max(upload_bytes/bw, device_time) and
`engine_vs_roofline`. A pipelined<sync inversion (impossible on an idle
link; the r4 driver capture hit it under contention) triggers ONE retry of
that engine measurement; if it persists, or the pre/post link probes
disagree by >30%, `link_contended: true` is set — a depressed capture is
then explained by the artifact itself instead of reading as a regression.

In-run calibration (r5): small link probes also run BETWEEN the engine
measurement's own timed phases (after the sync loop and after each
pipelined round; BENCH_INRUN_PROBES=0 disables). `vs_roofline_inrun`
divides the engine fps by the roofline the link permitted WHILE the run
happened — the contention-immune serving-software-quality number. A link
that degrades between the pre/post probes and the run itself no longer
depresses the quality metric (it sets `inrun_below_probes` +
`link_contended` instead).

Also carried in the JSON line:
  * engine_u8 / engine_yuv420: the shipped engine per input format
    (uint8 RGB = 3 B/px; YUV420p planes = 1.5 B/px, the video-codec-native
    format), each with pipelined/sync fps, roofline, and vs_roofline
  * multi_expression: 8-expressions-per-video engine throughput; its ONE
    speedup definition is `speedup_vs_8_single_passes` (BENCH_NOTES.md
    "metric definitions" is the authority on every ratio's meaning)
  * secondary: Video-Swin-T engine+proxy numbers (tracked since r1)
  * train: swin-t AND swin-b train-step seconds (T=8, 360x640, bs=1/chip)
    with a provisional A100 denominator (VERDICT r3 "do this" #3)

`vs_baseline` divides by the PROVISIONAL spec-derived A100 estimate of the
reference torch pipeline recorded in baseline_fps.json (the repo publishes no
fps numbers and no GPU exists here — see that file + BENCH_NOTES.md for the
derivation and error bars; it is an estimate, not a measurement). A measured
`ytvos_infer_fps_<backbone>` key in baseline_fps.json overrides it (see
BASELINE.md's obligations ledger).
"""
import json
import os
import time

import numpy as np


def _enable_compile_cache():
    """Persistent compile cache (same dir as conftest.py): repeated bench
    runs skip recompiling unchanged programs where the backend honors it."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/tmp/jax_test_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass  # older jax or remote-compile backend: cache is best-effort


def probe_link(mb: int = 8, repeats: int = 3) -> dict:
    """In-session host↔device link probe (VERDICT r4 #1): scalar round-trip
    time and explicit `device_put` upload bandwidth — the two quantities the
    engine rooflines divide by. The engine metrics are LINK numbers on this
    tunneled runtime (~23 MB/s, ~50 ms RTT when idle), so the roofline they
    are judged against must be measured in the SAME session, not assumed
    from a previous idle-host run. Completion is forced the same way the
    bench forces it everywhere: a checksum fetch per upload (device_put +
    block_until_ready alone under-report on this runtime)."""
    import jax
    import jax.numpy as jnp

    # module-level cache: probe_link now also runs between measurement
    # phases (in-run probes), so its helpers must not re-trace per call
    if "_probe_fns" not in globals():
        globals()["_probe_fns"] = (
            jax.jit(lambda x: x + 1),
            jax.jit(lambda a: jnp.sum(a, dtype=jnp.int32)),
        )
    add, checksum = globals()["_probe_fns"]
    float(add(jax.device_put(np.float32(0.0))))  # compile + warm
    rtts = []
    for i in range(5):
        t0 = time.perf_counter()
        float(add(jax.device_put(np.float32(i + 1.0))))
        rtts.append(time.perf_counter() - t0)
    rtt_s = float(np.median(rtts))

    rng = np.random.RandomState(0)
    base = rng.randint(0, 256, (mb, 1 << 20), dtype=np.uint8)
    arrs = []
    for i in range(repeats + 1):
        a = base.copy()
        a[i % mb, :8] = i  # distinct content defeats execution memoization
        arrs.append(a)
    int(checksum(jax.device_put(arrs[0])))  # compile + first (slow) execution
    bws = []
    for a in arrs[1:]:
        t0 = time.perf_counter()
        int(checksum(jax.device_put(a)))
        dt = time.perf_counter() - t0
        bws.append(a.nbytes / max(dt - rtt_s, 1e-6) / 1e6)
    return {
        "rtt_ms": round(rtt_s * 1e3, 2),
        "upload_mb_s": round(float(np.median(bws)), 2),
        "upload_mb_s_spread": [round(min(bws), 2), round(max(bws), 2)],
    }


# host↔device bytes the SHIPPED engine must move per (T, H, W) video,
# by input format (BENCH_NOTES.md "engine transfer roofline"): pixels up,
# bit-packed final masks down (pack_masks=True default)
_FMT_BYTES_PER_PIXEL = {"uint8": 3.0, "yuv420": 1.5, "float32": 12.0}


def engine_roofline(fmt: str, T: int, H: int, W: int, link: dict,
                    proxy: dict) -> dict:
    """fps ceilings the measured link + device throughput permit.

    pipelined: upload, compute, and fetch overlap (depth-1) → the slower of
    link time and device time bounds the rate. sync: they serialize, and the
    one mask-fetch round trip is charged (the proxy's sync protocol already
    pays one RTT per call for its checksum, so no extra RTT term).
    `engine_vs_roofline ≈ 1` ⇒ the serving software adds nothing the
    hardware didn't force; < 1 under a contended link is flagged, not
    mistaken for a software regression."""
    upload = T * H * W * _FMT_BYTES_PER_PIXEL[fmt]
    fetch = T * H * W / 8  # bit-packed uint8 masks
    xfer_s = (upload + fetch) / (link["upload_mb_s"] * 1e6)
    pipe = T / max(xfer_s, T / proxy["pipelined"])
    sync = T / (xfer_s + T / proxy["sync_per_call"])
    return {"pipelined_fps": round(pipe, 3), "sync_fps": round(sync, 3)}


def measure_engine_checked(*args, **kwargs) -> dict:
    """measure_engine + the pipelined<sync inversion check. Pipelined
    (depth-1 overlap) below sync is impossible on an uncontended link — the
    r4 driver capture recorded exactly that (19.3 pipe vs 21.5 sync) under
    host/link contention and the artifact couldn't say so. Retry once; if
    the inversion persists, mark the measurement contended."""
    r = measure_engine(*args, **kwargs)
    if r["pipelined"] < r["sync_per_call"]:
        r2 = measure_engine(*args, **kwargs)
        if r2["pipelined"] > r["pipelined"]:
            r = r2
        r = dict(r)
        r["retried_after_inversion"] = True
        r["inverted"] = r["pipelined"] < r["sync_per_call"]
    return r


def build_model(backbone: str, dtype_name: str):
    import jax.numpy as jnp

    from neurips2023_soc_tpu.models.soc import SOC

    dtype = jnp.bfloat16 if dtype_name == "bfloat16" else jnp.float32
    return SOC(
        backbone_name=backbone, d_model=256, num_queries=20,
        dim_feedforward=2048, enc_layers=3, dec_layers=3,
        voc_enc_layers=3, voc_dec_layers=3, text_encoder_type="roberta-base",
        msda_impl=os.environ.get("BENCH_MSDA", "auto"),
        swin_attn_impl=os.environ.get("BENCH_SWIN_ATTN", "xla"),
        dtype=dtype,
    )


def init_params(model, T, H, W, S):
    import jax

    rng = np.random.RandomState(0)
    pixels = rng.randn(T, 1, H, W, 3).astype(np.float32)
    pad = np.zeros((T, 1, H, W), bool)
    ids = rng.randint(3, 1000, size=(1, S)).astype(np.int32)
    msk = np.ones((1, S), np.int32)
    return jax.jit(model.init)(jax.random.PRNGKey(0), pixels, pad, ids, msk)


def measure_proxy(model, params, T: int, iters: int,
                  H: int = 360, W: int = 640, S: int = 16) -> dict:
    """Rounds 1-3 protocol: fused forward + in-graph trajectory selection +
    scalar checksum fetch. Upper bound on any end-to-end number; kept for
    cross-round continuity."""
    import jax
    import jax.numpy as jnp

    rng = np.random.RandomState(0)
    pixels = rng.randn(T, 1, H, W, 3).astype(np.float32)
    pad = np.zeros((T, 1, H, W), bool)
    ids = rng.randint(3, 1000, size=(1, S)).astype(np.int32)
    msk = np.ones((1, S), np.int32)

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
    sync_fps = T / float(np.median(times))

    # steady-state (pipelined) throughput: dispatch clip i+1 before fetching
    # clip i's checksum (depth 1). Median over 3 rounds of `iters` clips.
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


def measure_engine(model, params, T: int, n_videos: int,
                   expressions: int = 1, H: int = 360, W: int = 640,
                   text_encoder_type: str = "roberta-base",
                   text_bucket: int = 32) -> dict:
    """The SHIPPED path: InferenceEngine end-to-end over synthetic 360x640
    videos, including the host tail (padding copy, score fetch, device
    finalize, uint8 mask fetch). Every video's pixels differ (defeats the
    runtime's execution memoization); every mask tensor is fetched.

    Returns frames/sec for the depth-1 pipelined `infer_videos` loop (the
    serving protocol the CLIs use) and for the sync one-video-at-a-time
    loop. With expressions>1, each video runs `expressions` texts through
    the split backbone/head path and fps counts frames x expressions."""
    from neurips2023_soc_tpu.inference import InferenceEngine

    texts = [f"expression number {k} describing the object"
             for k in range(expressions)]
    engine = InferenceEngine(
        model, params, text_encoder_type=text_encoder_type,
        text_bucket=text_bucket,
        time_buckets=(T,), size_buckets=((H, W),),
        pack_masks=os.environ.get("BENCH_PACK_MASKS", "1") == "1",
    )
    rng = np.random.RandomState(42)
    # uint8 frames are the shipped contract (eval datasets emit raw uint8;
    # the engine normalizes on device). BENCH_ENGINE_DTYPE A/Bs the other
    # input formats: float32 (host-normalized) and yuv420 (uint8 YUV420p
    # planes, HALF the upload bytes — the serving-from-a-video-codec case,
    # see inference.rgb_to_yuv420)
    fmt = os.environ.get("BENCH_ENGINE_DTYPE", "uint8")
    if fmt == "yuv420":
        from neurips2023_soc_tpu.inference import rgb_to_yuv420

        base_y, base_u, base_v = rgb_to_yuv420(
            rng.randint(0, 256, (T, H, W, 3)).astype(np.uint8))

        def make_items(seed0, n):
            for i in range(n):
                y = base_y.copy()
                y[:, 0, 0] = (seed0 + i) % 256
                y[:, 1, 0] = ((seed0 + i) // 256) % 256
                yield dict(frames=(y, base_u, base_v), texts=texts,
                           original_size=(H, W))
    elif fmt == "uint8":
        base = rng.randint(0, 256, (T, H, W, 3)).astype(np.uint8)

        def make_items(seed0, n):
            for i in range(n):
                frames = base.copy()
                # any content change defeats execution memoization
                frames[:, 0, 0, 0] = (seed0 + i) % 256
                frames[:, 1, 0, 0] = ((seed0 + i) // 256) % 256
                yield dict(frames=frames, texts=texts, original_size=(H, W))
    else:
        base = rng.randn(T, H, W, 3).astype(np.float32)

        def make_items(seed0, n):
            for i in range(n):
                yield dict(frames=base + np.float32(seed0 + i),
                           texts=texts, original_size=(H, W))

    # BENCH_PIPELINE_DEPTH: videos dispatched ahead of the oldest pending
    # fetch. 1 is the CLI default; deeper keeps more uploads queued on the
    # transfer stream, smoothing bandwidth troughs on a contended link at
    # the cost of one more video's device-resident logits per extra step
    depth = int(os.environ.get("BENCH_PIPELINE_DEPTH", 1))
    # compile + two perturbed warm videos (first post-compile execution can
    # be 3-5x slow on the tunneled runtime)
    for _ in engine.infer_videos(make_items(10_000, 2), depth=1):
        pass

    # sync protocol: one video fully finished before the next starts
    # in-run link probes: small readings taken BETWEEN the timed phases
    # (never inside one), so the roofline denominator can reflect the link
    # that existed DURING this measurement rather than the pre/post best.
    # A link that degrades mid-session otherwise depresses vs_roofline even
    # when the serving software is perfect (the r5 contended capture read
    # 0.677 exactly this way). BENCH_INRUN_PROBES=0 disables for A/B runs.
    inrun = []

    def _inrun_probe():
        if os.environ.get("BENCH_INRUN_PROBES", "1") != "1":
            return
        try:
            inrun.append(probe_link(mb=4, repeats=1)["upload_mb_s"])
        except Exception:
            pass

    times = []
    for i, item in enumerate(make_items(20_000, max(3, n_videos // 2))):
        t0 = time.perf_counter()
        res = engine.infer_video_multi(**item)
        assert res[0].shape == (T, H, W)
        times.append(time.perf_counter() - t0)
    sync_fps = T * expressions / float(np.median(times))
    _inrun_probe()

    # pipelined depth-1 protocol (the CLI serving loop)
    rounds = []
    seq = 30_000
    for _ in range(3):
        t0 = time.perf_counter()
        for res in engine.infer_videos(make_items(seq, n_videos), depth=depth):
            assert res[0].dtype == np.uint8
        rounds.append((time.perf_counter() - t0) / n_videos)
        seq += n_videos
        _inrun_probe()
    pipe_fps = T * expressions / float(np.median(rounds))
    out = {"pipelined": pipe_fps, "sync_per_call": sync_fps,
           "pipeline_depth": depth,
           # per-round fps: a >30% spread means the link/host moved
           # mid-measurement (contention signal for the JSON record)
           "pipelined_rounds_fps": [round(T * expressions / r, 3)
                                    for r in rounds]}
    if inrun:
        out["inrun_link_mb_s"] = [round(b, 2) for b in inrun]
    return out


def measure_train(backbone: str, iters: int) -> float:
    """Train-step seconds at the YTVOS finetune shape (T=8, B=1/chip,
    360x640, bf16 compute, f32 params) — reference README.md:167-172's
    flagship finetune config when backbone='video-swin-b'."""
    import jax
    import jax.numpy as jnp

    from neurips2023_soc_tpu.losses import CriterionConfig
    from neurips2023_soc_tpu.models.soc import SOC
    from neurips2023_soc_tpu.training.optim import build_optimizer
    from neurips2023_soc_tpu.training.train_step import TrainState, make_train_step

    T, B, H, W, S = 8, 1, 360, 640, 16
    model = SOC(
        backbone_name=backbone, d_model=256, num_queries=20,
        dim_feedforward=2048, enc_layers=3, dec_layers=3,
        voc_enc_layers=3, voc_dec_layers=3,
        text_encoder_type="roberta-base", dtype=jnp.bfloat16,
        msda_impl=os.environ.get("BENCH_MSDA", "auto"),
    )
    rng = np.random.RandomState(0)
    batch = {
        "pixels": rng.randn(T, B, H, W, 3).astype(np.float32),
        "pad_mask": np.zeros((T, B, H, W), bool),
        "text_ids": rng.randint(3, 1000, (B, S)).astype(np.int32),
        "text_mask": np.ones((B, S), np.int32),
        "sample_sizes": np.tile(np.array([H, W], np.float32), (B, 1)),
        "masks": np.zeros((T, B, 1, H, W), np.float32),
        "boxes": np.tile(np.array([0.5, 0.5, 0.3, 0.3], np.float32), (T, B, 1, 1)),
        "labels": np.zeros((B, 1), np.int32),
        "inst_valid": np.ones((B, 1), bool),
        "is_ref_inst_visible": np.ones((T, B, 1), bool),
        "referred_instance_idx": np.zeros((B,), np.int32),
    }
    batch["masks"][:, :, :, 100:260, 200:440] = 1.0
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["pixels"], batch["pad_mask"],
        batch["text_ids"], batch["text_mask"],
    )
    tx = build_optimizer(params, lr=1e-4, lr_backbone=1e-5, text_encoder_lr=5e-6)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_train_step(model, CriterionConfig())

    state, m = step(state, batch, jax.random.PRNGKey(0))
    _ = float(m["loss"])  # compile + warm
    b = dict(batch)
    b["pixels"] = batch["pixels"] + np.float32(0.5) * 1e-3
    state, m = step(state, b, jax.random.PRNGKey(999))
    _ = float(m["loss"])  # perturbed warm step (post-compile slow call)

    times = []
    for i in range(iters):
        b = dict(batch)
        b["pixels"] = batch["pixels"] + np.float32(i + 1) * 1e-3
        t0 = time.perf_counter()
        state, m = step(state, b, jax.random.PRNGKey(i + 1))
        _ = float(m["loss"])
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main():
    _enable_compile_cache()
    T = int(os.environ.get("BENCH_FRAMES", 16))
    dtype_name = os.environ.get("BENCH_DTYPE", "bfloat16")
    iters = int(os.environ.get("BENCH_ITERS", 10))
    n_videos = int(os.environ.get("BENCH_VIDEOS", 8))

    baselines = {}
    try:
        with open(os.path.join(os.path.dirname(__file__),
                               "baseline_fps.json")) as f:
            baselines = json.load(f)
    except Exception:
        pass

    # in-session link probe BEFORE any engine measurement (VERDICT r4 #1);
    # repeated after them — disagreement means the link moved mid-run
    try:
        link_pre = probe_link()
    except Exception as e:
        link_pre = {"error": str(e)}

    # BENCH_BACKBONE overrides run a single backbone (A/B kernel work);
    # the default driver run measures the north-star swin-b + tracked swin-t
    only = os.environ.get("BENCH_BACKBONE")
    backbones = [only] if only else ["video-swin-b", "video-swin-t"]
    results = {}
    for backbone in backbones:
        model = build_model(backbone, dtype_name)
        params = init_params(model, T, 360, 640, 16)
        r = {"engine": measure_engine_checked(model, params, T, n_videos)}
        if os.environ.get("BENCH_SKIP_PROXY") != "1":
            try:
                r["proxy"] = measure_proxy(model, params, T, iters)
            except Exception as e:  # never lose the engine metric
                r["proxy_error"] = str(e)
        if backbone == backbones[0]:
            if os.environ.get("BENCH_SKIP_MULTI") != "1":
                try:
                    r["multi8"] = measure_engine(
                        model, params, T, max(3, n_videos // 2),
                        expressions=8)
                except Exception as e:
                    r["multi8_error"] = str(e)
            if os.environ.get("BENCH_SKIP_YUV") != "1":
                # serving-from-a-video-codec input format: uint8 YUV420p
                # planes, half the upload bytes of raw RGB (see
                # inference.rgb_to_yuv420 / BENCH_NOTES.md roofline)
                prev = os.environ.get("BENCH_ENGINE_DTYPE")
                try:
                    os.environ["BENCH_ENGINE_DTYPE"] = "yuv420"
                    r["yuv420"] = measure_engine_checked(
                        model, params, T, n_videos)
                except Exception as e:
                    r["yuv420_error"] = str(e)
                finally:
                    if prev is None:
                        os.environ.pop("BENCH_ENGINE_DTYPE", None)
                    else:
                        os.environ["BENCH_ENGINE_DTYPE"] = prev
        results[backbone] = r
        del model, params

    try:
        link_post = probe_link()
    except Exception as e:
        link_post = {"error": str(e)}
    # capacity = the better of the two probes (a lower reading IS the
    # contention); rooflines divide by capacity so a contended engine run
    # shows up as vs_roofline < 1 WITH the contended flag set
    probes = [p for p in (link_pre, link_post) if "upload_mb_s" in p]
    link = None
    if probes:
        best = max(probes, key=lambda p: p["upload_mb_s"])
        lo = min(p["upload_mb_s"] for p in probes)
        spread_unstable = any(
            p["upload_mb_s_spread"][0] > 0
            and p["upload_mb_s_spread"][1] > 2.0 * p["upload_mb_s_spread"][0]
            for p in probes)
        link = {
            "upload_mb_s": best["upload_mb_s"],
            "rtt_ms": min(p["rtt_ms"] for p in probes),
            "pre": link_pre, "post": link_post,
            "probes_disagree": bool(
                len(probes) == 2 and lo < 0.7 * best["upload_mb_s"]),
            "probe_unstable": spread_unstable,
        }

    primary = only or "video-swin-b"
    res = results[primary]
    base_key = ("ytvos_infer_fps_a100_provisional_swin_b"
                if "swin-b" in primary else
                "ytvos_infer_fps_a100_provisional_swin_t")
    # a per-backbone MEASURED key wins over the provisional estimate; the
    # legacy single-value 'ytvos_infer_fps' slot applies to swin-t only
    measured = baselines.get(f"ytvos_infer_fps_{primary}") or (
        baselines.get("ytvos_infer_fps") if "swin-t" in primary else None)
    base = measured or baselines.get(base_key)

    proxy = res.get("proxy")
    engine = res["engine"]
    # HEADLINE value = DEVICE clip throughput (chip-honest: no link in it).
    # Falls back to the raw engine number if the proxy measurement failed.
    fps = proxy["pipelined"] if proxy else engine["pipelined"]
    record = {
        "metric": (f"ytvos_device_clip_fps_{primary}_{T}f_360x640_"
                   f"{dtype_name}" if proxy else
                   f"ytvos_engine_infer_fps_{primary}_{T}f_360x640_"
                   f"{dtype_name}"),
        "value": round(fps, 3),
        "unit": "frames/sec/chip",
        "vs_baseline": round(fps / base, 3) if base else None,
        "protocol": ("fused_clip_device_throughput_depth1_median" if proxy
                     else "InferenceEngine.infer_videos_depth1_median"),
        # the headline pair (BENCH_NOTES.md "metric definitions"): `value`
        # is what the chip sustains; engine vs_roofline is what the serving
        # software delivers of the ceiling this session's LINK permits. Raw
        # engine fps is a link number on this tunnel (~23 MB/s vs GB/s PCIe
        # on a production TPU host) and lives under engine_u8/engine_yuv420.
        "headline": "device_throughput + engine_vs_roofline",
    }
    if proxy:
        record["proxy_sync_fps"] = round(proxy["sync_per_call"], 3)

    contended = bool(link and (link.get("probes_disagree")
                               or link.get("probe_unstable")))

    def engine_block(r, fmt):
        nonlocal contended
        blk = {
            "pipelined_fps": round(r["pipelined"], 3),
            "sync_fps": round(r["sync_per_call"], 3),
            "vs_baseline": (round(r["pipelined"] / base, 3)
                            if base else None),
            "vs_baseline_sync": (round(r["sync_per_call"] / base, 3)
                                 if base else None),
        }
        rnds = r.get("pipelined_rounds_fps")
        if rnds:
            blk["pipelined_rounds_fps"] = rnds
            if min(rnds) < 0.7 * max(rnds):  # link/host moved mid-measurement
                blk["rounds_unstable"] = True
                contended = True
        if r.get("retried_after_inversion"):
            blk["retried_after_inversion"] = True
        if r.get("inverted"):
            blk["pipelined_below_sync"] = True  # physically impossible idle
            contended = True
        if link and proxy:
            roof = engine_roofline(fmt, T, 360, 640, link, proxy)
            blk["roofline_fps"] = roof
            blk["vs_roofline"] = round(
                r["pipelined"] / roof["pipelined_fps"], 3)
            blk["vs_roofline_sync"] = round(
                r["sync_per_call"] / roof["sync_fps"], 3)
        # contention-immune variant: rooflines against the link capacity
        # measured BETWEEN this run's own timed phases (measure_engine's
        # in-run probes) — what the link actually delivered while the
        # engine ran, not the session's best pre/post reading. This is the
        # serving-software-quality number that survives a contended day.
        inrun = r.get("inrun_link_mb_s")
        if inrun and proxy:
            blk["inrun_link_mb_s"] = inrun
            bw = float(np.median(inrun))
            roof_in = engine_roofline(fmt, T, 360, 640,
                                      {"upload_mb_s": bw}, proxy)
            blk["vs_roofline_inrun"] = round(
                r["pipelined"] / roof_in["pipelined_fps"], 3)
            blk["vs_roofline_sync_inrun"] = round(
                r["sync_per_call"] / roof_in["sync_fps"], 3)
            # the link having moved between the pre/post best and the
            # in-run readings is concurrent evidence of contention
            if link and bw < 0.7 * link["upload_mb_s"]:
                blk["inrun_below_probes"] = True
                contended = True
        return blk

    record["engine_u8"] = engine_block(engine, "uint8")
    if "yuv420" in res:
        record["engine_yuv420"] = engine_block(res["yuv420"], "yuv420")
    if proxy:
        record["engine_vs_proxy"] = round(
            engine["pipelined"] / proxy["pipelined"], 3)
        vs_roof = {}
        if "vs_roofline" in record["engine_u8"]:
            vs_roof["u8"] = record["engine_u8"]["vs_roofline"]
        if "vs_roofline" in record.get("engine_yuv420", {}):
            vs_roof["yuv420"] = record["engine_yuv420"]["vs_roofline"]
        if vs_roof:
            record["engine_vs_roofline"] = vs_roof
        vs_roof_in = {}
        if "vs_roofline_inrun" in record["engine_u8"]:
            vs_roof_in["u8"] = record["engine_u8"]["vs_roofline_inrun"]
        if "vs_roofline_inrun" in record.get("engine_yuv420", {}):
            vs_roof_in["yuv420"] = (
                record["engine_yuv420"]["vs_roofline_inrun"])
        if vs_roof_in:
            record["engine_vs_roofline_inrun"] = vs_roof_in
    if link:
        record["link"] = link
    record["link_contended"] = contended
    if "multi8" in res:
        m8 = res["multi8"]
        record["multi_expression"] = {
            "expressions_per_video": 8,
            "pipelined_expression_frames_per_sec": round(m8["pipelined"], 3),
            # THE speedup definition (BENCH_NOTES.md metric definitions):
            # vs running the same videos 8x through the single-expression
            # engine — the reference re-runs the full model per expression
            "speedup_vs_8_single_passes": round(
                m8["pipelined"] / engine["pipelined"], 3),
        }
    for err_key in ("proxy_error", "multi8_error", "yuv420_error"):
        if err_key in res:
            record[err_key] = res[err_key]
    if base and not measured and baselines.get("provisional"):
        record["baseline_provenance"] = (
            f"PROVISIONAL spec-derived A100 estimate ({base} fps, "
            "baseline_fps.json) — not a measurement")
    secondary = {b: v for b, v in results.items() if b != primary}
    if secondary:
        record["secondary"] = {
            f"ytvos_engine_infer_fps_{b}_{T}f_360x640_{dtype_name}":
                {"engine_pipelined": round(v["engine"]["pipelined"], 3),
                 "engine_sync": round(v["engine"]["sync_per_call"], 3),
                 **({"proxy_pipelined": round(v["proxy"]["pipelined"], 3),
                     "proxy_sync": round(v["proxy"]["sync_per_call"], 3)}
                    if "proxy" in v else {})}
            for b, v in secondary.items()}

    if os.environ.get("BENCH_SKIP_TRAIN") != "1":
        train_iters = int(os.environ.get("BENCH_TRAIN_ITERS", 3))
        train = {}
        for backbone in backbones:
            key = "swin_b" if "swin-b" in backbone else "swin_t"
            try:
                train[f"train_step_s_{key}"] = round(
                    measure_train(backbone, train_iters), 4)
            except Exception as e:  # never lose the inference metric
                train[f"train_step_s_{key}"] = f"error: {e}"
        # a measured key (obligations ledger row 2) overrides the estimate
        tmeasured = baselines.get("ytvos_train_step_s_a100_swin_b")
        tbase = tmeasured or baselines.get(
            "ytvos_train_step_s_a100_provisional_swin_b")
        if tbase and isinstance(train.get("train_step_s_swin_b"), float):
            train["train_vs_baseline_swin_b"] = round(
                tbase / train["train_step_s_swin_b"], 3)
            if not tmeasured:
                train["train_baseline_provenance"] = (
                    f"PROVISIONAL spec-derived A100 estimate ({tbase} "
                    "s/step) — not a measurement")
        record["train"] = train

    # attach the host input-pipeline measurement if one was captured
    # (tools/bench_data_pipeline.py writes DATA_PIPELINE.json; it is a
    # host-CPU number, measured once on an idle host rather than re-run
    # here where it would contend with the engine timings)
    try:
        dp_path = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "DATA_PIPELINE.json")
        with open(dp_path) as f:
            dp = json.load(f)
        record["data_pipeline"] = {
            k: dp[k] for k in (
                "host_s_per_batch", "device_step_s", "data_time_fraction",
                "keeps_chips_busy", "global_bs", "workers", "cores_used",
                "cores_needed_for_8_chips", "captured_at") if k in dp}
    except FileNotFoundError:
        pass  # optional: no capture on this machine
    except Exception as e:  # corrupt file should be visible, not silent
        record["data_pipeline_error"] = str(e)

    print(json.dumps(record))


if __name__ == "__main__":
    main()
