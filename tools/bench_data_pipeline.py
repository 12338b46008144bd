"""Host input-pipeline throughput at the reference's global train batch
(VERDICT r4 #4): can the host feed 8 chips at global bs=8, T=8?

Drives the REAL data path — on-disk JPEG corpus → ReferYouTubeVOSDataset
(decode, resize-to-360/640, flip, normalize) → ShardedEpochSampler →
parallel_map(num_workers) → collate_batch → shard_batch onto the mesh —
i.e. exactly `cli/main.py:make_batch_iterator`, the loop `Trainer.train`
consumes through `prefetch`. The reference's analog is
DataLoader(num_workers) per GPU process (reference trainer.py:74-88) at the
8-GPU bs-8 finetune shape (reference README.md:167-172).

Prints ONE JSON line:
  host_s_per_batch      median wall seconds to produce one GLOBAL batch
                        (8 samples x 8 frames, decoded at the corpus
                        resolution, resized to <=360x640, collated)
  data_time_fraction    host_s_per_batch / device_step_s — <1 means the
                        host hides entirely behind the chip under prefetch
  device_step_s         denominator: the measured swin-b TPU train step
                        (BENCH_r04 train_step_s_swin_b = 0.413; override
                        with --device-step-s or a bench JSON)
  cores_used / cores_needed_for_8_chips
                        decode/resize/normalize release the GIL and
                        parallel_map scales them across threads; on a
                        cores-limited host the fraction scales ~1/cores, so
                        cores_needed = ceil(fraction * cores_used) is the
                        host budget for a sustained feed (production v5e-8
                        hosts carry >100 vCPU)

Usage:  python tools/bench_data_pipeline.py [--batches N] [--workers N]
            [--frame-hw 720 1280] [--device-step-s 0.413]
"""
from __future__ import annotations

import argparse
import json
import math
import os
import sys
import tempfile
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def build_corpus(root: Path, num_videos: int, frames_per_video: int,
                 hw: tuple) -> None:
    """On-disk synthetic Ref-YTVOS corpus at a realistic source resolution
    (YTVOS frames are 720p JPEGs) — the decode cost is the point."""
    from PIL import Image

    h, w = hw
    rng = np.random.RandomState(0)
    frame_ids = [f"{i:05d}" for i in range(frames_per_video)]
    videos = {}
    for v in range(num_videos):
        vid = f"vid_{v:03d}"
        jd = root / "train" / "JPEGImages" / vid
        ad = root / "train" / "Annotations" / vid
        jd.mkdir(parents=True)
        ad.mkdir(parents=True)
        # textured frames (JPEG entropy comparable to natural video; a flat
        # frame would decode unrealistically fast)
        base = (rng.rand(h // 8, w // 8, 3) * 255).astype(np.uint8)
        base = np.kron(base, np.ones((8, 8, 1), np.uint8))
        for t, fi in enumerate(frame_ids):
            img = np.roll(base, 7 * t, axis=1)
            img[:, :, 0] = np.roll(img[:, :, 0], 3 * t, axis=0)
            Image.fromarray(img).save(jd / f"{fi}.jpg", quality=85)
            ann = np.zeros((h, w), np.uint8)
            y0 = (11 * v + 5 * t) % (h - h // 4)
            x0 = (23 * v + 9 * t) % (w - w // 4)
            ann[y0:y0 + h // 4, x0:x0 + w // 4] = 1
            Image.fromarray(ann).convert("P").save(ad / f"{fi}.png")
        videos[vid] = {
            "frames": frame_ids,
            "expressions": {"0": {"exp": "the moving textured square",
                                  "obj_id": "1"}},
        }
    (root / "meta_expressions" / "train").mkdir(parents=True)
    (root / "meta_expressions" / "train" / "meta_expressions.json").write_text(
        json.dumps({"videos": videos}))
    meta = {"videos": {vid: {"objects": {"1": {"category": "dog"}}}
                       for vid in videos}}
    (root / "train" / "meta.json").write_text(json.dumps(meta))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, default=8)
    ap.add_argument("--workers", type=int,
                    default=len(os.sched_getaffinity(0)))
    ap.add_argument("--global-bs", type=int, default=8)
    ap.add_argument("--window", type=int, default=8)
    ap.add_argument("--frame-hw", type=int, nargs=2, default=(720, 1280))
    ap.add_argument("--device-step-s", type=float, default=0.413,
                    help="measured swin-b TPU train step (BENCH_r04)")
    ap.add_argument("--corpus", default=None,
                    help="reuse an existing corpus dir (skips generation)")
    ap.add_argument("--skip-shard", action="store_true",
                    help="measure the pure host path (no jax device_put)")
    args = ap.parse_args()

    from neurips2023_soc_tpu.data.refer_youtube_vos import ReferYouTubeVOSDataset
    from neurips2023_soc_tpu.data.collate import collate_batch
    from neurips2023_soc_tpu.data.sampler import ShardedEpochSampler
    from neurips2023_soc_tpu.models.text_encoder import build_tokenizer
    from neurips2023_soc_tpu.utils.prefetch import parallel_map

    tmp = None
    if args.corpus:
        root = Path(args.corpus)
    else:
        tmp = tempfile.TemporaryDirectory(prefix="soc_data_bench_")
        root = Path(tmp.name)
        # enough windows that --batches never repeats a decoded (cached) file
        need = args.batches * args.global_bs + args.global_bs
        frames_per_video = 2 * args.window
        t0 = time.perf_counter()
        build_corpus(root, num_videos=need // 2 + 1,
                     frames_per_video=frames_per_video, hw=tuple(args.frame_hw))
        print(f"corpus built in {time.perf_counter() - t0:.1f}s", file=sys.stderr)

    ds = ReferYouTubeVOSDataset(
        "train", str(root), window_size=args.window, check_counts=False,
        transforms_kwargs=dict(train_short_size=360, train_max_size=640),
    )
    tokenizer = build_tokenizer("roberta-base", 32)
    sampler = ShardedEpochSampler(len(ds), 1, 0, shuffle=True, seed=0)
    sampler.set_epoch(0)
    order = list(sampler)[: args.batches * args.global_bs]

    mesh = None
    if not args.skip_shard:
        import jax

        from neurips2023_soc_tpu.parallel import make_mesh, shard_batch

        n = len(jax.devices())
        n = max(d for d in range(1, n + 1) if args.global_bs % d == 0)
        mesh = make_mesh(shape=(n,), axis_names=("data",),
                         devices=jax.devices()[:n])

    # the exact make_batch_iterator inner loop (cli/main.py:95-109)
    times = []
    produced = 0
    t0 = time.perf_counter()
    batch_t0 = t0
    batch = []
    for s in parallel_map(ds.__getitem__, order, args.workers):
        batch.append(s)
        if len(batch) == args.global_bs:
            b = collate_batch(batch, tokenizer,
                              size_buckets=((360, 640),),
                              time_buckets=(args.window,))
            if mesh is not None:
                from neurips2023_soc_tpu.parallel import shard_batch

                b = shard_batch(mesh, b)
            now = time.perf_counter()
            times.append(now - batch_t0)
            batch_t0 = now
            produced += 1
            batch = []
    total = time.perf_counter() - t0

    # first batch pays thread-pool + tokenizer warmup; median is steady state
    host_s = float(np.median(times[1:] if len(times) > 2 else times))
    cores = len(os.sched_getaffinity(0))
    fraction = host_s / args.device_step_s
    record = {
        "metric": "train_input_pipeline_global_bs8",
        "host_s_per_batch": round(host_s, 4),
        "host_s_per_batch_all": [round(t, 4) for t in times],
        "device_step_s": args.device_step_s,
        "data_time_fraction": round(fraction, 3),
        "keeps_chips_busy": bool(fraction < 1.0),
        "global_bs": args.global_bs,
        "window": args.window,
        "source_hw": list(args.frame_hw),
        "workers": args.workers,
        "cores_used": cores,
        # decode/resize release the GIL; parallel_map scales them across
        # threads, so the core budget for fraction<1 is ~linear
        "cores_needed_for_8_chips": int(math.ceil(fraction * cores)),
        "samples_per_sec_host": round(produced * args.global_bs / total, 2),
        "sharded_onto_mesh": mesh is not None,
    }
    print(json.dumps(record))
    # persist next to bench.py: the driver's round-end bench attaches this
    # (record["data_pipeline"]) so the official artifact carries the host
    # feed-rate story without re-measuring on the bench machine
    out = Path(__file__).resolve().parent.parent / "DATA_PIPELINE.json"
    record["captured_at"] = time.strftime("%Y-%m-%d %H:%M:%S")
    out.write_text(json.dumps(record, indent=1))
    if tmp is not None:
        tmp.cleanup()


if __name__ == "__main__":
    main()
