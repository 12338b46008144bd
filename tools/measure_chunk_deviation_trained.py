"""Chunking deviation with TRAINED weights (VERDICT r4 #5).

tests/test_chunk_deviation.py bounds the beyond-bucket chunking deviation
with RANDOM weights (IoU 0.76 at 2x the bucket) and argues trained masks
saturate; this closes the register entry with a measured trained-weights
bound: train the tiny synthetic config to saturation (the moving-square
corpus, minutes), then compare chunked (bucket < T, VOC sees half the clip)
vs one-shot (bucket >= T, the reference's whole-video semantics,
infer_refytb.py:206-214) on held-out in-distribution clips.

Prints ONE JSON line with the trained-weights deviation (mask IoU between
the two protocols, mean |dp|, trajectory agreement) plus the quality gate
(IoU vs ground truth for BOTH protocols) proving the weights are saturated,
not random. Recorded in COMPONENTS.md's deviation register.

Usage: python tools/measure_chunk_deviation_trained.py [--steps 300]
"""
from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--lr", type=float, default=3e-4)
    ap.add_argument("--eval-clips", type=int, default=8)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import jax

    from neurips2023_soc_tpu.data.synthetic import (
        SyntheticRVOSDataset, iterate_batches,
    )
    from neurips2023_soc_tpu.inference import InferenceEngine
    from neurips2023_soc_tpu.losses import CriterionConfig
    from neurips2023_soc_tpu.models.soc import SOC
    from neurips2023_soc_tpu.models.text_encoder import build_tokenizer
    from neurips2023_soc_tpu.training.optim import build_optimizer
    from neurips2023_soc_tpu.training.train_step import (
        TrainState, make_train_step,
    )

    H, W, T_train = 48, 64, 8
    model = SOC(
        backbone_name="video-swin-t", d_model=64, num_queries=5,
        dim_feedforward=128, enc_layers=1, dec_layers=2,
        voc_enc_layers=1, voc_dec_layers=1, text_encoder_type="roberta-tiny",
        dropout=0.0,
    )
    train_ds = SyntheticRVOSDataset(num_samples=64, num_frames=T_train,
                                    frame_size=(H, W), seed=args.seed)
    tokenizer = build_tokenizer("roberta-tiny", 8)

    batches = list(iterate_batches(train_ds, 2, tokenizer, shuffle=True,
                                   seed=args.seed,
                                   size_buckets=((H, W),),
                                   time_buckets=(T_train,)))
    first = batches[0]
    params = jax.jit(model.init)(
        jax.random.PRNGKey(args.seed), first["pixels"], first["pad_mask"],
        first["text_ids"], first["text_mask"])
    tx = build_optimizer(params, lr=args.lr, lr_backbone=args.lr,
                         text_encoder_lr=args.lr / 2)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_train_step(model, CriterionConfig())

    rng = jax.random.PRNGKey(args.seed + 1)
    t0 = time.perf_counter()
    losses = []
    i = 0
    while i < args.steps:
        for b in batches:
            rng, srng = jax.random.split(rng)
            state, metrics = step(state, b, srng)
            losses.append(float(metrics["loss"]))
            i += 1
            if i % 50 == 0:
                print(f"step {i}: loss {np.mean(losses[-25:]):.4f} "
                      f"({time.perf_counter() - t0:.0f}s)", file=sys.stderr)
            if i >= args.steps:
                break
    train_s = time.perf_counter() - t0

    # ---- deviation measurement at 2x the bucket, in-distribution clips ----
    T = 2 * T_train
    eval_ds = SyntheticRVOSDataset(num_samples=args.eval_clips, num_frames=T,
                                   frame_size=(H, W), seed=args.seed + 777)

    def engine(buckets):
        return InferenceEngine(
            model, state.params, text_encoder_type="roberta-tiny",
            text_bucket=8, time_buckets=buckets, size_buckets=((H, W),))

    chunked = engine((T_train,))        # VOC sees T/2 per forward
    oneshot = engine((T_train, T))      # bucket covers T: reference semantics

    ious, dps, traj_match = [], [], 0
    gt_iou_chunk, gt_iou_whole = [], []
    for k in range(args.eval_clips):
        s = eval_ds[k]
        frames, text = s["frames"], s["text"]
        gt = s["masks"][:, 0] > 0
        p_c = chunked.infer_video(frames, text, return_probs=True)
        p_w = oneshot.infer_video(frames, text, return_probs=True)
        m_c, m_w = p_c > 0.5, p_w > 0.5
        inter = np.logical_and(m_c, m_w).sum()
        union = np.logical_or(m_c, m_w).sum()
        ious.append(float(inter) / max(float(union), 1.0))
        dps.append(float(np.abs(p_c - p_w).mean()))
        gt_iou_chunk.append(float(np.logical_and(m_c, gt).sum())
                            / max(float(np.logical_or(m_c, gt).sum()), 1.0))
        gt_iou_whole.append(float(np.logical_and(m_w, gt).sum())
                            / max(float(np.logical_or(m_w, gt).sum()), 1.0))
        # trajectory agreement via the fused per-video argmax both protocols
        # report through chosen boxes (tiny Nq=5)
        h_c = chunked._dispatch_video(frames, [text], fuse=False)
        h_w = oneshot._dispatch_video(frames, [text], fuse=False)

        def q(h):
            sc = np.concatenate(
                [np.asarray(outs[0][0])[:t] for outs, t in h["chunks"]], 0)
            return int(sc.mean(0).argmax())

        traj_match += int(q(h_c) == q(h_w))

    record = {
        "metric": "chunk_deviation_trained_weights",
        "train_steps": args.steps,
        "train_seconds": round(train_s, 1),
        "final_loss": round(float(np.mean(losses[-25:])), 4),
        "first_loss": round(float(np.mean(losses[:5])), 4),
        "clips": args.eval_clips,
        "T": T, "bucket": T_train,
        "chunked_vs_oneshot_mask_iou": {
            "mean": round(float(np.mean(ious)), 4),
            "min": round(float(np.min(ious)), 4)},
        "mean_abs_dp": round(float(np.mean(dps)), 5),
        "trajectory_agreement": f"{traj_match}/{args.eval_clips}",
        "gt_iou_chunked": round(float(np.mean(gt_iou_chunk)), 4),
        "gt_iou_oneshot": round(float(np.mean(gt_iou_whole)), 4),
        "random_weights_bound": "IoU 0.76 (tests/test_chunk_deviation.py)",
    }
    print(json.dumps(record))


if __name__ == "__main__":
    main()
