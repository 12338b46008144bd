"""Ref-DAVIS-17 inference (reference infer_davis.py): expressions grouped 4
per annotator; per-object probability masks merged by argmax with a 0.1
background channel; palette PNGs per annotator."""
from __future__ import annotations

import argparse
import time
from collections import defaultdict
from pathlib import Path

import numpy as np

from ..config import add_config_args, config_from_args
from ..data.davis import ReferDAVISDataset
from ..inference import (
    InferenceEngine,
    eval_size_buckets,
    group_davis_annotator_order,
    merge_davis_annotator,
    save_davis_annotator_masks,
    shard_videos,
)
from ..models import build_model
from .infer_refytb import load_params


def main():
    parser = add_config_args(argparse.ArgumentParser("Ref-DAVIS inference"))
    parser.add_argument("--visualize", action="store_true",
                        help="also write per-object mask overlays on the "
                             "original frames (reference infer_davis.py "
                             "--visualize)")
    args = parser.parse_args()
    config = config_from_args(args)
    from ..parallel import initialize_distributed

    initialize_distributed(config)  # enables cross-host video sharding
    dataset = ReferDAVISDataset(
        "valid", config.img_folder,
        transforms_kwargs=dict(eval_short_size=config.eval_short_size,
                               eval_max_size=config.eval_max_size),
    )
    model = build_model(config)
    sample = (
        np.zeros((8, 1, 360, 640, 3), np.float32),
        np.zeros((8, 1, 360, 640), bool),
        np.ones((1, config.get("text_bucket", 32)), np.int32),
        np.ones((1, config.get("text_bucket", 32)), np.int32),
    )
    params = load_params(config, model, sample)
    engine_kwargs = dict(
        text_encoder_type=config.text_encoder_type,
        text_bucket=config.get("text_bucket", 32),
        time_buckets=config.get("time_buckets"),
        size_buckets=tuple(tuple(b) for b in (
            config.get("eval_size_buckets")
            or eval_size_buckets(config.eval_short_size,
                                 config.eval_max_size))),
        # 'yuv420' halves the host->device pixel bytes (inference.py)
        pixel_format=config.get("pixel_format", "auto"),
        # shrink the DAVIS probability fetches ('bfloat16'/'uint8' opt-in)
        probs_dtype=config.get("probs_dtype", "float32"),
    )
    import jax

    n_local = len(jax.local_devices())
    pool = None
    if n_local > 1:
        # single-process multi-chip: engines pinned per local device (the
        # reference's one-process-per-GPU split, infer_davis.py:86-111)
        from ..inference import EnginePool

        pool = EnginePool(model, params, **engine_kwargs)
        engine = pool.engines[0]
    else:
        engine = InferenceEngine(model, params, **engine_kwargs)
    out_root = Path(config.get("output_dir") or "outputs/davis_valid")

    # group expressions by video; 4 annotators x num_obj expressions each
    by_video = defaultdict(list)
    for i in range(len(dataset)):
        meta = dataset.samples_list[i]
        by_video[meta[0]].append(i)
    # per-host video sharding (replaces the reference's mp.Process split)
    vids = shard_videos(sorted(by_video.keys()))
    by_video = {v: by_video[v] for v in vids}

    from ..inference import run_videos_pipelined

    t0 = time.time()
    # The converted meta_expressions layout is OBJECT-major: exp id
    # obj*4 + anno is object `obj` under annotation variant `anno`
    # (reference convert_davis_to_ytbs.py:165-177; consumed as
    # `i = obj_id * 4 + anno_id` at reference infer_davis.py:199).
    # group_davis_annotator_order reorders to annotator-major so slicing
    # num_obj-runs below groups each annotator's objects together.
    videos = []
    for video_id, idxs in by_video.items():
        idxs = sorted(idxs, key=lambda i: int(dataset.samples_list[i][2]["exp_id"]))
        videos.append({"video_id": video_id,
                       "order": group_davis_annotator_order(idxs)})

    def item_fn(w):
        """Decode one video (frames shared by ALL its expressions; the
        pipelined loop overlaps this with the previous video's compute)."""
        s = dataset[w["order"][0]]
        w["frame_names"] = s["video_metadata"]["frame_indices"]
        return dict(
            frames=s["frames"],
            texts=[dataset.get_text(i) for i in w["order"]],
            original_size=s["video_metadata"]["original_frame_size"],
            return_probs=True,
            trajectory="chunk",  # reference infer_davis.py:242-247
        )

    def post_fn(w, all_probs):
        """Merge + write all four annotators' PNGs for one video (runs
        while the next video computes on device)."""
        video_id, frame_names = w["video_id"], w["frame_names"]
        num_obj = len(w["order"]) // 4
        # decode each original JPEG once per VIDEO (all four annotators
        # overlay the same pixels)
        raw_frames = None
        if config.get("visualize"):
            from PIL import Image

            raw_frames = [
                np.asarray(Image.open(
                    Path(config.img_folder) / "valid" / "JPEGImages"
                    / video_id / f"{name}.jpg").convert("RGB"))
                for name in frame_names
            ]
        for anno_id in range(4):
            prob_masks = all_probs[anno_id * num_obj : (anno_id + 1) * num_obj]
            merged = merge_davis_annotator(prob_masks)
            save_davis_annotator_masks(
                merged, str(out_root / f"anno_{anno_id}" / video_id), frame_names
            )
            if raw_frames is not None:
                # reference infer_davis.py:274-283 ({split}_images tree);
                # here each object id gets its own palette color
                from PIL import Image

                from ..utils.visualize import vis_add_index_mask

                vd = out_root / "valid_images" / f"anno_{anno_id}" / video_id
                vd.mkdir(parents=True, exist_ok=True)
                for t, name in enumerate(frame_names):
                    Image.fromarray(
                        vis_add_index_mask(raw_frames[t], merged[t])
                    ).save(vd / f"{name}.png")
        print(f"{video_id}: done ({time.time() - t0:.1f}s elapsed)")

    # one depth-1 pipelined loop per local chip (pool) or on the single
    # engine: decode/merge/PNG writes hide behind device compute
    run_videos_pipelined(pool if pool is not None else engine,
                         videos, item_fn, post_fn)


if __name__ == "__main__":
    main()
