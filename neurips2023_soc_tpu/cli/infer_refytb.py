"""Ref-YouTube-VOS valid-set inference + submission zip
(reference infer_refytb.py).

    python -m neurips2023_soc_tpu.cli.infer_refytb -c configs/refer_youtube_vos.yaml \
        -ckpt <orbax dir or torch .pth.tar> --output_dir outputs/ytvos_valid
"""
from __future__ import annotations

import argparse
import time

import jax
import numpy as np

from ..config import add_config_args, config_from_args
from ..data.refer_youtube_vos import ReferYouTubeVOSDataset
from ..evaluators import evaluate_refer_youtube_vos
from ..inference import InferenceEngine, eval_size_buckets, shard_videos
from ..models import build_model


def load_params(config, model, sample_args):
    params = jax.jit(model.init)(jax.random.PRNGKey(0), *sample_args)
    ckpt = config.get("checkpoint_path")
    if ckpt:
        from ..training.checkpoint import load_params_from_path

        params, report = load_params_from_path(ckpt, params)
        if report["missing"] or report["unused"]:
            print(f"loaded {ckpt}: {len(report['missing'])} missing, "
                  f"{len(report['unused'])} unused keys")
    return params


def main():
    parser = add_config_args(argparse.ArgumentParser("Ref-YTVOS inference"))
    parser.add_argument("--visualize", action="store_true",
                        help="also write box+mask overlays on the original "
                             "frames (reference infer_refytb.py --visualize)")
    args = parser.parse_args()
    config = config_from_args(args)
    from ..parallel import initialize_distributed

    initialize_distributed(config)  # enables cross-host video sharding
    dataset = ReferYouTubeVOSDataset(
        "test", config.img_folder,
        # the 202-video competition guard only applies to the real corpus
        check_counts=bool(config.get("check_dataset_counts", True)),
        transforms_kwargs=dict(eval_short_size=config.eval_short_size,
                               eval_max_size=config.eval_max_size),
    )
    model = build_model(config)
    s0 = dataset[0]
    T0 = min(8, s0["frames"].shape[0])
    size_buckets = tuple(tuple(b) for b in (
        config.get("eval_size_buckets")
        or eval_size_buckets(config.eval_short_size, config.eval_max_size)))
    H0, W0 = size_buckets[0]
    sample = (
        np.zeros((T0, 1, H0, W0, 3), np.float32),
        np.zeros((T0, 1, H0, W0), bool),
        np.ones((1, config.get("text_bucket", 32)), np.int32),
        np.ones((1, config.get("text_bucket", 32)), np.int32),
    )
    params = load_params(config, model, sample)
    engine_kwargs = dict(
        text_encoder_type=config.text_encoder_type,
        text_bucket=config.get("text_bucket", 32),
        time_buckets=config.get("time_buckets"),
        size_buckets=size_buckets,
        # 'yuv420' halves the host->device pixel bytes (inference.py)
        pixel_format=config.get("pixel_format", "auto"),
    )
    n_local = len(jax.local_devices())
    if n_local > 1:
        # single-process multi-chip: engines pinned per local device so all
        # chips of the host stay busy (the reference's one-process-per-GPU
        # split, infer_refytb.py:84-109); EnginePool fans videos over threads
        from ..inference import EnginePool

        engine = EnginePool(model, params, **engine_kwargs)
    else:
        engine = InferenceEngine(model, params, **engine_kwargs)
    out_dir = config.get("output_dir") or "outputs/ytvos_valid"
    t0 = time.time()
    # per-host VIDEO-group sharding (replaces the reference's mp.Process
    # split); every group's expressions stay on one host so the shared
    # backbone stage runs once per group
    groups = list(dataset.video_groups().values())
    if jax.process_count() > 1:
        groups = shard_videos(groups)
    vis_kwargs = {}
    if config.get("visualize"):
        from os import path as osp

        vis_kwargs = dict(
            # reference infer_refytb.py:61: {split}_images beside Annotations
            visualize_dir=osp.join(out_dir, "valid_images"),
            frame_path_fn=lambda vid, frame: osp.join(
                config.img_folder, "valid", "JPEGImages", vid, frame + ".jpg"
            ),
        )
    result = evaluate_refer_youtube_vos(engine, dataset, out_dir,
                                        groups=groups, **vis_kwargs)
    print(f"done in {time.time() - t0:.1f}s -> {result}")


if __name__ == "__main__":
    main()
