"""Training / evaluation entry point (reference main.py).

    python -m neurips2023_soc_tpu.cli.main -c configs/refer_youtube_vos.yaml -rm train

One process drives the whole mesh; no torch.multiprocessing spawn needed.
"""
from __future__ import annotations

import argparse

from ..config import add_config_args, config_from_args
from ..data.collate import collate_batch
from ..models.text_encoder import build_tokenizer
from ..training.trainer import Trainer


def build_train_dataset(config):
    name = config.dataset_name
    tk = dict(
        horizontal_flip_augmentations=config.horizontal_flip_augmentations,
        resize_and_crop_augmentations=config.resize_and_crop_augmentations,
        random_color=config.random_color,
        train_short_size=config.train_short_size,
        train_max_size=config.train_max_size,
        eval_short_size=config.eval_short_size,
        eval_max_size=config.eval_max_size,
        seed=config.seed,
    )
    if name == "ref_youtube_vos":
        from ..data.refer_youtube_vos import ReferYouTubeVOSDataset

        return ReferYouTubeVOSDataset(
            "train", config.img_folder, window_size=config.window_size,
            check_counts=bool(config.get("check_dataset_counts", True)),
            transforms_kwargs=tk,
        )
    if name == "a2d_sentences":
        from ..data.a2d_sentences import A2DSentencesDataset

        return A2DSentencesDataset(
            "train", config.img_folder, window_size=config.window_size,
            transforms_kwargs=tk,
            force_rebuild_metadata=bool(
                config.get("generate_new_samples_metadata", False)),
        )
    if name == "synthetic":
        from ..data.synthetic import SyntheticRVOSDataset

        return SyntheticRVOSDataset(num_samples=config.get("num_samples", 64),
                                    num_frames=config.window_size)
    raise ValueError(f"unsupported train dataset {name}")


def make_batch_iterator(dataset, config, tokenizer, num_hosts=None,
                        host_id=None, time_buckets=None):
    """Per-epoch shuffled batch iterator with per-host sharding and a
    multi-worker sample loader.

    Sharding (reference trainer.py:74-82 DistributedSampler): every host
    computes the same epoch permutation, takes its `host_id::num_hosts`
    stride, and yields LOCAL batches of batch_size/num_hosts samples; the k-th
    local batches across hosts are exactly the k-th global batch (assembled
    into one global array by parallel.shard_batch).

    Loading (reference trainer.py:82-88 DataLoader(num_workers)): samples for
    upcoming batches decode on config.num_workers threads, ordered and
    deterministic per epoch seed.
    """
    import jax

    from ..data.sampler import ShardedEpochSampler
    from ..utils.prefetch import parallel_map

    # (T, H, W) buckets derived from the training transform sizes: landscape
    # batches stay on one compiled program; the transposed and square buckets
    # exist for portrait samples / mixed-orientation batches (the reference's
    # NestedTensor pads those to the batch max dynamically, misc.py:143-160)
    # and compile lazily only if such a batch occurs. Pretrain overrides the
    # time bucket to 1: its samples are single frames.
    from ..utils.padded import train_size_buckets

    size_buckets = train_size_buckets(config.train_short_size,
                                      config.train_max_size)
    time_buckets = time_buckets or (config.window_size,)
    num_hosts = num_hosts if num_hosts is not None else jax.process_count()
    host_id = host_id if host_id is not None else jax.process_index()
    bs = int(config.batch_size)
    assert bs % num_hosts == 0, (
        f"global batch_size={bs} must divide over {num_hosts} hosts")
    local_bs = bs // num_hosts
    num_workers = int(config.get("num_workers", 0) or 0)
    sampler = ShardedEpochSampler(len(dataset), num_hosts, host_id,
                                  shuffle=True, seed=config.seed)

    def train_batches(epoch: int):
        sampler.set_epoch(epoch)
        if hasattr(dataset, "set_epoch"):
            # advances the datasets' per-(epoch, idx) augmentation streams
            dataset.set_epoch(epoch)
        order = list(sampler)
        order = order[: (len(order) // local_bs) * local_bs]
        batch = []
        for s in parallel_map(dataset.__getitem__, order, num_workers):
            batch.append(s)
            if len(batch) == local_bs:
                yield collate_batch(batch, tokenizer,
                                    size_buckets=size_buckets,
                                    time_buckets=time_buckets)
                batch = []

    return train_batches


def _eval_tk(config):
    return dict(eval_short_size=config.eval_short_size,
                eval_max_size=config.eval_max_size)


def _eval_size_buckets(config):
    """Eval-batch size buckets: both orientations + the square bucket for
    batches that mix them (eval_batch_size > 1)."""
    from ..utils.padded import train_size_buckets

    return train_size_buckets(config.eval_short_size, config.eval_max_size)


def build_a2d_style_val_dataset(config):
    """The A2D/JHMDB val split (shared by the per-epoch evaluator and the
    '-rm pred' visualizer — keep construction in ONE place)."""
    rebuild = bool(config.get("generate_new_samples_metadata", False))
    if config.dataset_name == "a2d_sentences":
        from ..data.a2d_sentences import A2DSentencesDataset

        return A2DSentencesDataset("test", config.img_folder,
                                   window_size=config.window_size,
                                   transforms_kwargs=_eval_tk(config),
                                   force_rebuild_metadata=rebuild)
    from ..data.jhmdb_sentences import JHMDBSentencesDataset

    return JHMDBSentencesDataset("test", config.img_folder,
                                 window_size=config.window_size,
                                 transforms_kwargs=_eval_tk(config),
                                 force_rebuild_metadata=rebuild)


def build_evaluator(config, tokenizer, model=None):
    """Per-epoch eval hook. A2D/JHMDB: COCO-protocol mAP. Ref-YTVOS: the
    reference runs valid-split inference -> PNG masks -> submission zip every
    epoch (trainer.py:315-354; no public GT, so checkpoint selection stays on
    train loss) — same here, gated on the valid split being on disk."""
    name = config.dataset_name
    if name in ("a2d_sentences", "jhmdb_sentences"):
        from ..evaluators import build_a2d_evaluator

        val = build_a2d_style_val_dataset(config)
        return build_a2d_evaluator(
            val, tokenizer, eval_batch_size=config.eval_batch_size,
            collate_kwargs=dict(size_buckets=_eval_size_buckets(config)),
            # reference config keys (trainer.py:306, create_gt_in_coco_format)
            calculate_pr=config.get("calculate_precision_and_iou_metrics",
                                    True),
            gt_json_path=config.get("dataset_coco_gt_format_path") or None)
    if name == "ref_youtube_vos" and model is not None:
        from os import path

        from ..evaluators import build_ytvos_evaluator

        if not path.exists(path.join(config.img_folder, "valid")):
            print("Ref-YTVOS valid split not found under "
                  f"{config.img_folder} — skipping per-epoch eval")
            return None
        return build_ytvos_evaluator(model, config)
    return None


def main():
    parser = add_config_args(argparse.ArgumentParser("SOC TPU training"))
    args = parser.parse_args()
    config = config_from_args(args)
    from ..parallel import initialize_distributed

    initialize_distributed(config)
    tokenizer = build_tokenizer(config.text_encoder_type,
                                config.get("text_bucket", 32))
    dataset = build_train_dataset(config)
    steps_per_epoch = len(dataset) // config.batch_size
    trainer = Trainer(
        config,
        train_batches=make_batch_iterator(dataset, config, tokenizer),
        steps_per_epoch=steps_per_epoch,
    )
    # the YTVOS evaluator drives the trainer's model through the inference
    # engine, so it's attached after construction
    trainer.evaluate_fn = build_evaluator(config, tokenizer, trainer.model)
    if args.running_mode == "resume_train":
        first = next(iter(trainer.train_batches(0)))
        # reference main.py:26 resumes from the EXPLICIT config.checkpoint_path;
        # without one we fall back to the latest epoch under output_dir
        trainer.load_checkpoint(sample_batch=first,
                                path=config.get("checkpoint_path") or None)
        trainer.train()
    elif args.running_mode == "train":
        trainer.train()
    elif args.running_mode == "test":
        if trainer.evaluate_fn is None:
            raise SystemExit(
                f"no evaluator available for dataset '{config.dataset_name}' "
                "(is the valid split on disk?)")
        first = next(iter(trainer.train_batches(0)))
        if config.get("checkpoint_path"):
            # reference main.py:29-35: -rm test loads config.checkpoint_path
            # as model weights (strict), not the trainer's own history
            trainer.load_weights(config.checkpoint_path, sample_batch=first)
        elif trainer._state is None:
            trainer.init_state(first)
        metrics = trainer.evaluate_fn(trainer._forward, trainer._state.params, 0)
        print(metrics)
    elif args.running_mode == "pred":
        # reference main.py:36-43 'pred': visualize the val split's best
        # masks to out_dir (predict.py:25-97)
        if config.dataset_name not in ("a2d_sentences", "jhmdb_sentences"):
            raise SystemExit("-rm pred supports a2d/jhmdb configs "
                             "(reference predict.py drives the A2D-style "
                             "val loader)")
        from ..evaluators import run_predict_visualize

        val = build_a2d_style_val_dataset(config)
        first = next(iter(trainer.train_batches(0)))
        if config.get("checkpoint_path"):
            trainer.load_weights(config.checkpoint_path, sample_batch=first)
        elif trainer._state is None:
            trainer.init_state(first)
        out_dir = (config.get("output_dir") or "outputs") + "/visualize"
        n = run_predict_visualize(
            trainer._forward, trainer._state.params, val, tokenizer, out_dir,
            eval_batch_size=config.eval_batch_size,
            collate_kwargs=dict(size_buckets=_eval_size_buckets(config)))
        print(f"wrote {n} visualizations to {out_dir}")
    else:
        raise ValueError(f"use infer_refytb/infer_davis for {args.running_mode}")


if __name__ == "__main__":
    main()
