"""Training / evaluation entry point (reference main.py).

    python -m neurips2023_soc_tpu.cli.main -c configs/refer_youtube_vos.yaml -rm train

One process drives the whole mesh; no torch.multiprocessing spawn needed.
"""
from __future__ import annotations

import argparse

import numpy as np

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
            transforms_kwargs=tk,
        )
    if name == "a2d_sentences":
        from ..data.a2d_sentences import A2DSentencesDataset

        return A2DSentencesDataset(
            "train", config.img_folder, window_size=config.window_size,
            transforms_kwargs=tk,
        )
    if name == "synthetic":
        from ..data.synthetic import SyntheticRVOSDataset

        return SyntheticRVOSDataset(num_samples=config.get("num_samples", 64),
                                    num_frames=config.window_size)
    raise ValueError(f"unsupported train dataset {name}")


def make_batch_iterator(dataset, config, tokenizer):
    # one static (T, H, W) bucket derived from the training transform sizes
    # keeps every epoch on a single compiled program
    size_buckets = ((config.train_short_size, config.train_max_size),)
    time_buckets = (config.window_size,)

    def train_batches(epoch: int):
        rng = np.random.RandomState(config.seed + epoch)
        order = rng.permutation(len(dataset))
        bs = config.batch_size
        for start in range(0, len(order) - bs + 1, bs):
            samples = [dataset[int(i)] for i in order[start : start + bs]]
            yield collate_batch(samples, tokenizer,
                                size_buckets=size_buckets,
                                time_buckets=time_buckets)

    return train_batches


def build_evaluator(config, tokenizer):
    """Per-epoch eval hook (A2D/JHMDB COCO protocol; YTVOS has no public GT,
    the reference checkpoints on train loss there — same here)."""
    name = config.dataset_name
    tk = dict(eval_short_size=config.eval_short_size,
              eval_max_size=config.eval_max_size)
    if name in ("a2d_sentences", "jhmdb_sentences"):
        from ..evaluators import build_a2d_evaluator

        if name == "a2d_sentences":
            from ..data.a2d_sentences import A2DSentencesDataset

            val = A2DSentencesDataset("test", config.img_folder,
                                      window_size=config.window_size,
                                      transforms_kwargs=tk)
        else:
            from ..data.jhmdb_sentences import JHMDBSentencesDataset

            val = JHMDBSentencesDataset("test", config.img_folder,
                                        window_size=config.window_size,
                                        transforms_kwargs=tk)
        return build_a2d_evaluator(val, tokenizer,
                                   eval_batch_size=config.eval_batch_size)
    return None


def main():
    parser = add_config_args(argparse.ArgumentParser("SOC TPU training"))
    args = parser.parse_args()
    config = config_from_args(args)

    tokenizer = build_tokenizer(config.text_encoder_type,
                                config.get("text_bucket", 32))
    dataset = build_train_dataset(config)
    steps_per_epoch = len(dataset) // config.batch_size
    trainer = Trainer(
        config,
        train_batches=make_batch_iterator(dataset, config, tokenizer),
        steps_per_epoch=steps_per_epoch,
        evaluate_fn=build_evaluator(config, tokenizer),
    )
    if args.running_mode == "resume_train":
        first = next(iter(trainer.train_batches(0)))
        trainer.load_checkpoint(sample_batch=first)
        trainer.train()
    elif args.running_mode == "train":
        trainer.train()
    elif args.running_mode == "test":
        first = next(iter(trainer.train_batches(0)))
        if config.get("checkpoint_path"):
            trainer.load_checkpoint(sample_batch=first)
        elif trainer._state is None:
            trainer.init_state(first)
        metrics = trainer.evaluate_fn(trainer._forward, trainer._state.params, 0)
        print(metrics)
    else:
        raise ValueError(f"use infer_refytb/infer_davis for {args.running_mode}")


if __name__ == "__main__":
    main()
