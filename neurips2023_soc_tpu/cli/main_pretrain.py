"""RefCOCO/+/g pretraining entry point (reference main_pretrain.py +
pretrainer.py): concatenates the three RefCOCO image-as-clip datasets and
trains with the standard step; evaluation reports mask mAP / P@K / IoU and
box recall@k on each val set."""
from __future__ import annotations

import argparse
from os import path

from ..config import add_config_args, config_from_args
from ..data.coco_ref import ConcatClipDataset, RefCOCOClipDataset
from ..models.text_encoder import build_tokenizer
from ..training.trainer import Trainer
from ..utils.padded import train_size_buckets
from .main import make_batch_iterator

REFCOCO_ANN_FILES = {
    "refcoco": "finetune_refcoco_train.json",
    "refcoco+": "finetune_refcoco+_train.json",
    "refcocog": "finetune_refcocog_train.json",
}


def build_pretrain_dataset(config, as_clip: bool = False):
    """as_clip=False (pretrain): single-frame T=1 samples, matching the
    reference pretrainer which trains on refercoco.ModulatedDetection images
    (reference pretrainer.py:67-73 + refercoco.py:49-50 'T = 1').
    as_clip=True (joint): 8-frame pseudo-videos via the warp augmenter,
    matching the joint trainer's ref2seq datasets."""
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
    parts = []
    for name, ann in REFCOCO_ANN_FILES.items():
        ann_path = path.join(config.img_folder, "annotations", ann)
        if path.exists(ann_path):
            parts.append(RefCOCOClipDataset(
                ann_path, path.join(config.img_folder, "train2014"),
                num_frames=config.window_size, transforms_kwargs=tk,
                seed=config.seed, as_clip=as_clip,
            ))
    assert parts, f"no refcoco annotation files under {config.img_folder}/annotations"
    return ConcatClipDataset(parts)


def build_pretrain_evaluate_fn(config, tokenizer):
    """Per-epoch validation over every RefCOCO split whose val json exists
    (reference pretrainer.py:87-108 builds the val tuples, 262-286 runs them
    every epoch). Returns None when no val annotations are present."""
    from ..data.coco_ref import build_refcoco_val_datasets
    from ..evaluators import build_pretrain_evaluator

    val_sets = build_refcoco_val_datasets(config)
    if not val_sets:
        print("no RefCOCO val annotation files found — checkpointing by "
              "train loss only")
        return None
    print(f"pretrain validation on: {[name for name, _ in val_sets]}")
    return build_pretrain_evaluator(
        val_sets, tokenizer,
        eval_batch_size=config.eval_batch_size,
        # COCO val images mix orientations within an eval batch; the square
        # bucket absorbs mixed batches (train_size_buckets docstring)
        size_buckets=train_size_buckets(config.eval_short_size,
                                        config.eval_max_size),
    )


def main():
    parser = add_config_args(argparse.ArgumentParser("SOC RefCOCO pretraining"))
    args = parser.parse_args()
    config = config_from_args(args)
    from ..parallel import initialize_distributed

    initialize_distributed(config)
    tokenizer = build_tokenizer(config.text_encoder_type,
                                config.get("text_bucket", 32))
    dataset = build_pretrain_dataset(config)  # single-frame, like reference
    trainer = Trainer(
        config,
        train_batches=make_batch_iterator(dataset, config, tokenizer,
                                          time_buckets=(1,)),
        steps_per_epoch=len(dataset) // config.batch_size,
        evaluate_fn=build_pretrain_evaluate_fn(config, tokenizer),
    )
    if args.running_mode == "resume_train":
        first = next(iter(trainer.train_batches(0)))
        trainer.load_checkpoint(sample_batch=first,
                                path=config.get("checkpoint_path") or None)
        trainer.train()
    elif args.running_mode == "test":
        assert trainer.evaluate_fn is not None, \
            "no RefCOCO val annotations found — nothing to evaluate"
        first = next(iter(trainer.train_batches(0)))
        if config.get("checkpoint_path"):
            trainer.load_weights(config.checkpoint_path, sample_batch=first)
        else:
            trainer.init_state(first)
        metrics = trainer.evaluate_fn(trainer._forward, trainer._state.params, 0)
        print(metrics)
    else:
        trainer.train()


if __name__ == "__main__":
    main()
