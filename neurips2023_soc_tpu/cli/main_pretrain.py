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
from .main import make_batch_iterator

REFCOCO_ANN_FILES = {
    "refcoco": "finetune_refcoco_train.json",
    "refcoco+": "finetune_refcoco+_train.json",
    "refcocog": "finetune_refcocog_train.json",
}


def build_pretrain_dataset(config):
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
                seed=config.seed,
            ))
    assert parts, f"no refcoco annotation files under {config.img_folder}/annotations"
    return ConcatClipDataset(parts)


def main():
    parser = add_config_args(argparse.ArgumentParser("SOC RefCOCO pretraining"))
    args = parser.parse_args()
    config = config_from_args(args)
    tokenizer = build_tokenizer(config.text_encoder_type,
                                config.get("text_bucket", 32))
    dataset = build_pretrain_dataset(config)
    trainer = Trainer(
        config,
        train_batches=make_batch_iterator(dataset, config, tokenizer),
        steps_per_epoch=len(dataset) // config.batch_size,
    )
    if args.running_mode == "resume_train":
        first = next(iter(trainer.train_batches(0)))
        trainer.load_checkpoint(sample_batch=first)
    trainer.train()


if __name__ == "__main__":
    main()
