"""Joint RefCOCO-as-clip + Ref-YouTube-VOS training (reference main_joint.py +
jointtrainer.py): concat both sources, evaluate only on Ref-YTVOS."""
from __future__ import annotations

import argparse

from ..config import add_config_args, config_from_args
from ..data.coco_ref import ConcatClipDataset
from ..data.refer_youtube_vos import ReferYouTubeVOSDataset
from ..models.text_encoder import build_tokenizer
from ..training.trainer import Trainer
from .main import make_batch_iterator
from .main_pretrain import build_pretrain_dataset


def main():
    parser = add_config_args(argparse.ArgumentParser("SOC joint training"))
    parser.add_argument("--coco_folder", default="data/coco")
    args = parser.parse_args()
    config = config_from_args(args)
    from ..parallel import initialize_distributed

    initialize_distributed(config)
    ytvos = ReferYouTubeVOSDataset(
        "train", config.img_folder, window_size=config.window_size,
        transforms_kwargs=dict(
            horizontal_flip_augmentations=config.horizontal_flip_augmentations,
            resize_and_crop_augmentations=config.resize_and_crop_augmentations,
            random_color=config.random_color,
            train_short_size=config.train_short_size,
            train_max_size=config.train_max_size,
            eval_short_size=config.eval_short_size,
            eval_max_size=config.eval_max_size,
            seed=config.seed,
        ),
    )
    coco_cfg = config.replace(img_folder=args.coco_folder)
    # joint training uses the 8-frame image-as-clip pipeline (reference
    # ref2seq.py), unlike the single-frame pretrainer
    coco = build_pretrain_dataset(coco_cfg, as_clip=True)
    dataset = ConcatClipDataset([coco, ytvos])

    tokenizer = build_tokenizer(config.text_encoder_type,
                                config.get("text_bucket", 32))
    trainer = Trainer(
        config,
        train_batches=make_batch_iterator(dataset, config, tokenizer),
        steps_per_epoch=len(dataset) // config.batch_size,
    )
    # the joint trainer evaluates on Ref-YTVOS only (reference
    # jointtrainer.py evaluate_refer_youtube_vos): per-epoch valid-split
    # inference -> submission zip, gated on the valid split being on disk
    from os import path

    if path.exists(path.join(config.img_folder, "valid")):
        from ..evaluators import build_ytvos_evaluator

        trainer.evaluate_fn = build_ytvos_evaluator(trainer.model, config)
    if args.running_mode == "resume_train":
        first = next(iter(trainer.train_batches(0)))
        trainer.load_checkpoint(sample_batch=first,
                                path=config.get("checkpoint_path") or None)
    trainer.train()


if __name__ == "__main__":
    main()
