"""End-to-end RefCOCO pretrain workflow over an on-disk COCO-style fixture:
train for one epoch via the main_pretrain wiring, validate on two RefCOCO
splits each epoch, select best by mean mask-mAP and retain <=10 checkpoints
(reference pretrainer.py:87-108, 234-238, 262-286, 340-345)."""
import json

import numpy as np
import pytest
from PIL import Image

from neurips2023_soc_tpu.config import load_config
from neurips2023_soc_tpu.cli.main import make_batch_iterator
from neurips2023_soc_tpu.cli.main_pretrain import (
    build_pretrain_dataset,
    build_pretrain_evaluate_fn,
)
from neurips2023_soc_tpu.models.text_encoder import build_tokenizer
from neurips2023_soc_tpu.training.trainer import Trainer


def _write_refexp_json(path, image_ids, hw=(32, 40)):
    h, w = hw
    images, annotations = [], []
    for i, iid in enumerate(image_ids):
        images.append({
            "id": iid, "file_name": f"img_{iid}.jpg",
            "height": h, "width": w,
            "caption": f"the red square number {i}",
        })
        x0, y0, x1, y1 = 4 + i, 5, 20 + i, 25
        annotations.append({
            "id": 1000 + iid, "image_id": iid, "category_id": 1,
            "segmentation": [[x0, y0, x1, y0, x1, y1, x0, y1]],
            "bbox": [x0, y0, x1 - x0, y1 - y0],
            "area": float((x1 - x0) * (y1 - y0)), "iscrowd": 0,
        })
    path.parent.mkdir(parents=True, exist_ok=True)
    path.write_text(json.dumps({
        "images": images, "annotations": annotations,
        "categories": [{"id": 1, "name": "object"}],
    }))


@pytest.fixture()
def coco_root(tmp_path):
    root = tmp_path / "coco"
    img_dir = root / "train2014"
    img_dir.mkdir(parents=True)
    rng = np.random.RandomState(0)
    for iid in range(1, 7):
        arr = rng.randint(0, 255, (32, 40, 3), np.uint8)
        arr[5:25, 4:20] = (200, 30, 30)
        Image.fromarray(arr).save(img_dir / f"img_{iid}.jpg")
    ann = root / "annotations"
    _write_refexp_json(ann / "finetune_refcoco_train.json", [1, 2, 3, 4])
    _write_refexp_json(ann / "instances_refcoco_val.json", [5, 6])
    _write_refexp_json(ann / "finetune_refcoco+_val.json", [5, 6])
    return root


def _make_config(coco_root, out_dir, epochs=1):
    return load_config("configs/tiny_synthetic.yaml", overrides={
        "dataset_name": "coco_refer",
        "img_folder": str(coco_root),
        "ann_file": "",  # exercise the annotations/-dir fallback resolution
        "output_dir": str(out_dir),
        "epochs": epochs,
        "batch_size": 2,
        "window_size": 2,  # short pseudo-clips keep the test fast
        "eval_batch_size": 2,
    })


def test_pretrain_workflow(coco_root, tmp_path):
    out_dir = tmp_path / "out"
    cfg = _make_config(coco_root, out_dir)
    tok = build_tokenizer(cfg.text_encoder_type, cfg.get("text_bucket", 32))

    dataset = build_pretrain_dataset(cfg)
    assert len(dataset) == 4  # only refcoco has a train json
    # pretrain trains on SINGLE frames (reference refercoco.py:49-50 T=1);
    # the joint trainer's as_clip=True path keeps the pseudo-videos
    assert dataset[0]["frames"].shape[0] == 1
    assert build_pretrain_dataset(cfg, as_clip=True)[0]["frames"].shape[0] == 2

    evaluate_fn = build_pretrain_evaluate_fn(cfg, tok)
    assert evaluate_fn is not None  # both val jsons resolved

    train_batches = make_batch_iterator(dataset, cfg, tok, time_buckets=(1,))
    first = next(iter(train_batches(0)))
    assert first["pixels"].shape[0] == 1  # T=1 batches, no padded frames
    trainer = Trainer(
        cfg,
        train_batches=train_batches,
        steps_per_epoch=len(dataset) // cfg.batch_size,
        evaluate_fn=evaluate_fn,
    )
    assert trainer.ckpt.max_keep == 10  # pretrainer retention policy
    trainer.train()

    log = [json.loads(l) for l in
           (out_dir / "log.txt").read_text().strip().splitlines()]
    rec = log[-1]
    # per-dataset metrics for both splits, prefixed by split name
    for split in ("refcoco", "refcoco+"):
        assert f"eval_{split}_mAP 0.5:0.95" in rec
        assert f"eval_{split}_bbox P@0.5" in rec
        assert f"eval_{split}_recall@1" in rec
    assert "eval_mean_mask_mAP" in rec
    expected_mean = np.mean([rec["eval_refcoco_mAP 0.5:0.95"],
                             rec["eval_refcoco+_mAP 0.5:0.95"]])
    assert rec["eval_mean_mask_mAP"] == pytest.approx(expected_mean)

    # best selected by mean mask-mAP (strict >, reference trainer.py:393-404:
    # an untrained 0.0-mAP epoch is not "best"); exercise the branch with a
    # positive metric and persist it through save_checkpoint
    assert trainer._update_best({"mean_mask_mAP": 0.37}, 0.0) is True
    assert trainer.best_map == pytest.approx(0.37)
    assert trainer._update_best({"mean_mask_mAP": 0.2}, 0.0) is False
    trainer.save_checkpoint(True, {})
    best = json.loads((out_dir / "checkpoints" / "best.json").read_text())
    assert best["best_map"] == pytest.approx(0.37)

    # resume restores the best tracking exactly (reference trainer.py:363-378)
    cfg2 = _make_config(coco_root, out_dir, epochs=2)
    trainer2 = Trainer(
        cfg2,
        train_batches=make_batch_iterator(dataset, cfg2, tok,
                                          time_buckets=(1,)),
        steps_per_epoch=len(dataset) // cfg2.batch_size,
        evaluate_fn=evaluate_fn,
    )
    first = next(iter(trainer2.train_batches(0)))
    trainer2.load_checkpoint(sample_batch=first)
    assert trainer2.best_map == pytest.approx(0.37)
    assert trainer2.epoch == 1


def test_val_dataset_is_single_frame_and_ordered(coco_root):
    cfg = _make_config(coco_root, coco_root / "unused")
    from neurips2023_soc_tpu.data.coco_ref import (
        build_refcoco_gt,
        build_refcoco_val_datasets,
    )

    val_sets = build_refcoco_val_datasets(cfg)
    assert [name for name, _ in val_sets] == ["refcoco", "refcoco+"]
    name, ds = val_sets[0]
    s = ds[0]
    assert s["frames"].shape[0] == 1  # T=1, reference refercoco.py:49-50
    assert s["image_id"] == 5  # no resampling on the eval path
    gt_anns, gt_boxes = build_refcoco_gt(ds)
    assert {a["image_id"] for a in gt_anns} == {5, 6}
    np.testing.assert_allclose(gt_boxes[5][0], [4, 5, 20, 25])
