"""Per-dataset evaluation drivers gluing forward -> postprocess -> metrics
(reference trainer.py:252-354).

A2D/JHMDB: COCO-protocol mask mAP + P@K/IoU over center-frame predictions.
Ref-YTVOS: whole-video masks -> PNG tree -> submission zip (no public GT).
"""
from __future__ import annotations

from typing import Callable, Dict, Iterable, List, Optional

import numpy as np

from .evaluation.coco_eval import evaluate_coco_map, precision_at_k_and_iou
from .evaluation.rle import encode as rle_encode
from .models.postprocessing import a2d_postprocess


def build_a2d_gt_annotations(dataset) -> List[Dict]:
    """COCO-format GT from the dataset's center-frame masks (reference
    datasets/a2d_sentences/create_gt_in_coco_format.py)."""
    gts = []
    for i in range(len(dataset)):
        s = dataset[i]
        mask = s["masks"][0, 0].astype(np.uint8)
        gts.append({
            "image_id": s["image_id"],
            "segmentation": rle_encode(mask),
            "iscrowd": 0,
            "area": int(mask.sum()),
        })
    return gts


def write_coco_gt_json(gt_annotations: List[Dict], out_path: str) -> None:
    """Write GT annotations as a pycocotools-loadable COCO dataset JSON in
    the reference's exact layout (datasets/a2d_sentences/
    create_gt_in_coco_format.py:43-95: dummy single category, one image per
    annotation, ascii RLE counts, xywh bbox) so external COCO tooling can
    consume the same ground truth the in-process evaluator uses. Wired to
    the reference's `dataset_coco_gt_format_path` config key."""
    import json

    from .evaluation.rle import decode as rle_decode

    images, annotations = [], []
    for i, gt in enumerate(gt_annotations):
        rle = gt["segmentation"]
        h, w = rle["size"]
        images.append({"id": gt["image_id"], "height": int(h), "width": int(w)})
        mask = rle_decode(rle)
        ys, xs = np.nonzero(mask)
        bbox = ([float(xs.min()), float(ys.min()),
                 float(xs.max() - xs.min()), float(ys.max() - ys.min())]
                if len(xs) else [0.0, 0.0, 0.0, 0.0])
        counts = rle["counts"]
        annotations.append({
            "id": i + 1,
            "image_id": gt["image_id"],
            "category_id": 1,
            "segmentation": {"size": rle["size"],
                             "counts": counts.decode("ascii")
                             if isinstance(counts, bytes) else counts},
            "area": float(gt["area"]),
            "bbox": bbox,
            "iscrowd": int(gt.get("iscrowd", 0)),
        })
    out = {"categories": [{"id": 1, "name": "dummy_class"}],
           "images": images, "annotations": annotations}
    with open(out_path, "w") as f:
        json.dump(out, f)


def evaluate_a2d_batches(
    forward: Callable,
    params,
    batches: Iterable[Dict],
    gt_annotations: List[Dict],
    calculate_pr: bool = True,
) -> Dict[str, float]:
    """batches must carry 'image_ids', 'resized_sizes', 'orig_sizes' metadata
    alongside the standard model inputs."""
    from concurrent.futures import ThreadPoolExecutor

    from .utils.prefetch import prefetch

    def postprocess(outputs, batch):
        preds = a2d_postprocess(
            outputs,
            batch["pixels"].shape[2:4],
            batch["resized_sizes"],
            batch["orig_sizes"],
        )
        annos = []
        for image_id, p in zip(batch["image_ids"], preds):
            scores = np.asarray(p["scores"])
            for q in range(len(scores)):
                annos.append({
                    "image_id": image_id,
                    "segmentation": p["rle_masks"][q],
                    "score": float(scores[q]),
                })
        return annos

    dt_annotations = []
    # pipeline all three stages: collate the next batch (prefetch thread),
    # run this forward (device, async dispatch), and resize/threshold/RLE
    # the previous batch (postprocess thread, which is where the device
    # results are fetched)
    pending = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        for batch in prefetch(batches):
            outputs = forward(params, batch)
            pending.append(ex.submit(postprocess, outputs, batch))
            if len(pending) > 2:  # bound in-flight device outputs
                dt_annotations.extend(pending.pop(0).result())
        for fut in pending:
            dt_annotations.extend(fut.result())
    # merge per-host predictions (reference trainer.py:290-293 all_gather)
    from .parallel.multihost import gather_objects

    dt_annotations = [a for part in gather_objects(dt_annotations) for a in part]
    metrics = evaluate_coco_map(gt_annotations, dt_annotations)
    if calculate_pr:
        metrics.update(precision_at_k_and_iou(gt_annotations, dt_annotations))
    return metrics


def evaluate_coco_pretrain_batches(
    forward: Callable,
    params,
    batches: Iterable[Dict],
    gt_annotations: List[Dict],
    gt_boxes_by_img: Dict,
) -> Dict[str, float]:
    """RefCOCO pretrain validation (reference pretrainer.py:354-434): mask
    mAP + P@K/IoU via the COCO protocol, plus bbox recall@k and bbox P@K."""
    from .evaluation.refexp_eval import (
        bbox_precision_at_k_and_iou,
        evaluate_refexp_recall,
    )
    from .models.postprocessing import a2d_postprocess, coco_topk_device_step

    from concurrent.futures import ThreadPoolExecutor

    from .utils.prefetch import prefetch

    def postprocess(outputs, batch):
        preds = a2d_postprocess(
            outputs, batch["pixels"].shape[2:4],
            batch["resized_sizes"], batch["orig_sizes"],
        )
        scores_k, labels_k, boxes_k = coco_topk_device_step(
            outputs["pred_cls"][-1], outputs["pred_boxes"][-1]
        )
        scores_k = np.asarray(scores_k)
        boxes_k = np.asarray(boxes_k)
        annos, boxes_by_img = [], {}
        for b, (image_id, p) in enumerate(zip(batch["image_ids"], preds)):
            sc = np.asarray(p["scores"])
            for q in range(len(sc)):
                annos.append({
                    "image_id": image_id,
                    "segmentation": p["rle_masks"][q],
                    "score": float(sc[q]),
                })
            oh, ow = batch["orig_sizes"][b]
            scale = np.array([ow, oh, ow, oh], np.float32)
            boxes_by_img[image_id] = [
                {"box": boxes_k[b, k] * scale, "score": float(scores_k[b, k])}
                for k in range(boxes_k.shape[1])
            ]
        return annos, boxes_by_img

    dt_annotations = []
    dt_boxes_by_img: Dict = {}

    def collect(fut):
        annos, boxes_by_img = fut.result()
        dt_annotations.extend(annos)
        dt_boxes_by_img.update(boxes_by_img)

    # same 3-stage pipeline as the A2D evaluator: collate next (prefetch
    # thread) / device forward (async) / host postprocess (worker thread)
    pending = []
    with ThreadPoolExecutor(max_workers=1) as ex:
        for batch in prefetch(batches):
            outputs = forward(params, batch)
            pending.append(ex.submit(postprocess, outputs, batch))
            if len(pending) > 2:
                collect(pending.pop(0))
        for fut in pending:
            collect(fut)
    metrics = evaluate_coco_map(gt_annotations, dt_annotations)
    metrics.update(precision_at_k_and_iou(gt_annotations, dt_annotations))
    metrics.update(evaluate_refexp_recall(gt_boxes_by_img, dt_boxes_by_img))
    metrics.update(bbox_precision_at_k_and_iou(gt_boxes_by_img, dt_boxes_by_img))
    return metrics


def build_a2d_evaluator(dataset, tokenizer, eval_batch_size: int = 4,
                        calculate_pr: bool = True,
                        collate_kwargs: Optional[Dict] = None,
                        gt_json_path: Optional[str] = None) -> Callable:
    """Per-epoch A2D/JHMDB evaluation hook for Trainer (reference
    trainer.py:252-313). GT annotations build once and cache; if
    `gt_json_path` is set (the reference's `dataset_coco_gt_format_path`),
    the COCO-format GT JSON is written there once by the first host."""
    from os import path

    from .data.collate import collate_batch

    gt_cache: Dict[str, List[Dict]] = {}
    collate_kwargs = collate_kwargs or {}

    def evaluate(forward, params, epoch: int) -> Dict[str, float]:
        if "gt" not in gt_cache:
            gt_cache["gt"] = build_a2d_gt_annotations(dataset)
            if gt_json_path and not path.exists(gt_json_path):
                from .parallel.multihost import is_main_process

                if is_main_process():
                    write_coco_gt_json(gt_cache["gt"], gt_json_path)

        def batches():
            for start in range(0, len(dataset), eval_batch_size):
                samples = [dataset[i] for i in
                           range(start, min(start + eval_batch_size, len(dataset)))]
                yield collate_batch(samples, tokenizer, **collate_kwargs)

        return evaluate_a2d_batches(
            forward, params, batches(), gt_cache["gt"], calculate_pr
        )

    return evaluate


# reference predict.py:13 — fixed overlay palette for `-rm pred`
_PRED_COLORS = ([212, 255, 127], [193, 182, 255],
                [106, 106, 255], [255, 206, 135])


def run_predict_visualize(forward, params, dataset, tokenizer, out_dir: str,
                          eval_batch_size: int = 4,
                          collate_kwargs: Optional[Dict] = None) -> int:
    """`-rm pred` (reference main.py:43 + predict.py:25-97): run the val
    split, overlay each sample's highest-scoring mask on its denormalized
    annotated frame at original resolution, and save
    `out_dir/<video>/<image_id>.jpg` grouped per video. Returns the number
    of images written."""
    from pathlib import Path

    from PIL import Image

    from .data.collate import IMAGENET_MEAN, IMAGENET_STD, collate_batch
    from .evaluation.rle import decode as rle_decode
    from .utils.visualize import vis_add_mask

    collate_kwargs = collate_kwargs or {}
    out_root = Path(out_dir)
    out_root.mkdir(parents=True, exist_ok=True)
    written = 0
    for start in range(0, len(dataset), eval_batch_size):
        samples = [dataset[i] for i in
                   range(start, min(start + eval_batch_size, len(dataset)))]
        batch = collate_batch(samples, tokenizer, **collate_kwargs)
        outputs = forward(params, batch)
        preds = a2d_postprocess(
            outputs, batch["pixels"].shape[2:4],
            batch["resized_sizes"], batch["orig_sizes"])
        for b, (image_id, p) in enumerate(zip(batch["image_ids"], preds)):
            best = int(np.argmax(np.asarray(p["scores"])))
            mask = rle_decode(p["rle_masks"][best])
            # denormalize the annotated frame, crop padding, resize to orig
            t = int(batch.get("valid_indices", np.zeros(len(preds), int))[b])
            h, w = batch["resized_sizes"][b]
            frame = np.asarray(batch["pixels"][t, b, :h, :w])
            frame = np.clip((frame * IMAGENET_STD + IMAGENET_MEAN) * 255.0,
                            0, 255).astype(np.uint8)
            oh, ow = mask.shape
            img = Image.fromarray(frame).resize((ow, oh), Image.BILINEAR)
            over = vis_add_mask(np.asarray(img), mask,
                                _PRED_COLORS[b % len(_PRED_COLORS)])
            # reference predict.py:44-45 groups files by the video segment
            # of 'v_<video>_f_<frame>_i_<inst>' ids; fall back to flat ids
            parts = str(image_id).split("_")
            folder = parts[1] if len(parts) > 2 and parts[0] == "v" else ""
            dst = out_root / folder if folder else out_root
            dst.mkdir(parents=True, exist_ok=True)
            Image.fromarray(over).save(dst / f"{image_id}.jpg")
            written += 1
    return written


def build_pretrain_evaluator(val_sets, tokenizer, eval_batch_size: int = 1,
                             size_buckets=None) -> Callable:
    """Per-epoch RefCOCO/+/g validation hook for Trainer (reference
    pretrainer.py:262-286 evaluate + 354-434 evaluate_coco): every val split
    is evaluated each epoch, metrics are prefixed `{name}_`, and the
    checkpoint-selection scalar `mean_mask_mAP` is the mean of the per-split
    mask mAPs (pretrainer.py:234-238).

    val_sets: [(name, dataset)] of single-frame (T=1) datasets.
    """
    from .data.coco_ref import build_refcoco_gt
    from .data.collate import collate_batch

    gt_cache: Dict[str, tuple] = {}

    def evaluate(forward, params, epoch: int) -> Dict[str, float]:
        metrics: Dict[str, float] = {}
        maps = []
        for name, ds in val_sets:
            if name not in gt_cache:
                gt_cache[name] = build_refcoco_gt(ds)
            gt_annotations, gt_boxes_by_img = gt_cache[name]

            def batches(ds=ds):
                for start in range(0, len(ds), eval_batch_size):
                    samples = [ds[i] for i in
                               range(start, min(start + eval_batch_size, len(ds)))]
                    yield collate_batch(
                        samples, tokenizer, time_buckets=(1,),
                        **({"size_buckets": size_buckets} if size_buckets else {}),
                    )

            m = evaluate_coco_pretrain_batches(
                forward, params, batches(), gt_annotations, gt_boxes_by_img
            )
            maps.append(m.get("mAP 0.5:0.95", 0.0))
            metrics.update({f"{name}_{k}": v for k, v in m.items()})
        metrics["mean_mask_mAP"] = float(np.mean(maps)) if maps else 0.0
        return metrics

    return evaluate


def build_ytvos_evaluator(model, config, dataset=None) -> Callable:
    """Per-epoch Ref-YTVOS valid-split inference hook for Trainer (reference
    trainer.py:315-354): whole-video forward per expression -> per-frame PNG
    masks under `validation_outputs/epoch_{N}/Annotations/` -> zipped to
    `validation_outputs/submission_epoch_{N}.zip` for the competition server,
    then the uncompressed tree is removed. Returns the zip path as the only
    "metric" — the server computes J&F (reference returns {} there)."""
    import shutil
    import zipfile
    from pathlib import Path

    from .inference import InferenceEngine
    from .inference import eval_size_buckets as _eval_size_buckets

    state: Dict = {"ds": dataset}

    def evaluate(forward, params, epoch: int) -> Dict[str, str]:
        if state["ds"] is None:
            from .data.refer_youtube_vos import ReferYouTubeVOSDataset

            state["ds"] = ReferYouTubeVOSDataset(
                "test", config.img_folder,
                check_counts=bool(config.get("check_dataset_counts", True)),
                transforms_kwargs=dict(
                    eval_short_size=config.eval_short_size,
                    eval_max_size=config.eval_max_size,
                ),
            )
        if "engine" not in state:
            import jax

            from .inference import EnginePool

            kw = dict(
                text_encoder_type=config.text_encoder_type,
                text_bucket=config.get("text_bucket", 32),
                time_buckets=config.get("eval_time_buckets"),
                # both orientations: portrait valid videos resize to
                # (<=max, short) and need the transposed bucket
                size_buckets=_eval_size_buckets(config.eval_short_size,
                                                config.eval_max_size),
                # 'yuv420' halves the host->device pixel bytes (inference.py)
                pixel_format=config.get("pixel_format", "auto"),
                probs_dtype=config.get("probs_dtype", "float32"),
            )
            # per-epoch eval saturates every local chip (training is paused
            # while it runs); one engine per device, videos fanned over
            # threads — the reference's one-worker-per-GPU inference split
            state["engine"] = (
                EnginePool(model, params, **kw)
                if len(jax.local_devices()) > 1
                else InferenceEngine(model, params, **kw))
        engine = state["engine"]
        if hasattr(engine, "update_params"):
            engine.update_params(params)
        else:
            engine.params = params

        out_root = Path(config.get("output_dir")
                        or f"outputs/{config.dataset_name}") / "validation_outputs"
        epoch_dir = out_root / f"epoch_{epoch}"
        # multi-host: shard videos across processes (like infer_refytb);
        # output_dir must be a shared filesystem so rank 0 can zip all shards
        import jax

        from .inference import shard_videos
        from .parallel.multihost import barrier, is_main_process

        ds = state["ds"]
        # shard GROUPS (videos) across processes so every group's expressions
        # stay on one host and share the backbone stage; keeps the real
        # dataset object (lazy decode + get_text/exp_id accessors) intact.
        # Datasets without video_groups (e.g. test fixtures) degrade to
        # singleton groups — per-expression inference, still sharded.
        if hasattr(ds, "video_groups"):
            groups = list(ds.video_groups().values())
        else:
            groups = [[i] for i in range(len(ds))]
        if jax.process_count() > 1:
            groups = shard_videos(groups)
        evaluate_refer_youtube_vos(engine, ds, str(epoch_dir),
                                   make_zip=False, groups=groups)
        barrier("ytvos_eval_pngs")  # all hosts done writing PNGs
        zip_path = out_root / f"submission_epoch_{epoch}.zip"
        if is_main_process():
            with zipfile.ZipFile(zip_path, "w", zipfile.ZIP_DEFLATED) as zf:
                for p in sorted((epoch_dir / "Annotations").rglob("*.png")):
                    zf.write(p, p.relative_to(epoch_dir))
            shutil.rmtree(epoch_dir)  # reference trainer.py:350
        barrier("ytvos_eval_zip")
        return {"submission_zip": str(zip_path)}

    return evaluate


def evaluate_refer_youtube_vos(
    engine,
    dataset,
    output_dir: str,
    make_zip: bool = True,
    visualize_dir: str = None,
    frame_path_fn=None,
    groups=None,
) -> Dict[str, str]:
    """Run whole-video inference over the valid split and write the
    competition submission (reference trainer.py:315-354).

    Expressions of the same video share decoded frames AND the
    text-independent backbone stage: samples are grouped by video (via
    dataset.video_groups(), or the `groups` index lists a multi-host caller
    sharded), each group decodes once and runs InferenceEngine.
    infer_video_multi — the backbone (~55% of the forward) executes once per
    group instead of once per expression.

    With visualize_dir + frame_path_fn(video_id, frame_name) -> jpg path,
    also writes box+mask overlays on the ORIGINAL frames, one palette color
    per expression (reference infer_refytb.py --visualize, 240-266).

    Multi-host: callers shard the groups per process (shard_videos); the
    zip is created by rank 0 only, AFTER a barrier, so it contains every
    host's predictions — output_dir must be a shared filesystem."""
    from .inference import run_videos_pipelined, save_ytvos_predictions, \
        zip_submission
    from .parallel.multihost import barrier, is_main_process

    if groups is None:
        if hasattr(dataset, "video_groups"):
            groups = list(dataset.video_groups().values())
        else:
            groups = [[i] for i in range(len(dataset))]
    can_batch = hasattr(dataset, "get_text") and hasattr(dataset, "exp_id")

    def item_fn(w):
        """Decode one video group into infer_video_multi kwargs; runs
        inside the pipelined loop, so the NEXT group's decode overlaps this
        one's device compute."""
        g = w["g"]
        s = dataset[g[0]]
        meta0 = s["video_metadata"]
        if can_batch:
            texts = [dataset.get_text(i) for i in g]
            w["metas"] = [{**meta0, "exp_id": dataset.exp_id(i)} for i in g]
        else:  # single-sample group (datasets without the accessors)
            if len(g) > 1:
                raise ValueError(
                    "multi-expression groups need dataset.get_text/exp_id "
                    f"accessors (got a {len(g)}-element group on "
                    f"{type(dataset).__name__})")
            texts = [s["text"]]
            w["metas"] = [meta0]
        return dict(frames=s["frames"], texts=texts,
                    original_size=meta0["original_frame_size"],
                    return_boxes=visualize_dir is not None)

    def post_fn(w, results):
        """Write THIS video's PNGs immediately (reference infer_refytb.py
        writes per expression, :230-277): holding the whole split's
        original-size masks in host RAM would be tens of GB on the real
        202-video corpus. Runs while the next video computes on device."""
        preds = []
        for meta, r in zip(w["metas"], results):
            if visualize_dir is not None:
                masks, boxes = r
                _save_ytvos_overlays(meta, masks, boxes, visualize_dir,
                                     frame_path_fn)
            else:
                masks = r
            preds.append({**meta, "pred_masks": masks})
        save_ytvos_predictions(preds, output_dir)

    # one engine per local device (EnginePool) or the single engine; each
    # runs a depth-1 pipelined loop over its round-robin share of the
    # groups — every chip of the host stays busy (the reference's
    # one-worker-per-GPU split, infer_refytb.py:84-109) and decode/PNG
    # writes hide behind device compute
    run_videos_pipelined(engine, [{"g": g} for g in groups],
                         item_fn, post_fn)
    out = {"predictions_dir": output_dir}
    if make_zip:
        barrier("ytvos_submission_pngs")  # all hosts done writing
        if is_main_process():
            out["submission_zip"] = zip_submission(output_dir)
        barrier("ytvos_submission_zip")
    return out


def _save_ytvos_overlays(meta, masks, boxes, visualize_dir, frame_path_fn):
    """Write box+mask overlays on original frames, colored by expression id
    (reference infer_refytb.py:240-266: {split}_images/{video}/{exp}/)."""
    from pathlib import Path

    from PIL import Image

    from .utils.visualize import overlay_prediction

    d = Path(visualize_dir) / meta["video_id"] / meta["exp_id"]
    d.mkdir(parents=True, exist_ok=True)
    color_index = int(meta["exp_id"]) if str(meta["exp_id"]).isdigit() else 0
    for t, frame in enumerate(meta["frame_indices"]):
        img = np.asarray(
            Image.open(frame_path_fn(meta["video_id"], frame)).convert("RGB")
        )
        out = overlay_prediction(img, masks[t], boxes[t], color_index)
        Image.fromarray(out).save(d / f"{frame}.png")
