"""RefCOCO/+/g image-as-clip pretraining dataset (reference
datasets/coco/ref2seq.py + image_to_seq_augmenter.py).

Each image becomes an 8-frame pseudo-video: per frame a random
perspective+affine warp (+brightness, optional motion blur) is applied to the
image and its referred-instance mask (cv2 replaces imgaug), frames are
shuffled, and per-frame targets carry visibility. Samples with a fully
invisible referred instance are resampled. COCO polygon segmentations are
rasterized with PIL (pycocotools-free).
"""
from __future__ import annotations

import json
import random
from os import path
from typing import Dict, List, Optional, Tuple

import numpy as np
from PIL import Image, ImageDraw

from .collate import normalize_frames
from .transforms import VideoTransforms, stable_rng


def polygons_to_mask(polygons: List[List[float]], h: int, w: int) -> np.ndarray:
    mask = Image.new("L", (w, h), 0)
    draw = ImageDraw.Draw(mask)
    for poly in polygons:
        if len(poly) >= 6:
            draw.polygon(list(map(float, poly)), outline=1, fill=1)
    return np.asarray(mask, np.uint8)


def ann_to_mask(ann: Dict, h: int, w: int) -> np.ndarray:
    seg = ann["segmentation"]
    if isinstance(seg, list):
        return polygons_to_mask(seg, h, w)
    from ..evaluation.rle import decode

    rle = dict(seg)
    rle.setdefault("size", [h, w])
    return decode(rle)


class ImageToSeqAugmenter:
    """cv2 equivalent of the reference's imgaug pipeline
    (image_to_seq_augmenter.py:19-52): brightness add, perspective 0.12,
    affine translate ±15% rotate ±20°, motion blur k∈{7,9} with p=0.5."""

    def __init__(self, perspective=True, affine=True, motion_blur=True,
                 brightness_range=(-50, 50), perspective_magnitude=0.12,
                 translate_range=0.15, rotation_range=(-20, 20),
                 motion_blur_kernel_sizes=(7, 9), motion_blur_prob=0.5,
                 rng: Optional[random.Random] = None):
        self.perspective = perspective
        self.affine = affine
        self.motion_blur = motion_blur
        self.brightness_range = brightness_range
        self.perspective_magnitude = perspective_magnitude
        self.translate_range = translate_range
        self.rotation_range = rotation_range
        self.motion_blur_kernel_sizes = motion_blur_kernel_sizes
        self.motion_blur_prob = motion_blur_prob
        self.rng = rng or random.Random()

    def _transform_matrix(self, h: int, w: int) -> np.ndarray:
        import cv2

        M = np.eye(3, dtype=np.float64)
        if self.perspective:
            mag = self.perspective_magnitude
            src = np.float32([[0, 0], [w, 0], [w, h], [0, h]])
            jitter = np.float32(
                [[self.rng.gauss(0, mag) * w, self.rng.gauss(0, mag) * h]
                 for _ in range(4)]
            )
            dst = src + jitter
            M = cv2.getPerspectiveTransform(src, dst) @ M
        if self.affine:
            angle = self.rng.uniform(*self.rotation_range)
            tx = self.rng.uniform(-self.translate_range, self.translate_range) * w
            ty = self.rng.uniform(-self.translate_range, self.translate_range) * h
            A = cv2.getRotationMatrix2D((w / 2, h / 2), angle, 1.0)
            A[0, 2] += tx
            A[1, 2] += ty
            A3 = np.vstack([A, [0, 0, 1]])
            M = A3 @ M
        return M

    def __call__(self, image: np.ndarray, masks: List[np.ndarray]):
        """image uint8 (H, W, 3); masks list of (H, W) uint8. Returns warped
        (image, masks) with consistent geometry."""
        import cv2

        h, w = image.shape[:2]
        img = image.astype(np.float32)
        img = np.clip(img + self.rng.uniform(*self.brightness_range), 0, 255)
        M = self._transform_matrix(h, w)
        warped = cv2.warpPerspective(
            img.astype(np.uint8), M.astype(np.float32), (w, h),
            flags=cv2.INTER_LINEAR,
        )
        warped_masks = [
            cv2.warpPerspective(m.astype(np.uint8), M.astype(np.float32), (w, h),
                                flags=cv2.INTER_NEAREST)
            for m in masks
        ]
        if self.motion_blur and self.rng.random() < self.motion_blur_prob:
            k = self.rng.choice(self.motion_blur_kernel_sizes)
            kernel = np.zeros((k, k), np.float32)
            angle = self.rng.uniform(0, 180)
            c = (k - 1) / 2
            for i in range(k):  # line kernel through the center
                x = int(round(c + (i - c) * np.cos(np.radians(angle))))
                y = int(round(c + (i - c) * np.sin(np.radians(angle))))
                if 0 <= x < k and 0 <= y < k:
                    kernel[y, x] = 1
            kernel /= max(kernel.sum(), 1)
            warped = cv2.filter2D(warped, -1, kernel)
        return warped, warped_masks


class RefCOCOClipDataset:
    """MDETR-style refexp COCO json -> 8-frame pseudo-video samples."""

    def __init__(self, ann_file: str, img_folder: str, num_frames: int = 8,
                 subset_type: str = "train",
                 transforms_kwargs: Optional[Dict] = None, seed: int = 0,
                 as_clip: bool = True):
        with open(ann_file) as f:
            coco = json.load(f)
        self.imgs = {im["id"]: im for im in coco["images"]}
        anns_by_img: Dict[int, List[Dict]] = {}
        for a in coco["annotations"]:
            anns_by_img.setdefault(a["image_id"], []).append(a)
        self.items = [(iid, anns_by_img.get(iid, [])) for iid in self.imgs
                      if anns_by_img.get(iid)]
        self.img_folder = img_folder
        self.num_frames = num_frames if as_clip else 1
        self.as_clip = as_clip
        self.train = subset_type == "train"
        self.seed = seed
        self._epoch = 0
        self.transforms = VideoTransforms(subset_type, **(transforms_kwargs or {}))

    def set_epoch(self, epoch: int):
        """Advance the per-sample augmentation streams (transforms.stable_rng);
        called by the training batch iterator."""
        self._epoch = epoch

    def __len__(self):
        return len(self.items)

    def __getitem__(self, idx: int) -> Dict:
        # per-(epoch, idx) stream: deterministic at any worker count
        rng = stable_rng(self.seed, self._epoch, idx)
        if not self.train:
            # eval must visit every image exactly once — no resampling
            return self._load(idx, rng)
        for _ in range(20):  # resample if referred instance never visible
            sample = self._load(idx, rng)
            if sample["is_visible"].any():
                return sample
            idx = rng.randint(0, len(self) - 1)
        return sample

    def _load(self, idx: int, rng: random.Random) -> Dict:
        image_id, anns = self.items[idx]
        im_info = self.imgs[image_id]
        caption = im_info.get("caption", "")
        img = np.asarray(
            Image.open(path.join(self.img_folder, im_info["file_name"])).convert("RGB")
        )
        h, w = img.shape[:2]
        mask = ann_to_mask(anns[0], h, w)  # one referred instance per sample

        augmenter = ImageToSeqAugmenter(rng=rng)
        seq_imgs, seq_masks = [img], [mask]
        for _ in range(self.num_frames - 1):
            wi, wm = augmenter(img, [mask])
            seq_imgs.append(wi)
            seq_masks.append(wm[0])
        if self.as_clip:
            perm = list(range(self.num_frames))
            rng.shuffle(perm)
            seq_imgs = [seq_imgs[i] for i in perm]
            seq_masks = [seq_masks[i] for i in perm]

        T = self.num_frames
        masks = np.stack(seq_masks)[:, None]  # (T, 1, h, w)
        boxes = np.zeros((T, 1, 4), np.float32)
        visible = np.zeros((T, 1), bool)
        for t in range(T):
            m = masks[t, 0]
            if m.any():
                ys, xs = np.nonzero(m)
                boxes[t, 0] = (xs.min(), ys.min(), xs.max(), ys.max())
                visible[t, 0] = True
        frames = [f.astype(np.float32) / 255.0 for f in seq_imgs]
        text = " ".join(caption.lower().split())
        frames, masks, boxes, text = self.transforms(frames, masks, boxes, text,
                                                     rng=rng)
        return {
            "frames": normalize_frames(np.stack(frames)),
            "text": text,
            "masks": masks,
            "boxes": boxes,
            "labels": np.zeros(1, np.int32),
            "is_visible": visible,
            "referred_instance_idx": 0,
            "image_id": image_id,
            "orig_size": (h, w),
        }


REFCOCO_NAMES = ("refcoco", "refcoco+", "refcocog")


def find_refcoco_ann_file(name: str, subset: str, ann_root: str,
                          img_folder: str) -> Optional[str]:
    """Resolve the annotation json for a RefCOCO split. Tries the reference's
    layout `{ann_root}/{name}/instances_{name}_{subset}.json` (reference
    pretrainer.py:405-410 / datasets/__init__.py:26-29) then the MDETR-style
    `{img_folder}/annotations/{finetune|instances}_{name}_{subset}.json`."""
    candidates = [
        path.join(ann_root, name, f"instances_{name}_{subset}.json"),
        path.join(img_folder, "annotations", f"instances_{name}_{subset}.json"),
        path.join(img_folder, "annotations", f"finetune_{name}_{subset}.json"),
    ]
    for c in candidates:
        if c and path.exists(c):
            return c
    return None


def build_refcoco_val_datasets(config) -> List[Tuple[str, "RefCOCOClipDataset"]]:
    """Single-frame (T=1) validation datasets for the three RefCOCO splits
    (reference refercoco.py:12-50 ModulatedDetection + pretrainer.py:87-108
    val_tuples). Returns [(name, dataset)] for every split whose val json
    exists."""
    tk = dict(
        horizontal_flip_augmentations=False,
        resize_and_crop_augmentations=True,
        random_color=False,
        eval_short_size=config.eval_short_size,
        eval_max_size=config.eval_max_size,
    )
    out = []
    for name in REFCOCO_NAMES:
        ann = find_refcoco_ann_file(name, "val", config.get("ann_file", ""),
                                    config.img_folder)
        if ann is None:
            continue
        out.append((name, RefCOCOClipDataset(
            ann, path.join(config.img_folder, "train2014"),
            subset_type="valid", transforms_kwargs=tk, as_clip=False,
        )))
    return out


def build_refcoco_gt(dataset: "RefCOCOClipDataset"):
    """COCO-format GT straight from the val json annotations, in ORIGINAL
    image coordinates (predictions are mapped back to orig size by the
    postprocessor). Returns (gt_annotations, gt_boxes_by_img) for
    evaluators.evaluate_coco_pretrain_batches."""
    gt_annotations: List[Dict] = []
    gt_boxes_by_img: Dict[int, np.ndarray] = {}
    for image_id, anns in dataset.items:
        im = dataset.imgs[image_id]
        h, w = im["height"], im["width"]
        ann = anns[0]  # one referred instance per image in refexp jsons
        mask = ann_to_mask(ann, h, w)
        from ..evaluation.rle import encode as rle_encode

        gt_annotations.append({
            "image_id": image_id,
            "segmentation": rle_encode(mask),
            "iscrowd": int(ann.get("iscrowd", 0)),
            "area": float(ann.get("area", int(mask.sum()))),
        })
        x, y, bw, bh = ann["bbox"]
        gt_boxes_by_img[image_id] = np.array(
            [[x, y, x + bw, y + bh]], np.float32)
    return gt_annotations, gt_boxes_by_img


class ConcatClipDataset:
    """ConcatDataset equivalent for joint RefCOCO(+/g)-as-clip + Ref-YTVOS
    training (reference datasets/concat_dataset.py:14-31)."""

    def __init__(self, datasets: List):
        self.datasets = datasets
        self._offsets = np.cumsum([0] + [len(d) for d in datasets])

    def __len__(self):
        return int(self._offsets[-1])

    def set_epoch(self, epoch: int):
        for d in self.datasets:
            if hasattr(d, "set_epoch"):
                d.set_epoch(epoch)

    def __getitem__(self, idx: int):
        d = int(np.searchsorted(self._offsets, idx, side="right") - 1)
        return self.datasets[d][idx - int(self._offsets[d])]
