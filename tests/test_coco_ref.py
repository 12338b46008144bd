"""RefCOCO image-as-clip dataset tests on a synthetic COCO-json fixture."""
import json

import numpy as np
import pytest
from PIL import Image

from neurips2023_soc_tpu.data.coco_ref import (
    ConcatClipDataset,
    ImageToSeqAugmenter,
    RefCOCOClipDataset,
    polygons_to_mask,
)


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    (root / "images").mkdir()
    images, annotations = [], []
    for i in range(3):
        arr = (np.random.RandomState(i).rand(64, 96, 3) * 255).astype(np.uint8)
        fname = f"img_{i}.jpg"
        Image.fromarray(arr).save(root / "images" / fname)
        images.append({"id": i, "file_name": fname, "height": 64, "width": 96,
                       "caption": f"the object number {i} on the right"})
        annotations.append({
            "id": i, "image_id": i, "category_id": 1,
            "segmentation": [[10, 10, 40, 10, 40, 40, 10, 40]],
            "bbox": [10, 10, 30, 30], "area": 900, "iscrowd": 0,
        })
    ann = {"images": images, "annotations": annotations, "categories": []}
    (root / "refexp.json").write_text(json.dumps(ann))
    return root


def test_polygon_rasterization():
    m = polygons_to_mask([[2, 2, 10, 2, 10, 10, 2, 10]], 16, 16)
    assert m[5, 5] == 1 and m[0, 0] == 0
    assert 64 <= m.sum() <= 100  # ~9x9 square incl. boundary handling


def test_augmenter_geometry_consistency():
    rng_img = np.random.RandomState(0)
    img = (rng_img.rand(64, 96, 3) * 255).astype(np.uint8)
    mask = np.zeros((64, 96), np.uint8)
    mask[20:40, 30:60] = 1
    aug = ImageToSeqAugmenter()
    wi, wm = aug(img, [mask])
    assert wi.shape == img.shape and wm[0].shape == mask.shape
    # mask should survive mostly intact for moderate warps
    assert 0.3 * mask.sum() < wm[0].sum() < 3 * mask.sum() + 1


def test_refcoco_clip_dataset(coco_root):
    ds = RefCOCOClipDataset(
        str(coco_root / "refexp.json"), str(coco_root / "images"),
        num_frames=4,
        transforms_kwargs=dict(horizontal_flip_augmentations=False,
                               train_short_size=48, train_max_size=80),
    )
    assert len(ds) == 3
    s = ds[0]
    assert s["frames"].shape[0] == 4
    assert s["masks"].shape[:2] == (4, 1)
    assert s["is_visible"].any()
    assert "object" in s["text"]


def test_concat_dataset(coco_root):
    ds = RefCOCOClipDataset(
        str(coco_root / "refexp.json"), str(coco_root / "images"), num_frames=2,
        transforms_kwargs=dict(horizontal_flip_augmentations=False,
                               train_short_size=48, train_max_size=80),
    )
    cat = ConcatClipDataset([ds, ds])
    assert len(cat) == 6
    assert cat[5]["frames"].shape[0] == 2
