"""Dataset loaders tested against synthetic on-disk fixture trees."""
import json
from pathlib import Path

import numpy as np
import pytest
from PIL import Image

from neurips2023_soc_tpu.data.refer_youtube_vos import ReferYouTubeVOSDataset
from neurips2023_soc_tpu.data.transforms import size_with_aspect_ratio


@pytest.fixture(scope="module")
def ytvos_root(tmp_path_factory):
    root = tmp_path_factory.mktemp("ytvos")
    frames = [f"{i:05d}" for i in range(0, 10)]
    for subset in ["train"]:
        for vid in ["vid_a", "vid_b"]:
            (root / subset / "JPEGImages" / vid).mkdir(parents=True)
            (root / subset / "Annotations" / vid).mkdir(parents=True)
            for t, fi in enumerate(frames):
                img = (np.random.RandomState(t).rand(64, 96, 3) * 255).astype(np.uint8)
                Image.fromarray(img).save(root / subset / "JPEGImages" / vid / f"{fi}.jpg")
                ann = np.zeros((64, 96), np.uint8)
                # obj 1 visible in all frames; obj 2 only in the first window
                ann[10:30, 10:30] = 1
                if t < 4:
                    ann[40:60, 60:80] = 2
                pal = Image.fromarray(ann).convert("P")
                pal.save(root / subset / "Annotations" / vid / f"{fi}.png")
    meta_exp = {"videos": {
        vid: {
            "frames": frames,
            "expressions": {
                "0": {"exp": "the red thing on the Left", "obj_id": "1"},
                "1": {"exp": "a vanishing object", "obj_id": "2"},
            },
        } for vid in ["vid_a", "vid_b"]
    }}
    (root / "meta_expressions" / "train").mkdir(parents=True)
    (root / "meta_expressions" / "train" / "meta_expressions.json").write_text(
        json.dumps(meta_exp))
    meta = {"videos": {vid: {"objects": {"1": {"category": "dog"},
                                         "2": {"category": "cat"}}}
                       for vid in ["vid_a", "vid_b"]}}
    (root / "train" / "meta.json").write_text(json.dumps(meta))
    return root


def test_ytvos_train_windows_and_visibility(ytvos_root):
    ds = ReferYouTubeVOSDataset(
        "train", str(ytvos_root), window_size=4, check_counts=False,
        transforms_kwargs=dict(horizontal_flip_augmentations=False,
                               train_short_size=48, train_max_size=80),
    )
    # 10 frames -> windows [0:4], [4:8], [6:10]; obj 1 in all 3, obj 2 only in
    # the first -> per video: 3 + 1 = 4 samples
    assert len(ds) == 8
    s = ds[0]
    assert s["frames"].shape[0] == 4
    assert s["masks"].shape[1] == 1 and s["boxes"].shape[1] == 1
    assert s["masks"].shape[2:] == s["frames"].shape[1:3]
    assert s["labels"][0] == 13  # dog
    assert s["is_visible"].all()
    # obj-2 samples: only first window kept
    texts = [ds[i]["text"] for i in range(len(ds))]
    assert sum("vanishing" in t for t in texts) == 2  # one window per video


def test_ytvos_boxes_track_resize(ytvos_root):
    ds = ReferYouTubeVOSDataset(
        "train", str(ytvos_root), window_size=4, check_counts=False,
        transforms_kwargs=dict(horizontal_flip_augmentations=False,
                               train_short_size=32, train_max_size=48),
    )
    s = ds[0]
    h, w = s["frames"].shape[1:3]
    assert (h, w) == (32, 48)
    b = s["boxes"][0, 0]
    m = s["masks"][0, 0]
    ys, xs = np.nonzero(m)
    assert abs(b[0] - xs.min()) <= 1 and abs(b[2] - xs.max()) <= 1


def test_size_with_aspect_ratio_max_cap():
    assert size_with_aspect_ratio(720, 1280, 360, 640) == (360, 640)
    oh, ow = size_with_aspect_ratio(480, 1280, 360, 640)
    assert ow == 640 and oh == round(480 * 640 / 1280)


@pytest.fixture(scope="module")
def jhmdb_root(tmp_path_factory):
    import scipy.io

    root = tmp_path_factory.mktemp("jhmdb")
    lines = ["video_id,query"]
    for vid in ["brush_hair_vid", "catch_vid"]:
        d = root / "Rename_Images" / "action" / vid
        d.mkdir(parents=True)
        for t in range(5):
            img = (np.random.RandomState(t).rand(48, 64, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"{t + 1:05d}.png")
        md = root / "puppet_mask" / "action" / vid
        md.mkdir(parents=True)
        mask = np.zeros((48, 64, 5), np.uint8)
        mask[10:30, 20:40, :] = 1
        scipy.io.savemat(md / "puppet_mask.mat", {"part_mask": mask})
        lines.append(f"{vid},a person doing things")
    ann = root / "jhmdb_annotation.txt"
    ann.write_text("\n".join(lines) + "\n")
    return root


def test_jhmdb_dataset(jhmdb_root, monkeypatch):
    from neurips2023_soc_tpu.data import jhmdb_sentences as jh

    monkeypatch.setattr(jh, "build_samples_metadata",
                        lambda p, c=None, seed=42, **kw: _jhmdb_meta(jhmdb_root))
    ds = jh.JHMDBSentencesDataset(
        "test", str(jhmdb_root), window_size=4,
        transforms_kwargs=dict(eval_short_size=48, eval_max_size=64),
    )
    assert len(ds) == 4
    s = ds[0]
    assert s["frames"].shape[0] == 4
    assert s["masks"].shape == (1, 1, 48, 64)
    assert s["is_visible"].all()
    assert s["valid_frame_idx"] == 2


def _jhmdb_meta(root):
    from glob import glob
    from os import path

    out = []
    for vid in ["brush_hair_vid", "catch_vid"]:
        frames = sorted(glob(str(root / "Rename_Images" / "action" / vid / "*.png")))
        masks = str(root / "puppet_mask" / "action" / vid / "puppet_mask.mat")
        for fi in (1, 3):
            out.append((vid, frames[fi], masks, fi, "a person doing things"))
    return out


def test_ytvos_valid_split(ytvos_root, tmp_path):
    import json as _json
    import shutil

    # synthesize a valid split from the train fixture
    root = tmp_path / "ytvos_valid"
    shutil.copytree(ytvos_root, root)
    (root / "valid").mkdir(exist_ok=True)
    shutil.copytree(root / "train" / "JPEGImages", root / "valid" / "JPEGImages")
    (root / "meta_expressions" / "valid").mkdir(parents=True)
    meta = _json.loads(
        (root / "meta_expressions" / "train" / "meta_expressions.json").read_text())
    (root / "meta_expressions" / "valid" / "meta_expressions.json").write_text(
        _json.dumps(meta))
    (root / "meta_expressions" / "test").mkdir(parents=True)
    (root / "meta_expressions" / "test" / "meta_expressions.json").write_text(
        _json.dumps({"videos": {}}))

    ds = ReferYouTubeVOSDataset(
        "test", str(root), check_counts=False,
        transforms_kwargs=dict(eval_short_size=48, eval_max_size=80),
    )
    # 2 videos x 2 expressions
    assert len(ds) == 4
    s = ds[0]
    assert "video_metadata" in s and "masks" not in s
    assert s["frames"].shape[0] == 10  # full-length video
    assert s["video_metadata"]["original_frame_size"] == (64, 96)


@pytest.fixture(scope="module")
def a2d_video(tmp_path_factory):
    """A tiny mp4 whose frame t is a solid gray level 10+20*t (codec-robust)."""
    import cv2

    d = tmp_path_factory.mktemp("a2d")
    vp = str(d / "vid0.mp4")
    vw = cv2.VideoWriter(vp, cv2.VideoWriter_fourcc(*"mp4v"), 10, (32, 24))
    assert vw.isOpened(), "mp4v codec unavailable"
    for t in range(12):
        vw.write(np.full((24, 32, 3), 10 + 20 * t, np.uint8))
    vw.release()
    return d, vp


def _frame_ids(frames):
    # map decoded frames back to t via the gray-level encoding
    return [int(round((f.mean() * 255 - 10) / 20)) for f in frames]


def test_video_range_decode_matches_full(a2d_video):
    from neurips2023_soc_tpu.data.a2d_sentences import (
        read_video_frames_cv2,
        video_frame_count,
    )

    _, vp = a2d_video
    assert video_frame_count(vp) == 12
    full = read_video_frames_cv2(vp)
    assert _frame_ids(full) == list(range(12))
    part = read_video_frames_cv2(vp, 3, 9)
    assert part.shape[0] == 6
    np.testing.assert_array_equal(part, full[3:9])
    # ranges clamped by the caller; end beyond EOF just stops at EOF
    tail = read_video_frames_cv2(vp, 10, 20)
    np.testing.assert_array_equal(tail, full[10:])


@pytest.mark.parametrize("frame_idx", [1, 6, 12])
def test_a2d_getitem_window_via_range_decode(a2d_video, frame_idx):
    """__getitem__ decodes only the window but yields EXACTLY the frames the
    reference's whole-video decode + clamped indexing produces
    (reference a2d_sentences_dataset.py:119-122), incl. edge clamping at both
    ends of the clip."""
    import h5py

    from neurips2023_soc_tpu.data.a2d_sentences import (
        A2DSentencesDataset,
        read_video_frames_cv2,
    )
    from neurips2023_soc_tpu.data.transforms import VideoTransforms

    d, vp = a2d_video
    mask_dir = d / "masks" / "vid0"
    mask_dir.mkdir(parents=True, exist_ok=True)
    with h5py.File(mask_dir / f"{frame_idx:05d}.h5", "w") as f:
        f["instance"] = np.array([7])
        f["reMask"] = np.zeros((32, 24), np.uint8)  # h5 stores (W, H)
        f["reMask"][5:15, 8:20] = 1

    ds = A2DSentencesDataset.__new__(A2DSentencesDataset)
    ds.window_size = 8
    ds.videos_dir = str(d)
    ds.mask_annotations_dir = str(d / "masks")
    ds.text_annotations = [("a gray screen", "vid0", frame_idx, 7)]
    ds.seed = 0
    ds._epoch = 0
    ds.transforms = VideoTransforms(
        "test", eval_short_size=24, eval_max_size=32)
    s = ds[0]
    assert s["frames"].shape[0] == 8
    assert s["masks"].shape == (1, 1, 24, 32)
    assert s["masks"][0, 0, 8:20, 5:15].all()  # transposed back to (H, W)

    # oracle: whole-video decode with the reference's clamped window indexing
    video = read_video_frames_cv2(vp)
    start = frame_idx - 1 - 4
    want = [min(max(i, 0), len(video) - 1) for i in range(start, start + 8)]
    from neurips2023_soc_tpu.data.collate import normalize_frames

    oracle = normalize_frames(np.stack([video[i] for i in want]))
    np.testing.assert_array_equal(s["frames"], oracle)


def test_jhmdb_window_excludes_unannotated_tail(tmp_path):
    """Some JHMDB videos have trailing frames without masks; the reference
    truncates the frame list to the mask count before windowing
    (jhmdb_sentences_dataset.py:65-68), so edge clamping repeats the LAST
    ANNOTATED frame, never an unannotated one."""
    import scipy.io

    from neurips2023_soc_tpu.data import jhmdb_sentences as jh

    root = tmp_path
    vid = "clap_vid"
    d = root / "Rename_Images" / "action" / vid
    d.mkdir(parents=True)
    for t in range(5):  # 5 frames on disk...
        img = np.full((32, 40, 3), 40 * (t + 1), np.uint8)
        Image.fromarray(img).save(d / f"{t + 1:05d}.png")
    md = root / "puppet_mask" / "action" / vid
    md.mkdir(parents=True)
    mask = np.zeros((32, 40, 3), np.uint8)  # ...but only 3 annotated
    mask[5:20, 10:30, :] = 1
    scipy.io.savemat(md / "puppet_mask.mat", {"part_mask": mask})

    frames = sorted((d).glob("*.png"))
    meta = [(vid, str(frames[2]), str(md / "puppet_mask.mat"), 2, "a person")]
    ds = jh.JHMDBSentencesDataset.__new__(jh.JHMDBSentencesDataset)
    ds.window_size = 4
    ds.samples_metadata = meta
    ds.transforms = jh.VideoTransforms(
        "test", eval_short_size=32, eval_max_size=40)

    s = ds[0]
    out = np.asarray(s["frames"])  # (T, H, W, 3) normalized
    assert out.shape[0] == 4
    # window [0,1,2,3] clamps to annotated range [0,2]: last two frames are
    # both the final annotated frame
    np.testing.assert_array_equal(out[-1], out[-2])
    # the unannotated frames (constant 160/200) never appear: every window
    # frame comes from the first three (constant 40/80/120) source images
    uniq = {out[t].mean().round(4) for t in range(4)}
    assert len(uniq) == 3


def test_refer_davis_dataset(tmp_path):
    from neurips2023_soc_tpu.data.davis import ReferDAVISDataset

    root = tmp_path
    frames = [f"{i:05d}" for i in range(4)]
    for vid in ["dog", "goat"]:
        d = root / "valid" / "JPEGImages" / vid
        d.mkdir(parents=True)
        for i, f in enumerate(frames):
            img = (np.random.RandomState(i).rand(40, 56, 3) * 255).astype(np.uint8)
            Image.fromarray(img).save(d / f"{f}.jpg")
    meta = {
        "videos": {
            vid: {
                "frames": frames,
                "expressions": {
                    "0": {"exp": "a Dog  running"},
                    "1": {"exp": "the second dog"},
                    "2": {"exp": "third"},
                    "3": {"exp": "fourth"},
                },
            }
            for vid in ["dog", "goat"]
        }
    }
    md = root / "meta_expressions" / "valid"
    md.mkdir(parents=True)
    (md / "meta_expressions.json").write_text(json.dumps(meta))

    ds = ReferDAVISDataset(
        "valid", str(root),
        transforms_kwargs=dict(eval_short_size=40, eval_max_size=56),
    )
    # 2 videos x 4 expressions (4 per annotator, merged downstream)
    assert len(ds) == 8
    s = ds[0]
    assert s["frames"].shape == (4, 40, 56, 3)
    assert s["text"] == "a dog running"  # lowercased, whitespace-collapsed
    vm = s["video_metadata"]
    assert vm["video_id"] in ("dog", "goat")
    assert vm["frame_indices"] == frames
    assert vm["original_frame_size"] == (40, 56)
    assert vm["exp_id"] == "0"


def test_prepare_ref_davis_conversion(tmp_path):
    """Raw DAVIS download -> YTVOS layout (reference
    davis2017/convert_davis_to_ytbs.py): expression ids interleave
    [annot1-first, annot1-full, annot2-first, annot2-full] per object,
    misspelled video names are fixed, annotator-2 files parse as latin-1,
    and the converted tree loads directly through ReferDAVISDataset."""
    from neurips2023_soc_tpu.data.davis import ReferDAVISDataset
    from neurips2023_soc_tpu.data.prepare_davis import prepare_ref_davis

    raw = tmp_path / "raw"
    sets = raw / "DAVIS" / "ImageSets" / "2017"
    sets.mkdir(parents=True)
    (sets / "train.txt").write_text("bear\n")
    (sets / "val.txt").write_text("classic-car\n")
    for video in ["bear", "classic-car"]:
        for kind in ["JPEGImages", "Annotations_unsupervised"]:
            d = raw / "DAVIS" / kind / "480p" / video
            d.mkdir(parents=True)
            ext = "jpg" if kind == "JPEGImages" else "png"
            for t in range(3):
                img = np.full((24, 32, 3), t, np.uint8)
                Image.fromarray(img).save(d / f"{t:05d}.{ext}")
    (raw / "DAVIS" / "davis_semantics.json").write_text(json.dumps({
        "bear": {"1": "bear"},
        "classic-car": {"1": "car", "2": "person"},
    }))
    txt = raw / "davis_text_annotations"
    txt.mkdir()
    # annotation files use the misspelled name; annotator 2 is latin-1
    (txt / "Davis17_annot1.txt").write_text(
        'bear 1 "a brown bear"\n'
        'clasic-car 1 "an old car"\nclasic-car 2 "a driver"\n')
    (txt / "Davis17_annot1_full_video.txt").write_text(
        'bear 1 "a bear walking"\n'
        'clasic-car 1 "a car driving"\nclasic-car 2 "a person waving"\n')
    (txt / "Davis17_annot2.txt").write_bytes(
        'bear 1 "un ours brun"\n'
        'clasic-car 1 "une voiture \xe9l\xe9gante"\n'
        'clasic-car 2 "un conducteur"\n'.encode("latin-1"))
    (txt / "Davis17_annot2_full_video.txt").write_bytes(
        'bear 1 "un ours"\n'
        'clasic-car 1 "une voiture"\nclasic-car 2 "une personne"\n'
        .encode("latin-1"))

    out = tmp_path / "ref-davis"
    prepare_ref_davis(str(raw), str(out))

    meta = json.loads(
        (out / "meta_expressions" / "valid" / "meta_expressions.json")
        .read_text())
    car = meta["videos"]["classic-car"]  # name fixed from 'clasic-car'
    assert car["frames"] == ["00000", "00001", "00002"]
    # object 1's four variants first, then object 2's
    assert [car["expressions"][str(i)]["exp"] for i in range(8)] == [
        "an old car", "a car driving", "une voiture \xe9l\xe9gante",
        "une voiture", "a driver", "a person waving", "un conducteur",
        "une personne"]
    assert [car["expressions"][str(i)]["obj_id"] for i in range(8)] == \
        ["1"] * 4 + ["2"] * 4
    vmeta = json.loads((out / "valid" / "meta.json").read_text())
    assert vmeta["videos"]["classic-car"]["objects"] == {
        "1": {"category": "car"}, "2": {"category": "person"}}
    # originals untouched (reference mv's them away)
    assert (raw / "DAVIS" / "JPEGImages" / "480p" / "bear" / "00000.jpg").exists()

    # the converted tree is directly consumable by the dataset
    ds = ReferDAVISDataset(
        "valid", str(out),
        transforms_kwargs=dict(eval_short_size=24, eval_max_size=32))
    assert len(ds) == 8
    s = ds[0]
    assert s["frames"].shape == (3, 24, 32, 3)
    assert s["text"] == "an old car"
