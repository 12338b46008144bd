"""eval_davis CLI end-to-end over a synthetic DAVIS tree with palette PNGs."""
import sys
from pathlib import Path

import numpy as np
import pytest
from PIL import Image


def _save_palette(mask, path):
    img = Image.fromarray(mask.astype(np.uint8)).convert("P")
    img.save(path)


@pytest.fixture()
def davis_tree(tmp_path):
    davis = tmp_path / "DAVIS"
    results = tmp_path / "results"
    seqs = ["seq_a", "seq_b"]
    frames = [f"{i:05d}" for i in range(6)]
    (davis / "ImageSets" / "2017").mkdir(parents=True)
    (davis / "ImageSets" / "2017" / "val.txt").write_text("\n".join(seqs) + "\n")
    rng = np.random.RandomState(0)
    for seq in seqs:
        gt_dir = davis / "Annotations_unsupervised" / "480p" / seq
        gt_dir.mkdir(parents=True)
        for anno in range(4):
            (results / f"anno_{anno}" / seq).mkdir(parents=True)
        for f in frames:
            gt = np.zeros((48, 64), np.uint8)
            gt[8:24, 8:24] = 1
            gt[30:44, 40:60] = 2
            _save_palette(gt, gt_dir / f"{f}.png")
            for anno in range(4):
                # perfect predictions for annotators 0-2; sloppy for 3
                pred = gt.copy()
                if anno == 3:
                    pred = np.roll(pred, 4, axis=1)
                _save_palette(pred, results / f"anno_{anno}" / seq / f"{f}.png")
    return davis, results


def test_eval_davis_cli(davis_tree, capsys, monkeypatch):
    davis, results = davis_tree
    from neurips2023_soc_tpu.cli.eval_davis import main

    monkeypatch.setattr(sys, "argv", [
        "eval_davis", "--davis_path", str(davis),
        "--results_path", str(results), "--set", "val",
    ])
    main()
    out = capsys.readouterr().out
    assert "anno_0" in out and "mean over annotators" in out
    assert (results / "global_results.csv").exists()
    # perfect annotators score J&F ~1.0
    import csv

    with open(results / "global_results.csv") as f:
        rows = list(csv.DictReader(f))
    perfect = [r for r in rows if r["annotator"] in ("0", "1", "2")]
    for r in perfect:
        assert float(r["J&F-Mean"]) > 0.99
    sloppy = [r for r in rows if r["annotator"] == "3"][0]
    assert float(sloppy["J&F-Mean"]) < 0.99

    # reference-schema CSVs per annotator (reference eval_davis.py:24-29)
    g_measures = ["J&F-Mean", "J-Mean", "J-Recall", "J-Decay",
                  "F-Mean", "F-Recall", "F-Decay"]
    for anno in range(4):
        gpath = results / f"anno_{anno}" / "global_results-val.csv"
        spath = results / f"anno_{anno}" / "per-sequence_results-val.csv"
        assert gpath.exists() and spath.exists()
        with open(gpath) as f:
            grows = list(csv.DictReader(f))
        assert len(grows) == 1 and list(grows[0].keys()) == g_measures
        with open(spath) as f:
            srows = list(csv.DictReader(f))
        assert list(srows[0].keys()) == ["Sequence", "J-Mean", "F-Mean"]
        # 2 sequences x 2 objects each
        assert sorted(r["Sequence"] for r in srows) == [
            "seq_a_1", "seq_a_2", "seq_b_1", "seq_b_2"]
        if anno < 3:
            for r in srows:
                assert float(r["J-Mean"]) > 0.99


def test_eval_davis_semi_supervised_missing_id_alignment(tmp_path, capsys,
                                                         monkeypatch):
    """Semi-supervised protocol compares result object k against GT object
    k BY ID (reference davis2017 Results.read_masks selects masks ==
    object_id). A prediction that never emits id 1 must score ~0 for
    object 1 and ~1 for a perfect object 2 — NOT silently shift object 2's
    masks onto object 1's row."""
    import csv

    davis = tmp_path / "DAVIS"
    results = tmp_path / "results"
    frames = [f"{i:05d}" for i in range(4)]
    (davis / "ImageSets" / "2017").mkdir(parents=True)
    (davis / "ImageSets" / "2017" / "val.txt").write_text("seq_a\n")
    gt_dir = davis / "Annotations" / "480p" / "seq_a"
    gt_dir.mkdir(parents=True)
    for anno in range(4):
        (results / f"anno_{anno}" / "seq_a").mkdir(parents=True)
    for f in frames:
        gt = np.zeros((48, 64), np.uint8)
        gt[8:24, 8:24] = 1
        gt[30:44, 40:60] = 2
        _save_palette(gt, gt_dir / f"{f}.png")
        pred = np.where(gt == 2, 2, 0).astype(np.uint8)  # id 1 never emitted
        for anno in range(4):
            _save_palette(pred, results / f"anno_{anno}" / "seq_a" / f"{f}.png")

    from neurips2023_soc_tpu.cli.eval_davis import main

    monkeypatch.setattr(sys, "argv", [
        "eval_davis", "--davis_path", str(davis),
        "--results_path", str(results), "--set", "val",
        "--task", "semi-supervised",
    ])
    main()
    with open(results / "anno_0" / "per-sequence_results-val.csv") as f:
        rows = {r["Sequence"]: float(r["J-Mean"])
                for r in csv.DictReader(f)}
    assert rows["seq_a_1"] < 0.01  # missing id scores zero on ITS row
    assert rows["seq_a_2"] > 0.99  # present id still scores on its own row
