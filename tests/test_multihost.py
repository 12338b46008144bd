"""Multi-host training path: per-host batch sharding arithmetic, the
parallel sample loader, and a REAL 2-process jax.distributed run on CPU that
assembles global arrays from process-local shards (SURVEY.md §2.4 — the
reference is single-node NCCL; the TPU build must be jax.distributed-real)."""
import os
import socket
import subprocess
import sys
import textwrap
import time

import numpy as np
import pytest

from neurips2023_soc_tpu.data.sampler import ShardedEpochSampler
from neurips2023_soc_tpu.utils.prefetch import parallel_map


def test_parallel_map_order_and_overlap():
    def load(i):
        time.sleep(0.03)
        return i * 2

    items = list(range(24))
    t0 = time.perf_counter()
    serial = list(parallel_map(load, items, num_workers=1))
    t_serial = time.perf_counter() - t0
    t0 = time.perf_counter()
    par = list(parallel_map(load, items, num_workers=4))
    t_par = time.perf_counter() - t0
    assert par == serial == [i * 2 for i in items]  # ordered
    assert t_par < 0.6 * t_serial  # genuine overlap (4 workers, sleepy IO)


def test_parallel_map_propagates_errors():
    def load(i):
        if i == 3:
            raise ValueError("boom")
        return i

    with pytest.raises(ValueError, match="boom"):
        list(parallel_map(load, range(8), num_workers=4))


def test_host_sharded_batches_partition_the_global_batch():
    """The k-th local batches across hosts must together hold exactly the
    k-th global batch (torch DistributedSampler semantics, reference
    trainer.py:74-82)."""
    N, bs, num_hosts = 24, 6, 2
    local_bs = bs // num_hosts

    def batches_for(num_hosts, host_id, local_bs):
        s = ShardedEpochSampler(N, num_hosts, host_id, shuffle=True, seed=7)
        s.set_epoch(3)
        order = list(s)
        order = order[: (len(order) // local_bs) * local_bs]
        return [order[i : i + local_bs]
                for i in range(0, len(order), local_bs)]

    global_batches = batches_for(1, 0, bs)
    h0 = batches_for(num_hosts, 0, local_bs)
    h1 = batches_for(num_hosts, 1, local_bs)
    assert len(h0) == len(h1) == len(global_batches)
    for k in range(len(global_batches)):
        assert sorted(h0[k] + h1[k]) == sorted(global_batches[k])


def test_make_batch_iterator_workers_and_sharding():
    """The training iterator yields identical batches regardless of worker
    count, and host-sharded iterators partition sample ids per step."""
    from neurips2023_soc_tpu.cli.main import make_batch_iterator
    from neurips2023_soc_tpu.config import load_config
    from neurips2023_soc_tpu.data.synthetic import SyntheticRVOSDataset
    from neurips2023_soc_tpu.models.text_encoder import build_tokenizer

    ds = SyntheticRVOSDataset(num_samples=8, num_frames=2, frame_size=(24, 32),
                              center_frame_only=True)  # samples carry image_id
    tok = build_tokenizer("roberta-tiny", text_bucket=8)
    cfg = load_config("configs/tiny_synthetic.yaml", overrides={
        "batch_size": 4, "window_size": 2,
        "train_short_size": 24, "train_max_size": 32, "num_workers": 4,
    })
    it4 = list(make_batch_iterator(ds, cfg, tok, num_hosts=1, host_id=0)(0))
    cfg1 = cfg.replace(num_workers=0)
    it0 = list(make_batch_iterator(ds, cfg1, tok, num_hosts=1, host_id=0)(0))
    assert len(it4) == len(it0) == 2
    for b4, b0 in zip(it4, it0):
        assert b4["image_ids"] == b0["image_ids"]
        np.testing.assert_array_equal(b4["pixels"], b0["pixels"])

    h0 = list(make_batch_iterator(ds, cfg, tok, num_hosts=2, host_id=0)(0))
    h1 = list(make_batch_iterator(ds, cfg, tok, num_hosts=2, host_id=1)(0))
    for k, gb in enumerate(it0):
        local = h0[k]["image_ids"] + h1[k]["image_ids"]
        assert sorted(local) == sorted(gb["image_ids"])
        assert h0[k]["pixels"].shape[1] == 2  # local batch = global / hosts


_WORKER_SCRIPT = textwrap.dedent("""
    import os, sys
    os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
    os.environ.pop("JAX_PLATFORMS", None)
    import jax
    jax.config.update("jax_platforms", "cpu")
    import numpy as np
    import jax.numpy as jnp

    pid = int(sys.argv[1]); port = sys.argv[2]
    jax.distributed.initialize(coordinator_address=f"127.0.0.1:{port}",
                               num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    assert len(jax.devices()) == 4  # 2 local x 2 processes

    from neurips2023_soc_tpu.parallel import make_mesh, shard_batch

    mesh = make_mesh(shape=(4,), axis_names=("data",))
    # every process holds its LOCAL half of a deterministic global batch
    T, B, H, W = 2, 4, 4, 4
    global_px = np.arange(T * B * H * W * 3, dtype=np.float32).reshape(
        T, B, H, W, 3)
    local = {"pixels": global_px[:, pid * 2 : (pid + 1) * 2],
             "labels": np.arange(B, dtype=np.int32).reshape(B)[
                 pid * 2 : (pid + 1) * 2]}
    batch = shard_batch(mesh, local)
    assert batch["pixels"].shape == (T, B, H, W, 3)  # global shape
    assert batch["labels"].shape == (B,)

    s = jax.jit(lambda b: (jnp.sum(b["pixels"]), jnp.sum(b["labels"])))(batch)
    got = (float(s[0]), float(s[1]))
    want = (float(global_px.sum()), float(np.arange(B).sum()))
    assert got == want, (got, want)
    print(f"OK process {pid}", flush=True)
""")


def test_two_process_distributed_global_batch(tmp_path):
    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()

    script = tmp_path / "worker.py"
    script.write_text(_WORKER_SCRIPT)
    env = dict(os.environ)
    env["PYTHONPATH"] = "/root/repo:" + env.get("PYTHONPATH", "")
    procs = [
        subprocess.Popen([sys.executable, "-u", str(script), str(pid), str(port)],
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         env=env, text=True)
        for pid in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{out}"
        assert f"OK process {pid}" in out


def test_worker_count_invariant_augmentations(tmp_path):
    """Datasets that draw augmentation randomness must yield IDENTICAL
    batches at any worker count (per-(epoch, idx) streams via
    transforms.stable_rng) and DIFFERENT augmentations across epochs —
    a shared dataset-level RNG would interleave nondeterministically under
    parallel_map (code-review r3 finding)."""
    import json as _json

    from PIL import Image

    from neurips2023_soc_tpu.cli.main import make_batch_iterator
    from neurips2023_soc_tpu.config import load_config
    from neurips2023_soc_tpu.data.coco_ref import RefCOCOClipDataset
    from neurips2023_soc_tpu.models.text_encoder import build_tokenizer

    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    for iid in range(1, 5):
        arr = rng.randint(0, 255, (32, 40, 3), np.uint8)
        Image.fromarray(arr).save(img_dir / f"im_{iid}.jpg")
        images.append({"id": iid, "file_name": f"im_{iid}.jpg",
                       "height": 32, "width": 40, "caption": f"thing {iid}"})
        annotations.append({
            "id": iid, "image_id": iid, "category_id": 1,
            "segmentation": [[4, 5, 20, 5, 20, 25, 4, 25]],
            "bbox": [4, 5, 16, 20], "area": 320.0, "iscrowd": 0})
    ann = tmp_path / "train.json"
    ann.write_text(_json.dumps({"images": images, "annotations": annotations,
                                "categories": [{"id": 1, "name": "o"}]}))

    tk = dict(horizontal_flip_augmentations=True,
              resize_and_crop_augmentations=True, random_color=True,
              train_short_size=32, train_max_size=48, seed=3)
    ds = RefCOCOClipDataset(str(ann), str(img_dir), num_frames=3,
                            transforms_kwargs=tk, seed=3)
    tok = build_tokenizer("roberta-tiny", text_bucket=8)
    cfg = load_config("configs/tiny_synthetic.yaml", overrides={
        "batch_size": 2, "window_size": 3,
        "train_short_size": 32, "train_max_size": 48, "num_workers": 4,
    })
    b4 = list(make_batch_iterator(ds, cfg, tok, num_hosts=1, host_id=0)(0))
    b0 = list(make_batch_iterator(ds, cfg.replace(num_workers=0), tok,
                                  num_hosts=1, host_id=0)(0))
    assert len(b4) == len(b0) == 2
    for a, b in zip(b4, b0):
        np.testing.assert_array_equal(a["pixels"], b["pixels"])
        np.testing.assert_array_equal(a["masks"], b["masks"])

    # epochs advance the augmentation streams (same sample, different warp)
    e1 = list(make_batch_iterator(ds, cfg.replace(num_workers=0), tok,
                                  num_hosts=1, host_id=0)(1))
    assert any(np.abs(a["pixels"] - b["pixels"]).max() > 1e-6
               for a, b in zip(b0, e1))
