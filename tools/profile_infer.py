"""Op-level device profile of the north-star inference clip program
(VERDICT r4 #3: the train step has a profile + no-hot-op-left conclusion;
this gives the inference side the same table).

Runs ONE warm perturbed whole-clip forward (the fused selection program the
engine dispatches) under jax.profiler, parses the trace, and prints the
top-N device ops plus a stage aggregation (pallas msda / attention+matmul /
while-loops / copies / other fusions).

Usage: python tools/profile_infer.py [--backbone video-swin-b] [--frames 16]
           [--top 25]
"""
from __future__ import annotations

import argparse
import collections
import glob
import gzip
import json
import os
import sys
import tempfile
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_and_trace(backbone: str, T: int, H: int, W: int, log_dir: str):
    import jax
    import jax.numpy as jnp

    sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
    import bench

    model = bench.build_model(backbone, "bfloat16")
    params = bench.init_params(model, T, H, W, 16)

    rng = np.random.RandomState(0)
    pixels = rng.randn(T, 1, H, W, 3).astype(np.float32)
    pad = np.zeros((T, 1, H, W), bool)
    ids = rng.randint(3, 1000, size=(1, 16)).astype(np.int32)
    msk = np.ones((1, 16), np.int32)

    @jax.jit
    def forward(params, pixels, pad, ids, msk):
        out = model.apply(params, pixels, pad, ids, msk)
        scores = jax.nn.sigmoid(out["pred_cls"][-1]).mean(0).max(-1)
        best = jnp.argmax(scores, -1)
        masks = out["pred_masks"][-1]
        sel = jnp.take_along_axis(
            masks, best[None, :, None, None, None], axis=2)[:, :, 0]
        return sel.astype(jnp.float32).mean()

    px = jax.device_put(pixels)
    pd, id_, mk = map(jax.device_put, (pad, ids, msk))
    float(forward(params, px, pd, id_, mk))            # compile
    float(forward(params, px + np.float32(0.5), pd, id_, mk))  # slow 1st exec
    with jax.profiler.trace(log_dir):
        float(forward(params, px + np.float32(1.5), pd, id_, mk))


def parse_trace(log_dir: str):
    paths = glob.glob(os.path.join(
        log_dir, "**", "*.trace.json.gz"), recursive=True)
    assert paths, f"no trace under {log_dir}"
    with gzip.open(sorted(paths)[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"}
    device_pids = {p for p, n in pid_names.items() if "/device:TPU" in n}
    # each device pid has one thread line per level: "XLA Modules" (the whole
    # jit_forward envelope — would double-count every op), "XLA Ops" (what we
    # want), sometimes "Steps"/"XLA TraceMe"
    op_tids = {(e["pid"], e["tid"])
               for e in events
               if e.get("ph") == "M" and e.get("name") == "thread_name"
               and e["pid"] in device_pids
               and "XLA Ops" in e["args"].get("name", "")}
    ops = collections.Counter()
    calls = collections.Counter()
    for e in events:
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tids:
            name = e.get("name", "?")
            ops[name] += e.get("dur", 0)
            calls[name] += 1
    return ops, calls


STAGES = (
    # NOTE: XLA names Pallas calls "custom-call.N" (no 'msda' substring), so
    # every custom-call is attributed here. Valid for THIS clip program,
    # whose only custom-calls are the 3 encoder Pallas msda kernels — if a
    # profiled graph gains other custom-calls (sort/top-k, host callbacks),
    # split this bucket before trusting the msda share.
    ("pallas_msda", lambda n: "msda" in n or "custom-call" in n),
    ("while_loops", lambda n: n.startswith("while")),
    ("conv", lambda n: "convolution" in n),
    ("dynamic_update", lambda n: "dynamic-update" in n or "dynamic_update" in n),
    ("copies", lambda n: n.startswith(("copy", "bitcast", "transpose"))),
    ("fusions", lambda n: n.startswith("fusion")),
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--backbone", default="video-swin-b")
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--hw", type=int, nargs=2, default=(360, 640))
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    with tempfile.TemporaryDirectory(prefix="soc_prof_") as d:
        run_and_trace(args.backbone, args.frames, *args.hw, d)
        ops, calls = parse_trace(d)

    total = sum(ops.values())
    print(f"\ndevice busy: {total / 1e3:.1f} ms "
          f"({args.backbone}, T={args.frames}, {args.hw[0]}x{args.hw[1]})")
    print(f"\ntop {args.top} ops:")
    for name, dur in ops.most_common(args.top):
        print(f"  {dur / 1e3:8.2f} ms  x{calls[name]:<4d} "
              f"{dur / total * 100:5.1f}%  {name[:100]}")
    print("\nstage aggregation:")
    assigned = collections.Counter()
    for name, dur in ops.items():
        for stage, pred in STAGES:
            if pred(name):
                assigned[stage] += dur
                break
        else:
            assigned["other"] += dur
    for stage, dur in assigned.most_common():
        print(f"  {dur / 1e3:8.2f} ms  {dur / total * 100:5.1f}%  {stage}")


if __name__ == "__main__":
    main()
