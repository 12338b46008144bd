"""Training-step benchmark: YTVOS finetune shape (T=8, B=1/chip, 360x640,
bf16 compute, f32 params) on one chip. Prints one JSON line. Same trusted
protocol as bench.py (fresh inputs + forced scalar fetch per step).

Env knobs: BENCH_BACKBONE (video-swin-t|video-swin-b), BENCH_MSDA,
BENCH_B (per-chip batch; reports per-sample time so layouts compare),
BENCH_REMAT=1 (nn.remat through swin blocks — trades FLOPs for HBM, the
lever that makes larger per-chip batches fit), BENCH_ITERS."""
import json
import os
import time

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from neurips2023_soc_tpu.losses import CriterionConfig
    from neurips2023_soc_tpu.models.soc import SOC
    from neurips2023_soc_tpu.training.optim import build_optimizer
    from neurips2023_soc_tpu.training.train_step import TrainState, make_train_step

    T, B, H, W, S = 8, int(os.environ.get("BENCH_B", 1)), 360, 640, 16
    model = SOC(
        backbone_name=os.environ.get("BENCH_BACKBONE", "video-swin-t"),
        d_model=256, num_queries=20, dim_feedforward=2048,
        enc_layers=3, dec_layers=3, voc_enc_layers=3, voc_dec_layers=3,
        text_encoder_type="roberta-base", dtype=jnp.bfloat16,
        msda_impl=os.environ.get("BENCH_MSDA", "auto"),
        use_remat=os.environ.get("BENCH_REMAT", "") == "1",
    )
    rng = np.random.RandomState(0)
    batch = {
        "pixels": rng.randn(T, B, H, W, 3).astype(np.float32),
        "pad_mask": np.zeros((T, B, H, W), bool),
        "text_ids": rng.randint(3, 1000, (B, S)).astype(np.int32),
        "text_mask": np.ones((B, S), np.int32),
        "sample_sizes": np.tile(np.array([H, W], np.float32), (B, 1)),
        "masks": np.zeros((T, B, 1, H, W), np.float32),
        "boxes": np.tile(np.array([0.5, 0.5, 0.3, 0.3], np.float32), (T, B, 1, 1)),
        "labels": np.zeros((B, 1), np.int32),
        "inst_valid": np.ones((B, 1), bool),
        "is_ref_inst_visible": np.ones((T, B, 1), bool),
        "referred_instance_idx": np.zeros((B,), np.int32),
    }
    batch["masks"][:, :, :, 100:260, 200:440] = 1.0
    batch = {k: jax.device_put(v) for k, v in batch.items()}

    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch["pixels"], batch["pad_mask"],
        batch["text_ids"], batch["text_mask"],
    )
    tx = build_optimizer(params, lr=1e-4, lr_backbone=1e-5, text_encoder_lr=5e-6)
    state = TrainState.create(apply_fn=model.apply, params=params, tx=tx)
    step = make_train_step(model, CriterionConfig())

    state, m = step(state, batch, jax.random.PRNGKey(0))
    _ = float(m["loss"])  # compile + warm
    # second PERTURBED warm step: the first non-memoized execution after
    # compile can be 3-5x slow on the tunneled runtime; keep it out of the
    # timing loop (same protocol as bench.py)
    b = dict(batch)
    b["pixels"] = batch["pixels"] + np.float32(0.5) * 1e-3
    state, m = step(state, b, jax.random.PRNGKey(999))
    _ = float(m["loss"])

    iters = int(os.environ.get("BENCH_ITERS", 5))
    times = []
    for i in range(iters):
        b = dict(batch)
        b["pixels"] = batch["pixels"] + np.float32(i + 1) * 1e-3
        t0 = time.perf_counter()
        state, m = step(state, b, jax.random.PRNGKey(i + 1))
        _ = float(m["loss"])
        times.append(time.perf_counter() - t0)
    # median per-step time: robust to transient host-load spikes
    dt = float(np.median(times))
    print(json.dumps({
        "metric": "ytvos_train_step_time_swin_t_8f_360x640_bf16",
        "value": round(dt, 4),
        "unit": f"sec/step (bs={B}/chip)",
        "per_sample_s": round(dt / B, 4),
        "samples_per_s": round(B / dt, 3),
        "remat": os.environ.get("BENCH_REMAT", "") == "1",
        "vs_baseline": None,
    }))


if __name__ == "__main__":
    main()
