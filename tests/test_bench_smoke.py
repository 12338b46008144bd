"""bench.py measurement functions driven end-to-end on a tiny model (CPU):
the driver runs bench.py on the real chip each round — its logic must never
be the thing that breaks there."""
import sys
from pathlib import Path

import numpy as np
import pytest

import jax

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import bench  # noqa: E402
from neurips2023_soc_tpu.models.soc import SOC  # noqa: E402


@pytest.fixture(scope="module")
def tiny():
    model = SOC(
        backbone_name="video-swin-t", d_model=64, num_queries=5,
        dim_feedforward=128, enc_layers=1, dec_layers=2,
        voc_enc_layers=1, voc_dec_layers=1, text_encoder_type="roberta-tiny",
        dropout=0.0,
    )
    px = np.zeros((4, 1, 48, 64, 3), np.float32)
    pad = np.zeros((4, 1, 48, 64), bool)
    ids = np.ones((1, 8), np.int32)
    msk = np.ones((1, 8), np.int32)
    params = jax.jit(model.init)(jax.random.PRNGKey(0), px, pad, ids, msk)
    return model, params


def test_measure_engine_smoke(tiny):
    model, params = tiny
    r = bench.measure_engine(model, params, T=4, n_videos=3, H=48, W=64,
                             text_encoder_type="roberta-tiny", text_bucket=8)
    assert r["pipelined"] > 0 and r["sync_per_call"] > 0


def test_measure_engine_multi_expression_smoke(tiny):
    model, params = tiny
    r = bench.measure_engine(model, params, T=4, n_videos=2, expressions=3,
                             H=48, W=64, text_encoder_type="roberta-tiny",
                             text_bucket=8)
    assert r["pipelined"] > 0


def test_measure_proxy_smoke(tiny):
    model, params = tiny
    r = bench.measure_proxy(model, params, T=4, iters=2, H=48, W=64, S=8)
    assert r["pipelined"] > 0 and r["sync_per_call"] > 0
