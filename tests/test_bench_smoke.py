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


def test_probe_link_smoke():
    """The in-session link probe (r5 self-calibration) must always produce
    finite positive numbers — the driver bench leads with rooflines built
    from it."""
    r = bench.probe_link(mb=1, repeats=2)
    assert r["rtt_ms"] > 0 and np.isfinite(r["rtt_ms"])
    assert r["upload_mb_s"] > 0 and np.isfinite(r["upload_mb_s"])
    assert r["upload_mb_s_spread"][0] <= r["upload_mb_s_spread"][1]


def test_engine_roofline_math():
    """Roofline formulas (BENCH_NOTES.md metric definitions): link-bound when
    transfer dominates, device-bound when the chip is slower than the link."""
    link = {"upload_mb_s": 23.0, "rtt_ms": 50.0}
    proxy = {"pipelined": 81.5, "sync_per_call": 71.0}
    u8 = bench.engine_roofline("uint8", 16, 360, 640, link, proxy)
    # 16*360*640*3 B + 16*360*640/8 B = 11.52 MB -> ~0.5 s -> ~32 fps,
    # link-bound (device time 16/81.5 = 0.196 s)
    assert 28 < u8["pipelined_fps"] < 36
    assert u8["sync_fps"] < u8["pipelined_fps"]
    yv = bench.engine_roofline("yuv420", 16, 360, 640, link, proxy)
    assert yv["pipelined_fps"] > u8["pipelined_fps"]  # half the pixel bytes
    # a fat link makes the device the bound: roofline == proxy pipelined
    fat = bench.engine_roofline("uint8", 16, 360, 640,
                                {"upload_mb_s": 1e5}, proxy)
    assert abs(fat["pipelined_fps"] - proxy["pipelined"]) < 1e-6


def test_measure_engine_collects_inrun_probes(tiny, monkeypatch):
    """In-run calibration (r5): measure_engine probes the link between its
    own timed phases — after the sync loop and after each of the 3 pipelined
    rounds — so the roofline can divide by the link that existed DURING the
    run. Probes must never land inside a timed phase (fps would drop)."""
    model, params = tiny
    readings = iter([21.0, 19.5, 18.0, 17.5, 99.0])

    def fake_probe(mb=4, repeats=1):
        return {"upload_mb_s": next(readings), "rtt_ms": 50.0,
                "upload_mb_s_spread": [1.0, 1.0]}

    monkeypatch.setattr(bench, "probe_link", fake_probe)
    r = bench.measure_engine(model, params, T=4, n_videos=3, H=48, W=64,
                             text_encoder_type="roberta-tiny", text_bucket=8)
    assert r["inrun_link_mb_s"] == [21.0, 19.5, 18.0, 17.5]

    monkeypatch.setenv("BENCH_INRUN_PROBES", "0")
    r = bench.measure_engine(model, params, T=4, n_videos=3, H=48, W=64,
                             text_encoder_type="roberta-tiny", text_bucket=8)
    assert "inrun_link_mb_s" not in r


def test_inrun_roofline_is_contention_immune():
    """The vs_roofline_inrun construction: a link that halves between the
    pre/post probes and the run keeps the in-run quality ratio at ~1 for a
    perfect engine, while vs_roofline (against the best probe) collapses —
    exactly the r5 contended-capture failure mode, now self-explaining."""
    proxy = {"pipelined": 81.5, "sync_per_call": 71.0}
    best = {"upload_mb_s": 23.0}
    inrun_bw = 11.5  # the link the engine actually got
    roof_best = bench.engine_roofline("uint8", 16, 360, 640, best, proxy)
    roof_in = bench.engine_roofline("uint8", 16, 360, 640,
                                    {"upload_mb_s": inrun_bw}, proxy)
    engine_fps = roof_in["pipelined_fps"]  # a perfect engine on that link
    assert engine_fps / roof_best["pipelined_fps"] < 0.55  # reads as broken
    assert abs(engine_fps / roof_in["pipelined_fps"] - 1.0) < 1e-9
    # and the divergence itself is the contention signal main() flags
    assert inrun_bw < 0.7 * best["upload_mb_s"]


def test_measure_engine_checked_retries_inversion(monkeypatch):
    """pipelined<sync is impossible on an idle link (it burned the r4 driver
    capture): the checked wrapper retries once and flags a persisting
    inversion as contended."""
    calls = []

    def fake_measure(*a, **k):
        calls.append(1)
        # first call inverted, retry healthy
        if len(calls) == 1:
            return {"pipelined": 10.0, "sync_per_call": 12.0}
        return {"pipelined": 20.0, "sync_per_call": 12.0}

    monkeypatch.setattr(bench, "measure_engine", fake_measure)
    r = bench.measure_engine_checked()
    assert len(calls) == 2
    assert r["pipelined"] == 20.0
    assert r["retried_after_inversion"] and not r["inverted"]

    calls.clear()

    def always_inverted(*a, **k):
        calls.append(1)
        return {"pipelined": 10.0, "sync_per_call": 12.0}

    monkeypatch.setattr(bench, "measure_engine", always_inverted)
    r = bench.measure_engine_checked()
    assert len(calls) == 2 and r["inverted"]
