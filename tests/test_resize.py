"""Parity of torch-exact resize ops vs torch.nn.functional (CPU torch as oracle)."""
import numpy as np
import pytest
import torch
import torch.nn.functional as F

from neurips2023_soc_tpu.ops import (
    aligned_bilinear,
    resize_bilinear,
    resize_nearest,
)


def _rand(b, h, w, c, seed=0):
    rng = np.random.RandomState(seed)
    return rng.randn(b, h, w, c).astype(np.float32)


SIZES = [((7, 9), (14, 18)), ((16, 24), (5, 11)), ((10, 10), (33, 7))]


@pytest.mark.parametrize("in_size,out_size", SIZES)
def test_nearest(in_size, out_size):
    x = _rand(2, *in_size, 3)
    got = np.asarray(resize_nearest(x, *out_size))
    want = (
        F.interpolate(torch.from_numpy(x).permute(0, 3, 1, 2), size=out_size, mode="nearest")
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=0, rtol=0)


@pytest.mark.parametrize("in_size,out_size", SIZES)
@pytest.mark.parametrize("align", [False, True])
def test_bilinear(in_size, out_size, align):
    x = _rand(2, *in_size, 3, seed=1)
    got = np.asarray(resize_bilinear(x, *out_size, align_corners=align))
    want = (
        F.interpolate(
            torch.from_numpy(x).permute(0, 3, 1, 2),
            size=out_size,
            mode="bilinear",
            align_corners=align,
        )
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)


def _torch_aligned_bilinear(tensor, factor):
    # Same public CondInst recipe the reference uses (models/soc.py:511-533),
    # restated here as the test oracle.
    h, w = tensor.shape[2:]
    tensor = F.pad(tensor, pad=(0, 1, 0, 1), mode="replicate")
    oh, ow = factor * h + 1, factor * w + 1
    tensor = F.interpolate(tensor, size=(oh, ow), mode="bilinear", align_corners=True)
    tensor = F.pad(tensor, pad=(factor // 2, 0, factor // 2, 0), mode="replicate")
    return tensor[:, :, : oh - 1, : ow - 1]


@pytest.mark.parametrize("factor", [1, 2, 4])
def test_aligned_bilinear(factor):
    x = _rand(2, 9, 13, 4, seed=2)
    got = np.asarray(aligned_bilinear(x, factor))
    want = (
        _torch_aligned_bilinear(torch.from_numpy(x).permute(0, 3, 1, 2), factor)
        .permute(0, 2, 3, 1)
        .numpy()
    )
    np.testing.assert_allclose(got, want, atol=1e-5, rtol=1e-5)
