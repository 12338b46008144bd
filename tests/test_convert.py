"""Torch->flax converter coverage test: every flax param must map to a torch
key; converting a synthesized state_dict must fill the tree exactly."""
import numpy as np
import jax
import pytest

from neurips2023_soc_tpu.models.soc import SOC
from neurips2023_soc_tpu.training.convert import (
    convert_torch_state_dict,
    flax_to_torch,
)


@pytest.fixture(scope="module")
def tiny_params():
    model = SOC(
        backbone_name="video-swin-t", d_model=64, num_queries=5,
        dim_feedforward=128, enc_layers=2, dec_layers=2,
        voc_enc_layers=1, voc_dec_layers=2, text_encoder_type="roberta-tiny",
    )
    pixels = np.zeros((2, 1, 32, 32, 3), np.float32)
    pad = np.zeros((2, 1, 32, 32), bool)
    ids = np.ones((1, 4), np.int32)
    msk = np.ones((1, 4), np.int32)
    return model.init(jax.random.PRNGKey(0), pixels, pad, ids, msk)


def _flat_paths(params):
    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    out = []
    for kp, leaf in flat:
        keys = tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in kp)
        out.append((keys[1:] if keys[0] == "params" else keys, leaf))
    return out


def test_every_param_maps(tiny_params):
    unmapped = []
    for path, leaf in _flat_paths(tiny_params):
        if flax_to_torch(path) is None:
            unmapped.append("/".join(path))
    assert unmapped == [], f"unmapped params: {unmapped[:20]}"


def test_roundtrip_conversion_fills_everything(tiny_params):
    # synthesize a torch state dict with the right (inverse-transformed) shapes
    from neurips2023_soc_tpu.training.convert import TRANSFORMS

    inverse_shape = {
        "linear": lambda s: s[::-1],
        "conv": lambda s: (s[3], s[2], s[0], s[1]),
        "conv3d": lambda s: (s[4], s[3], s[0], s[1], s[2]),
        "copy": lambda s: s,
    }
    rng = np.random.RandomState(0)
    sd = {}
    for path, leaf in _flat_paths(tiny_params):
        tkey, kind = flax_to_torch(path)
        sd[tkey] = rng.randn(*inverse_shape[kind](np.shape(leaf))).astype(np.float32)

    new_params, report = convert_torch_state_dict(sd, tiny_params)
    assert report["missing"] == []
    assert report["unused"] == []
    # converted values actually landed (differ from the random init)
    for (path, old), (_, new) in zip(
        _flat_paths(tiny_params), _flat_paths(new_params)
    ):
        tkey, kind = flax_to_torch(path)
        want = TRANSFORMS[kind](sd[tkey])
        np.testing.assert_allclose(np.asarray(new), want, atol=1e-6)
