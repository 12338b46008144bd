"""Separable relative-position bias == direct N^2 gather."""
import numpy as np
import jax.numpy as jnp

from neurips2023_soc_tpu.models.video_swin import (
    _np_rel_pos_index,
    _rel_pos_bias,
)


def test_separable_bias_matches_direct_gather():
    window = (4, 3, 5)
    H = 2
    table_len = (2 * 4 - 1) * (2 * 3 - 1) * (2 * 5 - 1)
    rng = np.random.RandomState(0)
    table = rng.randn(table_len, H).astype(np.float32)
    for N in (4 * 3 * 5, 30):  # full window and a clamped slice
        idx = _np_rel_pos_index(window)[:N, :N]
        want = table[idx.reshape(-1)].reshape(N, N, H).transpose(2, 0, 1)
        got = np.asarray(_rel_pos_bias(jnp.asarray(table), window, N))
        np.testing.assert_allclose(got, want, atol=0, rtol=0)
