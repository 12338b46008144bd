"""ResNet-50 backbone with frozen BatchNorm (reference models/backbone.py:20-101).

FrozenBatchNorm keeps affine+stats as constants folded at runtime; the
parameters live under names containing 'frozen_bn' so the trainer's
optimizer mask excludes them from updates (matching torch buffers).
Outputs 4 per-frame maps at strides 4/8/16/32 with channels 256/512/1024/2048.
"""
from __future__ import annotations

from typing import Sequence

import flax.linen as nn
import jax.numpy as jnp


class FrozenBN(nn.Module):
    features: int
    eps: float = 1e-5
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        scale = self.param("frozen_bn_scale", nn.initializers.ones,
                           (self.features,), jnp.float32)
        bias = self.param("frozen_bn_bias", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        mean = self.param("frozen_bn_mean", nn.initializers.zeros,
                          (self.features,), jnp.float32)
        var = self.param("frozen_bn_var", nn.initializers.ones,
                         (self.features,), jnp.float32)
        w = (scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        b = (bias - mean * scale / jnp.sqrt(var + self.eps)).astype(self.dtype)
        return x * w + b


class Bottleneck(nn.Module):
    features: int
    strides: int = 1
    downsample: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        residual = x
        y = nn.Conv(self.features, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv1")(x)
        y = FrozenBN(self.features, dtype=self.dtype, name="bn1")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features, (3, 3), strides=self.strides, padding=1,
                    use_bias=False, dtype=self.dtype, name="conv2")(y)
        y = FrozenBN(self.features, dtype=self.dtype, name="bn2")(y)
        y = nn.relu(y)
        y = nn.Conv(self.features * 4, (1, 1), use_bias=False, dtype=self.dtype,
                    name="conv3")(y)
        y = FrozenBN(self.features * 4, dtype=self.dtype, name="bn3")(y)
        if self.downsample:
            residual = nn.Conv(self.features * 4, (1, 1), strides=self.strides,
                               use_bias=False, dtype=self.dtype,
                               name="downsample_conv")(x)
            residual = FrozenBN(self.features * 4, dtype=self.dtype,
                                name="downsample_bn")(residual)
        return nn.relu(y + residual)


class ResNet50Backbone(nn.Module):
    dtype: jnp.dtype = jnp.float32
    layer_sizes: Sequence[int] = (3, 4, 6, 3)

    @nn.compact
    def __call__(self, video: jnp.ndarray, deterministic: bool = True):
        """video: (B, T, H, W, 3) -> 4 per-frame maps (B*T, Hi, Wi, Ci)."""
        B, T, H, W, _ = video.shape
        x = video.reshape(B * T, H, W, 3).astype(self.dtype)
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    dtype=self.dtype, name="conv1")(x)
        x = FrozenBN(64, dtype=self.dtype, name="bn1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))

        outs = []
        features = 64
        for stage, blocks in enumerate(self.layer_sizes):
            strides = 1 if stage == 0 else 2
            for i in range(blocks):
                x = Bottleneck(
                    features,
                    strides=strides if i == 0 else 1,
                    downsample=(i == 0),
                    dtype=self.dtype,
                    name=f"layer{stage + 1}_{i}",
                )(x)
            outs.append(x)
            features *= 2
        return outs
