"""FPN spatial decoder + CondInst-style dynamic mask head.

FPN: reference models/segmentation.py:11-77. Mask head: reference
models/soc.py:399-549 — the reference executes the per-query 1x1 conv net as a
grouped F.conv2d; on TPU we run it as batched einsums over the clip so the MXU
sees one large contraction per layer (the batched-over-clip fusion the
north-star asks for).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import flax.linen as nn
import jax.numpy as jnp

from ..ops import aligned_bilinear, resize_nearest


class FPNSpatialDecoder(nn.Module):
    """Top-down FPN over encoder memory (+ stride-4 backbone feature)."""

    context_dim: int
    fpn_dims: Sequence[int]  # adapter input channels, high->low res order
    mask_kernels_dim: int = 8
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, layer_features: List[jnp.ndarray]):
        # x: (B, H, W, C) coarsest memory; layer_features: finer maps
        cd = self.context_dim
        inter = [cd, cd // 2, cd // 4, cd // 8, cd // 16]

        def conv_gn_relu(y, out_ch, idx):
            y = nn.Conv(out_ch, (3, 3), padding=1, dtype=self.dtype,
                        name=f"lay{idx}")(y)
            y = nn.GroupNorm(num_groups=min(8, out_ch), dtype=self.dtype,
                             name=f"gn{idx}")(y)
            return nn.relu(y)

        x = conv_gn_relu(x, inter[0], 1)
        x = conv_gn_relu(x, inter[1], 2)

        cur = nn.Conv(inter[1], (1, 1), dtype=self.dtype, name="adapter1")(
            layer_features[0]
        )
        x = cur + resize_nearest(x, cur.shape[-3], cur.shape[-2])
        x = conv_gn_relu(x, inter[2], 3)

        cur = nn.Conv(inter[2], (1, 1), dtype=self.dtype, name="adapter2")(
            layer_features[1]
        )
        x = cur + resize_nearest(x, cur.shape[-3], cur.shape[-2])
        x = conv_gn_relu(x, inter[3], 4)

        if len(self.fpn_dims) == 3:
            cur = nn.Conv(inter[3], (1, 1), dtype=self.dtype, name="adapter3")(
                layer_features[2]
            )
            x = cur + resize_nearest(x, cur.shape[-3], cur.shape[-2])
            x = conv_gn_relu(x, inter[4], 5)

        return nn.Conv(self.mask_kernels_dim, (3, 3), padding=1,
                       dtype=self.dtype, name="out_lay")(x)


def mask_head_param_split(
    in_channels: int, channels: int, num_layers: int, rel_coord: bool
) -> Tuple[Tuple[int, ...], Tuple[int, ...]]:
    """Per-layer weight/bias sizes of the dynamic conv net
    (reference models/soc.py:136-153)."""
    weight_nums, bias_nums = [], []
    for l in range(num_layers):
        if l == 0:
            cin = in_channels + 2 if rel_coord else in_channels
            weight_nums.append(cin * channels)
            bias_nums.append(channels)
        elif l == num_layers - 1:
            weight_nums.append(channels * 1)
            bias_nums.append(1)
        else:
            weight_nums.append(channels * channels)
            bias_nums.append(channels)
    return tuple(weight_nums), tuple(bias_nums)


def compute_locations(h: int, w: int, stride: int) -> jnp.ndarray:
    """Pixel-center locations of a stride-s feature map in image coords
    (reference models/soc.py:536-549). Returns (h, w, 2) xy."""
    sx = jnp.arange(w, dtype=jnp.float32) * stride + stride // 2
    sy = jnp.arange(h, dtype=jnp.float32) * stride + stride // 2
    x = jnp.broadcast_to(sx[None, :], (h, w))
    y = jnp.broadcast_to(sy[:, None], (h, w))
    return jnp.stack([x, y], axis=-1)


def dynamic_mask_with_coords(
    mask_features: jnp.ndarray,  # (B, T, H, W, Cm)
    mask_head_params: jnp.ndarray,  # (B, T*Nq, num_params)
    reference_points: jnp.ndarray,  # (B, T*Nq, 2) cxcy normalized [0,1]
    image_size: Tuple[int, int] | jnp.ndarray,  # (img_h, img_w) model-input size
    channels: int,
    num_layers: int,
    rel_coord: bool = True,
    mask_feat_stride: int = 4,
    mask_out_stride: int = 4,
) -> jnp.ndarray:
    """Run the per-query dynamic conv net over the clip as fused einsums.

    Returns mask logits (B, T*Nq, H_out, W_out). Everything is computed in
    float32 (8-channel maps are VPU work, not MXU).
    """
    B, T, H, W, Cm = mask_features.shape
    nq_total = mask_head_params.shape[1]
    Q = nq_total // T

    mf = mask_features.astype(jnp.float32)
    params = mask_head_params.astype(jnp.float32)

    if rel_coord:
        if isinstance(image_size, tuple):
            img_h, img_w = image_size
            scale = jnp.asarray([img_w, img_h], dtype=jnp.float32)
        else:
            scale = jnp.stack(
                [image_size[..., 1], image_size[..., 0]], axis=-1
            ).astype(jnp.float32)  # (B, 2) or (2,)
            if scale.ndim == 1:
                scale = scale[None]
            scale = scale[:, None, :]  # (B, 1, 2)
        ref = reference_points.astype(jnp.float32) * scale  # (B, T*Nq, 2) image px
        ref = ref.reshape(B, T, Q, 2)
        locs = compute_locations(H, W, mask_feat_stride)  # (H, W, 2)
        rel = ref[:, :, :, None, None, :] - locs[None, None, None]  # (B,T,Q,H,W,2)
        x = jnp.concatenate(
            [
                jnp.broadcast_to(mf[:, :, None], (B, T, Q, H, W, Cm)),
                rel,
            ],
            axis=-1,
        )  # (B, T, Q, H, W, Cm+2)
    else:
        x = jnp.broadcast_to(mf[:, :, None], (B, T, Q, H, W, Cm))

    # split params into per-layer weights/biases
    weight_nums, bias_nums = mask_head_param_split(Cm, channels, num_layers, rel_coord)
    p = params.reshape(B, T, Q, -1)
    offset = 0
    weights, biases = [], []
    for n in weight_nums:
        weights.append(p[..., offset : offset + n])
        offset += n
    for n in bias_nums:
        biases.append(p[..., offset : offset + n])
        offset += n

    cin = Cm + 2 if rel_coord else Cm
    for l in range(num_layers):
        cout = 1 if l == num_layers - 1 else channels
        wl = weights[l].reshape(B, T, Q, cout, cin)
        bl = biases[l].reshape(B, T, Q, cout)
        x = jnp.einsum("btqhwc,btqoc->btqhwo", x, wl) + bl[:, :, :, None, None, :]
        if l < num_layers - 1:
            x = nn.relu(x)
        cin = cout

    logits = x[..., 0]  # (B, T, Q, H, W)
    factor = mask_feat_stride // mask_out_stride
    if factor > 1:
        logits = aligned_bilinear(logits[..., None], factor)[..., 0]
    return logits.reshape(B, T * Q, logits.shape[-2], logits.shape[-1])
