"""Video Swin Transformer backbone, TPU-native flax implementation.

Behavioral twin of the reference (models/video_swin_transformer.py:19-808):
patch size (1,4,4) (no temporal downsampling -> per-frame features), window
(8,7,7) 3D shifted windows, 4 stages with PatchMerging between (applied
*after* collecting each stage's output, so all 4 stride-4/8/16/32 maps are
emitted). Window partition/rolls are pure reshapes/`jnp.roll` (XLA handles
these as layout ops); the shifted-window attention mask is a numpy constant
computed at trace time per static (T, H, W) bucket — the analog of the
reference's lru_cached `compute_mask` (models/video_swin_transformer.py:316).

Layout: channels-last throughout. Input (B, T, H, W, 3); outputs a list of 4
per-frame maps [(B*T, H/4, W/4, C), ..., (B*T, H/32, W/32, 8C)].
"""
from __future__ import annotations

import functools
from typing import Optional, Sequence, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

Window = Tuple[int, int, int]


@functools.lru_cache(maxsize=64)
def _np_window_region_ids(Dp: int, Hp: int, Wp: int, window: Window,
                          shift: Window) -> np.ndarray:
    """(nW, N) int32 region ids per shifted-window token. The (nW, N, N)
    additive mask is derived ON DEVICE from this small constant — embedding
    the full mask as an HLO literal is O(100 MB) at video scale and overflows
    the compiler's request limits."""
    img = np.zeros((Dp, Hp, Wp), np.int32)
    cnt = 0
    for d in (slice(-window[0]), slice(-window[0], -shift[0]), slice(-shift[0], None)):
        for h in (slice(-window[1]), slice(-window[1], -shift[1]), slice(-shift[1], None)):
            for w in (slice(-window[2]), slice(-window[2], -shift[2]), slice(-shift[2], None)):
                img[d, h, w] = cnt
                cnt += 1
    wd, wh, ww = window
    win = img.reshape(Dp // wd, wd, Hp // wh, wh, Wp // ww, ww)
    return np.ascontiguousarray(
        win.transpose(0, 2, 4, 1, 3, 5).reshape(-1, wd * wh * ww)
    )


def _attn_mask(Dp: int, Hp: int, Wp: int, window: Window, shift: Window):
    """(nW, N, N) additive mask (0 / -100)
    (reference models/video_swin_transformer.py:316-329). Small masks embed
    as constants (folded by XLA, fastest); large ones are built on device
    from the compact region-id constant so the HLO stays small."""
    ids_np = _np_window_region_ids(Dp, Hp, Wp, window, shift)
    nW, N = ids_np.shape
    if nW * N * N * 4 <= 8 << 20:  # 8 MB literal budget
        diff = ids_np[:, None, :] != ids_np[:, :, None]
        return jnp.asarray(np.where(diff, -100.0, 0.0).astype(np.float32))
    from ..ops.window_attention import mask_from_ids

    return mask_from_ids(jnp.asarray(ids_np))


@functools.lru_cache(maxsize=64)
def _np_rel_pos_index(window: Window) -> np.ndarray:
    """(N, N) index into the relative position bias table."""
    wd, wh, ww = window
    coords = np.stack(
        np.meshgrid(np.arange(wd), np.arange(wh), np.arange(ww), indexing="ij")
    ).reshape(3, -1)
    rel = coords[:, :, None] - coords[:, None, :]
    rel = rel.transpose(1, 2, 0)
    rel[:, :, 0] += wd - 1
    rel[:, :, 1] += wh - 1
    rel[:, :, 2] += ww - 1
    rel[:, :, 0] *= (2 * wh - 1) * (2 * ww - 1)
    rel[:, :, 1] *= 2 * ww - 1
    return rel.sum(-1)


@functools.lru_cache(maxsize=64)
def _np_axis_rel(n: int, size: int) -> np.ndarray:
    """(n, n) relative offsets along one window axis, shifted to [0, 2size-2]."""
    a = np.arange(n)
    return (a[:, None] - a[None, :] + size - 1).astype(np.int32)


@functools.lru_cache(maxsize=64)
def _np_axis_onehot(n: int, size: int) -> np.ndarray:
    """(n*n, 2*size-1) one-hot selector for one window axis's relative
    offsets — row (i*n+j) selects table entry (i - j + size - 1)."""
    idx = _np_axis_rel(n, size).reshape(-1)
    eye = np.zeros((idx.shape[0], 2 * size - 1), np.float32)
    eye[np.arange(idx.shape[0]), idx] = 1.0
    return eye


def _rel_pos_bias(bias_table: jnp.ndarray, window: Window, N: int) -> jnp.ndarray:
    """(H, N, N) relative-position bias built *separably*: three tiny one-hot
    matmuls along the d/h/w axes instead of one N^2-row gather per block
    (the direct gather costs ~1 ms/block at window (8,7,7) on v5e).

    One-hot dot_generals, not jnp.take: a take along a non-leading axis
    lowers on TPU to a serial while loop of dynamic-slice/dynamic-update-
    slice steps — the r5 swin-b inference profile showed 2x2.5 ms while
    loops + 4.7 ms of 49-step update-slice chains (~7% of the clip) from
    exactly these gathers. The selector matrices are tiny host constants
    ((n², 2n-1): at most 64x15 floats) and a one-hot f32 matmul is an exact
    selection (every non-selected product is exactly 0)."""
    wd, wh, ww = window
    H = bias_table.shape[-1]
    T = bias_table.reshape(2 * wd - 1, 2 * wh - 1, 2 * ww - 1, H)
    T = T.astype(jnp.float32)
    A = jnp.einsum("ps,stuh->ptuh", jnp.asarray(_np_axis_onehot(wd, wd)), T)
    B = jnp.einsum("qt,ptuh->pquh", jnp.asarray(_np_axis_onehot(wh, wh)), A)
    C = jnp.einsum("ru,pquh->pqrh", jnp.asarray(_np_axis_onehot(ww, ww)), B)
    C = C.reshape(wd, wd, wh, wh, ww, ww, H)
    bias = jnp.transpose(C, (0, 2, 4, 1, 3, 5, 6))
    n_full = wd * wh * ww
    bias = bias.reshape(n_full, n_full, H)[:N, :N]
    return jnp.transpose(bias, (2, 0, 1)).astype(bias_table.dtype)  # (H, N, N)


def _effective_window(size: Tuple[int, int, int], window: Window, shift: Window):
    """Clamp window to the input size; zero the shift where clamped
    (reference models/video_swin_transformer.py:71-84)."""
    win, sh = list(window), list(shift)
    for i in range(3):
        if size[i] <= window[i]:
            win[i] = size[i]
            sh[i] = 0
    return tuple(win), tuple(sh)


class WindowAttention3D(nn.Module):
    dim: int
    window: Window  # full configured window (bias table size)
    num_heads: int
    qkv_bias: bool = True
    attn_impl: str = "xla"  # 'pallas' -> fused ops.window_attention kernel
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, eff_window: Window,
                 mask: Optional[jnp.ndarray] = None,
                 region_ids: Optional[jnp.ndarray] = None) -> jnp.ndarray:
        """x: (B_, N, C) windows; mask: (nW, N, N) additive or None;
        region_ids: compact (nW, N) labels for the Pallas kernel (which
        rebuilds the mask in VMEM instead of streaming it from HBM)."""
        from ..ops.window_attention import window_attention

        B_, N, C = x.shape
        H = self.num_heads
        Dh = C // H
        table_len = (
            (2 * self.window[0] - 1)
            * (2 * self.window[1] - 1)
            * (2 * self.window[2] - 1)
        )
        bias_table = self.param(
            "relative_position_bias_table",
            nn.initializers.truncated_normal(0.02),
            (table_len, H),
            jnp.float32,
        )
        qkv = nn.Dense(3 * C, use_bias=self.qkv_bias, dtype=self.dtype,
                       name="qkv")(x)
        # keeping q/k/v in the natural (B_, N, H, Dh) layout (einsum
        # contracting d directly) was A/B'd in r5 and is a WASH: XLA's
        # layout assignment canonicalizes both graphs to the same 182.9 ms
        # clip — the hoisted layout stays for the Pallas path's benefit
        qkv = qkv.reshape(B_, N, 3, H, Dh).transpose(2, 0, 3, 1, 4)
        q, k, v = qkv[0], qkv[1], qkv[2]  # (B_, H, N, Dh)

        # relative position bias; when the window is clamped the reference
        # indexes the full-window table with index[:N, :N] — same here.
        bias = _rel_pos_bias(bias_table, self.window, N)  # (H, N, N)

        out = window_attention(q, k, v, bias, mask, ids=region_ids,
                               impl=self.attn_impl)
        out = out.astype(self.dtype)
        out = out.transpose(0, 2, 1, 3).reshape(B_, N, C)
        return nn.Dense(C, dtype=self.dtype, name="proj")(out)


class SwinBlock3D(nn.Module):
    dim: int
    num_heads: int
    window: Window
    shift: Window
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path: float = 0.0
    attn_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, deterministic: bool = True) -> jnp.ndarray:
        """x: (B, D, H, W, C)."""
        B, D, H, W, C = x.shape
        window, shift = _effective_window((D, H, W), self.window, self.shift)

        shortcut = x
        x = nn.LayerNorm(dtype=self.dtype, name="norm1")(x)
        pad_d = (-D) % window[0]
        pad_h = (-H) % window[1]
        pad_w = (-W) % window[2]
        x = jnp.pad(x, ((0, 0), (0, pad_d), (0, pad_h), (0, pad_w), (0, 0)))
        Dp, Hp, Wp = D + pad_d, H + pad_h, W + pad_w

        region_ids = None
        if any(s > 0 for s in shift):
            x = jnp.roll(x, (-shift[0], -shift[1], -shift[2]), axis=(1, 2, 3))
            if self.attn_impl == "pallas":
                # the fused kernel rebuilds the mask in VMEM from the compact
                # labels; never materialize the (nW, N, N) mask in HBM
                mask = None
                region_ids = jnp.asarray(
                    _np_window_region_ids(Dp, Hp, Wp, window, shift))
            else:
                mask = _attn_mask(Dp, Hp, Wp, window, shift)
        else:
            mask = None

        wd, wh, ww = window
        nwd, nwh, nww = Dp // wd, Hp // wh, Wp // ww
        xw = x.reshape(B, nwd, wd, nwh, wh, nww, ww, C)
        xw = xw.transpose(0, 1, 3, 5, 2, 4, 6, 7).reshape(-1, wd * wh * ww, C)

        xw = WindowAttention3D(
            self.dim, self.window, self.num_heads, self.qkv_bias,
            attn_impl=self.attn_impl, dtype=self.dtype, name="attn",
        )(xw, window, mask, region_ids)

        x = xw.reshape(B, nwd, nwh, nww, wd, wh, ww, C)
        x = x.transpose(0, 1, 4, 2, 5, 3, 6, 7).reshape(B, Dp, Hp, Wp, C)
        if any(s > 0 for s in shift):
            x = jnp.roll(x, (shift[0], shift[1], shift[2]), axis=(1, 2, 3))
        x = x[:, :D, :H, :W]

        x = shortcut + self._drop_path(x, deterministic)
        h = nn.LayerNorm(dtype=self.dtype, name="norm2")(x)
        h = nn.Dense(int(C * self.mlp_ratio), dtype=self.dtype, name="mlp_fc1")(h)
        h = nn.gelu(h, approximate=False)
        h = nn.Dense(C, dtype=self.dtype, name="mlp_fc2")(h)
        return x + self._drop_path(h, deterministic)

    def _drop_path(self, x: jnp.ndarray, deterministic: bool) -> jnp.ndarray:
        if self.drop_path == 0.0 or deterministic:
            return x
        keep = 1.0 - self.drop_path
        rng = self.make_rng("dropout")
        shape = (x.shape[0],) + (1,) * (x.ndim - 1)
        mask = jax.random.bernoulli(rng, keep, shape)
        return jnp.where(mask, x / keep, 0.0)


class PatchMerging(nn.Module):
    dim: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """x: (B, D, H, W, C) -> (B, D, H/2, W/2, 2C)."""
        B, D, H, W, C = x.shape
        x = jnp.pad(x, ((0, 0), (0, 0), (0, H % 2), (0, W % 2), (0, 0)))
        x0 = x[:, :, 0::2, 0::2]
        x1 = x[:, :, 1::2, 0::2]
        x2 = x[:, :, 0::2, 1::2]
        x3 = x[:, :, 1::2, 1::2]
        x = jnp.concatenate([x0, x1, x2, x3], -1)
        x = nn.LayerNorm(dtype=self.dtype, name="norm")(x)
        return nn.Dense(2 * self.dim, use_bias=False, dtype=self.dtype,
                        name="reduction")(x)


class VideoSwinBackbone(nn.Module):
    """4-stage Video Swin emitting all four per-frame feature levels."""

    patch_size: Window = (1, 4, 4)
    embed_dim: int = 96
    depths: Sequence[int] = (2, 2, 6, 2)
    num_heads: Sequence[int] = (3, 6, 12, 24)
    window: Window = (8, 7, 7)
    mlp_ratio: float = 4.0
    qkv_bias: bool = True
    drop_path_rate: float = 0.2
    patch_norm: bool = True
    # 2D Swin (reference models/swin_transformer.py:611-615) LayerNorms each
    # stage's output before emitting it; Video Swin does not.
    out_norms: bool = False
    use_remat: bool = False
    attn_impl: str = "xla"
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, video: jnp.ndarray, deterministic: bool = True):
        """video: (B, T, H, W, 3) -> list of 4 maps (B*T, Hi, Wi, Ci)."""
        B, T, H, W, _ = video.shape
        pd, ph, pw = self.patch_size
        video = jnp.pad(
            video,
            ((0, 0), (0, (-T) % pd), (0, (-H) % ph), (0, (-W) % pw), (0, 0)),
        )
        x = nn.Conv(
            self.embed_dim,
            kernel_size=self.patch_size,
            strides=self.patch_size,
            dtype=self.dtype,
            name="patch_embed",
        )(video)  # (B, T, H/4, W/4, C)
        if self.patch_norm:
            x = nn.LayerNorm(dtype=self.dtype, name="patch_norm")(x)

        dpr = np.linspace(0, self.drop_path_rate, sum(self.depths))
        outs = []
        block_idx = 0
        dim = self.embed_dim
        # jax.checkpoint over each block trades FLOPs for HBM when training
        # (the reference's use_checkpoint flag, video_swin_transformer.py:263).
        block_cls = (
            nn.remat(SwinBlock3D, static_argnums=(2,)) if self.use_remat
            else SwinBlock3D
        )
        for stage, depth in enumerate(self.depths):
            shift = tuple(w // 2 for w in self.window)
            for i in range(depth):
                x = block_cls(
                    dim=dim,
                    num_heads=self.num_heads[stage],
                    window=self.window,
                    shift=(0, 0, 0) if i % 2 == 0 else shift,
                    mlp_ratio=self.mlp_ratio,
                    qkv_bias=self.qkv_bias,
                    drop_path=float(dpr[block_idx]),
                    attn_impl=self.attn_impl,
                    dtype=self.dtype,
                    name=f"layers_{stage}_blocks_{i}",
                )(x, deterministic)
                block_idx += 1
            # collect the pre-downsample output of this stage, per frame
            y = x
            if self.out_norms:
                y = nn.LayerNorm(dtype=self.dtype, name=f"out_norm_{stage}")(y)
            Bc, Tc, Hc, Wc, Cc = y.shape
            outs.append(y.reshape(Bc * Tc, Hc, Wc, Cc))
            if stage < len(self.depths) - 1:
                x = PatchMerging(dim, dtype=self.dtype,
                                 name=f"layers_{stage}_downsample")(x)
                dim *= 2
        return outs


SWIN_CONFIGS = {
    "video-swin-t": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24)),
    "video-swin-s": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24)),
    "video-swin-b": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32)),
    # 2D image Swin (reference models/swin_transformer.py:688-744): the same
    # machinery with temporal window 1 — each frame attends independently, the
    # relative-position table collapses to the 2D (13*13, H) one — plus
    # per-stage output LayerNorms. The reference never wires these into SOC
    # (models/soc.py:42-45 accepts only video-swin/resnet); here any swin-*
    # name is usable end-to-end.
    "swin-t": dict(embed_dim=96, depths=(2, 2, 6, 2), num_heads=(3, 6, 12, 24),
                   window=(1, 7, 7), out_norms=True, drop_path_rate=0.2),
    "swin-s": dict(embed_dim=96, depths=(2, 2, 18, 2), num_heads=(3, 6, 12, 24),
                   window=(1, 7, 7), out_norms=True, drop_path_rate=0.2),
    "swin-b": dict(embed_dim=128, depths=(2, 2, 18, 2), num_heads=(4, 8, 16, 32),
                   window=(1, 7, 7), out_norms=True, drop_path_rate=0.3),
    "swin-l": dict(embed_dim=192, depths=(2, 2, 18, 2), num_heads=(6, 12, 24, 48),
                   window=(1, 7, 7), out_norms=True, drop_path_rate=0.3),
}


def build_video_swin(name: str, use_remat: bool = False,
                     attn_impl: str = "xla",
                     dtype: jnp.dtype = jnp.float32) -> VideoSwinBackbone:
    cfg = dict(SWIN_CONFIGS[name])
    return VideoSwinBackbone(
        patch_size=(1, 4, 4),
        window=cfg.pop("window", (8, 7, 7)),
        drop_path_rate=cfg.pop("drop_path_rate", 0.2),
        out_norms=cfg.pop("out_norms", False),
        patch_norm=True,
        use_remat=use_remat,
        attn_impl=attn_impl,
        dtype=dtype,
        **cfg,
    )
