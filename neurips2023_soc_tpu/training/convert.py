"""Torch checkpoint -> flax params converter.

The released SOC model zoo (reference README.md:108-119) ships `.pth.tar`
torch checkpoints; this module maps them onto our flax parameter tree so the
TPU build can hit the parity targets in BASELINE.md. The mapping is defined
as a function from each *flax* parameter path to the corresponding torch
state_dict key + layout transform, so coverage is checkable in both
directions.

Layout transforms:
  linear   : torch (out, in)            -> flax kernel (in, out)
  conv     : torch (out, in, kh, kw)    -> flax (kh, kw, in, out)
  conv3d   : torch (out, in, kd, kh, kw)-> flax (kd, kh, kw, in, out)
  copy     : identical layout (biases, tables, embeddings, norms)
"""
from __future__ import annotations

import re
from typing import Dict, Optional, Tuple

import numpy as np


def _t(x):
    return np.ascontiguousarray(np.transpose(x))


def _conv(x):  # (O, I, kh, kw) -> (kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(x, (2, 3, 1, 0)))


def _conv3d(x):  # (O, I, kd, kh, kw) -> (kd, kh, kw, I, O)
    return np.ascontiguousarray(np.transpose(x, (2, 3, 4, 1, 0)))


TRANSFORMS = {
    "linear": _t,
    "conv": _conv,
    "conv3d": _conv3d,
    "copy": lambda x: np.asarray(x),
}


def flax_to_torch(path: Tuple[str, ...]) -> Optional[Tuple[str, str]]:
    """Map a flax param path (under 'params') to (torch_key, transform kind).

    Returns None when the parameter has no torch counterpart.
    """
    p = "/".join(path)
    leaf = path[-1]

    def lin(torch_prefix):
        if leaf == "kernel":
            return torch_prefix + ".weight", "linear"
        return torch_prefix + ".bias", "copy"

    def norm(torch_prefix):
        if leaf == "scale":
            return torch_prefix + ".weight", "copy"
        return torch_prefix + ".bias", "copy"

    def mha(torch_prefix):
        if leaf == "in_proj_kernel":
            return torch_prefix + ".in_proj_weight", "linear"
        if leaf == "in_proj_bias":
            return torch_prefix + ".in_proj_bias", "copy"
        return None

    # ---------------- backbone: video swin ----------------
    m = re.match(r"backbone/(.*)", p)
    if m:
        rest = m.group(1)
        bb = "backbone.0.body."
        if rest.startswith("patch_embed/"):
            if leaf == "kernel":
                return bb + "patch_embed.proj.weight", "conv3d"
            return bb + "patch_embed.proj.bias", "copy"
        if rest.startswith("patch_norm/"):
            return norm(bb + "patch_embed.norm")
        m2 = re.match(r"layers_(\d+)_blocks_(\d+)/(.*)", rest)
        if m2:
            s, i, sub = m2.groups()
            tp = f"{bb}layers.{s}.blocks.{i}."
            if sub.startswith("norm1/"):
                return norm(tp + "norm1")
            if sub.startswith("norm2/"):
                return norm(tp + "norm2")
            if sub.startswith("attn/qkv/"):
                return lin(tp + "attn.qkv")
            if sub.startswith("attn/proj/"):
                return lin(tp + "attn.proj")
            if sub == "attn/relative_position_bias_table":
                return tp + "attn.relative_position_bias_table", "copy"
            if sub.startswith("mlp_fc1/"):
                return lin(tp + "mlp.fc1")
            if sub.startswith("mlp_fc2/"):
                return lin(tp + "mlp.fc2")
        m2 = re.match(r"layers_(\d+)_downsample/(.*)", rest)
        if m2:
            s, sub = m2.groups()
            tp = f"{bb}downsamples.{s}."
            if sub.startswith("norm/"):
                return norm(tp + "norm")
            if sub.startswith("reduction/"):
                return lin(tp + "reduction")
        # 2D Swin per-stage output norms (reference swin_transformer.py:527,
        # 611-615: self.norm{i} applied to each out level)
        m2 = re.match(r"out_norm_(\d+)/", rest)
        if m2:
            return norm(f"{bb}norm{m2.group(1)}")
        return None

    # ---------------- text encoder: roberta ----------------
    m = re.match(r"text_encoder/(.*)", p)
    if m:
        rest = m.group(1)
        te = "text_encoder."
        emb = te + "embeddings."
        if rest.startswith("word_embeddings/"):
            return emb + "word_embeddings.weight", "copy"
        if rest.startswith("position_embeddings/"):
            return emb + "position_embeddings.weight", "copy"
        if rest.startswith("token_type_embeddings/"):
            return emb + "token_type_embeddings.weight", "copy"
        if rest.startswith("emb_ln/"):
            return norm(emb + "LayerNorm")
        m2 = re.match(r"layer_(\d+)_(q|k|v|attn_out|attn_ln|inter|out|out_ln)/(.*)", rest)
        if m2:
            i, part, _ = m2.groups()
            tp = te + f"encoder.layer.{i}."
            table = {
                "q": (lin, tp + "attention.self.query"),
                "k": (lin, tp + "attention.self.key"),
                "v": (lin, tp + "attention.self.value"),
                "attn_out": (lin, tp + "attention.output.dense"),
                "attn_ln": (norm, tp + "attention.output.LayerNorm"),
                "inter": (lin, tp + "intermediate.dense"),
                "out": (lin, tp + "output.dense"),
                "out_ln": (norm, tp + "output.LayerNorm"),
            }
            fn, key = table[part]
            return fn(key)
        if rest.startswith("pooler/"):
            return lin(te + "pooler.dense")
        return None

    # ---------------- deformable transformer ----------------
    m = re.match(r"transformer/(.*)", p)
    if m:
        rest = m.group(1)
        tf = "transformer."
        if rest == "level_embed":
            return tf + "level_embed", "copy"
        if rest.startswith("reference_points/"):
            return lin(tf + "reference_points")
        # two-stage submodules (reference deformable_transformer.py:55-58);
        # enc_class_embed/enc_bbox_embed have no reference counterpart (the
        # reference's two-stage head sharing is broken as shipped — see
        # models/deformable_transformer.py module docstring) so they stay
        # at their init values when loading a reference checkpoint.
        if rest.startswith("enc_output/"):
            return lin(tf + "enc_output")
        if rest.startswith("enc_output_norm/"):
            return norm(tf + "enc_output_norm")
        if rest.startswith("pos_trans/"):
            return lin(tf + "pos_trans")
        if rest.startswith("pos_trans_norm/"):
            return norm(tf + "pos_trans_norm")
        m2 = re.match(r"encoder_layers_(\d+)/(.*)", rest)
        if m2:
            i, sub = m2.groups()
            tp = tf + f"encoder.layers.{i}."
            if sub.startswith("self_attn/"):
                part = sub.split("/")[1]
                return lin(tp + f"self_attn.{part}")
            if sub.startswith("norm1/"):
                return norm(tp + "norm1")
            if sub.startswith("ffn/linear1/"):
                return lin(tp + "linear1")
            if sub.startswith("ffn/linear2/"):
                return lin(tp + "linear2")
            if sub.startswith("ffn/norm/"):
                return norm(tp + "norm2")
        m2 = re.match(r"decoder_layers_(\d+)/(.*)", rest)
        if m2:
            i, sub = m2.groups()
            tp = tf + f"decoder.layers.{i}."
            if sub.startswith("cross_attn/"):
                part = sub.split("/")[1]
                return lin(tp + f"cross_attn.{part}")
            if sub.startswith("self_attn/"):
                r = mha(tp + "self_attn")
                if r:
                    return r
                if sub.startswith("self_attn/out_proj/"):
                    return lin(tp + "self_attn.out_proj")
            if sub.startswith("norm1/"):
                return norm(tp + "norm1")
            if sub.startswith("norm2/"):
                return norm(tp + "norm2")
            if sub.startswith("ffn/linear1/"):
                return lin(tp + "linear1")
            if sub.startswith("ffn/linear2/"):
                return lin(tp + "linear2")
            if sub.startswith("ffn/norm/"):
                return norm(tp + "norm3")
        m2 = re.match(r"bbox_embed_(\d+)/layers_(\d+)/(.*)", rest)
        if m2:
            l, j, _ = m2.groups()
            return lin(f"bbox_embed.{l}.layers.{j}")
        return None

    # ---------------- VOC ----------------
    m = re.match(r"voc/(.*)", p)
    if m:
        rest = m.group(1)
        if rest == "fq_pos":
            return "voc.fq_pos.weight", "copy"
        if rest == "query_embed":
            return "voc.query_embed.weight", "copy"
        if rest.startswith("decoder_norm/"):
            return norm("voc.decoder_norm")
        specs = [
            (r"enc_self_attn_(\d+)/self_attn/(.*)", "voc.enc_self_attn.{}.self_attn"),
            (r"dec_self_(\d+)/self_attn/(.*)",
             "voc.transformer_self_attention_layers.{}.self_attn"),
            (r"dec_cross_(\d+)/multihead_attn/(.*)",
             "voc.transformer_cross_attention_layers.{}.multihead_attn"),
        ]
        for pat, fmt in specs:
            m2 = re.match(pat, rest)
            if m2:
                i, sub = m2.groups()
                tp = fmt.format(i)
                r = mha(tp)
                if r:
                    return r
                if sub.startswith("out_proj/"):
                    return lin(tp + ".out_proj")
        norms = [
            (r"enc_self_attn_(\d+)/norm/", "voc.enc_self_attn.{}.norm"),
            (r"dec_self_(\d+)/norm/", "voc.transformer_self_attention_layers.{}.norm"),
            (r"dec_cross_(\d+)/norm/", "voc.transformer_cross_attention_layers.{}.norm"),
            (r"enc_ffn_(\d+)/norm/", "voc.enc_ffn.{}.norm"),
            (r"dec_ffn_(\d+)/norm/", "voc.transformer_ffn_layers.{}.norm"),
        ]
        for pat, fmt in norms:
            m2 = re.match(pat, rest)
            if m2:
                return norm(fmt.format(m2.group(1)))
        ffns = [
            (r"enc_ffn_(\d+)/linear(\d)/", "voc.enc_ffn.{}.linear{}"),
            (r"dec_ffn_(\d+)/linear(\d)/", "voc.transformer_ffn_layers.{}.linear{}"),
        ]
        for pat, fmt in ffns:
            m2 = re.match(pat, rest)
            if m2:
                return lin(fmt.format(*m2.groups()))
        return None

    # ---------------- SOC top level ----------------
    if p == "query_embed":
        return "query_embed.weight", "copy"
    m = re.match(r"class_embed_(\d+)/(.*)", p)
    if m:
        return lin(f"class_embed.{m.group(1)}")
    m = re.match(r"controller/layers_(\d+)/(.*)", p)
    if m:
        return lin(f"controller.layers.{m.group(1)}")
    m = re.match(r"input_proj_(\d+)_conv/(.*)", p)
    if m:
        if leaf == "kernel":
            return f"input_proj.{m.group(1)}.0.weight", "conv"
        return f"input_proj.{m.group(1)}.0.bias", "copy"
    m = re.match(r"input_proj_(\d+)_gn/(.*)", p)
    if m:
        return norm(f"input_proj.{m.group(1)}.1")
    m = re.match(r"(vlf|lvf)/multihead_attn/(.*)", p)
    if m:
        which, sub = m.groups()
        tp = f"{which}.multihead_attn"
        r = mha(tp)
        if r:
            return r
        if sub.startswith("out_proj/"):
            return lin(tp + ".out_proj")
    m = re.match(r"txt_proj/(fc|layer_norm)/(.*)", p)
    if m:
        if m.group(1) == "fc":
            return lin("txt_proj.fc")
        return norm("txt_proj.layer_norm")
    m = re.match(r"spatial_decoder/(.*)", p)
    if m:
        rest = m.group(1)
        sd = "spatial_decoder."
        m2 = re.match(r"(lay\d|adapter\d|out_lay)/(.*)", rest)
        if m2:
            name = m2.group(1)
            if leaf == "kernel":
                return sd + name + ".weight", "conv"
            return sd + name + ".bias", "copy"
        m2 = re.match(r"(gn\d)/(.*)", rest)
        if m2:
            return norm(sd + m2.group(1))
    return None


def kinetics_swin_to_backbone(state_dict: Dict[str, "np.ndarray"]):
    """Convert a Kinetics-400 Video-Swin torch checkpoint into SOC backbone
    keys (reference video_swin_transformer.py:646-670): strip the 'backbone.'
    prefix, sum the patch-embed temporal dim (2,4,4)->(1,4,4), and move each
    stage's downsample out of the BasicLayer (layers.{s}.downsample ->
    downsamples.{s}) to match the SOC wrapper."""
    out = {}
    for k, v in state_dict.items():
        if not k.startswith("backbone."):
            continue
        k = k[len("backbone."):]
        if "relative_position_index" in k or "attn_mask" in k:
            continue
        if k == "patch_embed.proj.weight":
            v = np.asarray(v).sum(axis=2, keepdims=True)
        m = re.match(r"layers\.(\d+)\.downsample\.(.*)", k)
        if m:
            k = f"downsamples.{m.group(1)}.{m.group(2)}"
        out["backbone.0.body." + k] = np.asarray(v)
    return out


def swin2d_to_backbone(state_dict: Dict[str, "np.ndarray"]):
    """Convert an ImageNet 2D-Swin torch checkpoint (official layout, e.g.
    swin_{tiny,small,base,large}_patch4_window7_224.pth 'model' dict) into
    SOC backbone keys for the swin-* 2D configs: inject a singleton temporal
    dim into the patch embed (C,3,4,4)->(C,3,1,4,4) — the 2D table already
    matches the (1,7,7)-window table 1:1 — and move downsamples out of the
    BasicLayer like the Kinetics converter."""
    out = {}
    for k, v in state_dict.items():
        if k.startswith("backbone."):
            k = k[len("backbone."):]
        if ("relative_position_index" in k or "attn_mask" in k
                or k.startswith("head.") or k == "norm.weight"
                or k == "norm.bias"):
            continue
        v = np.asarray(v)
        if k == "patch_embed.proj.weight":
            v = v[:, :, None]  # (C, 3, 4, 4) -> (C, 3, 1, 4, 4)
        m = re.match(r"layers\.(\d+)\.downsample\.(.*)", k)
        if m:
            k = f"downsamples.{m.group(1)}.{m.group(2)}"
        out["backbone.0.body." + k] = v
    return out


def convert_torch_state_dict(state_dict: Dict[str, "np.ndarray"], flax_params):
    """Fill a flax params pytree from a torch state_dict.

    Returns (new_params, report) where report lists missing/unused keys.
    Weight-surgery quirks handled like the reference: none here — callers drop
    class_embed when num_classes changes (reference trainer.py:430-438).
    """
    import jax

    sd = {k: np.asarray(v) for k, v in state_dict.items()}
    used = set()
    missing = []

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    out = {}

    def set_path(tree, path, value):
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = value

    new_tree: dict = {}
    for keypath, leaf in flat:
        keys = tuple(
            getattr(k, "key", getattr(k, "name", str(k))) for k in keypath
        )
        # strip the 'params' collection head for mapping
        map_keys = keys[1:] if keys and keys[0] == "params" else keys
        res = flax_to_torch(map_keys)
        if res is None:
            set_path(new_tree, keys, leaf)
            continue
        tkey, kind = res
        if tkey not in sd:
            missing.append(("/".join(map_keys), tkey))
            set_path(new_tree, keys, leaf)
            continue
        arr = TRANSFORMS[kind](sd[tkey]).astype(np.asarray(leaf).dtype)
        assert arr.shape == leaf.shape, (
            f"shape mismatch {'/'.join(map_keys)}: torch {arr.shape} vs flax {leaf.shape}"
        )
        set_path(new_tree, keys, arr)
        used.add(tkey)

    unused = sorted(set(sd.keys()) - used)
    report = {"missing": missing, "unused": unused}
    return new_tree, report


INVERSE_TRANSFORMS = {
    "linear": _t,  # transpose is its own inverse
    "conv": lambda x: np.ascontiguousarray(np.transpose(x, (3, 2, 0, 1))),
    "conv3d": lambda x: np.ascontiguousarray(np.transpose(x, (4, 3, 0, 1, 2))),
    "copy": lambda x: np.asarray(x),
}


def export_torch_state_dict(flax_params) -> Dict[str, "np.ndarray"]:
    """Flax params -> torch state_dict with the REFERENCE's key names and
    layouts (the exact inverse of `convert_torch_state_dict`), so weights
    trained here can be loaded by the reference codebase (and by our own
    loader, closing the round trip). Parameters with no torch counterpart
    (flax_to_torch -> None) are skipped."""
    import jax

    flat = jax.tree_util.tree_flatten_with_path(flax_params)[0]
    sd: Dict[str, np.ndarray] = {}
    for kp, leaf in flat:
        keys = tuple(getattr(k, "key", getattr(k, "name", str(k))) for k in kp)
        if keys and keys[0] == "params":
            keys = keys[1:]
        mapped = flax_to_torch(keys)
        if mapped is None:
            continue
        tkey, kind = mapped
        sd[tkey] = INVERSE_TRANSFORMS[kind](np.asarray(leaf))
    return sd
