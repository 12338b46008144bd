"""Load the actual /root/reference torch modules on CPU for parity testing.

The reference's heavyweight deps (CUDA extension, torchvision, timm,
pycocotools) are stubbed with behaviorally-equivalent minimal shims BEFORE any
reference import, and the CUDA `MSDeformAttnFunction.apply` is rerouted to the
repo's own pure-PyTorch oracle `ms_deform_attn_core_pytorch`
(reference models/ops/functions/ms_deform_attn_func.py:41-61), which the
reference itself uses as its numerical oracle (models/ops/test.py:31-60).

This makes every torch-only reference module runnable on CPU, so the flax
rebuild can be parity-tested against the *real* implementation rather than an
independently rewritten oracle (VERDICT.md round 1, item 2).
"""
from __future__ import annotations

import sys
import types

import numpy as np
import torch

REF_ROOT = "/root/reference"
_installed = False


def _mod(name):
    import importlib.machinery

    m = types.ModuleType(name)
    # transformers probes availability via importlib.util.find_spec, which
    # raises on stub modules without a __spec__
    m.__spec__ = importlib.machinery.ModuleSpec(name, None)
    return m


def _install_stubs():
    import torch.nn as nn

    if "torchvision" not in sys.modules:
        tv = _mod("torchvision")
        # NOTE: the reference's misc.interpolate branches on
        # float(torchvision.__version__[:3]) < 0.7 (misc.py:222-229) — three
        # chars only, so "0.15.0" reads as 0.1 and takes the legacy
        # ops.misc.interpolate path. Use a version whose 3-char prefix parses
        # >= 0.7 so it routes to F.interpolate like any modern install.
        tv.__version__ = "0.7.0"
        ops = _mod("torchvision.ops")
        boxes_mod = _mod("torchvision.ops.boxes")

        def box_area(boxes):
            return (boxes[:, 2] - boxes[:, 0]) * (boxes[:, 3] - boxes[:, 1])

        boxes_mod.box_area = box_area
        ops.boxes = boxes_mod
        # modern-torchvision branch of the reference's misc.interpolate
        # (misc.py:229) delegates here; it is just F.interpolate
        ops_misc = _mod("torchvision.ops.misc")
        ops_misc.interpolate = torch.nn.functional.interpolate
        ops.misc = ops_misc
        tv.ops = ops

        # minimal torchvision.transforms(.functional) for the reference's
        # DETR-style crop/pad/flip utilities (datasets/transforms.py:7-8)
        tvt = _mod("torchvision.transforms")
        tvf = _mod("torchvision.transforms.functional")

        def _pil_crop(img, top, left, height, width):
            return img.crop((left, top, left + width, top + height))

        def _pil_pad(img, padding):
            from PIL import Image

            left, top, right, bottom = padding
            out = Image.new(img.mode,
                            (img.width + left + right,
                             img.height + top + bottom))
            out.paste(img, (left, top))
            return out

        def _pil_hflip(img):
            from PIL import Image

            return img.transpose(Image.FLIP_LEFT_RIGHT)

        def _pil_resize(img, size, **kw):
            if isinstance(size, (list, tuple)):
                return img.resize(size[::-1])
            raise NotImplementedError

        tvf.crop = _pil_crop
        tvf.pad = _pil_pad
        tvf.hflip = _pil_hflip
        tvf.resize = _pil_resize

        class _RandomCrop:
            @staticmethod
            def get_params(img, output_size):
                import random as _random

                th, tw = output_size
                i = _random.randint(0, img.height - th) if img.height > th else 0
                j = _random.randint(0, img.width - tw) if img.width > tw else 0
                return i, j, th, tw

        tvt.RandomCrop = _RandomCrop
        tvt.functional = tvf
        tv.transforms = tvt
        sys.modules["torchvision.transforms"] = tvt
        sys.modules["torchvision.transforms.functional"] = tvf
        models_mod = _mod("torchvision.models")
        mutils = _mod("torchvision.models._utils")

        class IntermediateLayerGetter(nn.ModuleDict):
            """Minimal torchvision IntermediateLayerGetter (resnet parity)."""

            def __init__(self, model, return_layers):
                orig = dict(return_layers)
                layers = {}
                remaining = dict(orig)
                for name, module in model.named_children():
                    layers[name] = module
                    if name in remaining:
                        del remaining[name]
                    if not remaining:
                        break
                super().__init__(layers)
                self.return_layers = orig

            def forward(self, x):
                out = {}
                for name, module in self.items():
                    x = module(x)
                    if name in self.return_layers:
                        out[self.return_layers[name]] = x
                return out

        mutils.IntermediateLayerGetter = IntermediateLayerGetter

        def _no_weights(*a, **k):
            raise NotImplementedError(
                "torchvision stub: pretrained resnet weights unavailable"
            )

        models_mod._utils = mutils
        models_mod.resnet50 = _no_weights
        tv.models = models_mod
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.ops"] = ops
        sys.modules["torchvision.ops.boxes"] = boxes_mod
        sys.modules["torchvision.models"] = models_mod
        sys.modules["torchvision.models._utils"] = mutils

    if "timm" not in sys.modules:
        timm = _mod("timm")
        tm = _mod("timm.models")
        tml = _mod("timm.models.layers")

        class DropPath(nn.Module):
            """Stochastic depth; identity in eval mode (parity runs in eval)."""

            def __init__(self, drop_prob=None):
                super().__init__()
                self.drop_prob = drop_prob or 0.0

            def forward(self, x):
                if self.drop_prob == 0.0 or not self.training:
                    return x
                keep = 1.0 - self.drop_prob
                shape = (x.shape[0],) + (1,) * (x.ndim - 1)
                mask = torch.bernoulli(torch.full(shape, keep, device=x.device))
                return x / keep * mask

        tml.DropPath = DropPath
        tml.trunc_normal_ = torch.nn.init.trunc_normal_

        def to_2tuple(x):
            return x if isinstance(x, tuple) else (x, x)

        tml.to_2tuple = to_2tuple
        timm.models = tm
        tm.layers = tml
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = tm
        sys.modules["timm.models.layers"] = tml

    if "MultiScaleDeformableAttention" not in sys.modules:
        # the CUDA pybind module; never called (apply() is rerouted below)
        sys.modules["MultiScaleDeformableAttention"] = _mod(
            "MultiScaleDeformableAttention"
        )

    if "pycocotools" not in sys.modules:
        pm = _mod("pycocotools")
        mk = _mod("pycocotools.mask")

        def _unused(*a, **k):  # only import-time presence is needed
            raise NotImplementedError("pycocotools stub: not used in parity tests")

        mk.encode = mk.decode = mk.area = mk.toBbox = _unused
        pm.mask = mk
        sys.modules["pycocotools"] = pm
        sys.modules["pycocotools.mask"] = mk


def install_reference():
    """Idempotently make `/root/reference` importable with CPU-safe stubs."""
    global _installed
    if _installed:
        return
    _install_stubs()
    if REF_ROOT not in sys.path:
        sys.path.insert(0, REF_ROOT)

    # Reroute the CUDA autograd Function to the repo's pure-torch oracle so
    # every module that calls MSDeformAttnFunction.apply runs on CPU.
    from models.ops.functions import ms_deform_attn_func as ref_func

    def _oracle_apply(value, spatial_shapes, level_start_index,
                      sampling_locations, attention_weights, im2col_step):
        return ref_func.ms_deform_attn_core_pytorch(
            value, spatial_shapes, sampling_locations, attention_weights
        )

    ref_func.MSDeformAttnFunction.apply = _oracle_apply
    _installed = True


def torch_sd(module: "torch.nn.Module", prefix: str = ""):
    """state_dict -> {prefixed key: numpy array} (float64 -> float32)."""
    out = {}
    for k, v in module.state_dict().items():
        a = v.detach().cpu().numpy()
        if a.dtype == np.float64:
            a = a.astype(np.float32)
        out[prefix + k] = a
    return out


def convert_submodule(variables, sd, flax_prefix=None, allow_missing=()):
    """Fill a flax submodule's params from a torch state_dict via the full-SOC
    mapping (training/convert.py), wrapping the tree under `flax_prefix` so
    paths match their position in the SOC tree. Asserts full coverage.
    """
    from neurips2023_soc_tpu.training.convert import convert_torch_state_dict

    params = variables["params"]
    wrapped = {"params": ({flax_prefix: params} if flax_prefix else dict(params))}
    new, report = convert_torch_state_dict(sd, wrapped)
    missing = [m for m in report["missing"]
               if not any(m[0].startswith(p) for p in allow_missing)]
    assert not missing, f"unconverted flax params: {missing}"
    out = new["params"][flax_prefix] if flax_prefix else new["params"]
    return {"params": out}, report


def zero_dropout(module: "torch.nn.Module"):
    """Zero every dropout rate so train-mode *semantics* (training-only
    branches) can be compared deterministically against our
    deterministic=True path."""
    import torch.nn as nn

    for m in module.modules():
        if isinstance(m, nn.Dropout):
            m.p = 0.0
        if isinstance(m, nn.MultiheadAttention):
            m.dropout = 0.0
    return module


def seed_all(seed: int = 0):
    torch.manual_seed(seed)
    np.random.seed(seed)
