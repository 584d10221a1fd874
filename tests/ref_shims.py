"""Minimal stand-ins for reference-only dependencies (timm, mmcv).

The reference segformer (`modules/real3d/segformer.py`) imports a handful of
symbols from timm and mmcv, neither of which is in this image. For oracle
parity tests we install tiny functional equivalents into ``sys.modules``
before importing the reference module. These shims reproduce exactly the
state_dict layout and eval-mode forward math the reference relies on:

* ``DropPath`` — identity in eval mode (drop_prob only matters in training);
* ``to_2tuple`` / ``trunc_normal_`` / ``register_model`` / ``_cfg`` — trivial;
* ``ConvModule(conv -> bn -> relu)`` — conv without bias when a norm_cfg is
  given, named ``.conv`` / ``.bn`` like mmcv's.

The ``mit_b*`` constructors also load pretrained .pth files from a relative
path; ``patched_torch_load`` nulls that out during construction.
"""

from __future__ import annotations

import contextlib
import sys
import types


def install_ref_shims() -> None:
    if "timm" in sys.modules:
        return
    import torch
    import torch.nn as nn

    timm = types.ModuleType("timm")
    models = types.ModuleType("timm.models")
    layers = types.ModuleType("timm.models.layers")
    registry = types.ModuleType("timm.models.registry")
    vit = types.ModuleType("timm.models.vision_transformer")

    class DropPath(nn.Module):
        def __init__(self, drop_prob=0.0):
            super().__init__()
            self.drop_prob = drop_prob

        def forward(self, x):
            if not self.training or self.drop_prob == 0.0:
                return x
            keep = 1.0 - self.drop_prob
            mask = torch.rand((x.shape[0],) + (1,) * (x.ndim - 1),
                              device=x.device) < keep
            return x * mask / keep

    def to_2tuple(x):
        return x if isinstance(x, tuple) else (x, x)

    def trunc_normal_(tensor, mean=0.0, std=1.0, a=-2.0, b=2.0):
        with torch.no_grad():
            tensor.normal_(mean, std).clamp_(min=a * std, max=b * std)
        return tensor

    def register_model(fn):
        return fn

    def _cfg(url="", **kwargs):
        return dict(url=url, **kwargs)

    layers.DropPath = DropPath
    layers.to_2tuple = to_2tuple
    layers.trunc_normal_ = trunc_normal_
    registry.register_model = register_model
    vit._cfg = _cfg
    models.layers = layers
    models.registry = registry
    models.vision_transformer = vit
    timm.models = models

    mmcv = types.ModuleType("mmcv")
    cnn = types.ModuleType("mmcv.cnn")

    class ConvModule(nn.Module):
        """conv -> bn -> relu with mmcv's state_dict names (.conv/.bn)."""

        def __init__(self, in_channels, out_channels, kernel_size,
                     norm_cfg=None, **kwargs):
            super().__init__()
            self.conv = nn.Conv2d(in_channels, out_channels, kernel_size,
                                  bias=norm_cfg is None)
            self.bn = nn.BatchNorm2d(out_channels) if norm_cfg is not None else None
            self.act = nn.ReLU(inplace=False)

        def forward(self, x):
            x = self.conv(x)
            if self.bn is not None:
                x = self.bn(x)
            return self.act(x)

    cnn.ConvModule = ConvModule
    mmcv.cnn = cnn

    # torchvision is only dereferenced inside constructors we never call
    # (Hopenet, VGG perceptual losses); an empty placeholder satisfies the
    # module-level imports.
    torchvision = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    torchvision.models = tv_models

    sys.modules.update({
        "timm": timm, "timm.models": models, "timm.models.layers": layers,
        "timm.models.registry": registry,
        "timm.models.vision_transformer": vit,
        "mmcv": mmcv, "mmcv.cnn": cnn,
        "torchvision": torchvision, "torchvision.models": tv_models,
    })


@contextlib.contextmanager
def patched_torch_load():
    """Make ``torch.load`` of the (absent) pretrained mit_b*.pth a no-op."""
    import torch

    orig = torch.load

    def fake_load(path, *a, **k):
        if isinstance(path, str) and "pretrained_ckpts" in path:
            return {}
        return orig(path, *a, **k)

    torch.load = fake_load
    try:
        yield
    finally:
        torch.load = orig
