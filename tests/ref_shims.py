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

    # torchvision: the facev2v models only dereference it inside
    # constructors we never call, but the DeepLabV3 encoder subclasses
    # torchvision.models.resnet.ResNet — provide a faithful minimal ResNet
    # (standard architecture, matching torchvision layer/buffer names).
    torchvision = types.ModuleType("torchvision")
    tv_models = types.ModuleType("torchvision.models")
    tv_resnet = types.ModuleType("torchvision.models.resnet")

    def conv3x3(inp, out, stride=1, groups=1, dilation=1):
        return nn.Conv2d(inp, out, 3, stride=stride, padding=dilation,
                         groups=groups, bias=False, dilation=dilation)

    def conv1x1(inp, out, stride=1):
        return nn.Conv2d(inp, out, 1, stride=stride, bias=False)

    class BasicBlock(nn.Module):
        expansion = 1

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            self.conv1 = conv3x3(inplanes, planes, stride)
            self.bn1 = norm_layer(planes)
            self.relu = nn.ReLU(inplace=True)
            self.conv2 = conv3x3(planes, planes)
            self.bn2 = norm_layer(planes)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.bn2(self.conv2(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class Bottleneck(nn.Module):
        expansion = 4

        def __init__(self, inplanes, planes, stride=1, downsample=None,
                     groups=1, base_width=64, dilation=1, norm_layer=None):
            super().__init__()
            norm_layer = norm_layer or nn.BatchNorm2d
            width = int(planes * (base_width / 64.0)) * groups
            self.conv1 = conv1x1(inplanes, width)
            self.bn1 = norm_layer(width)
            self.conv2 = conv3x3(width, width, stride, groups, dilation)
            self.bn2 = norm_layer(width)
            self.conv3 = conv1x1(width, planes * self.expansion)
            self.bn3 = norm_layer(planes * self.expansion)
            self.relu = nn.ReLU(inplace=True)
            self.downsample = downsample
            self.stride = stride

        def forward(self, x):
            identity = x
            out = self.relu(self.bn1(self.conv1(x)))
            out = self.relu(self.bn2(self.conv2(out)))
            out = self.bn3(self.conv3(out))
            if self.downsample is not None:
                identity = self.downsample(x)
            return self.relu(out + identity)

    class ResNet(nn.Module):
        def __init__(self, block, layers, num_classes=1000,
                     zero_init_residual=False, groups=1, width_per_group=64,
                     replace_stride_with_dilation=None, norm_layer=None):
            super().__init__()
            self._norm_layer = norm_layer or nn.BatchNorm2d
            self.inplanes = 64
            self.dilation = 1
            self.groups = groups
            self.base_width = width_per_group
            self.conv1 = nn.Conv2d(3, 64, 7, stride=2, padding=3, bias=False)
            self.bn1 = self._norm_layer(64)
            self.relu = nn.ReLU(inplace=True)
            self.maxpool = nn.MaxPool2d(3, stride=2, padding=1)
            self.layer1 = self._make_layer(block, 64, layers[0])
            self.layer2 = self._make_layer(block, 128, layers[1], stride=2)
            self.layer3 = self._make_layer(block, 256, layers[2], stride=2)
            self.layer4 = self._make_layer(block, 512, layers[3], stride=2)
            self.avgpool = nn.AdaptiveAvgPool2d((1, 1))
            self.fc = nn.Linear(512 * block.expansion, num_classes)

        def _make_layer(self, block, planes, blocks, stride=1):
            norm_layer = self._norm_layer
            downsample = None
            if stride != 1 or self.inplanes != planes * block.expansion:
                downsample = nn.Sequential(
                    conv1x1(self.inplanes, planes * block.expansion, stride),
                    norm_layer(planes * block.expansion),
                )
            layers = [block(self.inplanes, planes, stride, downsample,
                            self.groups, self.base_width, self.dilation,
                            norm_layer)]
            self.inplanes = planes * block.expansion
            for _ in range(1, blocks):
                layers.append(block(self.inplanes, planes, groups=self.groups,
                                    base_width=self.base_width,
                                    dilation=self.dilation,
                                    norm_layer=norm_layer))
            return nn.Sequential(*layers)

    tv_resnet.ResNet = ResNet
    tv_resnet.BasicBlock = BasicBlock
    tv_resnet.Bottleneck = Bottleneck
    tv_models.resnet = tv_resnet
    torchvision.models = tv_models

    # pretrainedmodels: only its settings dict is read; any-key empty dict
    import collections

    pm = types.ModuleType("pretrainedmodels")
    pm_models = types.ModuleType("pretrainedmodels.models")
    pm_tvm = types.ModuleType("pretrainedmodels.models.torchvision_models")
    pm_tvm.pretrained_settings = collections.defaultdict(dict)
    pm_models.torchvision_models = pm_tvm
    pm.models = pm_models

    shims = {
        "timm": timm, "timm.models": models, "timm.models.layers": layers,
        "timm.models.registry": registry,
        "timm.models.vision_transformer": vit,
        "mmcv": mmcv, "mmcv.cnn": cnn,
        "torchvision": torchvision, "torchvision.models": tv_models,
        "torchvision.models.resnet": tv_resnet,
        "pretrainedmodels": pm, "pretrainedmodels.models": pm_models,
        "pretrainedmodels.models.torchvision_models": pm_tvm,
    }
    # give every shim a real ModuleSpec: importlib.util.find_spec raises
    # "ValueError: <name>.__spec__ is None" on spec-less modules, which
    # breaks innocent bystanders probing for optional deps (e.g.
    # transformers.utils.import_utils checking for timm)
    import importlib.machinery

    for name, mod in shims.items():
        if getattr(mod, "__spec__", None) is None:
            mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    sys.modules.update(shims)


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


def build_torch_inception():
    """Hand-rolled torchvision-style ``inception_v3`` feature trunk (oracle
    for the FID converter test; torchvision itself is absent). State-dict
    key names match torchvision/pytorch-fid exactly; includes the
    pytorch-fid pooling patches (count_include_pad=False avg pools,
    max pool in Mixed_7c's pool branch)."""
    import torch
    import torch.nn as nn
    import torch.nn.functional as F

    class BasicConv2d(nn.Module):
        def __init__(self, cin, cout, **kw):
            super().__init__()
            self.conv = nn.Conv2d(cin, cout, bias=False, **kw)
            self.bn = nn.BatchNorm2d(cout, eps=0.001)

        def forward(self, x):
            return F.relu(self.bn(self.conv(x)))

    def avgp(x):
        return F.avg_pool2d(x, 3, stride=1, padding=1,
                            count_include_pad=False)

    class IncA(nn.Module):
        def __init__(self, cin, pf):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch5x5_1 = BasicConv2d(cin, 48, kernel_size=1)
            self.branch5x5_2 = BasicConv2d(48, 64, kernel_size=5, padding=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, padding=1)
            self.branch_pool = BasicConv2d(cin, pf, kernel_size=1)

        def forward(self, x):
            return torch.cat([
                self.branch1x1(x),
                self.branch5x5_2(self.branch5x5_1(x)),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                self.branch_pool(avgp(x)),
            ], 1)

    class IncB(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3 = BasicConv2d(cin, 384, kernel_size=3, stride=2)
            self.branch3x3dbl_1 = BasicConv2d(cin, 64, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(64, 96, kernel_size=3, padding=1)
            self.branch3x3dbl_3 = BasicConv2d(96, 96, kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3(x),
                self.branch3x3dbl_3(self.branch3x3dbl_2(self.branch3x3dbl_1(x))),
                F.max_pool2d(x, 3, stride=2),
            ], 1)

    class IncC(nn.Module):
        def __init__(self, cin, c7):
            super().__init__()
            self.branch1x1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7_2 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7_3 = BasicConv2d(c7, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_1 = BasicConv2d(cin, c7, kernel_size=1)
            self.branch7x7dbl_2 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_3 = BasicConv2d(c7, c7, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7dbl_4 = BasicConv2d(c7, c7, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7dbl_5 = BasicConv2d(c7, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            b7 = self.branch7x7_3(self.branch7x7_2(self.branch7x7_1(x)))
            bd = self.branch7x7dbl_5(self.branch7x7dbl_4(
                self.branch7x7dbl_3(self.branch7x7dbl_2(self.branch7x7dbl_1(x)))))
            return torch.cat([self.branch1x1(x), b7, bd,
                              self.branch_pool(avgp(x))], 1)

    class IncD(nn.Module):
        def __init__(self, cin):
            super().__init__()
            self.branch3x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch3x3_2 = BasicConv2d(192, 320, kernel_size=3, stride=2)
            self.branch7x7x3_1 = BasicConv2d(cin, 192, kernel_size=1)
            self.branch7x7x3_2 = BasicConv2d(192, 192, kernel_size=(1, 7), padding=(0, 3))
            self.branch7x7x3_3 = BasicConv2d(192, 192, kernel_size=(7, 1), padding=(3, 0))
            self.branch7x7x3_4 = BasicConv2d(192, 192, kernel_size=3, stride=2)

        def forward(self, x):
            return torch.cat([
                self.branch3x3_2(self.branch3x3_1(x)),
                self.branch7x7x3_4(self.branch7x7x3_3(
                    self.branch7x7x3_2(self.branch7x7x3_1(x)))),
                F.max_pool2d(x, 3, stride=2),
            ], 1)

    class IncE(nn.Module):
        def __init__(self, cin, pool):
            super().__init__()
            self.pool = pool
            self.branch1x1 = BasicConv2d(cin, 320, kernel_size=1)
            self.branch3x3_1 = BasicConv2d(cin, 384, kernel_size=1)
            self.branch3x3_2a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3_2b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch3x3dbl_1 = BasicConv2d(cin, 448, kernel_size=1)
            self.branch3x3dbl_2 = BasicConv2d(448, 384, kernel_size=3, padding=1)
            self.branch3x3dbl_3a = BasicConv2d(384, 384, kernel_size=(1, 3), padding=(0, 1))
            self.branch3x3dbl_3b = BasicConv2d(384, 384, kernel_size=(3, 1), padding=(1, 0))
            self.branch_pool = BasicConv2d(cin, 192, kernel_size=1)

        def forward(self, x):
            b3 = self.branch3x3_1(x)
            b3 = torch.cat([self.branch3x3_2a(b3), self.branch3x3_2b(b3)], 1)
            bd = self.branch3x3dbl_2(self.branch3x3dbl_1(x))
            bd = torch.cat([self.branch3x3dbl_3a(bd), self.branch3x3dbl_3b(bd)], 1)
            bp = (avgp(x) if self.pool == "avg"
                  else F.max_pool2d(x, 3, stride=1, padding=1))
            return torch.cat([self.branch1x1(x), b3, bd,
                              self.branch_pool(bp)], 1)

    class InceptionTrunk(nn.Module):
        def __init__(self):
            super().__init__()
            self.Conv2d_1a_3x3 = BasicConv2d(3, 32, kernel_size=3, stride=2)
            self.Conv2d_2a_3x3 = BasicConv2d(32, 32, kernel_size=3)
            self.Conv2d_2b_3x3 = BasicConv2d(32, 64, kernel_size=3, padding=1)
            self.Conv2d_3b_1x1 = BasicConv2d(64, 80, kernel_size=1)
            self.Conv2d_4a_3x3 = BasicConv2d(80, 192, kernel_size=3)
            self.Mixed_5b = IncA(192, 32)
            self.Mixed_5c = IncA(256, 64)
            self.Mixed_5d = IncA(288, 64)
            self.Mixed_6a = IncB(288)
            self.Mixed_6b = IncC(768, 128)
            self.Mixed_6c = IncC(768, 160)
            self.Mixed_6d = IncC(768, 160)
            self.Mixed_6e = IncC(768, 192)
            self.Mixed_7a = IncD(768)
            self.Mixed_7b = IncE(1280, "avg")
            self.Mixed_7c = IncE(2048, "max")

        def forward(self, x):
            x = self.Conv2d_1a_3x3(x)
            x = self.Conv2d_2a_3x3(x)
            x = self.Conv2d_2b_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            x = self.Conv2d_3b_1x1(x)
            x = self.Conv2d_4a_3x3(x)
            x = F.max_pool2d(x, 3, stride=2)
            for blk in (self.Mixed_5b, self.Mixed_5c, self.Mixed_5d,
                        self.Mixed_6a, self.Mixed_6b, self.Mixed_6c,
                        self.Mixed_6d, self.Mixed_6e, self.Mixed_7a,
                        self.Mixed_7b, self.Mixed_7c):
                x = blk(x)
            return x.mean(dim=(2, 3))  # [B, 2048]

    return InceptionTrunk()
