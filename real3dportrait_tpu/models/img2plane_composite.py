"""Composite one-shot image-to-triplane backbone (the shipped default).

Faithful TPU-native implementation of the reference's ``composite`` mode
(`modules/img2plane/img2plane_model.py:12`, the mode the released
`240210_real3dportrait_orig` checkpoints use — `egs/os_avatar/real3d_orig/
img2plane_orig.yaml` sets ``img2plane_backbone_mode: composite``):

* a low-resolution semantic path — dilated ResNet34 (output-stride 8, the
  SMP ``make_dilated`` patching of `deeplabv3/encoders/_utils.py:41`) into a
  norm-free ASPP decoder (`deeplabv3/decoders/my_decoder.py:128`, all
  BatchNorms are commented out upstream) and a global-attention ViT
  (`segformer/models.py:11`);
* a high-resolution detail CNN (`simple_encoders/high_resolution_encoder.py`);
* a predictor ViT fusing both into the raw planes (`segformer/models.py:91`).

Input gains xy-coordinate channels (positional encoding) and optional
alpha/camera channels (`img2plane_model.py:20-58`); plane axis flips match
hide-nerf. Channels-last throughout.

``norm_mode``: the ResNet encoder's BatchNorms become GroupNorm for fresh
TPU training ("gn") or exact eval-time per-channel affines ("affine") for
checkpoints converted by ``tools/convert_torch_ckpt``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from real3dportrait_tpu.models.segformer import (
    MiTBlock,
    OverlapPatchEmbed,
    apply_plane_flips,
    upsample_align_corners,
)
from real3dportrait_tpu.models.torso import ChannelAffine

# scale -> (low_reso_vit blocks, triplane_predictor_vit blocks)
# (`segformer/models.py:21-27,105-111`)
COMPOSITE_SCALES = {"small": (2, 1), "standard": (5, 1), "large": (10, 3)}


def pixel_shuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """[B,H,W,C*r*r] -> [B,H*r,W*r,C], torch ``nn.PixelShuffle`` channel
    order: input channel ``c*r*r + i*r + j`` lands at spatial offset (i,j)."""
    b, h, w, c = x.shape
    r = factor
    x = x.reshape(b, h, w, c // (r * r), r, r)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(b, h * r, w * r, c // (r * r))


def _norm(x, mode: str, name: str):
    if mode == "affine":
        return ChannelAffine(name=name)(x)
    groups = max(1, min(32, x.shape[-1] // 8))
    while x.shape[-1] % groups:
        groups -= 1
    return nn.GroupNorm(num_groups=groups, name=name)(x)


# ---------------------------------------------------------------------------
# Low-resolution path: dilated ResNet34 + ASPP (DeepLabV3)
# ---------------------------------------------------------------------------


class BasicBlock(nn.Module):
    """torchvision ResNet BasicBlock with SMP's dilation patching: in dilated
    stages *every* 3x3 conv gets stride 1 / dilation r / padding r, and the
    1x1 downsample conv gets stride 1 (`encoders/_utils.py:41-51`)."""

    planes: int
    stride: int = 1
    dilation: int = 1
    use_downsample: bool = False
    norm_mode: str = "gn"

    @nn.compact
    def __call__(self, x):
        identity = x
        y = nn.Conv(self.planes, (3, 3), strides=self.stride,
                    padding=self.dilation, kernel_dilation=self.dilation,
                    use_bias=False, name="conv1")(x)
        y = nn.relu(_norm(y, self.norm_mode, "bn1"))
        y = nn.Conv(self.planes, (3, 3), padding=self.dilation,
                    kernel_dilation=self.dilation, use_bias=False,
                    name="conv2")(y)
        y = _norm(y, self.norm_mode, "bn2")
        if self.use_downsample:
            identity = nn.Conv(self.planes, (1, 1), strides=self.stride,
                               use_bias=False, name="downsample_conv")(x)
            identity = _norm(identity, self.norm_mode, "downsample_norm")
        return nn.relu(y + identity)


class ResNet34Encoder(nn.Module):
    """ResNet34 at output stride 8: layers 3/4 dilated (2/4) instead of
    strided (`deeplabv3/decoders/my_model.py:63-69`)."""

    norm_mode: str = "gn"
    layers: Sequence[int] = (3, 4, 6, 3)
    planes: Sequence[int] = (64, 128, 256, 512)
    # per-layer (stride of first block, dilation) for output_stride=8
    stage_cfg: Sequence[tuple] = ((1, 1), (2, 1), (1, 2), (1, 4))

    @nn.compact
    def __call__(self, x):
        x = nn.Conv(64, (7, 7), strides=2, padding=3, use_bias=False,
                    name="conv1")(x)
        x = nn.relu(_norm(x, self.norm_mode, "bn1"))
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=((1, 1), (1, 1)))
        for li, (n_blocks, planes, (stride, dil)) in enumerate(
                zip(self.layers, self.planes, self.stage_cfg), start=1):
            for bi in range(n_blocks):
                use_ds = bi == 0 and (stride != 1 or x.shape[-1] != planes)
                x = BasicBlock(
                    planes, stride=stride if bi == 0 else 1, dilation=dil,
                    use_downsample=use_ds, norm_mode=self.norm_mode,
                    name=f"layer{li}_{bi}",
                )(x)
        return x  # [B, H/8, W/8, 512]


class DeepLabDecoder(nn.Module):
    """ASPP + 3x3 projection — norm-free, exactly as the reference vendored
    it (every BatchNorm commented out, `my_decoder.py:128-190`)."""

    out_channels: int = 256
    rates: Sequence[int] = (12, 24, 36)

    @nn.compact
    def __call__(self, x):
        c = self.out_channels
        branches = [nn.relu(nn.Conv(c, (1, 1), use_bias=False,
                                    name="aspp_conv0")(x))]
        for i, r in enumerate(self.rates, start=1):
            branches.append(nn.relu(nn.Conv(
                c, (3, 3), padding=r, kernel_dilation=r, use_bias=False,
                name=f"aspp_conv{i}")(x)))
        pooled = x.mean(axis=(1, 2), keepdims=True)
        pooled = nn.relu(nn.Conv(c, (1, 1), use_bias=False,
                                 name="aspp_pool_conv")(pooled))
        branches.append(jnp.broadcast_to(pooled, x.shape[:3] + (c,)))
        h = jnp.concatenate(branches, axis=-1)
        h = nn.relu(nn.Conv(c, (1, 1), use_bias=False, name="aspp_project")(h))
        # reference has Dropout(0.5) here — identity at inference
        return nn.Conv(c, (3, 3), padding=1, use_bias=False, name="out_conv")(h)


class DeepLabV3LowEncoder(nn.Module):
    """Full low-resolution encoder (`my_model.py:13`): stride-8 dilated
    ResNet34 features -> ASPP -> [B, H/8, W/8, 256]."""

    norm_mode: str = "gn"

    @nn.compact
    def __call__(self, x):
        feat = ResNet34Encoder(norm_mode=self.norm_mode, name="encoder")(x)
        return DeepLabDecoder(name="decoder")(feat)


# ---------------------------------------------------------------------------
# High-resolution detail CNN
# ---------------------------------------------------------------------------


class HighResoEncoder(nn.Module):
    """Stride-2 detail CNN (`simple_encoders/high_resolution_encoder.py:6`)."""

    out_channels: int = 96

    @nn.compact
    def __call__(self, x):
        # NB: the reference defines self.activation but never applies it
        # after `first` (`high_resolution_encoder.py:30-36`) — match that.
        h = nn.Conv(64, (7, 7), strides=2, padding=3, name="first")(x)
        for i in range(4):
            h = nn.leaky_relu(
                nn.Conv(96, (3, 3), padding=1, name=f"conv{i}")(h), 0.01)
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="final")(h)


# ---------------------------------------------------------------------------
# ViTs (`modules/img2plane/segformer/models.py`)
# ---------------------------------------------------------------------------


class LowResolutionViT(nn.Module):
    """Global attention over the semantic features, upsampled 8x to the
    plane resolution (`segformer/models.py:11`)."""

    num_blocks: int = 5
    vit_dim: int = 1024
    out_channels: int = 96

    @nn.compact
    def __call__(self, x):  # [B, h, w, 256]
        # these ViTs use torch's default LayerNorm eps=1e-5 (the MiT encoder
        # pins 1e-6); the deeplab features are tiny-scale, so eps matters
        h = OverlapPatchEmbed(self.vit_dim, 3, 2, ln_eps=1e-5,
                              name="patch_embed")(x)
        for i in range(self.num_blocks):
            h = MiTBlock(self.vit_dim, num_heads=4, sr_ratio=1, mlp_ratio=2,
                         ln_eps=1e-5, name=f"block{i + 1}")(h)
        h = pixel_shuffle(h, 2)  # dim/4 channels, 2x spatial
        # reference uses nn.UpsamplingBilinear2d => align_corners=True
        h = upsample_align_corners(h, (h.shape[1] * 2, h.shape[2] * 2))
        h = nn.relu(nn.Conv(128, (3, 3), padding=1,
                            name="conv_after_upsample1")(h))
        h = upsample_align_corners(h, (h.shape[1] * 2, h.shape[2] * 2))
        h = nn.relu(nn.Conv(128, (3, 3), padding=1,
                            name="conv_after_upsample2")(h))
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="final_conv")(h)


class TriplanePredictorViT(nn.Module):
    """Fuses low-res semantic + high-res detail features into raw planes
    (`segformer/models.py:91`)."""

    num_blocks: int = 1
    vit_dim: int = 1024
    out_channels: int = 96

    @nn.compact
    def __call__(self, x_low, x_high):
        x = jnp.concatenate([x_low, x_high], axis=-1)
        h = nn.leaky_relu(nn.Conv(256, (3, 3), padding=1, name="first_conv")(x), 0.01)
        h = nn.leaky_relu(nn.Conv(128, (3, 3), padding=1, name="second_conv")(h), 0.01)
        h = OverlapPatchEmbed(self.vit_dim, 3, 2, ln_eps=1e-5,
                              name="patch_embed")(h)
        for i in range(self.num_blocks):
            h = MiTBlock(self.vit_dim, num_heads=4, sr_ratio=2, mlp_ratio=2,
                         ln_eps=1e-5, name=f"block{i + 1}")(h)
        h = pixel_shuffle(h, 2)  # back to plane resolution, dim/4 channels
        h = jnp.concatenate([h, x_low], axis=-1)
        h = nn.leaky_relu(nn.Conv(256, (3, 3), padding=1,
                                  name="first_conv_after_cat")(h), 0.01)
        h = nn.leaky_relu(nn.Conv(128, (3, 3), padding=1,
                                  name="second_conv_after_cat")(h), 0.01)
        h = nn.leaky_relu(nn.Conv(128, (3, 3), padding=1,
                                  name="third_conv_after_cat")(h), 0.01)
        return nn.Conv(self.out_channels, (3, 3), padding=1, name="final_conv")(h)


class CompositeImg2PlaneBackbone(nn.Module):
    """Full composite backbone: image [B,H,W,3] -> planes [B,3,H/2,W/2,C]."""

    plane_channels: int = 96
    scale: str = "standard"         # small | standard | large
    vit_dim: int = 1024
    input_mode: str = "rgb"         # rgb | rgb_alpha | rgb_camera | rgb_alpha_camera
    norm_mode: str = "gn"           # "affine" for converted torch ckpts

    @nn.compact
    def __call__(self, img: jnp.ndarray, cond: dict | None = None) -> jnp.ndarray:
        b, h, w, _ = img.shape
        x = img
        if "alpha" in self.input_mode:
            alphas = (cond or {}).get("ref_alphas")
            if alphas is None:
                alphas = (img.mean(axis=-1, keepdims=True) >= -0.999).astype(img.dtype)
            x = jnp.concatenate([x, alphas], axis=-1)
        if "camera" in self.input_mode:
            cam_feat = nn.Dense(3, name="camera_to_channel")((cond or {})["ref_cameras"])
            cam_feat = jnp.broadcast_to(cam_feat[:, None, None, :], (b, h, w, 3))
            x = jnp.concatenate([x, cam_feat], axis=-1)

        # both axes normalized by H, matching the reference exactly
        # (`img2plane_model.py:60-62`: grid_x/H and grid_y/H; grid_x is the
        # ROW coordinate — torch meshgrid defaults to 'ij')
        gy, gx = jnp.meshgrid(jnp.arange(h) / h, jnp.arange(w) / h, indexing="ij")
        grid = jnp.broadcast_to(jnp.stack([gy, gx], -1)[None], (b, h, w, 2))
        x = jnp.concatenate([x, grid.astype(x.dtype)], axis=-1)

        low_blocks, pred_blocks = COMPOSITE_SCALES[self.scale]
        feat_low = DeepLabV3LowEncoder(
            norm_mode=self.norm_mode, name="low_reso_encoder")(x)
        feat_low = LowResolutionViT(
            num_blocks=low_blocks, vit_dim=self.vit_dim, name="low_reso_vit"
        )(feat_low)
        feat_high = HighResoEncoder(name="high_reso_encoder")(x)
        planes = TriplanePredictorViT(
            num_blocks=pred_blocks, vit_dim=self.vit_dim,
            out_channels=self.plane_channels * 3, name="triplane_predictor_vit",
        )(feat_low, feat_high)

        bp, hp, wp, _ = planes.shape
        planes = planes.reshape(bp, hp, wp, 3, self.plane_channels)
        planes = jnp.moveaxis(planes, 3, 1)
        return apply_plane_flips(planes)
