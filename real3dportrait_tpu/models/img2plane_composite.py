"""Composite one-shot image-to-triplane backbone.

TPU-native redesign of the reference's default ``composite`` mode
(`modules/img2plane/img2plane_model.py:12`): a low-resolution semantic path
(dilated-conv encoder with ASPP — DeepLabV3's signature block — followed by
a global-attention ViT) runs in parallel with a high-resolution detail CNN;
a final predictor ViT fuses both into the canonical tri-plane. Input gains
xy-coordinate channels (positional encoding) and optional alpha/camera
channels (`img2plane_model.py:20-58`); plane axis flips match hide-nerf.

Channels-last; attention/pixel-shuffle dims are MXU/VPU aligned.
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
    resize_nhwc,
)

COMPOSITE_SCALES = {"small": (2, 1), "standard": (5, 1), "large": (10, 3)}


def pixel_shuffle(x: jnp.ndarray, factor: int = 2) -> jnp.ndarray:
    """[B,H,W,C*r*r] -> [B,H*r,W*r,C] (depth-to-space)."""
    b, h, w, c = x.shape
    r = factor
    x = x.reshape(b, h, w, r, r, c // (r * r))
    x = jnp.transpose(x, (0, 1, 3, 2, 4, 5))
    return x.reshape(b, h * r, w * r, c // (r * r))


class ASPP(nn.Module):
    """Atrous spatial pyramid pooling (DeepLabV3's core block)."""

    out_channels: int = 256
    rates: Sequence[int] = (1, 6, 12, 18)

    @nn.compact
    def __call__(self, x):
        branches = []
        for r in self.rates:
            k = 1 if r == 1 else 3
            branches.append(nn.Conv(self.out_channels, (k, k), padding=(k // 2) * r,
                                    kernel_dilation=r)(x))
        # image-level pooling branch
        pooled = x.mean(axis=(1, 2), keepdims=True)
        pooled = nn.Conv(self.out_channels, (1, 1))(pooled)
        branches.append(jnp.broadcast_to(pooled, x.shape[:3] + (self.out_channels,)))
        h = jnp.concatenate(branches, axis=-1)
        h = nn.Conv(self.out_channels, (1, 1))(h)
        h = nn.GroupNorm(num_groups=32)(h)
        return nn.relu(h)


class LowResoEncoder(nn.Module):
    """Strided/dilated conv encoder to stride 8 + ASPP
    (DeepLabV3(resnet) stand-in, `deeplabv3/decoders/my_model.py:13`)."""

    out_channels: int = 256

    @nn.compact
    def __call__(self, x):
        chans = (64, 128, 256)
        for i, ch in enumerate(chans):
            x = nn.Conv(ch, (3, 3), strides=2, padding=1)(x)
            x = nn.GroupNorm(num_groups=min(32, ch // 4))(x)
            x = nn.relu(x)
            y = nn.Conv(ch, (3, 3), padding=1)(x)
            y = nn.GroupNorm(num_groups=min(32, ch // 4))(y)
            x = nn.relu(x + y)
        return ASPP(self.out_channels)(x)


class HighResoEncoder(nn.Module):
    """Stride-2 detail CNN (`simple_encoders/high_resolution_encoder.py:6`)."""

    out_channels: int = 96

    @nn.compact
    def __call__(self, x):
        h = nn.Conv(64, (7, 7), strides=2, padding=3)(x)
        h = nn.leaky_relu(h, 0.01)
        for _ in range(4):
            h = nn.leaky_relu(nn.Conv(96, (3, 3), padding=1)(h), 0.01)
        return nn.Conv(self.out_channels, (3, 3), padding=1)(h)


class LowResolutionViT(nn.Module):
    """Global-attention ViT over the semantic features, upsampled to the
    plane resolution (`segformer/models.py:11`)."""

    num_blocks: int = 5
    vit_dim: int = 1024
    out_channels: int = 96

    @nn.compact
    def __call__(self, x):  # [B, h, w, 256]
        h = OverlapPatchEmbed(self.vit_dim, 3, 2, name="patch_embed")(x)
        for i in range(self.num_blocks):
            h = MiTBlock(self.vit_dim, num_heads=4, sr_ratio=1, mlp_ratio=2,
                         name=f"block{i + 1}")(h)
        h = pixel_shuffle(h, 2)  # dim/4 channels, 2x spatial
        h = resize_nhwc(h, (h.shape[1] * 2, h.shape[2] * 2))
        h = nn.relu(nn.Conv(128, (3, 3), padding=1)(h))
        h = resize_nhwc(h, (h.shape[1] * 2, h.shape[2] * 2))
        h = nn.relu(nn.Conv(128, (3, 3), padding=1)(h))
        return nn.Conv(self.out_channels, (3, 3), padding=1)(h)


class TriplanePredictorViT(nn.Module):
    """Fuses low-res semantic + high-res detail features into raw planes
    (`segformer/models.py:91`)."""

    num_blocks: int = 1
    vit_dim: int = 1024
    out_channels: int = 96

    @nn.compact
    def __call__(self, x_low, x_high):
        x = jnp.concatenate([x_low, x_high], axis=-1)
        h = nn.leaky_relu(nn.Conv(256, (3, 3), padding=1)(x), 0.01)
        h = nn.leaky_relu(nn.Conv(128, (3, 3), padding=1)(h), 0.01)
        h = OverlapPatchEmbed(self.vit_dim, 3, 2, name="patch_embed")(h)
        for i in range(self.num_blocks):
            h = MiTBlock(self.vit_dim, num_heads=4, sr_ratio=2, mlp_ratio=2,
                         name=f"block{i + 1}")(h)
        h = pixel_shuffle(h, 2)  # back to plane resolution, dim/4 channels
        h = jnp.concatenate([h, x_low], axis=-1)
        h = nn.leaky_relu(nn.Conv(256, (3, 3), padding=1)(h), 0.01)
        h = nn.leaky_relu(nn.Conv(128, (3, 3), padding=1)(h), 0.01)
        h = nn.leaky_relu(nn.Conv(128, (3, 3), padding=1)(h), 0.01)
        return nn.Conv(self.out_channels, (3, 3), padding=1)(h)


class CompositeImg2PlaneBackbone(nn.Module):
    """Full composite backbone: image [B,H,W,3] -> planes [B,3,H/2,W/2,C]."""

    plane_channels: int = 96
    scale: str = "standard"         # small | standard | large
    vit_dim: int = 1024
    input_mode: str = "rgb"         # rgb | rgb_alpha | rgb_camera | rgb_alpha_camera

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
        # (`img2plane_model.py:60-62`: grid_x/H and grid_y/H)
        gy, gx = jnp.meshgrid(jnp.arange(h) / h, jnp.arange(w) / h, indexing="ij")
        grid = jnp.broadcast_to(jnp.stack([gy, gx], -1)[None], (b, h, w, 2))
        x = jnp.concatenate([x, grid.astype(x.dtype)], axis=-1)

        low_blocks, pred_blocks = COMPOSITE_SCALES[self.scale]
        feat_low = LowResoEncoder(name="low_reso_encoder")(x)
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
