"""GAN super-resolution heads (raw neural rendering -> final image).

Flax equivalents of `modules/eg3ds/models/superresolution.py`:
``SuperresolutionHybrid8XDC`` (128 -> 512, two StyleGAN2 blocks, the head
used by Real3D-Portrait) plus the 4X variant, and the antialiased
``filtered_resizing`` helper used by the dual discriminator.

Layout NHWC. The SR head is conditioned on a constant ``ws`` at inference
(`img2plane_baseline.py:142` passes ones), so ``ws`` is [B, num, w_dim] and
only the last latent is used, repeated 3x, as in the reference.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from real3dportrait_tpu.models.stylegan2 import SynthesisBlock


def resize_bilinear(x: jnp.ndarray, size: int, antialias: bool = True) -> jnp.ndarray:
    """NHWC bilinear resize (align_corners=False semantics of jax.image)."""
    b, h, w, c = x.shape
    return jax.image.resize(x, (b, size, size, c), method="bilinear", antialias=antialias)


def filtered_resizing(x: jnp.ndarray, size: int, filter_mode: str = "antialiased"):
    """Antialiased resize used by the dual discriminator
    (`dual_discriminator.py:100`)."""
    if filter_mode == "antialiased":
        return resize_bilinear(x, size, antialias=True)
    if filter_mode == "none":
        return resize_bilinear(x, size, antialias=False)
    raise NotImplementedError(filter_mode)


class SuperresolutionHybrid8XDC(nn.Module):
    """128 -> 512 SR head (`superresolution.py:331`): 2 skip SynthesisBlocks."""

    w_dim: int = 512
    sr_num_fp16_res: int = 4
    sr_antialias: bool = True
    input_resolution: int = 128
    block0_channels: int = 256
    block1_channels: int = 128
    final_resolution: int = 512

    @nn.compact
    def __call__(self, rgb: jnp.ndarray, x: jnp.ndarray, ws: jnp.ndarray,
                 noise_mode: str = "none") -> jnp.ndarray:
        """rgb [B,h,w,3] raw image, x [B,h,w,C] feature image, ws [B,*,w_dim]."""
        use_fp16 = self.sr_num_fp16_res > 0
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)
        # block0 doubles spatially, so land exactly on final//4 — smoke
        # configs may pick neural_rendering_resolution != final_resolution/4
        if x.shape[1] != self.final_resolution // 4:
            x = resize_bilinear(x, self.final_resolution // 4,
                                antialias=self.sr_antialias)
            rgb = resize_bilinear(rgb, self.final_resolution // 4,
                                  antialias=self.sr_antialias)
        x, rgb = SynthesisBlock(
            in_channels=x.shape[-1], out_channels=self.block0_channels,
            w_dim=self.w_dim, resolution=self.final_resolution // 2, img_channels=3,
            is_last=False, use_fp16=use_fp16,
            conv_clamp=256.0 if use_fp16 else None, name="block0",
        )(x, rgb, ws, noise_mode=noise_mode)
        x, rgb = SynthesisBlock(
            in_channels=self.block0_channels, out_channels=self.block1_channels,
            w_dim=self.w_dim, resolution=self.final_resolution, img_channels=3,
            is_last=True, use_fp16=use_fp16,
            conv_clamp=256.0 if use_fp16 else None, name="block1",
        )(x, rgb, ws, noise_mode=noise_mode)
        return rgb


class SuperresolutionHybrid4X(nn.Module):
    """128 -> 256 variant (`superresolution.py` 4X): NoUp block + one up block."""

    w_dim: int = 512
    sr_num_fp16_res: int = 4
    sr_antialias: bool = True
    input_resolution: int = 128

    @nn.compact
    def __call__(self, rgb, x, ws, noise_mode: str = "none"):
        use_fp16 = self.sr_num_fp16_res > 0
        ws = jnp.repeat(ws[:, -1:, :], 3, axis=1)
        if x.shape[1] < self.input_resolution:
            x = resize_bilinear(x, self.input_resolution, antialias=self.sr_antialias)
            rgb = resize_bilinear(rgb, self.input_resolution, antialias=self.sr_antialias)
        x, rgb = SynthesisBlock(
            in_channels=x.shape[-1], out_channels=128, w_dim=self.w_dim,
            resolution=128, img_channels=3, is_last=False, use_fp16=use_fp16,
            conv_clamp=256.0 if use_fp16 else None, up=1, name="block0",
        )(x, rgb, ws, noise_mode=noise_mode)
        x, rgb = SynthesisBlock(
            in_channels=128, out_channels=64, w_dim=self.w_dim,
            resolution=256, img_channels=3, is_last=True, use_fp16=use_fp16,
            conv_clamp=256.0 if use_fp16 else None, name="block1",
        )(x, rgb, ws, noise_mode=noise_mode)
        return rgb
