"""EG3D dual discriminator: joint D over (SR image, upsampled raw image).

Flax redesign of `modules/eg3ds/models/dual_discriminator.py:127`: the raw
neural-rendered image is antialias-resized to the final resolution and
concatenated (6 channels); conditioning is the 25-d camera vector embedded
through a mapping network, optionally jittered with per-dim noise
(``disc_c_noise``, key-threaded here instead of global RNG).
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
from flax import linen as nn

from real3dportrait_tpu.models.stylegan2 import (
    DiscriminatorBlock,
    DiscriminatorEpilogue,
    MappingNetwork,
)
from real3dportrait_tpu.models.superresolution import filtered_resizing


class DualDiscriminator(nn.Module):
    img_resolution: int = 512
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: float = 256.0
    camera_dim: int = 25
    mbstd_group_size: int = 2
    disc_c_noise: float = 0.0

    @nn.compact
    def __call__(
        self,
        image: jnp.ndarray,       # [B, R, R, 3] SR output in [-1,1]
        image_raw: jnp.ndarray,   # [B, r, r, 3] raw render in [-1,1]
        camera: jnp.ndarray,      # [B, 25]
        force_fp32: bool = False,
    ) -> jnp.ndarray:
        raw_up = filtered_resizing(image_raw, image.shape[1])
        img = jnp.concatenate([image, raw_up], axis=-1)
        img = jnp.clip(img, -1.0, 1.0)

        resolutions = [2**i for i in range(int(math.log2(self.img_resolution)), 2, -1)]

        def channels(res):
            return min(self.channel_base // res, self.channel_max)

        cmap_dim = channels(4)
        fp16_resolution = max(
            2 ** (int(math.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8
        )
        x = None
        for res in resolutions:
            x, img = DiscriminatorBlock(
                in_channels=channels(res) if res < self.img_resolution else 0,
                tmp_channels=channels(res),
                out_channels=channels(res // 2),
                resolution=res,
                img_channels=6,
                use_fp16=(self.num_fp16_res > 0 and res >= fp16_resolution),
                conv_clamp=self.conv_clamp,
                name=f"b{res}",
            )(x, img, force_fp32=force_fp32)

        c = camera
        if self.disc_c_noise > 0:
            c_std = jnp.std(c, axis=0) if c.shape[0] > 1 else 1.0
            c = c + jax.random.normal(self.make_rng("noise"), c.shape) * c_std * self.disc_c_noise
        cmap = MappingNetwork(
            z_dim=0, c_dim=self.camera_dim, w_dim=cmap_dim, num_ws=None,
            w_avg_beta=None, name="mapping",
        )(None, c)
        return DiscriminatorEpilogue(
            channels(4), cmap_dim=cmap_dim, mbstd_group_size=self.mbstd_group_size,
            conv_clamp=self.conv_clamp, name="b4",
        )(x, cmap)
