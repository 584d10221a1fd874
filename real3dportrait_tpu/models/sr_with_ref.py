"""Torso/background-aware super-resolution fusion head.

Flax redesign of `modules/real3d/super_resolution/sr_with_ref.py:16`
(``SuperresolutionHybrid8XDC_Warp``): the 128² neural head render is
SR'd to 256², alpha-fused with the keypoint-warped torso (face-vid2vid
branch) using the NeRF weights image, composited over the encoded
background with an occlusion union, then SR'd to 512².

Fuse modes: ``v1`` (additive feature blend), ``v2`` (alpha-cat + NoUp
block, the shipped default). All resizes are antialiased bilinear.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn

from real3dportrait_tpu.models.stylegan2 import SynthesisBlock
from real3dportrait_tpu.models.superresolution import resize_bilinear
from real3dportrait_tpu.models.torso import WarpBasedTorsoModel


class SuperresolutionHybrid8XDCWarp(nn.Module):
    w_dim: int = 512
    sr_num_fp16_res: int = 4
    sr_antialias: bool = True
    input_resolution: int = 128
    mid_resolution: int = 256
    final_resolution: int = 512
    block0_channels: int = 256
    block1_channels: int = 128
    torso_kp_num: int = 4
    torso_scale: str = "standard"    # TORSO_PRESETS key
    fuse_mode: str = "v2"            # v1 | v2  (htbsr_head_weight_fuse_mode)
    head_threshold: float = 0.9      # htbsr_head_threshold
    weight_fuse: bool = True
    torso_version: str = "v2"        # v1 | v2 (torso_model_version)
    torso_norm_mode: str = "gn"      # "affine" for converted torch ckpts
    torso_inp_mode: str = "rgb_alpha"  # shipped torso_inp_mode
    torso_bf16: bool = False         # bf16 compute through the torso branch
    torso_mfe_fat_bf16: bool = False  # bf16 for the MFE fat convs only
    torso_mfe_bf16: bool = False      # bf16 for the whole MFE conv stack
    fuse_bf16: bool = False          # bf16 compute through the fusion convs

    def _encode_bg(self, bg_mid: jnp.ndarray, fdt) -> jnp.ndarray:
        """Background feature encoder (~97 GFLOP of 3x3 convs at mid res).

        Depends only on the per-video background image — callers cache it
        via ``bg_only=True`` and feed it back through ``bg_feat``."""
        x_bg = nn.Conv(64, (3, 3), padding=1, dtype=fdt,
                       name="bg_enc_conv0")(bg_mid)
        x_bg = nn.Conv(self.block0_channels, (3, 3), padding=1, dtype=fdt,
                       name="bg_enc_conv1")(nn.leaky_relu(x_bg, 0.01))
        x_bg = nn.Conv(self.block0_channels, (3, 3), padding=1, dtype=fdt,
                       name="bg_enc_conv2")(nn.leaky_relu(x_bg, 0.01))
        return x_bg

    @nn.compact
    def __call__(
        self,
        rgb: jnp.ndarray,             # [B,r,r,3] raw head render
        x: jnp.ndarray,               # [B,r,r,C] feature image
        ws: jnp.ndarray,              # [B,*,w_dim]
        ref_torso_rgb: jnp.ndarray,   # [B,H,W,3] source torso image
        ref_bg_rgb: jnp.ndarray,      # [B,H,W,3] background image
        weights_img: jnp.ndarray,     # [B,r,r,1] NeRF weights image
        segmap: jnp.ndarray,          # [B,H,W,6]
        kp_s: jnp.ndarray,            # [B,68,3]
        kp_d: jnp.ndarray,            # [B,68,3]
        target_torso_mask: jnp.ndarray | None = None,
        noise_mode: str = "none",
        appearance_volume: jnp.ndarray | None = None,  # per-video cache
        appearance_only: bool = False,
        bg_feat: tuple[jnp.ndarray, jnp.ndarray] | None = None,  # per-video cache
        bg_only: bool = False,
    ) -> tuple[jnp.ndarray, dict]:
        use_fp16 = self.sr_num_fp16_res > 0
        mid = self.mid_resolution
        aa = self.sr_antialias
        fdt = jnp.bfloat16 if self.fuse_bf16 else None
        cdt = jnp.bfloat16 if self.fuse_bf16 else jnp.float32
        if bg_only:
            # per-video background cache: the encoded background feature and
            # the mid-res background RGB depend only on the source bg image —
            # compute once per video, feed back as ``bg_feat`` every frame
            # (same dataflow as the torso appearance / cano plane caches).
            bg_mid = resize_bilinear(ref_bg_rgb, mid, antialias=aa)
            return (bg_mid, self._encode_bg(bg_mid, fdt)), {}
        if appearance_only:
            # per-video torso appearance cache (source-only inputs)
            torso_mid = resize_bilinear(ref_torso_rgb, mid, antialias=aa)
            ret = WarpBasedTorsoModel(
                torso_kp_num=self.torso_kp_num, scale=self.torso_scale,
                version=self.torso_version, norm_mode=self.torso_norm_mode,
                inp_mode=self.torso_inp_mode,
                dtype=jnp.bfloat16 if self.torso_bf16 else None,
                mfe_fat_bf16=self.torso_mfe_fat_bf16,
                mfe_bf16=self.torso_mfe_bf16,
                name="torso_model",
            )(torso_mid, segmap, kp_s, kp_d, appearance_only=True)
            return ret["appearance_volume"], ret
        weights_img = jax.lax.stop_gradient(weights_img)
        ws = jnp.broadcast_to(ws[:, -1:, :], (rgb.shape[0], 3, ws.shape[-1]))

        # block0 doubles spatially, so land exactly on mid//2 — smoke configs
        # may pick neural_rendering_resolution != final_resolution/4
        if x.shape[1] != mid // 2:
            x = resize_bilinear(x, mid // 2, antialias=aa)
            rgb = resize_bilinear(rgb, mid // 2, antialias=aa)

        rgb_mid = resize_bilinear(rgb, mid, antialias=aa)
        weights_mid = resize_bilinear(weights_img, mid, antialias=aa)
        torso_mid = resize_bilinear(ref_torso_rgb, mid, antialias=aa)
        if bg_feat is not None:
            bg_mid, x_bg = bg_feat
        else:
            bg_mid = resize_bilinear(ref_bg_rgb, mid, antialias=aa)
            x_bg = self._encode_bg(bg_mid, fdt)

        # head SR branch: input_res -> mid_res
        x, rgb = SynthesisBlock(
            in_channels=x.shape[-1], out_channels=self.block0_channels,
            w_dim=self.w_dim, resolution=mid, img_channels=3, is_last=False,
            use_fp16=use_fp16, conv_clamp=256.0 if use_fp16 else None,
            name="block0",
        )(x, rgb, ws, noise_mode=noise_mode)

        # warp torso branch
        torso_kwargs = {}
        if self.torso_version == "v2":
            torso_kwargs = dict(
                tgt_head_img=jax.lax.stop_gradient(rgb_mid),
                tgt_head_weights=weights_mid,
            )
        torso_ret = WarpBasedTorsoModel(
            torso_kp_num=self.torso_kp_num, scale=self.torso_scale,
            version=self.torso_version, norm_mode=self.torso_norm_mode,
            inp_mode=self.torso_inp_mode,
            dtype=jnp.bfloat16 if self.torso_bf16 else None,
            mfe_fat_bf16=self.torso_mfe_fat_bf16,
            mfe_bf16=self.torso_mfe_bf16,
            name="torso_model",
        )(torso_mid, segmap, kp_s, kp_d,
          target_torso_mask=target_torso_mask,
          appearance_volume=appearance_volume, **torso_kwargs)
        rgb_torso = torso_ret["deformed_torso_img"]
        # fusion convs: ~580 GFLOP of plain 3x3 convs at mid_resolution —
        # the per-frame MXU whale after the renderer. bf16 compute (params
        # fp32) halves their cost on TPU; rgb compositing stays fp32.
        x_torso = nn.Conv(self.block0_channels, (1, 1), dtype=fdt,
                          name="torso_encoder")(
            torso_ret["deformed_torso_hid"]
        )

        if self.weight_fuse:
            alpha = weights_mid
            if self.fuse_mode == "v1":
                rgb = rgb * alpha + rgb_torso * (1 - alpha)
                x = x * alpha + x_torso * (1 - alpha)
            else:  # v2: alpha-cat + NoUp refinement block
                rgb = rgb * alpha + rgb_torso * (1 - alpha)
                x = jnp.concatenate(
                    [(x * alpha).astype(cdt),
                     (x_torso * (1 - alpha)).astype(cdt)], axis=-1)
                x = nn.Conv(self.block0_channels, (3, 3), padding=1, dtype=fdt,
                            name="fuse_ht_conv0")(x)
                x = nn.Conv(self.block0_channels, (3, 3), padding=1, dtype=fdt,
                            name="fuse_ht_conv1")(nn.leaky_relu(x, 0.01))
                x, rgb = SynthesisBlock(
                    in_channels=self.block0_channels,
                    out_channels=self.block0_channels, w_dim=self.w_dim,
                    resolution=mid, img_channels=3, is_last=False,
                    use_fp16=self.fuse_bf16, conv_clamp=None, up=1,
                    name="head_torso_block",
                )(x, rgb, ws, noise_mode=noise_mode)

            head_occlusion = jnp.where(alpha > self.head_threshold, 1.0, alpha)
            torso_occlusion = resize_bilinear(
                torso_ret["occlusion_2"], mid, antialias=aa
            )
            person = jnp.clip(torso_occlusion + head_occlusion, 0.0, 1.0)
            rgb = (rgb * person + bg_mid * (1 - person)).astype(jnp.float32)
            x = jnp.concatenate(
                [(x * person).astype(cdt), (x_bg * (1 - person)).astype(cdt)],
                axis=-1)
        else:
            x = jnp.concatenate([x, x_torso, x_bg], axis=-1)

        x = nn.Conv(64, (1, 1), dtype=fdt, name="fuse_fb_conv0")(x)
        x = nn.Conv(self.block0_channels, (3, 3), padding=1, dtype=fdt,
                    name="fuse_fb_conv1")(nn.leaky_relu(x, 0.01))
        x = nn.Conv(self.block0_channels, (3, 3), padding=1, dtype=fdt,
                    name="fuse_fb_conv2")(nn.leaky_relu(x, 0.01))
        x, rgb = SynthesisBlock(
            in_channels=self.block0_channels, out_channels=self.block1_channels,
            w_dim=self.w_dim, resolution=self.final_resolution, img_channels=3,
            is_last=True, use_fp16=use_fp16,
            conv_clamp=256.0 if use_fp16 else None, name="block1",
        )(x, rgb, ws, noise_mode=noise_mode)
        return rgb, torso_ret
