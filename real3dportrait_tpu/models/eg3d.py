"""EG3D tri-plane generator (frozen teacher for img2plane distillation).

Flax equivalent of `modules/eg3ds/models/triplane.py:23`: StyleGAN2 mapping
+ synthesis produce a 3x32-channel tri-plane at 256²; rendering/SR reuse the
shared renderer and SR head. Used as a data generator in the img2plane
distillation stage (`tasks/os_avatar/img2plane_task.py:175-203`).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from real3dportrait_tpu.geometry.camera import unpack_camera
from real3dportrait_tpu.models.decoder import OSGDecoder
from real3dportrait_tpu.models.stylegan2 import MappingNetwork, SynthesisNetwork
from real3dportrait_tpu.models.superresolution import SuperresolutionHybrid8XDC
from real3dportrait_tpu.rendering.ray_sampler import sample_rays
from real3dportrait_tpu.rendering.renderer import RenderOptions, render_rays


class TriPlaneGenerator(nn.Module):
    z_dim: int = 512
    w_dim: int = 512
    camera_dim: int = 25
    plane_resolution: int = 256
    triplane_hid_dim: int = 32
    neural_rendering_resolution: int = 128
    final_resolution: int = 512
    channel_base: int = 32768
    channel_max: int = 512
    mapping_layers: int = 2
    sr_num_fp16_res: int = 4
    num_samples_coarse: int = 48
    num_samples_fine: int = 48
    box_warp: float = 1.0
    corner_fold: bool = False  # fold sampler corner reduce into decoder net0
    ray_near: Any = "auto"
    ray_far: Any = "auto"

    @property
    def render_options(self) -> RenderOptions:
        return RenderOptions(
            depth_resolution=self.num_samples_coarse,
            depth_resolution_importance=self.num_samples_fine,
            box_warp=self.box_warp,
            ray_start=self.ray_near,
            ray_end=self.ray_far,
        )

    def setup(self):
        self.backbone = SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.plane_resolution,
            img_channels=3 * self.triplane_hid_dim,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
        )
        self.mapping = MappingNetwork(
            z_dim=self.z_dim,
            c_dim=self.camera_dim,
            w_dim=self.w_dim,
            num_ws=self.backbone.num_ws,
            num_layers=self.mapping_layers,
        )
        self.decoder = OSGDecoder(hidden_dim=64, output_dim=self.triplane_hid_dim)
        self.superresolution = SuperresolutionHybrid8XDC(
            w_dim=self.w_dim,
            sr_num_fp16_res=self.sr_num_fp16_res,
            input_resolution=self.neural_rendering_resolution,
            final_resolution=self.final_resolution,
        )

    def map_latents(self, z, camera, truncation_psi=1.0, update_emas=False):
        return self.mapping(z, camera, truncation_psi=truncation_psi, update_emas=update_emas)

    def sample_points(self, planes, coordinates, directions=None):
        """Decode {'rgb','sigma'} at world coords (density reg / shapes,
        `triplane.py:141` sample_mixed)."""
        from real3dportrait_tpu.rendering.renderer import run_model

        return run_model(planes, lambda f, d: self.decoder(f, d), coordinates,
                         directions, self.render_options)

    def cal_planes(self, ws, noise_mode: str = "const") -> jnp.ndarray:
        """ws -> tri-plane [B, 3, H, W, C]."""
        planes = self.backbone(ws, noise_mode=noise_mode)
        b, h, w, _ = planes.shape
        planes = planes.reshape(b, h, w, 3, self.triplane_hid_dim)
        return jnp.moveaxis(planes, 3, 1)

    def synthesis(self, ws, camera, key=None, noise_mode: str = "const") -> dict:
        planes = self.cal_planes(ws, noise_mode=noise_mode)
        c2w, intrinsics = unpack_camera(camera)
        res = self.neural_rendering_resolution
        origins, dirs = sample_rays(c2w, intrinsics, res)
        decoder_fn = lambda f, d: self.decoder(f, d)  # noqa: E731
        decoder_fn.supports_corners = self.corner_fold  # r5 fast path knob
        out = render_rays(
            planes, decoder_fn, origins, dirs, self.render_options, key=key,
        )
        b = camera.shape[0]
        feature_image = out["rgb"].reshape(b, res, res, -1)
        rgb_image = feature_image[..., :3]
        ones_ws = jnp.ones((b, 14, self.w_dim), feature_image.dtype)
        sr_image = self.superresolution(rgb_image, feature_image, ones_ws,
                                        noise_mode=noise_mode)
        return {
            "image": jnp.clip(sr_image, -1, 1),
            "image_raw": jnp.clip(rgb_image, -1, 1),
            "image_depth": out["depth"].reshape(b, res, res, 1),
            "plane": planes,
        }

    def __call__(self, z, camera, truncation_psi=1.0, update_emas=False,
                 key=None, noise_mode: str = "const") -> dict:
        ws = self.map_latents(z, camera, truncation_psi=truncation_psi,
                              update_emas=update_emas)
        return self.synthesis(ws, camera, key=key, noise_mode=noise_mode)
