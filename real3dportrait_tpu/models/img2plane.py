"""One-shot avatar models: image -> tri-plane -> rendered portrait.

Functional Flax re-design of the reference model stack:

* :class:`OSAvatarImg2Plane` — `modules/real3d/img2plane_baseline.py:80`:
  img2plane backbone + OSGDecoder + volume renderer + SR head.
* :class:`OSAvatarSECCImg2Plane` — `modules/real3d/secc_img2plane.py:24`:
  adds the SECC-conditioned motion backbone whose residual plane is fused
  with the canonical plane.

The reference's stateful plane cache (``cache_backbone`` /
``use_cached_backbone``, `secc_img2plane.py:93-112`) becomes explicit data
flow: ``cal_cano_plane`` is a separate method, and ``synthesis`` accepts the
precomputed plane — the inference pipeline jits the backbone once per video
and feeds the cached plane into the per-frame step.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from real3dportrait_tpu.geometry.camera import unpack_camera
from real3dportrait_tpu.models.decoder import OSGDecoder
from real3dportrait_tpu.models.segformer import (
    SegFormerImg2PlaneBackbone,
    SegFormerSECC2PlaneBackbone,
)
from real3dportrait_tpu.models.superresolution import SuperresolutionHybrid8XDC
from real3dportrait_tpu.rendering.ray_sampler import sample_rays
from real3dportrait_tpu.rendering.renderer import (
    RenderOptions,
    render_rays,
    run_model,
)


class SameBlock3d(nn.Module):
    """3D-conv residual block with replicate padding and a learned residual
    scale (`img2plane_baseline.py:30`, alpha init 0.01)."""

    feats: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [N,D,H,W,C]
        def conv(h, name):
            h = jnp.pad(h, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0)),
                        mode="edge")
            return nn.Conv(self.feats, (3, 3, 3), padding="VALID",
                           name=name)(h)

        h = nn.relu(nn.GroupNorm(num_groups=4, name="norm1")(x))
        h = conv(h, "conv1")
        h = nn.relu(nn.GroupNorm(num_groups=4, name="norm2")(h))
        h = conv(h, "conv2")
        alpha = self.param("alpha", lambda k: jnp.full((1,), 0.01))
        return x + alpha * h


class Plane2GridModule(nn.Module):
    """3D-conv refinement of trigrid planes for ``triplane_feature_type=
    trigrid_v2`` (`img2plane_baseline.py:58`): shared by the cano and SECC
    plane paths (`img2plane_baseline.py:131-134`, `secc_img2plane.py:55-58`).
    """

    triplane_depth: int = 3
    channels: int = 32

    @nn.compact
    def __call__(self, planes: jnp.ndarray) -> jnp.ndarray:  # [B,3,D,H,W,C]
        b, k, d, h, w, c = planes.shape
        x = planes.reshape(b * k, d, h, w, c)
        for i in range(1 if self.triplane_depth <= 3 else 2):
            x = SameBlock3d(c, name=f"block{i}")(x)
        return x.reshape(b, k, d, h, w, c)


class OSAvatarImg2Plane(nn.Module):
    """One-shot image -> canonical plane -> rendered image."""

    triplane_hid_dim: int = 32
    triplane_depth: int = 3
    triplane_feature_type: str = "trigrid"  # triplane | trigrid | trigrid_v2
    neural_rendering_resolution: int = 128
    final_resolution: int = 512
    backbone_mode: str = "segformer"        # segformer | composite
    backbone_scale: str = "b0"              # MiT scale, or composite scale
    composite_vit_dim: int = 1024
    w_dim: int = 512
    sr_num_fp16_res: int = 4
    sr_channel0: int = 256
    sr_channel1: int = 128
    num_samples_coarse: int = 48
    num_samples_fine: int = 48
    box_warp: float = 1.0
    ray_near: Any = "auto"
    ray_far: Any = "auto"
    render_bf16: bool = False         # bf16 plane sampling + decoder matmuls
    torso_bf16: bool = False          # bf16 compute through the torso branch
    sr_fuse_bf16: bool = False        # bf16 compute in the SR fusion convs
    corner_fold: bool = False         # fold sampler corner reduce into net0
    head_norm_mode: str = "gn"        # "folded_bn" for converted torch ckpts

    @property
    def plane_channels(self) -> int:
        return self.triplane_hid_dim * self.triplane_depth

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
        if self.backbone_mode == "composite":
            from real3dportrait_tpu.models.img2plane_composite import (
                CompositeImg2PlaneBackbone,
            )

            self.img2plane_backbone = CompositeImg2PlaneBackbone(
                plane_channels=self.plane_channels,
                scale=self.backbone_scale if self.backbone_scale in
                ("small", "standard", "large") else "standard",
                vit_dim=self.composite_vit_dim,
                norm_mode="affine" if self.head_norm_mode == "folded_bn"
                else self.head_norm_mode,
            )
        else:
            self.img2plane_backbone = SegFormerImg2PlaneBackbone(
                scale=self.backbone_scale, plane_channels=self.plane_channels,
                head_norm_mode=self.head_norm_mode,
            )
        # render_bf16 extends to the decoder MLP + its rgb/feature output:
        # the fat [rays*samples, C] color tensor then stays bf16 all the way
        # to the composite einsum (fp32 MXU accumulation) — halving the
        # decode->march reshape traffic the r5 XLA trace priced at
        # ~1.9 ms/frame. Density math is recast to fp32 by the renderer.
        self.decoder = OSGDecoder(
            hidden_dim=64, output_dim=self.triplane_hid_dim,
            dtype=jnp.bfloat16 if self.render_bf16 else jnp.float32,
        )
        if self.triplane_feature_type == "trigrid_v2":
            self.plane2grid_module = Plane2GridModule(
                triplane_depth=self.triplane_depth,
                channels=self.triplane_hid_dim,
            )
        self.superresolution = self._make_superresolution()

    def _make_superresolution(self):
        """SR-head factory; the torso model overrides this with the
        warp/fusion head (mirrors the reference's `_forward_sr` split)."""
        return SuperresolutionHybrid8XDC(
            w_dim=self.w_dim,
            sr_num_fp16_res=self.sr_num_fp16_res,
            input_resolution=self.neural_rendering_resolution,
            block0_channels=self.sr_channel0,
            block1_channels=self.sr_channel1,
            final_resolution=self.final_resolution,
        )

    def _forward_sr(self, rgb_image, feature_image, ws, weights_image, cond,
                    noise_mode) -> tuple[jnp.ndarray, dict]:
        """(sr_image, extra outputs); cond unused by the plain SR head."""
        return self.superresolution(rgb_image, feature_image, ws,
                                    noise_mode=noise_mode), {}

    def _to_render_layout(self, planes: jnp.ndarray) -> jnp.ndarray:
        """[B,3,H,W,C*D] -> triplane [B,3,H,W,C] or trigrid [B,3,D,H,W,C]."""
        if self.triplane_feature_type == "triplane":
            return planes
        b, k, h, w, cd = planes.shape
        c, d = self.triplane_hid_dim, self.triplane_depth
        planes = planes.reshape(b, k, h, w, c, d)
        planes = jnp.moveaxis(planes, -1, 2)  # [B,3,D,H,W,C]
        if self.triplane_feature_type == "trigrid_v2":
            planes = self.plane2grid_module(planes)
        return planes

    def cal_cano_plane(self, img: jnp.ndarray) -> jnp.ndarray:
        """Source image [B,H,W,3] -> canonical plane in render layout."""
        planes = self.img2plane_backbone(img)
        return self._to_render_layout(planes)

    def _decoder_fn(self):
        # a Pallas fused plane-mean+MLP decoder was built, measured in the
        # flagship graph (62.8 vs 52.3 ms/frame, BASELINE.md round 4) and
        # deleted — the XLA decoder path wins. corner_fold=True advertises
        # supports_corners so render_rays hands OSGDecoder the unreduced
        # (rows, weights) packed form and net0's matmul folds the corner
        # reduce (r5; off by default — A/B'd on the real chip, see
        # BASELINE.md r5).
        fn = lambda feats, dirs: self.decoder(feats, dirs)  # noqa: E731
        fn.supports_corners = self.corner_fold
        return fn

    def render_planes(
        self,
        planes: jnp.ndarray,
        camera: jnp.ndarray,
        key: jax.Array | None = None,
        noise_mode: str = "none",
        cond: dict | None = None,
    ) -> dict:
        """Volume-render planes under ``camera`` [B,25] + run SR."""
        c2w, intrinsics = unpack_camera(camera)
        res = self.neural_rendering_resolution
        origins, dirs = sample_rays(c2w, intrinsics, res)
        if self.render_bf16:
            # halve HBM traffic of the per-sample plane gathers; the ray
            # marcher recasts to fp32 before compositing
            planes = planes.astype(jnp.bfloat16)
        out = render_rays(
            planes, self._decoder_fn(), origins, dirs, self.render_options, key=key
        )
        b = camera.shape[0]
        feature_image = out["rgb"].reshape(b, res, res, -1)
        depth_image = out["depth"].reshape(b, res, res, 1)
        weights_image = out["weights_sum"].reshape(b, res, res, 1)

        rgb_image = feature_image[..., :3]
        ones_ws = jnp.ones((b, 14, self.w_dim), feature_image.dtype)
        sr_image, extra = self._forward_sr(
            rgb_image, feature_image, ones_ws, weights_image, cond, noise_mode
        )
        ret = {
            "image": jnp.clip(sr_image, -1, 1),
            "image_raw": jnp.clip(rgb_image, -1, 1),
            "image_depth": depth_image,
            "image_feature": feature_image[..., 3:],
            "weights_img": weights_image,
            "plane": planes,
        }
        ret.update(extra)
        return ret

    def sample_points(self, planes: jnp.ndarray, coordinates: jnp.ndarray,
                      directions: jnp.ndarray | None = None) -> dict:
        """Decode {'rgb','sigma'} at arbitrary world coords (density reg / shapes)."""
        return run_model(
            planes, self._decoder_fn(), coordinates, directions, self.render_options
        )

    def synthesis(
        self,
        img: jnp.ndarray,
        camera: jnp.ndarray,
        planes: jnp.ndarray | None = None,
        key: jax.Array | None = None,
        noise_mode: str = "none",
    ) -> dict:
        if planes is None:
            planes = self.cal_cano_plane(img)
        return self.render_planes(planes, camera, key=key, noise_mode=noise_mode)

    def __call__(self, img, camera, **kw) -> dict:
        return self.synthesis(img, camera, **kw)


class OSAvatarSECCImg2Plane(OSAvatarImg2Plane):
    """Adds SECC motion conditioning (`modules/real3d/secc_img2plane.py:24`)."""

    pncc_cond_mode: str = "cano_src_tgt"  # cano_src_tgt | cano_tgt
    secc_segformer_scale: str = "b0"
    plane_fusion_mode: str = "add"  # add | mul
    secc_plane_cnn_bf16: bool = False  # bf16 plane-CNN convs (per-frame path)

    def setup(self):
        super().setup()
        self.secc_img2plane_backbone = SegFormerSECC2PlaneBackbone(
            scale=self.secc_segformer_scale,
            plane_channels=self.plane_channels,
            pncc_cond_mode=self.pncc_cond_mode,
            head_norm_mode=self.head_norm_mode,
            plane_cnn_bf16=self.secc_plane_cnn_bf16,
        )

    def cal_secc_plane(self, secc: jnp.ndarray) -> jnp.ndarray:
        """SECC condition maps [B,H,W,6|9] -> motion residual plane."""
        planes = self.secc_img2plane_backbone(secc)
        return self._to_render_layout(planes)

    def cal_plane_given_cano(self, cano_plane: jnp.ndarray, secc: jnp.ndarray) -> jnp.ndarray:
        """Fuse cached canonical plane with per-frame SECC plane
        (`secc_img2plane.py:73`)."""
        secc_plane = self.cal_secc_plane(secc)
        if self.plane_fusion_mode == "add":
            return cano_plane + secc_plane
        return cano_plane * secc_plane

    def synthesis(
        self,
        img: jnp.ndarray,
        camera: jnp.ndarray,
        secc: jnp.ndarray | None = None,
        cano_planes: jnp.ndarray | None = None,
        key: jax.Array | None = None,
        noise_mode: str = "none",
        cond: dict | None = None,
    ) -> dict:
        if cano_planes is None:
            cano_planes = self.cal_cano_plane(img)
        planes = (
            self.cal_plane_given_cano(cano_planes, secc)
            if secc is not None
            else cano_planes
        )
        out = self.render_planes(planes, camera, key=key, noise_mode=noise_mode,
                                 cond=cond)
        out["cano_plane"] = cano_planes
        return out

    def __call__(self, img, camera, secc=None, **kw) -> dict:
        return self.synthesis(img, camera, secc=secc, **kw)


class OSAvatarSECCImg2PlaneTorso(OSAvatarSECCImg2Plane):
    """Head+torso+background model (`modules/real3d/secc_img2plane_torso.py:7`).

    The plain SR head is replaced by the warp-based torso/background fusion
    SR; everything else (plane caching, SECC fusion, renderer, bf16/fused
    decoder options) is inherited. ``cond`` must carry ``ref_torso_img``,
    ``bg_img``, ``segmap``, ``kp_src``, ``kp_drv``
    (+optional ``target_torso_mask``).
    """

    torso_kp_num: int = 4
    torso_scale: str = "standard"
    fuse_mode: str = "v2"
    head_threshold: float = 0.9
    torso_version: str = "v2"
    torso_inp_mode: str = "rgb_alpha"
    mfe_fat_bf16: bool = False  # bf16 for the MFE's fat 7^3/occlusion convs
    mfe_bf16: bool = False      # bf16 for the whole motion-field estimator

    def _make_superresolution(self):
        from real3dportrait_tpu.models.sr_with_ref import SuperresolutionHybrid8XDCWarp

        return SuperresolutionHybrid8XDCWarp(
            w_dim=self.w_dim,
            sr_num_fp16_res=self.sr_num_fp16_res,
            input_resolution=self.neural_rendering_resolution,
            mid_resolution=self.final_resolution // 2,
            final_resolution=self.final_resolution,
            block0_channels=self.sr_channel0,
            block1_channels=self.sr_channel1,
            torso_kp_num=self.torso_kp_num,
            torso_scale=self.torso_scale,
            fuse_mode=self.fuse_mode,
            head_threshold=self.head_threshold,
            torso_version=self.torso_version,
            torso_inp_mode=self.torso_inp_mode,
            torso_norm_mode="affine" if self.head_norm_mode == "folded_bn"
            else self.head_norm_mode,
            torso_bf16=self.torso_bf16,
            torso_mfe_fat_bf16=self.mfe_fat_bf16,
            torso_mfe_bf16=self.mfe_bf16,
            fuse_bf16=self.sr_fuse_bf16,
        )

    def cal_torso_appearance(self, cond: dict) -> jnp.ndarray:
        """Per-video cacheable torso appearance volume (inputs: source torso
        image + segmap only) — compute once, pass back per frame as
        ``cond['torso_appearance']``, mirroring the cano-plane cache."""
        b = cond["ref_torso_img"].shape[0]
        r = self.neural_rendering_resolution
        dummy = jnp.zeros((b, r, r, 3))
        volume, _ = self.superresolution(
            dummy, dummy, jnp.zeros((b, 1, self.w_dim)),
            ref_torso_rgb=cond["ref_torso_img"],
            ref_bg_rgb=cond["bg_img"],
            weights_img=jnp.zeros((b, r, r, 1)),
            segmap=cond["segmap"],
            kp_s=cond["kp_src"],
            kp_d=cond["kp_drv"],
            appearance_only=True,
        )
        return volume

    def cal_bg_feat(self, cond: dict) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Per-video cacheable background feature: (mid-res bg RGB, encoded
        bg feature). Inputs are the background image only — compute once,
        pass back per frame as ``cond['bg_feat']`` (same dataflow as the
        torso appearance / cano plane caches)."""
        b = cond["bg_img"].shape[0]
        r = self.neural_rendering_resolution
        dummy = jnp.zeros((b, r, r, 3))
        feat, _ = self.superresolution(
            dummy, dummy, jnp.zeros((b, 1, self.w_dim)),
            ref_torso_rgb=cond["ref_torso_img"],
            ref_bg_rgb=cond["bg_img"],
            weights_img=jnp.zeros((b, r, r, 1)),
            segmap=cond["segmap"],
            kp_s=cond["kp_src"],
            kp_d=cond["kp_drv"],
            bg_only=True,
        )
        return feat

    def _forward_sr(self, rgb_image, feature_image, ws, weights_image, cond,
                    noise_mode):
        sr_image, torso_ret = self.superresolution(
            rgb_image, feature_image, ws,
            ref_torso_rgb=cond["ref_torso_img"],
            ref_bg_rgb=cond["bg_img"],
            weights_img=weights_image,
            segmap=cond["segmap"],
            kp_s=cond["kp_src"],
            kp_d=cond["kp_drv"],
            target_torso_mask=cond.get("target_torso_mask"),
            appearance_volume=cond.get("torso_appearance"),
            bg_feat=cond.get("bg_feat"),
            noise_mode=noise_mode,
        )
        extra = {
            "torso_ret": {k: v for k, v in torso_ret.items() if k != "losses"},
            "facev2v_losses": torso_ret["losses"],
        }
        return sr_image, extra

    def synthesis(self, img, camera, cond=None, secc=None, cano_planes=None,
                  key=None, noise_mode: str = "none") -> dict:
        assert cond is not None, "torso model requires the cond dict"
        return super().synthesis(img, camera, secc=secc, cano_planes=cano_planes,
                                 key=key, noise_mode=noise_mode, cond=cond)

    def __call__(self, img, camera, cond=None, secc=None, **kw) -> dict:
        return self.synthesis(img, camera, cond=cond, secc=secc, **kw)
