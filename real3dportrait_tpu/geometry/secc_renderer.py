"""SECC (Semantic-aware Explicit Camera Condition) map rendering.

Equivalent of `deep_3drecon/secc_renderer.py:10`: the BFM face mesh, colored
with the fixed NCC code and with the eyeball faces removed, is rasterized
from the fitted (id, exp, euler, trans) coefficients into a map in [-1, 1]
plus a coverage mask.

The whole chain — coefficients -> vertices -> sorted z-buffer -> NCC map —
is ONE jitted graph (eager per-op dispatch through the tunnel costs more
than the compute). Faces are statically bucketed by projected size so small
triangles emit small candidate patches (`rasterize_grouped`).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

from real3dportrait_tpu.geometry import bfm as bfm_ops
from real3dportrait_tpu.geometry.bfm import BFMAssets
from real3dportrait_tpu.geometry.rasterizer import (
    rasterize_grouped,
    split_faces_by_px_bound,
    split_faces_by_size,
)


def zero_pose_px_bounds(
    assets: BFMAssets,
    faces: np.ndarray,
    focal: float,
    center: float,
    image_size: int,
    z_slack: float = 0.2,
    margin_px: float = 1.0,
) -> np.ndarray:
    """Per-face projected-size bound under the SECC zero-pose contract.

    SECC maps are always rendered at euler = trans = 0 (the reference does
    the same — `secc_renderer.py` is only ever called with zero pose from
    `secc_img2plane_task.py:175-188` / `real3d_infer.py:396-403`; head pose
    enters through the EG3D camera, not the SECC render). With pose fixed,
    each face's depth is known up to the small id/exp morph, so the bound
    uses the face's OWN depth (minus ``z_slack``) instead of a global
    worst-case zmin — 20-40% fewer candidates, and candidate count is the
    rasterizer's entire cost.

    Note the morph does NOT need a patch-size allowance for its
    translation component: the K x K candidate patch is anchored at the
    per-frame projected bbox corner (`_candidate_keys_lane_major`), so only
    the projected-EXTENT change matters, which ``margin_px`` absorbs (the
    reference's fitted coefficients stretch a ~3 px triangle by well under
    a pixel; verified by the exact-mask grouped-vs-sorted test at 0.5-sigma
    synthetic draws, whose random dense basis deforms far more than the
    smooth real one).
    """
    n = assets.mean_shape.size // 3
    ms = np.asarray(assets.mean_shape).reshape(n, 3)
    faces = np.asarray(faces)
    v = ms[faces]                                        # [F,3,3]
    ext = (v.max(1) - v.min(1))[:, :2].max(-1)
    # camera space: z = camera_distance - shape_z (bfm.to_camera)
    zmin_face = (bfm_ops.DEFAULT_CAMERA_DISTANCE - v[..., 2].max(1)) - z_slack
    scale = image_size / (2.0 * center)
    return ext * focal / np.maximum(zmin_face, 1.0) * scale + margin_px


def load_eye_free_faces(assets: BFMAssets, bfm_dir: str | None) -> jnp.ndarray:
    """Faces with eyeball triangles removed (`secc_renderer.py:23-33`)."""
    faces = np.asarray(assets.face_buf)
    if bfm_dir:
        re_p = os.path.join(bfm_dir, "bfm_right_eye_faces.npy")
        le_p = os.path.join(bfm_dir, "bfm_left_eye_faces.npy")
        if os.path.isfile(re_p) and os.path.isfile(le_p):
            delete = np.concatenate([np.load(re_p), np.load(le_p)]) - 1
            keep = np.ones(len(faces), bool)
            keep[delete] = False
            faces = faces[keep]
    return jnp.asarray(faces, jnp.int32)


class SECCRenderer:
    """Holds static rasterization config; ``render`` is one jitted graph."""

    def __init__(
        self,
        assets: BFMAssets,
        bfm_dir: str | None = None,
        rasterize_size: int = 512,
        patch_size: int = 16,
        face_chunk: int = 8192,  # kept for API compat; sorted path ignores it
        output_resolution: int | None = None,
        assume_zero_pose: bool = True,
    ):
        """``rasterize_size`` is the z-buffer resolution; ``output_resolution``
        (default: same) bilinearly upsamples the SECC/mask maps afterwards.

        Rasterizing at 256² and upsampling to the 512² cond-map size quarters
        the candidate count — the rasterizer is the end-to-end inference
        bottleneck (BASELINE.md round-1) while the SECC maps are smooth NCC
        color fields, so the upsample is visually lossless for conditioning.

        ``assume_zero_pose`` (default): static face bucketing uses the tight
        per-face zero-pose bound (:func:`zero_pose_px_bounds`) — sound for
        the SECC contract where euler = trans = 0 always (every caller in
        this framework and the reference). Pass False to rasterize posed
        meshes with the conservative global-depth bound.
        """
        self.assets = assets
        self.faces = load_eye_free_faces(assets, bfm_dir)
        self.rasterize_size = rasterize_size
        self.output_resolution = output_resolution or rasterize_size
        # NCC colors are stored in [-1,1]; rasterize in [0,1] then rescale,
        # matching `(secc - 0.5)/0.5` of the reference (`secc_renderer.py:53`)
        ncc_01 = (assets.ncc_code + 1.0) / 2.0

        if assume_zero_pose:
            groups = split_faces_by_px_bound(
                np.asarray(self.faces),
                zero_pose_px_bounds(assets, np.asarray(self.faces),
                                    focal=1015.0, center=112.0,
                                    image_size=rasterize_size),
                buckets=(2, 3, 4, 6, 8, max(16, patch_size)),
            )
        else:
            groups = split_faces_by_size(
                np.asarray(assets.mean_shape).reshape(-1, 3),
                np.asarray(self.faces),
                focal=1015.0, center=112.0, image_size=rasterize_size,
                buckets=(2, 4, 8, max(16, patch_size)),
            )

        def _render(id_coeff, exp_coeff, euler, trans):
            verts = bfm_ops.compute_face_vertex(assets, id_coeff, exp_coeff,
                                                euler, trans)
            out = rasterize_grouped(
                verts, groups, ncc_01, image_size=rasterize_size
            )
            mask = out["mask"][..., None]
            # rasterized image is 0 outside the mask, so the rescale maps
            # the background to -1 exactly like the reference
            secc = out["image"] * 2.0 - 1.0
            if self.output_resolution != rasterize_size:
                b = secc.shape[0]
                r = self.output_resolution
                secc = jax.image.resize(secc, (b, r, r, 3), method="bilinear")
                mask = jax.image.resize(mask, (b, r, r, 1), method="bilinear")
            return mask, secc

        self._render_jit = jax.jit(_render)

    def render(
        self,
        id_coeff: jnp.ndarray,
        exp_coeff: jnp.ndarray,
        euler: jnp.ndarray,
        trans: jnp.ndarray,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """[B,C] (or [B,T,C]) coeffs -> (mask [B,H,W,1], secc [B,H,W,3] in [-1,1]).

        BTC input returns [B,T,H,W,*] (the reference's [B,C,T,H,W] transposed
        to channels-last).
        """
        btc = id_coeff.ndim == 3
        if btc:
            b, t = id_coeff.shape[:2]
            id_coeff = id_coeff.reshape(b * t, -1)
            exp_coeff = exp_coeff.reshape(b * t, -1)
            euler = euler.reshape(b * t, -1)
            trans = trans.reshape(b * t, -1)
        mask, secc = self._render_jit(id_coeff, exp_coeff, euler, trans)
        if btc:
            mask = mask.reshape(b, t, *mask.shape[1:])
            secc = secc.reshape(b, t, *secc.shape[1:])
        return mask, secc
