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
    split_faces_by_size,
)


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
    ):
        """``rasterize_size`` is the z-buffer resolution; ``output_resolution``
        (default: same) bilinearly upsamples the SECC/mask maps afterwards.

        Rasterizing at 256² and upsampling to the 512² cond-map size quarters
        the candidate count — the rasterizer is the end-to-end inference
        bottleneck (BASELINE.md round-1) while the SECC maps are smooth NCC
        color fields, so the upsample is visually lossless for conditioning.
        """
        self.assets = assets
        self.faces = load_eye_free_faces(assets, bfm_dir)
        self.rasterize_size = rasterize_size
        self.output_resolution = output_resolution or rasterize_size
        # NCC colors are stored in [-1,1]; rasterize in [0,1] then rescale,
        # matching `(secc - 0.5)/0.5` of the reference (`secc_renderer.py:53`)
        ncc_01 = (assets.ncc_code + 1.0) / 2.0

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
