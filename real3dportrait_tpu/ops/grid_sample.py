"""Bilinear/trilinear grid sampling as XLA-native gathers.

Replaces the CUDA ``grid_sample`` + ``grid_sample_gradfix`` pair of the
reference (`modules/eg3ds/torch_utils/ops/grid_sample_gradfix.py`): in JAX
the double-backward through a gather composes naturally, so no custom
autograd is needed.  Semantics follow ``torch.nn.functional.grid_sample``
with ``align_corners=False`` and ``padding_mode='zeros'`` — the only mode the
reference renderer uses (`modules/eg3ds/volumetric_rendering/renderer.py:65`).

Layout is channels-last (TPU-native): features ``[B, H, W, C]`` /
``[B, D, H, W, C]``; sample coords in [-1, 1] with x indexing W, y indexing
H, z indexing D (torch convention).
"""

from __future__ import annotations

import jax.numpy as jnp


def _unnormalize(coord: jnp.ndarray, size: int, align_corners: bool = False) -> jnp.ndarray:
    """[-1,1] -> pixel coordinate (torch grid_sample conventions)."""
    if align_corners:
        return (coord + 1.0) / 2.0 * (size - 1)
    return ((coord + 1.0) * size - 1.0) / 2.0


def _gather_2d(img: jnp.ndarray, ix: jnp.ndarray, iy: jnp.ndarray) -> jnp.ndarray:
    """img [B,H,W,C], ix/iy [B,M] int32 (already clipped) -> [B,M,C]."""
    b, h, w, c = img.shape
    flat = img.reshape(b, h * w, c)
    idx = iy * w + ix
    return jnp.take_along_axis(flat, idx[..., None], axis=1)


def grid_sample_2d(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Bilinear sample. features [B,H,W,C], coords [B,M,2] in [-1,1] -> [B,M,C]."""
    b, h, w, c = features.shape
    x = _unnormalize(coords[..., 0], w, align_corners)
    y = _unnormalize(coords[..., 1], h, align_corners)

    x0 = jnp.floor(x)
    y0 = jnp.floor(y)
    x1, y1 = x0 + 1, y0 + 1
    wx1 = x - x0
    wy1 = y - y0
    wx0 = 1.0 - wx1
    wy0 = 1.0 - wy1

    def corner(xi, yi, wgt):
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        v = _gather_2d(features, xi_c, yi_c)
        if padding_mode == "zeros":
            inside = (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
            wgt = wgt * inside
        return v * wgt[..., None]

    return (
        corner(x0, y0, wx0 * wy0)
        + corner(x1, y0, wx1 * wy0)
        + corner(x0, y1, wx0 * wy1)
        + corner(x1, y1, wx1 * wy1)
    )


def grid_sample_3d(
    features: jnp.ndarray,
    coords: jnp.ndarray,
    align_corners: bool = False,
    padding_mode: str = "zeros",
) -> jnp.ndarray:
    """Trilinear sample. features [B,D,H,W,C], coords [B,M,3] (x,y,z) -> [B,M,C]."""
    b, d, h, w, c = features.shape
    x = _unnormalize(coords[..., 0], w, align_corners)
    y = _unnormalize(coords[..., 1], h, align_corners)
    z = _unnormalize(coords[..., 2], d, align_corners)

    x0, y0, z0 = jnp.floor(x), jnp.floor(y), jnp.floor(z)
    wx1, wy1, wz1 = x - x0, y - y0, z - z0
    wx0, wy0, wz0 = 1 - wx1, 1 - wy1, 1 - wz1

    flat = features.reshape(b, d * h * w, c)

    def corner(xi, yi, zi, wgt):
        xi_c = jnp.clip(xi, 0, w - 1).astype(jnp.int32)
        yi_c = jnp.clip(yi, 0, h - 1).astype(jnp.int32)
        zi_c = jnp.clip(zi, 0, d - 1).astype(jnp.int32)
        idx = (zi_c * h + yi_c) * w + xi_c
        v = jnp.take_along_axis(flat, idx[..., None], axis=1)
        if padding_mode == "zeros":
            inside = (
                (xi >= 0) & (xi <= w - 1) & (yi >= 0) & (yi <= h - 1)
                & (zi >= 0) & (zi <= d - 1)
            )
            wgt = wgt * inside
        return v * wgt[..., None]

    out = 0.0
    for zi, wz in ((z0, wz0), (z0 + 1, wz1)):
        for yi, wy in ((y0, wy0), (y0 + 1, wy1)):
            for xi, wx in ((x0, wx0), (x0 + 1, wx1)):
                out = out + corner(xi, yi, zi, wx * wy * wz)
    return out
