"""Quadrature-accuracy study for the two-pass volume-render sampling scheme.

Weight-independent methodology (same spirit as the r4 SECC-raster resolution
study in BASELINE.md): build an ANALYTIC head-like radiance field (thin
ellipsoid density shells + ambient), compute ground truth with 1024-point
stratified quadrature through the production ray marcher, then score each
candidate sampling scheme two ways:

* PSNR vs the 1024-sample ground truth (absolute quadrature accuracy);
* PSNR vs the reference scheme's own render (48 coarse + 48 fine, merged
  march — `modules/eg3ds/volumetric_rendering/renderer.py:118`), i.e. the
  deviation a user of the reference algorithm would observe.

Schemes use the REAL production machinery (_stratified_depths,
sample_importance, _march_merged, march_rays) — only the plane sampling is
replaced by the analytic field, so the numbers measure the sampling scheme,
not a reimplementation.

Usage: JAX_PLATFORMS=cpu python tools/study_sampling.py
"""

from __future__ import annotations

import os
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)

import jax

if os.environ.get("STUDY_TPU", "0") != "1":
    # run on host CPU (this image's jax ignores JAX_PLATFORMS; config.update
    # is the only way) — leaves the one tunneled TPU chip free for benches
    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass

import jax.numpy as jnp
import numpy as np


def analytic_field(coords: jnp.ndarray):
    """coords [B,M,3] in the unit box -> (rgb [B,M,3] in [0,1], sigma [B,M,1]).

    Head-like scene: a thin ellipsoid shell (face surface), an offset thicker
    shell (hair mass), a small sharp blob (nose), mild ambient fog. Thin
    shells are the adversarial case for quadrature: miss the shell between
    samples and the pixel goes background.
    """
    x, y, z = coords[..., 0], coords[..., 1], coords[..., 2]

    def shell(cx, cy, cz, rx, ry, rz, width, amp):
        r = jnp.sqrt(((x - cx) / rx) ** 2 + ((y - cy) / ry) ** 2
                     + ((z - cz) / rz) ** 2)
        return amp * jnp.exp(-((r - 1.0) ** 2) / (2 * width**2))

    sigma = (
        shell(0.0, 0.03, 0.05, 0.24, 0.30, 0.26, 0.04, 90.0)     # face
        + shell(0.0, 0.12, -0.06, 0.27, 0.30, 0.28, 0.10, 25.0)  # hair
        + shell(0.0, -0.02, 0.30, 0.05, 0.05, 0.05, 0.08, 60.0)  # nose blob
        + 0.05                                                    # ambient
    )
    rgb = 0.5 + 0.5 * jnp.stack([
        jnp.sin(7.0 * x + 3.0 * y),
        jnp.sin(5.0 * y - 2.0 * z + 1.0),
        jnp.sin(6.0 * z + 4.0 * x + 2.0),
    ], axis=-1)
    return rgb, sigma[..., None]


def eval_field(origins, dirs, depths):
    """depths [B,M,S,1] -> (colors [B,M,S,3], densities [B,M,S,1])."""
    b, m, s, _ = depths.shape
    coords = origins[:, :, None, :] + depths * dirs[:, :, None, :]
    rgb, sigma = analytic_field(coords.reshape(b, m * s, 3))
    # raw-field convention matching OSGDecoder: sigma fed to the marcher's
    # softplus(sigma-1); invert so the analytic density is the marched one.
    # log(expm1(s)) -> s for large s (expm1 overflows past ~88).
    sig = jnp.maximum(sigma, 1e-6)
    sigma_pre = jnp.where(sig > 20.0, sig,
                          jnp.log(jnp.expm1(jnp.minimum(sig, 20.0)))) + 1.0
    return rgb.reshape(b, m, s, 3), sigma_pre.reshape(b, m, s, 1)


def render_two_pass(origins, dirs, ray_start, ray_end, n_coarse, n_fine,
                    mode="merged", coarse_downsample=1, res=128):
    """Production two-pass scheme over the analytic field.

    mode: "merged" (reference: march coarse+fine union) or "fine_only"
    (march only the importance samples). coarse_downsample > 1 runs the
    proposal pass on a decimated ray grid and bilinearly upsamples the
    importance weights to the full grid before drawing fine samples.
    """
    from real3dportrait_tpu.rendering.ray_marcher import march_rays
    from real3dportrait_tpu.rendering.renderer import (
        _march_merged,
        _stratified_depths,
        sample_importance,
    )

    b, m, _ = origins.shape
    ds = coarse_downsample
    if ds > 1:
        # proposal pass on every ds-th ray (rays are a row-major res x res grid)
        grid = lambda t: t.reshape(b, res, res, -1)
        o_lo = grid(origins)[:, ::ds, ::ds].reshape(b, -1, 3)
        d_lo = grid(dirs)[:, ::ds, ::ds].reshape(b, -1, 3)
        rs_lo = grid(ray_start)[:, ::ds, ::ds].reshape(b, -1, 1)
        re_lo = grid(ray_end)[:, ::ds, ::ds].reshape(b, -1, 1)
        depths_lo = _stratified_depths(rs_lo, re_lo, n_coarse, None)
        c_lo, s_lo = eval_field(o_lo, d_lo, depths_lo)
        _, _, w_lo = march_rays(c_lo, s_lo, depths_lo)
        # conservative upsample of the importance weights: bilinear on the
        # low-res grid (smooth by construction)
        r_lo = res // ds
        w_img = w_lo.reshape(b, r_lo, r_lo, n_coarse - 1)
        w_up = jax.image.resize(w_img, (b, res, res, n_coarse - 1), "bilinear")
        weights = w_up.reshape(b, m, n_coarse - 1, 1)
        depths_coarse = _stratified_depths(ray_start, ray_end, n_coarse, None)
        fine = sample_importance(depths_coarse, weights, n_fine, None)
        colors_f, dens_f = eval_field(origins, dirs, fine)
        rgb, depth, _ = march_rays(colors_f, dens_f, fine)
        return rgb, depth

    depths_coarse = _stratified_depths(ray_start, ray_end, n_coarse, None)
    colors_c, dens_c = eval_field(origins, dirs, depths_coarse)
    _, _, weights = march_rays(colors_c, dens_c, depths_coarse)
    fine = sample_importance(depths_coarse, weights, n_fine, None)
    colors_f, dens_f = eval_field(origins, dirs, fine)
    if mode == "fine_only":
        rgb, depth, _ = march_rays(colors_f, dens_f, fine)
    else:
        rgb, depth, _ = _march_merged(depths_coarse, colors_c, dens_c,
                                      fine, colors_f, dens_f)
    return rgb, depth


def psnr(a, b):
    mse = float(jnp.mean((a - b) ** 2))
    return 10.0 * np.log10(4.0 / max(mse, 1e-12))  # range [-1,1] -> peak 2


def main():
    from real3dportrait_tpu.geometry import fov_to_intrinsics, lookat_pose
    from real3dportrait_tpu.geometry.camera import unpack_camera, pack_camera
    from real3dportrait_tpu.rendering import math_utils
    from real3dportrait_tpu.rendering.ray_marcher import march_rays
    from real3dportrait_tpu.rendering.renderer import _stratified_depths
    from real3dportrait_tpu.rendering.ray_sampler import sample_rays

    res = int(os.environ.get("STUDY_RES", "128"))
    cam = pack_camera(
        lookat_pose(jnp.zeros((1,)), jnp.zeros((1,)), jnp.zeros((1, 3))),
        fov_to_intrinsics(),
    )
    c2w, intr = unpack_camera(cam)
    origins, dirs = sample_rays(c2w, intr, res)
    ray_start, ray_end, is_valid = math_utils.get_ray_limits_box(origins, dirs, 1.0)
    big = jnp.float32(1e10)
    smin = jnp.min(jnp.where(is_valid[..., None], ray_start, big))
    smax = jnp.max(jnp.where(is_valid[..., None], ray_start, -big))
    ray_start = jnp.where(is_valid[..., None], ray_start, smin)
    ray_end = jnp.where(is_valid[..., None], ray_end, smax)

    # ground truth: 1024-sample stratified midpoint quadrature
    def gt_render():
        S = 1024
        chunks = []
        depth_chunks = []
        n_chunk = 4  # keep [B,M,S,*] under control
        m = origins.shape[1]
        step = m // n_chunk
        for i in range(n_chunk):
            sl = slice(i * step, (i + 1) * step)
            dpt = _stratified_depths(ray_start[:, sl], ray_end[:, sl], S, None)
            c, s = eval_field(origins[:, sl], dirs[:, sl], dpt)
            rgb, dep, _ = march_rays(c, s, dpt)
            chunks.append(rgb)
            depth_chunks.append(dep)
        return jnp.concatenate(chunks, 1), jnp.concatenate(depth_chunks, 1)

    gt_rgb, gt_depth = jax.jit(gt_render)()
    print(f"GT: 1024-sample render at {res}^2 done")

    schemes = [
        ("reference 48+48 merged", dict(n_coarse=48, n_fine=48, mode="merged")),
        ("48+48 fine-only march", dict(n_coarse=48, n_fine=48, mode="fine_only")),
        ("48+64 fine-only march", dict(n_coarse=48, n_fine=64, mode="fine_only")),
        ("36+36 merged", dict(n_coarse=36, n_fine=36, mode="merged")),
        ("32+48 merged", dict(n_coarse=32, n_fine=48, mode="merged")),
        ("48+32 merged", dict(n_coarse=48, n_fine=32, mode="merged")),
        ("24+48 merged", dict(n_coarse=24, n_fine=48, mode="merged")),
        ("32+32 merged", dict(n_coarse=32, n_fine=32, mode="merged")),
        ("24+32 merged", dict(n_coarse=24, n_fine=32, mode="merged")),
        ("16+48 merged", dict(n_coarse=16, n_fine=48, mode="merged")),
        ("16+32 merged", dict(n_coarse=16, n_fine=32, mode="merged")),
        ("lowres/2 coarse 48 + 64 fine-only",
         dict(n_coarse=48, n_fine=64, mode="fine_only", coarse_downsample=2)),
        ("lowres/2 coarse 48 + 48 fine-only",
         dict(n_coarse=48, n_fine=48, mode="fine_only", coarse_downsample=2)),
        ("lowres/4 coarse 48 + 64 fine-only",
         dict(n_coarse=48, n_fine=64, mode="fine_only", coarse_downsample=4)),
    ]

    fn = jax.jit(lambda **kw: render_two_pass(origins, dirs, ray_start, ray_end,
                                              res=res, **kw),
                 static_argnames=("n_coarse", "n_fine", "mode",
                                  "coarse_downsample"))
    ref_rgb = None
    print(f"{'scheme':40s} {'rows/ray':>8s} {'PSNR->GT':>9s} {'PSNR->ref':>9s} "
          f"{'depth MAE':>9s}")
    for name, kw in schemes:
        rgb, depth = fn(**kw)
        ds = kw.get("coarse_downsample", 1)
        rows = kw["n_coarse"] / (ds * ds) + kw["n_fine"]
        p_gt = psnr(rgb, gt_rgb)
        p_ref = psnr(rgb, ref_rgb) if ref_rgb is not None else float("inf")
        dmae = float(jnp.mean(jnp.abs(depth - gt_depth)))
        if ref_rgb is None:
            ref_rgb = rgb
        print(f"{name:40s} {rows:8.1f} {p_gt:9.2f} {p_ref:9.2f} {dmae:9.4f}")


if __name__ == "__main__":
    main()
