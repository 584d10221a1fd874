import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real3dportrait_tpu.geometry import synthetic_bfm
from real3dportrait_tpu.geometry.rasterizer import project_to_screen, rasterize
from real3dportrait_tpu.geometry.secc_renderer import SECCRenderer


def test_project_to_screen_center():
    verts = jnp.array([[[0.0, 0.0, 10.0]]])
    uv, z = project_to_screen(verts, focal=1015.0, center=112.0, image_size=512)
    # optical axis maps to image center
    np.testing.assert_allclose(np.asarray(uv[0, 0]), [256.0, 256.0], atol=1e-4)
    np.testing.assert_allclose(float(z[0, 0]), 10.0)
    # +x maps right, +y maps up (v decreases)
    uv2, _ = project_to_screen(jnp.array([[[0.1, 0.1, 10.0]]]), 1015.0, 112.0, 512)
    assert float(uv2[0, 0, 0]) > 256.0 and float(uv2[0, 0, 1]) < 256.0


def _square_mesh(z=10.0, half=0.3):
    """Two triangles covering a centered square at depth z."""
    verts = jnp.array([
        [-half, -half, z], [half, -half, z], [half, half, z], [-half, half, z],
    ])[None]
    faces = jnp.array([[0, 1, 2], [0, 2, 3]], jnp.int32)
    return verts, faces


def test_rasterize_square_coverage():
    verts, faces = _square_mesh(z=10.0, half=0.3)
    attrs = jnp.ones((4, 3)) * 0.5
    out = rasterize(verts, faces, attrs, image_size=64, patch_size=64, face_chunk=2)
    mask = np.asarray(out["mask"][0])
    # projected half-extent: 1015*0.3/10 * (64/224) px = 8.7px around center 32
    assert mask[32, 32] == 1.0
    assert mask[32, 32 + 7] == 1.0 and mask[32, 32 - 7] == 1.0
    assert mask[32, 32 + 12] == 0.0 and mask[5, 5] == 0.0
    # covered area approximates the square's area (2*8.7)^2
    area = mask.sum()
    assert abs(area - (2 * 8.7) ** 2) / (2 * 8.7) ** 2 < 0.15
    # depth is the plane depth where covered
    d = np.asarray(out["depth"][0])
    np.testing.assert_allclose(d[mask > 0], 10.0, atol=1e-3)
    # attributes interpolate to the constant color
    img = np.asarray(out["image"][0])
    np.testing.assert_allclose(img[mask > 0], 0.5, atol=1e-3)


def test_rasterize_depth_test():
    # near square (z=9, red) should occlude far square (z=11, blue)
    near_v, faces = _square_mesh(z=9.0, half=0.2)
    far_v, _ = _square_mesh(z=11.0, half=0.4)
    verts = jnp.concatenate([near_v, far_v], axis=1)
    faces_all = jnp.concatenate([faces, faces + 4], axis=0)
    attrs = jnp.array([[1.0, 0, 0]] * 4 + [[0, 0, 1.0]] * 4)
    out = rasterize(verts, faces_all, attrs, image_size=64, patch_size=64, face_chunk=4)
    img = np.asarray(out["image"][0])
    d = np.asarray(out["depth"][0])
    # center: near red square wins
    np.testing.assert_allclose(img[32, 32], [1.0, 0, 0], atol=1e-3)
    np.testing.assert_allclose(d[32, 32], 9.0, atol=1e-3)
    # periphery inside far square (±10.5px) but outside near (±6.4px): blue
    assert img[32, 32 + 9, 2] > 0.9 and img[32, 32 + 9, 0] < 0.1


def test_rasterize_znear_zfar_culling():
    verts, faces = _square_mesh(z=20.0)  # beyond zfar=15
    out = rasterize(verts, faces, jnp.ones((4, 3)), image_size=32, patch_size=32,
                    face_chunk=2)
    assert float(out["mask"].sum()) == 0.0


def test_rasterize_batched():
    v1, faces = _square_mesh(z=9.0)
    v2, _ = _square_mesh(z=11.0)
    verts = jnp.concatenate([v1, v2], axis=0)
    out = rasterize(verts, faces, jnp.ones((4, 3)), image_size=32, patch_size=32,
                    face_chunk=2)
    d = np.asarray(out["depth"])
    assert abs(d[0][d[0] > 0].mean() - 9.0) < 0.01
    assert abs(d[1][d[1] > 0].mean() - 11.0) < 0.01


def test_secc_renderer_synthetic():
    assets = synthetic_bfm(n_vertices=128, n_keypoints=68)
    r = SECCRenderer(assets, rasterize_size=64, patch_size=16, face_chunk=256)
    b = 2
    mask, secc = r.render(
        jnp.zeros((b, 80)), jnp.zeros((b, 64)), jnp.zeros((b, 3)), jnp.zeros((b, 3))
    )
    assert mask.shape == (b, 64, 64, 1)
    assert secc.shape == (b, 64, 64, 3)
    assert float(mask.sum()) > 0  # something rendered
    s = np.asarray(secc)
    m = np.asarray(mask)[..., 0] > 0
    assert s.min() >= -1.0 - 1e-5 and s.max() <= 1.0 + 1e-5
    # background is exactly -1 (reference rescale convention)
    np.testing.assert_allclose(s[~m], -1.0, atol=1e-6)


def test_secc_renderer_btc():
    assets = synthetic_bfm(n_vertices=96, n_keypoints=68)
    r = SECCRenderer(assets, rasterize_size=32, patch_size=16, face_chunk=128)
    mask, secc = r.render(
        jnp.zeros((2, 3, 80)), jnp.zeros((2, 3, 64)), jnp.zeros((2, 3, 3)),
        jnp.zeros((2, 3, 3)),
    )
    assert mask.shape == (2, 3, 32, 32, 1)
    assert secc.shape == (2, 3, 32, 32, 3)


def test_grouped_matches_sorted_on_bfm():
    """rasterize_grouped (static size buckets + lane-major keys + compaction
    sort + recomputed barycentrics) is equivalent to rasterize_sorted with a
    uniform worst-case patch, on BFM meshes under representative coefficient
    draws — incl. the tight zero-pose bucketing used by SECCRenderer."""
    from real3dportrait_tpu.geometry import bfm as bfm_ops
    from real3dportrait_tpu.geometry.rasterizer import (
        rasterize_grouped, rasterize_sorted, split_faces_by_px_bound,
    )
    from real3dportrait_tpu.geometry.secc_renderer import zero_pose_px_bounds

    assets = synthetic_bfm(n_vertices=2048, n_keypoints=68)
    faces = np.asarray(assets.face_buf)
    rng = np.random.RandomState(0)
    idc = jnp.asarray(rng.randn(2, 80).astype(np.float32) * 0.5)
    expc = jnp.asarray(rng.randn(2, 64).astype(np.float32) * 0.5)
    verts = bfm_ops.compute_face_vertex(
        assets, idc, expc, jnp.zeros((2, 3)), jnp.zeros((2, 3))
    )
    attrs = jnp.asarray(np.asarray(assets.ncc_code))
    groups = split_faces_by_px_bound(
        faces,
        zero_pose_px_bounds(assets, faces, focal=1015.0, center=112.0,
                            image_size=96),
        buckets=(2, 3, 4, 6, 8, 16),
    )
    assert len(groups) > 1, "bucketing degenerated to one group"
    a = rasterize_grouped(verts, groups, attrs, image_size=96)
    b = rasterize_sorted(verts, jnp.asarray(faces, jnp.int32), attrs,
                         image_size=96, patch_size=16)
    # identical coverage: the tight per-face bound must not drop candidates
    np.testing.assert_array_equal(np.asarray(a["mask"]), np.asarray(b["mask"]))
    np.testing.assert_allclose(np.asarray(a["depth"]), np.asarray(b["depth"]),
                               atol=2e-3)
    # attributes agree except depth-quantization tie pixels
    diff = np.abs(np.asarray(a["image"]) - np.asarray(b["image"])).max(-1)
    assert (diff < 2e-2).mean() > 0.99


def test_sorted_matches_scatter():
    from real3dportrait_tpu.geometry.rasterizer import rasterize_scatter, rasterize_sorted

    assets = synthetic_bfm(n_vertices=512, n_keypoints=68)
    verts = jnp.asarray(np.asarray(assets.mean_shape).reshape(1, -1, 3))
    verts = verts.at[..., 2].set(10.0 - verts[..., 2])
    faces = jnp.asarray(np.asarray(assets.face_buf), jnp.int32)
    attrs = jnp.asarray(np.asarray(assets.ncc_code))
    a = rasterize_scatter(verts, faces, attrs, image_size=64, patch_size=16,
                          face_chunk=512)
    b = rasterize_sorted(verts, faces, attrs, image_size=64, patch_size=16)
    np.testing.assert_array_equal(np.asarray(a["mask"]), np.asarray(b["mask"]))
    # depths agree up to the key quantization (~0.4mm at 64px)
    np.testing.assert_allclose(np.asarray(a["depth"]), np.asarray(b["depth"]),
                               atol=2e-3)
    # attribute images agree except where equal-depth ties picked different
    # winners: compare at the overwhelming majority of pixels
    diff = np.abs(np.asarray(a["image"]) - np.asarray(b["image"])).max(-1)
    assert (diff < 2e-2).mean() > 0.99
