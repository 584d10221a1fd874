import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real3dportrait_tpu.ops import grid_sample_2d, grid_sample_3d
from real3dportrait_tpu.rendering import (
    RenderOptions,
    get_ray_limits_box,
    march_rays,
    render_rays,
    sample_from_planes,
    sample_rays,
)


# --- grid sampling: golden comparison against torch (test oracle only) -----


def test_grid_sample_2d_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(0)
    feats = rng.randn(2, 7, 9, 4).astype(np.float32)  # NHWC
    coords = (rng.rand(2, 50, 2) * 2.4 - 1.2).astype(np.float32)  # includes OOB

    ours = grid_sample_2d(jnp.asarray(feats), jnp.asarray(coords))

    t_feats = torch.from_numpy(feats).permute(0, 3, 1, 2)  # NCHW
    t_grid = torch.from_numpy(coords).unsqueeze(1)  # [B,1,M,2]
    ref = F.grid_sample(t_feats, t_grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    ref = ref.squeeze(2).permute(0, 2, 1).numpy()  # [B,M,C]
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_grid_sample_3d_matches_torch():
    import torch
    import torch.nn.functional as F

    rng = np.random.RandomState(1)
    feats = rng.randn(2, 3, 5, 6, 4).astype(np.float32)  # NDHWC
    coords = (rng.rand(2, 40, 3) * 2.4 - 1.2).astype(np.float32)

    ours = grid_sample_3d(jnp.asarray(feats), jnp.asarray(coords))

    t_feats = torch.from_numpy(feats).permute(0, 4, 1, 2, 3)  # NCDHW
    t_grid = torch.from_numpy(coords).reshape(2, 1, 1, -1, 3)
    ref = F.grid_sample(t_feats, t_grid, mode="bilinear", padding_mode="zeros",
                        align_corners=False)
    ref = ref.reshape(2, 4, -1).permute(0, 2, 1).numpy()
    np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4, atol=1e-5)


def test_grid_sample_3d_border_matches_torch():
    """Border mode vs torch, align_corners=True — the torso-warp config
    (`facev2v_warp/network.py:297`). Regression test for the round-2 red
    parity tests: out-of-range coords must clamp the CONTINUOUS coordinate
    (torch clip_coordinates), not just the corner indices."""
    import torch
    import torch.nn.functional as F

    from real3dportrait_tpu.ops.grid_sample import (
        grid_sample_3d, grid_sample_3d_packed,
    )

    rng = np.random.RandomState(2)
    feats = rng.randn(2, 4, 6, 7, 4).astype(np.float32)
    coords = (rng.rand(2, 60, 3) * 2.8 - 1.4).astype(np.float32)  # far OOB

    t_feats = torch.from_numpy(feats).permute(0, 4, 1, 2, 3)
    t_grid = torch.from_numpy(coords).reshape(2, 1, 1, -1, 3)
    ref = F.grid_sample(t_feats, t_grid, mode="bilinear",
                        padding_mode="border", align_corners=True)
    ref = ref.reshape(2, 4, -1).permute(0, 2, 1).numpy()

    for fn in (grid_sample_3d, grid_sample_3d_packed):
        ours = fn(jnp.asarray(feats), jnp.asarray(coords),
                  align_corners=True, padding_mode="border")
        np.testing.assert_allclose(np.asarray(ours), ref, rtol=1e-4,
                                   atol=1e-5, err_msg=fn.__name__)


def test_grid_sample_3d_packed_depth1_single_gather():
    """The d=1 (flagship triplane_depth) fast path of the packed sampler
    matches the reference path in both padding modes."""
    from real3dportrait_tpu.ops.grid_sample import (
        grid_sample_3d, grid_sample_3d_packed,
    )

    k = jax.random.PRNGKey(11)
    feats = jax.random.normal(k, (2, 1, 9, 11, 5))
    coords = jax.random.uniform(jax.random.PRNGKey(12), (2, 300, 3),
                                minval=-1.3, maxval=1.3)
    for pad in ("zeros", "border"):
        for ac in (False, True):
            want = grid_sample_3d(feats, coords, align_corners=ac,
                                  padding_mode=pad)
            got = grid_sample_3d_packed(feats, coords, align_corners=ac,
                                        padding_mode=pad)
            assert float(jnp.max(jnp.abs(want - got))) < 1e-5, (pad, ac)


def test_grid_sample_2d_grad_flows():
    feats = jnp.ones((1, 4, 4, 2))
    coords = jnp.zeros((1, 3, 2))
    g = jax.grad(lambda f: grid_sample_2d(f, coords).sum())(feats)
    assert float(jnp.abs(g).sum()) > 0


# --- ray-box ----------------------------------------------------------------


def test_ray_limits_box_analytic():
    o = jnp.array([[[0.0, 0.0, 2.7]]])
    d = jnp.array([[[0.0, 0.0, -1.0]]])
    tmin, tmax, valid = get_ray_limits_box(o, d, box_side_length=1.0)
    np.testing.assert_allclose(tmin[0, 0, 0], 2.2, atol=1e-5)
    np.testing.assert_allclose(tmax[0, 0, 0], 3.2, atol=1e-5)
    assert bool(valid[0, 0])


def test_ray_limits_box_miss():
    o = jnp.array([[[0.0, 0.0, 2.7]]])
    d = jnp.array([[[0.0, 1.0, 0.0]]])  # parallel to box, offset outside
    tmin, tmax, valid = get_ray_limits_box(o, d, 1.0)
    assert not bool(valid[0, 0])
    assert float(tmin[0, 0, 0]) == -1.0 and float(tmax[0, 0, 0]) == -2.0


# --- ray sampler ------------------------------------------------------------


def test_ray_sampler_center_pixel():
    c2w = jnp.eye(4)[None]
    intr = jnp.array([[[4.26, 0.0, 0.5], [0.0, 4.26, 0.5], [0.0, 0.0, 1.0]]])
    res = 4
    origins, dirs = sample_rays(c2w, intr, res)
    assert origins.shape == (1, 16, 3) and dirs.shape == (1, 16, 3)
    np.testing.assert_allclose(origins[0, 0], [0.0, 0.0, 0.0], atol=1e-6)
    # mean direction of the symmetric pixel grid is the optical axis +z
    mean_dir = np.asarray(dirs[0]).mean(0)
    mean_dir /= np.linalg.norm(mean_dir)
    np.testing.assert_allclose(mean_dir, [0, 0, 1], atol=1e-6)
    np.testing.assert_allclose(np.linalg.norm(np.asarray(dirs[0]), axis=-1), 1.0, atol=1e-6)


def test_ray_sampler_row_major():
    # pixel (row 0, col 1) must differ from (row 1, col 0): x varies fastest
    c2w = jnp.eye(4)[None]
    intr = jnp.array([[[1.0, 0.0, 0.5], [0.0, 1.0, 0.5], [0.0, 0.0, 1.0]]])
    _, dirs = sample_rays(c2w, intr, 3)
    d = np.asarray(dirs[0]).reshape(3, 3, 3)
    assert d[0, 0, 0] < d[0, 1, 0]  # x increases along columns
    assert d[0, 0, 1] < d[1, 0, 1]  # y increases along rows


# --- ray marcher ------------------------------------------------------------


def test_march_rays_empty_space():
    b, m, s = 1, 4, 8
    colors = jnp.ones((b, m, s, 3)) * 0.25
    densities = jnp.full((b, m, s, 1), -100.0)  # softplus(-101) ~ 0
    depths = jnp.broadcast_to(jnp.linspace(2.0, 3.0, s).reshape(1, 1, s, 1), (b, m, s, 1))
    rgb, depth, weights = march_rays(colors, densities, depths)
    np.testing.assert_allclose(np.asarray(weights), 0.0, atol=1e-6)
    np.testing.assert_allclose(np.asarray(rgb), -1.0, atol=1e-5)  # 0*2-1
    rgb_wb, _, _ = march_rays(colors, densities, depths, white_back=True)
    np.testing.assert_allclose(np.asarray(rgb_wb), 1.0, atol=1e-5)  # (0+1)*2-1


def test_march_rays_opaque_wall():
    b, m, s = 1, 2, 16
    colors = jnp.ones((b, m, s, 3)) * 0.75
    densities = jnp.full((b, m, s, 1), 500.0)
    depths = jnp.broadcast_to(jnp.linspace(2.0, 3.0, s).reshape(1, 1, s, 1), (b, m, s, 1))
    rgb, depth, weights = march_rays(colors, densities, depths)
    # fully opaque at first interval: total weight 1, color = 0.75*2-1 = 0.5
    np.testing.assert_allclose(np.asarray(weights.sum(-2)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(rgb), 0.5, atol=1e-3)
    # depth collapses to the first midpoint
    np.testing.assert_allclose(np.asarray(depth)[..., 0], depths[0, 0, 0, 0] + 0.5 / 15,
                               atol=1e-3)


# --- full renderer ----------------------------------------------------------


def _toy_decoder(feats, dirs):
    """Mean over planes -> rgb from first channels, sigma from feature sum."""
    x = feats.mean(axis=1)
    rgb = jax.nn.sigmoid(x[..., :3]) * 1.002 - 0.001
    sigma = x[..., 3:4]
    return {"rgb": rgb, "sigma": sigma}


@pytest.mark.slow  # fast-tier budget (>15 s on a 1-CPU box)
@pytest.mark.parametrize("trigrid", [False, True])
def test_render_rays_shapes_and_determinism(trigrid):
    b, res = 1, 8
    key = jax.random.PRNGKey(0)
    if trigrid:
        planes = jax.random.normal(key, (b, 3, 2, 16, 16, 8))
    else:
        planes = jax.random.normal(key, (b, 3, 16, 16, 8))
    from real3dportrait_tpu.geometry import lookat_pose, fov_to_intrinsics

    c2w = lookat_pose(jnp.zeros((b,)), jnp.zeros((b,)), jnp.zeros((b, 3)), radius=2.7)
    intr = jnp.broadcast_to(fov_to_intrinsics(), (b, 3, 3))
    origins, dirs = sample_rays(c2w, intr, res)
    opts = RenderOptions(depth_resolution=12, depth_resolution_importance=12)

    out = render_rays(planes, _toy_decoder, origins, dirs, opts, key=None)
    assert out["rgb"].shape == (b, res * res, 3)
    assert out["depth"].shape == (b, res * res, 1)
    assert out["weights_sum"].shape == (b, res * res, 1)
    assert bool(jnp.isfinite(out["rgb"]).all())
    # deterministic without a key
    out2 = render_rays(planes, _toy_decoder, origins, dirs, opts, key=None)
    np.testing.assert_allclose(np.asarray(out["rgb"]), np.asarray(out2["rgb"]))
    # jit-compatible
    f = jax.jit(lambda p, o, d: render_rays(p, _toy_decoder, o, d, opts)["rgb"])
    np.testing.assert_allclose(
        np.asarray(f(planes, origins, dirs)), np.asarray(out["rgb"]), rtol=3e-2, atol=3e-2
    )


def test_render_rays_opaque_ball_depth():
    """A dense center region must composite to a depth near the box front."""
    b, res = 1, 8
    # sigma channel (index 3) large everywhere -> opaque volume
    planes = jnp.zeros((b, 3, 16, 16, 8)).at[..., 3].set(30.0)
    from real3dportrait_tpu.geometry import lookat_pose, fov_to_intrinsics

    c2w = lookat_pose(jnp.zeros((b,)), jnp.zeros((b,)), jnp.zeros((b, 3)), radius=2.7)
    intr = jnp.broadcast_to(fov_to_intrinsics(), (b, 3, 3))
    origins, dirs = sample_rays(c2w, intr, res)
    opts = RenderOptions(depth_resolution=24, depth_resolution_importance=24)
    out = render_rays(planes, _toy_decoder, origins, dirs, opts, key=None)
    # weights should saturate ~1, depth ~2.2 (front face of the unit box)
    assert float(out["weights_sum"].mean()) > 0.95
    assert abs(float(out["depth"].mean()) - 2.2) < 0.1


def test_sample_from_planes_projection_convention():
    # plane 0 keys on (x, y): feature must be invariant to z
    b = 1
    planes = jnp.zeros((b, 3, 8, 8, 2))
    planes = planes.at[:, 0].set(jax.random.normal(jax.random.PRNGKey(0), (b, 8, 8, 2)))
    c1 = jnp.array([[[0.1, -0.2, 0.0]]])
    c2 = jnp.array([[[0.1, -0.2, 0.3]]])
    f1 = sample_from_planes(planes, c1, box_warp=1.0)
    f2 = sample_from_planes(planes, c2, box_warp=1.0)
    np.testing.assert_allclose(np.asarray(f1[:, 0]), np.asarray(f2[:, 0]), atol=1e-6)
    assert float(jnp.abs(f1[:, 0]).sum()) > 0


def test_grid_sample_3d_packed_equivalence():
    """Packed xy-corner trilinear path == reference path, incl. borders."""
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.ops.grid_sample import (
        grid_sample_3d, grid_sample_3d_packed,
    )

    k = jax.random.PRNGKey(7)
    feats = jax.random.normal(k, (2, 3, 9, 11, 5))
    # interior + boundary + out-of-range coords
    coords = jax.random.uniform(jax.random.PRNGKey(8), (2, 400, 3),
                                minval=-1.3, maxval=1.3)
    edge = jnp.array([[[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
                       [-1.0, 1.0, 0.0], [0.999, -0.999, 0.5]]])
    coords = jnp.concatenate([coords, jnp.tile(edge, (2, 1, 1))], axis=1)
    want = grid_sample_3d(feats, coords)
    got = grid_sample_3d_packed(feats, coords)
    assert jnp.max(jnp.abs(want - got)) < 1e-5


def test_grid_sample_3d_prepacked_equivalence():
    """8-corner cell-packed trilinear path (pack_trigrid_cells +
    grid_sample_3d_prepacked, the torso warp fast path) == reference path,
    incl. borders."""
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.ops.grid_sample import (
        grid_sample_3d, grid_sample_3d_prepacked, pack_trigrid_cells,
    )

    k = jax.random.PRNGKey(3)
    feats = jax.random.normal(k, (2, 4, 9, 11, 5))
    coords = jax.random.uniform(jax.random.PRNGKey(4), (2, 400, 3),
                                minval=-1.3, maxval=1.3)
    edge = jnp.array([[[-1.0, -1.0, -1.0], [1.0, 1.0, 1.0],
                       [-1.0, 1.0, 0.0], [0.999, -0.999, 0.5]]])
    coords = jnp.concatenate([coords, jnp.tile(edge, (2, 1, 1))], axis=1)
    want = grid_sample_3d(feats, coords)
    packed = pack_trigrid_cells(feats)
    got = grid_sample_3d_prepacked(packed, (4, 9, 11, 5), coords)
    assert jnp.max(jnp.abs(want - got)) < 1e-5


def test_grid_sample_2d_packed_equivalence():
    """Packed xy-cell bilinear path == reference 2D path, incl. borders and
    both padding modes (the released flagship's depth-1 triplane fast path)."""
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.ops.grid_sample import (
        grid_sample_2d, grid_sample_2d_packed,
    )

    k = jax.random.PRNGKey(11)
    feats = jax.random.normal(k, (2, 9, 11, 5))
    coords = jax.random.uniform(jax.random.PRNGKey(12), (2, 400, 2),
                                minval=-1.3, maxval=1.3)
    edge = jnp.array([[[-1.0, -1.0], [1.0, 1.0], [-1.0, 1.0],
                       [0.999, -0.999]]])
    coords = jnp.concatenate([coords, jnp.tile(edge, (2, 1, 1))], axis=1)
    for pm in ("zeros", "border"):
        for ac in (False, True):
            want = grid_sample_2d(feats, coords, align_corners=ac,
                                  padding_mode=pm)
            got = grid_sample_2d_packed(feats, coords, align_corners=ac,
                                        padding_mode=pm)
            assert jnp.max(jnp.abs(want - got)) < 1e-5, (pm, ac)


def test_make_packed_sampler_matches_sample_features():
    """The shared-pack sampler used by render_rays reproduces
    sample_features for both triplane (rank-5) and trigrid (rank-6) layouts."""
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.rendering.renderer import (
        make_packed_sampler, sample_features,
    )

    coords = jax.random.uniform(jax.random.PRNGKey(1), (2, 300, 3),
                                minval=-1.2, maxval=1.2)
    for shape in ((2, 3, 8, 8, 6), (2, 3, 4, 8, 8, 6), (2, 3, 1, 8, 8, 6)):
        planes = jax.random.normal(jax.random.PRNGKey(0), shape)
        want = sample_features(planes, coords, 1.0)
        got = make_packed_sampler(planes, 1.0)(coords)
        assert jnp.max(jnp.abs(want - got)) < 1e-5, shape


def test_packed_sampler_gather_indices_in_bounds(monkeypatch):
    """_gather_rows' promise_in_bounds contract: every caller must clip
    indices into [0, R) BEFORE the gather (the fill-mode guard was measured
    at 3.7 ms/frame for indices that are never out of bounds and removed).
    Drive the packed samplers with far-out-of-range and degenerate coords
    and assert the contract holds at the gather boundary."""
    import real3dportrait_tpu.ops.grid_sample as gs

    orig = gs._gather_rows

    def checked(table, idx):
        r = table.shape[1]
        i = np.asarray(idx)
        assert i.min() >= 0 and i.max() < r, (i.min(), i.max(), r)
        return orig(table, idx)

    monkeypatch.setattr(gs, "_gather_rows", checked)
    key = jax.random.PRNGKey(0)
    coords = jnp.concatenate([
        jax.random.uniform(key, (1, 64, 3), minval=-6.0, maxval=6.0),
        jnp.full((1, 4, 3), -1.0), jnp.full((1, 4, 3), 1.0),
        jnp.zeros((1, 4, 3)),
    ], axis=1)
    img = jax.random.normal(key, (1, 7, 9, 4))
    vol = jax.random.normal(key, (1, 3, 7, 9, 4))
    vol1 = jax.random.normal(key, (1, 1, 7, 9, 4))
    for pm in ("zeros", "border"):
        gs.grid_sample_2d_packed(img, coords[..., :2], padding_mode=pm)
        gs.grid_sample_3d_packed(vol, coords, padding_mode=pm)
        gs.grid_sample_3d_packed(vol1, coords, padding_mode=pm)
    # the unreduced corner variants share the same contract
    packed2 = gs.pack_xy_cells(img)
    gs.grid_sample_2d_prepacked_corners(packed2, (7, 9, 4), coords[..., :2])
    packed3 = gs.pack_xy_cells(vol)
    gs.grid_sample_3d_prepacked4_corners(packed3, (3, 7, 9, 4), coords)


def test_corner_sampler_matches_sample_features():
    """The unreduced corner sampler must reconstruct sample_features'
    plane-MEAN when reduced by hand: sum_i rows_i * repeat(w_i, C)."""
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.rendering.renderer import (
        make_corner_sampler, sample_features,
    )

    coords = jax.random.uniform(jax.random.PRNGKey(1), (2, 300, 3),
                                minval=-1.2, maxval=1.2)
    for shape in ((2, 3, 8, 8, 6), (2, 3, 4, 8, 8, 6), (2, 3, 1, 8, 8, 6)):
        planes = jax.random.normal(jax.random.PRNGKey(0), shape)
        want = sample_features(planes, coords, 1.0).mean(axis=1)
        rows_list, wts_list = make_corner_sampler(planes, 1.0)(coords)
        c = shape[-1]
        got = sum(r * jnp.repeat(w, c, axis=-1) for r, w in
                  zip(rows_list, wts_list)).reshape(2, 300, 4, c).sum(axis=2)
        assert jnp.max(jnp.abs(want - got)) < 1e-5, shape


def test_render_rays_corner_decoder_matches_plain():
    """render_rays with a supports_corners decoder (the fold of plane-mean +
    corner reduce into net0's matmul) must match the reduced-features path."""
    from real3dportrait_tpu.geometry import (
        fov_to_intrinsics, lookat_pose, pack_camera,
    )
    from real3dportrait_tpu.geometry.camera import unpack_camera
    from real3dportrait_tpu.models.decoder import OSGDecoder
    from real3dportrait_tpu.rendering import sample_rays
    from real3dportrait_tpu.rendering.renderer import RenderOptions, render_rays

    dec = OSGDecoder(hidden_dim=32, output_dim=16)
    dv = dec.init(jax.random.PRNGKey(1), jnp.zeros((1, 3, 8, 16)), None)
    cam = pack_camera(
        lookat_pose(jnp.zeros((1,)), jnp.zeros((1,)), jnp.zeros((1, 3))),
        fov_to_intrinsics(),
    )
    c2w, intr = unpack_camera(cam)
    o, d = sample_rays(c2w, intr, 16)
    opts = RenderOptions(depth_resolution=8, depth_resolution_importance=8)
    for shape in ((1, 3, 32, 32, 16), (1, 3, 2, 32, 32, 16),
                  (1, 3, 1, 32, 32, 16)):
        planes = jax.random.normal(jax.random.PRNGKey(0), shape) * 0.1
        plain = lambda f, dirs: dec.apply(dv, f, dirs)  # noqa: E731
        fast = lambda f, dirs: dec.apply(dv, f, dirs)  # noqa: E731
        fast.supports_corners = True
        r1 = render_rays(planes, plain, o, d, opts)
        r2 = render_rays(planes, fast, o, d, opts)
        assert jnp.max(jnp.abs(r1["rgb"] - r2["rgb"])) < 2e-5, shape
        assert jnp.max(jnp.abs(r1["depth"] - r2["depth"])) < 2e-4, shape


# --- fused-select / reindexed-composite equivalence -------------------------


def test_march_rays_composite_matches_naive():
    """The reindexed composite (sum_t c[t]*(w[t-1]+w[t])/2) must equal the
    naive midpoint form sum_s w[s]*(c[s]+c[s+1])/2."""
    k = jax.random.PRNGKey(3)
    k1, k2, k3 = jax.random.split(k, 3)
    b, m, s, c = 2, 7, 12, 5
    depths = jnp.sort(jax.random.uniform(k1, (b, m, s, 1), minval=1.0, maxval=2.0), axis=-2)
    colors = jax.random.uniform(k2, (b, m, s, c))
    densities = jax.random.normal(k3, (b, m, s, 1)) * 2.0

    rgb, depth, weights = march_rays(colors, densities, depths)
    colors_mid = (colors[:, :, :-1] + colors[:, :, 1:]) / 2
    naive = jnp.sum(weights * colors_mid, axis=-2) * 2.0 - 1.0
    np.testing.assert_allclose(np.asarray(rgb), np.asarray(naive), atol=1e-6)


def test_sample_pdf_fused_select_matches_naive():
    """The single-payload one-hot select in _sample_pdf must reproduce the
    reference four-gather inverse-CDF transform (torch renderer.py:254)."""
    from real3dportrait_tpu.rendering.renderer import _sample_pdf

    k = jax.random.PRNGKey(5)
    k1, k2 = jax.random.split(k)
    r, s_w, n = 64, 13, 9  # bins has s_w + 2 entries
    bins = jnp.sort(jax.random.uniform(k1, (r, s_w + 2), minval=1.0, maxval=2.0), axis=-1)
    weights = jax.random.uniform(k2, (r, s_w), minval=0.0, maxval=1.0)

    got = _sample_pdf(bins, weights, n, key=None)

    # naive reference: plain numpy searchsorted + gathers
    eps = 1e-5
    w = np.asarray(weights) + eps
    pdf = w / w.sum(-1, keepdims=True)
    cdf = np.concatenate([np.zeros((r, 1)), np.cumsum(pdf, -1)], axis=-1)
    u = np.broadcast_to(np.linspace(0.0, 1.0, n), (r, n))
    bn = np.asarray(bins)
    out = np.zeros((r, n))
    for i in range(r):
        inds = np.searchsorted(cdf[i], u[i], side="right")
        below = np.clip(inds - 1, 0, None)
        above = np.clip(inds, None, s_w)
        cdf_b, cdf_a = cdf[i][below], cdf[i][above]
        bins_b = bn[i][np.clip(below, None, s_w + 1)]
        bins_a = bn[i][np.clip(above, None, s_w + 1)]
        denom = np.where(cdf_a - cdf_b < eps, 1.0, cdf_a - cdf_b)
        out[i] = bins_b + (u[i] - cdf_b) / denom * (bins_a - bins_b)
    np.testing.assert_allclose(np.asarray(got), out, atol=2e-5)
