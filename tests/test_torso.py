import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real3dportrait_tpu.geometry import fov_to_intrinsics, lookat_pose, pack_camera
from real3dportrait_tpu.models.img2plane import OSAvatarSECCImg2PlaneTorso
from real3dportrait_tpu.models.sr_with_ref import SuperresolutionHybrid8XDCWarp
from real3dportrait_tpu.models.torso import (
    WarpBasedTorsoModel,
    create_sparse_motions,
    kp2gaussian_3d,
    make_coordinate_grid_3d,
)


def test_coordinate_grid_3d_convention():
    g = make_coordinate_grid_3d(2, 3, 4)
    assert g.shape == (2, 3, 4, 3)
    # x varies along W (last spatial axis), y along H, z along D
    np.testing.assert_allclose(g[0, 0, :, 0], np.linspace(-1, 1, 4), atol=1e-6)
    np.testing.assert_allclose(g[0, :, 0, 1], np.linspace(-1, 1, 3), atol=1e-6)
    np.testing.assert_allclose(g[:, 0, 0, 2], np.linspace(-1, 1, 2), atol=1e-6)


def test_kp2gaussian_peak_at_kp():
    kp = jnp.array([[[0.0, 0.0, 0.0]]])  # center
    vol = kp2gaussian_3d(kp, 5, 5, 5)
    assert vol.shape == (1, 1, 5, 5, 5)
    idx = np.unravel_index(np.argmax(np.asarray(vol[0, 0])), (5, 5, 5))
    assert idx == (2, 2, 2)


def test_sparse_motions_identity_when_kp_equal():
    kp = jax.random.uniform(jax.random.PRNGKey(0), (1, 4, 3), minval=-0.5, maxval=0.5)
    motions = create_sparse_motions(kp, kp, 2, 4, 4)
    assert motions.shape == (1, 5, 2, 4, 4, 3)
    # kp_s == kp_d -> every candidate warp equals the identity grid
    for k in range(5):
        np.testing.assert_allclose(
            np.asarray(motions[:, k]), np.asarray(motions[:, 0]), atol=1e-6
        )


@pytest.fixture(scope="module")
def torso_inputs():
    key = jax.random.PRNGKey(0)
    img = jax.random.uniform(key, (1, 32, 32, 3), minval=-1, maxval=1)
    segmap = jax.nn.one_hot(
        jax.random.randint(jax.random.PRNGKey(1), (1, 32, 32), 0, 6), 6
    )
    kp_s = jax.random.uniform(jax.random.PRNGKey(2), (1, 68, 3), minval=-0.8, maxval=0.8)
    kp_d = kp_s + 0.05
    return img, segmap, kp_s, kp_d


@pytest.mark.slow
def test_warp_torso_model_tiny(torso_inputs):
    img, segmap, kp_s, kp_d = torso_inputs
    model = WarpBasedTorsoModel(torso_kp_num=4, scale="tiny")
    variables = model.init(jax.random.PRNGKey(0), img, segmap, kp_s, kp_d)
    out = model.apply(variables, img, segmap, kp_s, kp_d)
    assert out["deformed_torso_img"].shape == (1, 32, 32, 3)
    assert out["occlusion_2"].shape == (1, 32, 32, 1)
    assert set(out["losses"]) == {
        "facev2v/occlusion_reg_l1",
        "facev2v/occlusion_2_reg_l1",
        "facev2v/occlusion_2_weights_entropy",
    }
    assert all(bool(jnp.isfinite(v)) for v in out["losses"].values())
    # occlusions are valid probabilities
    assert float(out["occlusion_2"].min()) >= 0 and float(out["occlusion_2"].max()) <= 1


@pytest.mark.slow  # fast-tier budget (>15 s on a 1-CPU box)
def test_warp_torso_v2_conditioning(torso_inputs):
    img, segmap, kp_s, kp_d = torso_inputs
    model = WarpBasedTorsoModel(torso_kp_num=4, scale="tiny")
    head = jnp.zeros((1, 16, 16, 3))
    weights = jnp.ones((1, 16, 16, 1)) * 0.5
    variables = model.init(
        jax.random.PRNGKey(0), img, segmap, kp_s, kp_d,
        tgt_head_img=head, tgt_head_weights=weights,
    )
    out = model.apply(variables, img, segmap, kp_s, kp_d,
                      tgt_head_img=head, tgt_head_weights=weights)
    assert out["deformed_torso_img"].shape == (1, 32, 32, 3)


def test_warp_torso_masked_reg(torso_inputs):
    img, segmap, kp_s, kp_d = torso_inputs
    model = WarpBasedTorsoModel(torso_kp_num=4, scale="tiny")
    mask = jnp.zeros((1, 32, 32), bool)
    variables = model.init(jax.random.PRNGKey(0), img, segmap, kp_s, kp_d,
                           target_torso_mask=mask)
    out = model.apply(variables, img, segmap, kp_s, kp_d, target_torso_mask=mask)
    assert bool(jnp.isfinite(out["losses"]["facev2v/occlusion_reg_l1"]))


@pytest.mark.slow
def test_sr_warp_fusion_tiny():
    b, r = 1, 8  # raw render 8 -> mid 16 -> final 32
    sr = SuperresolutionHybrid8XDCWarp(
        w_dim=16, sr_num_fp16_res=0, input_resolution=8, mid_resolution=16,
        final_resolution=32, block0_channels=16, block1_channels=8,
        torso_scale="tiny", torso_kp_num=4,
    )
    rgb = jax.random.uniform(jax.random.PRNGKey(0), (b, r, r, 3), minval=-1, maxval=1)
    feat = jax.random.normal(jax.random.PRNGKey(1), (b, r, r, 8))
    ws = jnp.ones((b, 1, 16))
    torso_img = jax.random.uniform(jax.random.PRNGKey(2), (b, 32, 32, 3))
    bg_img = jax.random.uniform(jax.random.PRNGKey(3), (b, 32, 32, 3))
    weights = jax.random.uniform(jax.random.PRNGKey(4), (b, r, r, 1))
    segmap = jax.nn.one_hot(jax.random.randint(jax.random.PRNGKey(5), (b, 32, 32), 0, 6), 6)
    kp = jax.random.uniform(jax.random.PRNGKey(6), (b, 68, 3), minval=-0.8, maxval=0.8)

    variables = sr.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        rgb, feat, ws, torso_img, bg_img, weights, segmap, kp, kp + 0.02,
    )
    out, torso_ret = sr.apply(
        variables, rgb, feat, ws, torso_img, bg_img, weights, segmap, kp, kp + 0.02,
        noise_mode="const",
    )
    assert out.shape == (b, 32, 32, 3)
    assert bool(jnp.isfinite(out).all())
    assert "deformed_torso_img" in torso_ret


@pytest.mark.slow
def test_torso_avatar_end_to_end():
    model = OSAvatarSECCImg2PlaneTorso(
        triplane_hid_dim=8, triplane_depth=2, neural_rendering_resolution=16,
        final_resolution=64, sr_channel0=16, sr_channel1=8, sr_num_fp16_res=0,
        num_samples_coarse=8, num_samples_fine=8, torso_scale="tiny",
    )
    b = 1
    img = jax.random.uniform(jax.random.PRNGKey(0), (b, 64, 64, 3), minval=-1, maxval=1)
    secc = jax.random.uniform(jax.random.PRNGKey(1), (b, 64, 64, 9), minval=-1, maxval=1)
    c2w = lookat_pose(jnp.zeros((b,)), jnp.zeros((b,)), jnp.zeros((b, 3)))
    cam = pack_camera(c2w, fov_to_intrinsics())
    cond = {
        "ref_torso_img": jax.random.uniform(jax.random.PRNGKey(2), (b, 64, 64, 3)),
        "bg_img": jax.random.uniform(jax.random.PRNGKey(3), (b, 64, 64, 3)),
        "segmap": jax.nn.one_hot(
            jax.random.randint(jax.random.PRNGKey(4), (b, 64, 64), 0, 6), 6
        ),
        "kp_src": jax.random.uniform(jax.random.PRNGKey(5), (b, 68, 3), minval=-0.8, maxval=0.8),
        "kp_drv": jax.random.uniform(jax.random.PRNGKey(6), (b, 68, 3), minval=-0.8, maxval=0.8),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, cam, cond, secc=secc,
    )
    out = model.apply(variables, img, cam, cond, secc=secc)
    assert out["image"].shape == (b, 64, 64, 3)
    assert out["image_raw"].shape == (b, 16, 16, 3)
    assert "facev2v_losses" in out
    assert bool(jnp.isfinite(out["image"]).all())
    # cached-cano path agrees
    cano = model.apply(variables, img, method=lambda m, i: m.cal_cano_plane(i))
    out2 = model.apply(variables, img, cam, cond, secc=secc, cano_planes=cano)
    np.testing.assert_allclose(np.asarray(out2["image"]), np.asarray(out["image"]), atol=1e-5)


@pytest.mark.slow
def test_torso_appearance_cache_equivalence():
    """Cached per-video appearance volume reproduces the uncached forward
    exactly (same masked extractor output fed back per frame)."""
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.models.img2plane import OSAvatarSECCImg2PlaneTorso

    m = OSAvatarSECCImg2PlaneTorso(
        triplane_hid_dim=8, triplane_depth=2, neural_rendering_resolution=8,
        final_resolution=32, sr_channel0=16, sr_channel1=8, sr_num_fp16_res=0,
        num_samples_coarse=4, num_samples_fine=4, torso_scale="tiny",
    )
    k = jax.random.PRNGKey(0)
    img = jax.random.uniform(k, (1, 32, 32, 3), minval=-1, maxval=1)
    cam = jnp.concatenate([jnp.eye(4).reshape(1, 16),
                           jnp.eye(3).reshape(1, 9)], -1)
    secc = jax.random.uniform(jax.random.PRNGKey(1), (1, 32, 32, 9))
    seg = jnp.zeros((1, 32, 32, 6)).at[..., 4].set(1.0)
    cond = {
        "ref_torso_img": img, "bg_img": img, "segmap": seg,
        "kp_src": jnp.zeros((1, 68, 3)), "kp_drv": jnp.zeros((1, 68, 3)),
    }
    variables = jax.jit(m.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, cam, cond, secc=secc,
    )
    want = m.apply(variables, img, cam, cond, secc=secc)["image"]
    vol = m.apply(variables, cond,
                  method=lambda mm, c: mm.cal_torso_appearance(c))
    got = m.apply(variables, img, cam, dict(cond, torso_appearance=vol),
                  secc=secc)["image"]
    assert jnp.max(jnp.abs(want - got)) < 1e-5
    # the per-video background cache reproduces the uncached forward too
    bg_feat = m.apply(variables, cond,
                      method=lambda mm, c: mm.cal_bg_feat(c))
    assert isinstance(bg_feat, tuple) and len(bg_feat) == 2
    got_bg = m.apply(variables, img, cam, dict(cond, bg_feat=bg_feat),
                     secc=secc)["image"]
    assert jnp.max(jnp.abs(want - got_bg)) < 1e-5


@pytest.mark.slow
def test_torso_bf16_close_to_fp32():
    """bf16 compute dtype through the torso branch stays within a small
    relative bound of fp32 (the inference fast path; params stay fp32)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from real3dportrait_tpu.models.torso import WarpBasedTorsoModel

    kw = dict(scale="tiny", torso_kp_num=4, version="v2", inp_mode="rgb")
    m32 = WarpBasedTorsoModel(**kw)
    m16 = WarpBasedTorsoModel(dtype=jnp.bfloat16, **kw)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    seg = jnp.zeros((1, 64, 64, 6)).at[..., 4].set(1.0)
    kp = jnp.asarray((rs.rand(1, 68, 3) - 0.5).astype(np.float32))
    head = jnp.asarray(rs.rand(1, 16, 16, 3).astype(np.float32))
    wts = jnp.asarray(rs.rand(1, 16, 16, 1).astype(np.float32))
    v = m32.init(jax.random.PRNGKey(0), img, seg, kp, kp,
                 tgt_head_img=head, tgt_head_weights=wts)
    out32 = m32.apply(v, img, seg, kp, kp, tgt_head_img=head,
                      tgt_head_weights=wts)
    out16 = m16.apply(v, img, seg, kp, kp, tgt_head_img=head,
                      tgt_head_weights=wts)
    for k in ("deformed_torso_img", "occlusion_2"):
        a = np.asarray(out32[k], np.float32)
        b = np.asarray(out16[k], np.float32)
        scale = np.abs(a).max() + 1e-6
        assert np.abs(a - b).max() / scale < 0.03, (k, np.abs(a - b).max(), scale)


def test_conv3d_via_2d_matches_nn_conv():
    """The depth-decomposed 3D conv lowering is numerically equivalent to
    flax nn.Conv (same kernel layout, SAME padding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from flax import linen as nn

    from real3dportrait_tpu.ops.conv3d import Conv3D

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.randn(2, 5, 8, 9, 6).astype(np.float32))
    for k in (1, 3, 7):
        ref = nn.Conv(4, (k, k, k), padding=k // 2)
        ours = Conv3D(4, (k, k, k))
        v = ref.init(jax.random.PRNGKey(k), x)
        want = ref.apply(v, x)
        got = ours.apply(v, x)
        assert got.shape == want.shape
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-5, atol=2e-5)


@pytest.mark.slow
def test_sr_fuse_bf16_close_to_fp32():
    """bf16 fusion convs in the SR-with-ref head stay within a small relative
    bound of the fp32 path on the tiny flagship (params shared; only the
    compute dtype of the fuse/bg/head-torso convs differs)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from real3dportrait_tpu.models.img2plane import OSAvatarSECCImg2PlaneTorso

    kw = dict(
        triplane_hid_dim=8, triplane_depth=2, neural_rendering_resolution=16,
        final_resolution=64, sr_channel0=16, sr_channel1=8, sr_num_fp16_res=0,
        num_samples_coarse=4, num_samples_fine=4, torso_scale="tiny",
    )
    m32 = OSAvatarSECCImg2PlaneTorso(**kw)
    m16 = OSAvatarSECCImg2PlaneTorso(sr_fuse_bf16=True, **kw)
    k = jax.random.PRNGKey(0)
    img = jax.random.uniform(k, (1, 64, 64, 3), minval=-1, maxval=1)
    cam = jnp.concatenate([jnp.eye(4).reshape(1, 16),
                           jnp.eye(3).reshape(1, 9)], -1)
    secc = jax.random.uniform(jax.random.PRNGKey(1), (1, 64, 64, 9))
    seg = jnp.zeros((1, 64, 64, 6)).at[..., 4].set(1.0)
    cond = {
        "ref_torso_img": img, "bg_img": img, "segmap": seg,
        "kp_src": jnp.zeros((1, 68, 3)), "kp_drv": jnp.zeros((1, 68, 3)),
    }
    v = jax.jit(m32.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, cam, cond, secc=secc,
    )
    a = np.asarray(m32.apply(v, img, cam, cond, secc=secc)["image"], np.float32)
    b = np.asarray(m16.apply(v, img, cam, cond, secc=secc)["image"], np.float32)
    scale = np.abs(a).max() + 1e-6
    assert np.abs(a - b).max() / scale < 0.04, (np.abs(a - b).max(), scale)


@pytest.mark.slow
def test_mfe_bf16_close_to_fp32():
    """The motion-field-estimator bf16 knobs (fat convs only, and whole-MFE)
    stay within a small relative bound of the fp32 path (params shared)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from real3dportrait_tpu.models.torso import WarpBasedTorsoModel

    kw = dict(scale="tiny", torso_kp_num=4, version="v2", inp_mode="rgb",
              norm_mode="affine")
    m32 = WarpBasedTorsoModel(**kw)
    rs = np.random.RandomState(0)
    img = jnp.asarray(rs.rand(1, 64, 64, 3).astype(np.float32) * 2 - 1)
    seg = jnp.zeros((1, 64, 64, 6)).at[..., 4].set(1.0)
    kp = jnp.asarray((rs.rand(1, 68, 3) - 0.5).astype(np.float32))
    head = jnp.asarray(rs.rand(1, 16, 16, 3).astype(np.float32))
    wts = jnp.asarray(rs.rand(1, 16, 16, 1).astype(np.float32))
    v = m32.init(jax.random.PRNGKey(0), img, seg, kp, kp,
                 tgt_head_img=head, tgt_head_weights=wts)
    out32 = m32.apply(v, img, seg, kp, kp, tgt_head_img=head,
                      tgt_head_weights=wts)
    for variant in (dict(mfe_fat_bf16=True), dict(mfe_bf16=True)):
        m16 = WarpBasedTorsoModel(**kw, **variant)
        out16 = m16.apply(v, img, seg, kp, kp, tgt_head_img=head,
                          tgt_head_weights=wts)
        for k in ("deformed_torso_img", "occlusion_2", "occlusion"):
            a = np.asarray(out32[k], np.float32)
            b = np.asarray(out16[k], np.float32)
            scale = np.abs(a).max() + 1e-6
            assert np.abs(a - b).max() / scale < 0.03, (
                variant, k, np.abs(a - b).max(), scale)


def test_mfe_fused_tail_matches_direct():
    """The depth-folded fused mask+occlusion tail is numerically equivalent
    to the reference-shaped direct lowering (same params, same taps)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from real3dportrait_tpu.models.torso import MotionFieldEstimator

    kw = dict(num_keypoints=4, down_seq=(8, 16), up_seq=(16, 8, 4),
              norm_mode="affine", use_head_cond=True, head_hid_dim=8)
    m_fused = MotionFieldEstimator(**kw, tail_mode="fused")
    m_direct = MotionFieldEstimator(**kw, tail_mode="direct")
    rs = np.random.RandomState(0)
    fs = jnp.asarray(rs.randn(1, 4, 16, 16, 4).astype(np.float32))
    kp_s = jnp.asarray((rs.rand(1, 4, 3) - 0.5).astype(np.float32))
    kp_d = kp_s + 0.1
    head = jnp.asarray(rs.rand(1, 16, 16, 3).astype(np.float32))
    wts = jnp.asarray(rs.rand(1, 16, 16, 1).astype(np.float32))
    v = m_fused.init(jax.random.PRNGKey(0), fs, kp_s, kp_d,
                     tgt_head_img=head, tgt_head_weights=wts)
    # identical param trees (checkpoint compatibility)
    va = jax.tree_util.tree_structure(v)
    vb = jax.tree_util.tree_structure(
        m_direct.init(jax.random.PRNGKey(0), fs, kp_s, kp_d,
                      tgt_head_img=head, tgt_head_weights=wts))
    assert va == vb
    out_f = m_fused.apply(v, fs, kp_s, kp_d, tgt_head_img=head,
                          tgt_head_weights=wts)
    out_d = m_direct.apply(v, fs, kp_s, kp_d, tgt_head_img=head,
                           tgt_head_weights=wts)
    for a, b, name in zip(out_f, out_d, ("deformation", "occ", "occ2")):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   atol=2e-5, rtol=1e-4, err_msg=name)
