import jax
import jax.numpy as jnp
import numpy as np
import pytest

# heavy end-to-end module: excluded from the fast gating tier
pytestmark = pytest.mark.slow

from real3dportrait_tpu.geometry import fov_to_intrinsics, lookat_pose, pack_camera
from real3dportrait_tpu.models.eg3d import TriPlaneGenerator
from real3dportrait_tpu.models.img2plane import OSAvatarImg2Plane, OSAvatarSECCImg2Plane
from real3dportrait_tpu.models.segformer import (
    MixVisionTransformer,
    SegFormerHead,
    SegFormerImg2PlaneBackbone,
    SegFormerSECC2PlaneBackbone,
    apply_plane_flips,
)

TINY = dict(
    triplane_hid_dim=8,
    triplane_depth=2,
    neural_rendering_resolution=16,
    final_resolution=64,
    sr_channel0=16,
    sr_channel1=8,
    sr_num_fp16_res=0,
    num_samples_coarse=8,
    num_samples_fine=8,
)


def _camera(b=1):
    c2w = lookat_pose(jnp.zeros((b,)), jnp.zeros((b,)), jnp.zeros((b, 3)))
    return pack_camera(c2w, fov_to_intrinsics())


def test_mit_pyramid_shapes(rng):
    m = MixVisionTransformer(scale="b0")
    x = jax.random.normal(rng, (1, 64, 64, 3))
    variables = m.init(jax.random.PRNGKey(0), x)
    feats = m.apply(variables, x)
    assert [f.shape for f in feats] == [
        (1, 16, 16, 32), (1, 8, 8, 64), (1, 4, 4, 160), (1, 2, 2, 256)
    ]
    head = SegFormerHead()
    hv = head.init(jax.random.PRNGKey(1), feats)
    fused = head.apply(hv, feats)
    assert fused.shape == (1, 16, 16, 256)


def test_plane_flips_involution():
    planes = jax.random.normal(jax.random.PRNGKey(0), (2, 3, 4, 4, 6))
    flipped = apply_plane_flips(planes)
    assert flipped.shape == planes.shape
    # flipping twice is identity
    np.testing.assert_allclose(
        np.asarray(apply_plane_flips(flipped)), np.asarray(planes)
    )


def test_img2plane_backbone_shapes(rng):
    bb = SegFormerImg2PlaneBackbone(scale="b0", plane_channels=16)
    img = jax.random.normal(rng, (1, 64, 64, 3))
    variables = bb.init(jax.random.PRNGKey(0), img)
    planes = bb.apply(variables, img)
    assert planes.shape == (1, 3, 32, 32, 16)


def test_secc_backbone_accepts_9ch(rng):
    bb = SegFormerSECC2PlaneBackbone(scale="b0", plane_channels=16)
    secc = jax.random.normal(rng, (1, 64, 64, 9))
    variables = bb.init(jax.random.PRNGKey(0), secc)
    planes = bb.apply(variables, secc)
    assert planes.shape == (1, 3, 32, 32, 16)


def test_osavatar_img2plane_end_to_end(rng):
    model = OSAvatarImg2Plane(**TINY)
    img = jax.random.normal(rng, (1, 64, 64, 3))
    cam = _camera(1)
    variables = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                           img, cam)
    out = model.apply(variables, img, cam)
    assert out["image"].shape == (1, 64, 64, 3)
    assert out["image_raw"].shape == (1, 16, 16, 3)
    assert out["image_depth"].shape == (1, 16, 16, 1)
    assert out["image_feature"].shape == (1, 16, 16, TINY["triplane_hid_dim"] - 3)
    # trigrid layout
    assert out["plane"].shape == (1, 3, 2, 32, 32, 8)
    assert bool(jnp.isfinite(out["image"]).all())


def test_osavatar_secc_cano_cache_equivalence(rng):
    """Cached-plane path must equal the full path (the key inference optimization)."""
    model = OSAvatarSECCImg2Plane(**TINY)
    img = jax.random.normal(rng, (1, 64, 64, 3))
    secc = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 9))
    cam = _camera(1)
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, img, cam,
        secc=secc,
    )
    out_full = model.apply(variables, img, cam, secc=secc)
    cano = model.apply(variables, img, method=lambda m, i: m.cal_cano_plane(i))
    np.testing.assert_allclose(np.asarray(cano), np.asarray(out_full["cano_plane"]))
    out_cached = model.apply(variables, img, cam, secc=secc, cano_planes=cano)
    np.testing.assert_allclose(
        np.asarray(out_cached["image"]), np.asarray(out_full["image"]), atol=1e-5
    )
    # different secc -> different image (motion conditioning is live)
    out_other = model.apply(variables, img, cam, secc=secc * -1.0, cano_planes=cano)
    assert float(jnp.abs(out_other["image"] - out_full["image"]).max()) > 1e-4


def test_render_bf16_close_to_fp32(rng):
    """render_bf16 (bf16 plane gathers + decoder MLP + bf16 colors through
    the composite, fp32 density/march math) stays within a small bound of
    the fp32 render — the shipped inference fast path."""
    model32 = OSAvatarSECCImg2Plane(**TINY)
    model16 = OSAvatarSECCImg2Plane(**TINY, render_bf16=True)
    img = jax.random.normal(rng, (1, 64, 64, 3))
    secc = jax.random.normal(jax.random.PRNGKey(3), (1, 64, 64, 9))
    cam = _camera(1)
    variables = model32.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, cam, secc=secc,
    )
    want = model32.apply(variables, img, cam, secc=secc)
    got = model16.apply(variables, img, cam, secc=secc)
    for k in ("image", "image_raw"):
        err = float(jnp.abs(got[k] - want[k]).max())
        assert err < 0.08, f"{k}: max|bf16-fp32| = {err}"
        # and they must not be trivially identical (bf16 path actually ran)
    assert float(jnp.abs(got["image"] - want["image"]).max()) > 0.0


def test_eg3d_teacher_tiny(rng):
    g = TriPlaneGenerator(
        z_dim=16, w_dim=16, plane_resolution=32, triplane_hid_dim=8,
        neural_rendering_resolution=16, final_resolution=64,
        channel_base=512, channel_max=64, sr_num_fp16_res=0,
        num_samples_coarse=8, num_samples_fine=8, mapping_layers=2,
    )
    z = jax.random.normal(rng, (2, 16))
    cam = jnp.tile(_camera(1), (2, 1))
    variables = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                       z, cam)
    out = g.apply(variables, z, cam)
    assert out["image"].shape == (2, 64, 64, 3)
    assert out["plane"].shape == (2, 3, 32, 32, 8)
    assert bool(jnp.isfinite(out["image"]).all())


def test_osavatar_jit_and_grad(rng):
    model = OSAvatarImg2Plane(**TINY)
    img = jax.random.normal(rng, (1, 64, 64, 3))
    cam = _camera(1)
    variables = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                           img, cam)

    @jax.jit
    def loss_fn(params, img, cam):
        out = model.apply({**variables, "params": params}, img, cam)
        return jnp.mean(jnp.square(out["image"]))

    g = jax.grad(loss_fn)(variables["params"], img, cam)
    leaves = jax.tree_util.tree_leaves(g)
    assert all(bool(jnp.isfinite(x).all()) for x in leaves)
    total = sum(float(jnp.abs(x).sum()) for x in leaves)
    assert total > 0


def test_trigrid_v2_plane2grid():
    """trigrid_v2: shared 3D-conv plane refinement on both plane paths
    (`img2plane_baseline.py:58,131-134`, `secc_img2plane.py:55-58`)."""
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.models.img2plane import OSAvatarSECCImg2Plane

    m = OSAvatarSECCImg2Plane(
        triplane_hid_dim=8, triplane_depth=2, triplane_feature_type="trigrid_v2",
        neural_rendering_resolution=8, final_resolution=32,
        sr_channel0=16, sr_channel1=8, sr_num_fp16_res=0,
        num_samples_coarse=4, num_samples_fine=4,
    )
    img = jnp.zeros((1, 32, 32, 3))
    cam = jnp.eye(4).reshape(1, 16)
    cam = jnp.concatenate([cam, jnp.eye(3).reshape(1, 9)], -1)
    secc = jnp.zeros((1, 32, 32, 9))
    variables = jax.jit(m.init)(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        img, cam, secc=secc,
    )
    # one shared refinement module exists in the tree
    assert "plane2grid_module" in variables["params"]
    blocks = variables["params"]["plane2grid_module"]
    assert "block0" in blocks and "block1" not in blocks  # depth<=3 -> 1 block
    out = jax.jit(m.apply)(variables, img, cam, secc=secc)
    assert out["image"].shape == (1, 32, 32, 3)
