import jax
import jax.numpy as jnp
import numpy as np

from real3dportrait_tpu.geometry import fov_to_intrinsics, lookat_pose, pack_camera
from real3dportrait_tpu.models.img2plane import OSAvatarImg2Plane
from real3dportrait_tpu.models.img2plane_composite import (
    CompositeImg2PlaneBackbone,
    pixel_shuffle,
)


def test_pixel_shuffle():
    x = jnp.arange(1 * 2 * 2 * 8).reshape(1, 2, 2, 8).astype(jnp.float32)
    y = pixel_shuffle(x, 2)
    assert y.shape == (1, 4, 4, 2)
    # depth-to-space: channel blocks become 2x2 spatial neighborhoods
    np.testing.assert_allclose(np.asarray(y[0, 0, 0]), np.asarray(x[0, 0, 0, :2]))
    np.testing.assert_allclose(np.asarray(y[0, 0, 1]), np.asarray(x[0, 0, 0, 2:4]))
    np.testing.assert_allclose(np.asarray(y[0, 1, 0]), np.asarray(x[0, 0, 0, 4:6]))


def test_composite_backbone_shapes(rng):
    bb = CompositeImg2PlaneBackbone(plane_channels=8, scale="small", vit_dim=64)
    img = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    variables = bb.init(jax.random.PRNGKey(0), img)
    planes = bb.apply(variables, img)
    assert planes.shape == (1, 3, 32, 32, 8)  # input/2, per-plane channels
    assert bool(jnp.isfinite(planes).all())


def test_composite_camera_alpha_modes(rng):
    bb = CompositeImg2PlaneBackbone(plane_channels=8, scale="small", vit_dim=64,
                                    input_mode="rgb_alpha_camera")
    img = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    cond = {"ref_cameras": jnp.zeros((1, 25))}
    variables = bb.init(jax.random.PRNGKey(0), img, cond)
    planes = bb.apply(variables, img, cond)
    assert planes.shape == (1, 3, 32, 32, 8)


def test_avatar_model_with_composite_backbone(rng):
    model = OSAvatarImg2Plane(
        backbone_mode="composite", backbone_scale="small", composite_vit_dim=64,
        triplane_hid_dim=8, triplane_depth=2, neural_rendering_resolution=16,
        final_resolution=64, sr_channel0=16, sr_channel1=8, sr_num_fp16_res=0,
        num_samples_coarse=6, num_samples_fine=6,
    )
    img = jax.random.uniform(rng, (1, 64, 64, 3), minval=-1, maxval=1)
    cam = pack_camera(lookat_pose(jnp.zeros((1,)), jnp.zeros((1,)), jnp.zeros((1, 3))),
                      fov_to_intrinsics())
    variables = model.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                           img, cam)
    out = model.apply(variables, img, cam)
    assert out["image"].shape == (1, 64, 64, 3)
    assert out["plane"].shape == (1, 3, 2, 32, 32, 8)
    assert bool(jnp.isfinite(out["image"]).all())
