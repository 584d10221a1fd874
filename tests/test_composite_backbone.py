import pytest

# heavy end-to-end module: excluded from the fast gating tier
pytestmark = pytest.mark.slow
import jax
import jax.numpy as jnp
import numpy as np

from real3dportrait_tpu.geometry import fov_to_intrinsics, lookat_pose, pack_camera
from real3dportrait_tpu.models.img2plane import OSAvatarImg2Plane
from real3dportrait_tpu.models.img2plane_composite import (
    CompositeImg2PlaneBackbone,
    pixel_shuffle,
)


def test_pixel_shuffle_matches_torch():
    import torch

    x = np.random.RandomState(0).randn(2, 3, 8, 2, 2).astype(np.float32)
    x_t = torch.from_numpy(x.reshape(2, 24, 2, 2))
    want = torch.nn.functional.pixel_shuffle(x_t, 2).numpy()
    got = pixel_shuffle(jnp.asarray(x.reshape(2, 24, 2, 2).transpose(0, 2, 3, 1)), 2)
    np.testing.assert_allclose(np.asarray(got).transpose(0, 3, 1, 2), want,
                               rtol=1e-6)


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
