import math

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real3dportrait_tpu.geometry import (
    compute_face_vertex,
    compute_key_shape,
    compute_landmarks_2d,
    compute_rotation,
    compute_shape,
    convert_eg3d_convention,
    create_cam2world_matrix,
    fov_to_intrinsics,
    lookat_pose,
    mirror_index,
    pack_camera,
    sample_uniform_pose,
    smooth_camera_sequence,
    synthetic_bfm,
    unpack_camera,
)
from real3dportrait_tpu.geometry import face3d_helper


@pytest.fixture(scope="module")
def assets():
    return synthetic_bfm(n_vertices=256, n_keypoints=68)


def test_rotation_orthonormal():
    euler = jnp.array([[0.1, -0.4, 0.7], [0.0, 0.0, 0.0], [1.2, 0.3, -0.9]])
    rot = compute_rotation(euler)
    eye = jnp.eye(3)[None].repeat(3, 0)
    np.testing.assert_allclose(rot @ jnp.swapaxes(rot, 1, 2), eye, atol=1e-5)
    np.testing.assert_allclose(np.linalg.det(np.asarray(rot)), 1.0, atol=1e-5)
    np.testing.assert_allclose(rot[1], jnp.eye(3), atol=1e-7)


def test_rotation_single_axis_convention():
    # pure yaw (y-axis) by 90deg: row-vector convention pts @ R.
    # R_returned = (Rz Ry Rx)^T = Ry^T for pure yaw.
    euler = jnp.array([[0.0, math.pi / 2, 0.0]])
    rot = compute_rotation(euler)
    pt = jnp.array([[1.0, 0.0, 0.0]])
    out = pt @ rot[0]
    # row-vector @ Ry^T picks Ry^T's first row = (cos, 0, -sin) = (0,0,-1)
    np.testing.assert_allclose(out, [[0.0, 0.0, -1.0]], atol=1e-6)


def test_compute_shape_shapes(assets):
    idc = jnp.ones((2, 80)) * 0.1
    expc = jnp.ones((2, 64)) * 0.1
    shape = compute_shape(assets, idc, expc)
    assert shape.shape == (2, assets.n_vertices, 3)
    key = compute_key_shape(assets, idc, expc)
    assert key.shape == (2, 68, 3)
    # keypoint subset consistency: key shape == full shape gathered at keypoints
    np.testing.assert_allclose(
        key, shape[:, np.asarray(assets.keypoints)], rtol=1e-5, atol=1e-6
    )


def test_projection_analytic(assets):
    # A point at the optical axis must project to the principal point (112,112).
    idc = jnp.zeros((1, 80))
    expc = jnp.zeros((1, 64))
    euler = jnp.zeros((1, 3))
    trans = jnp.zeros((1, 3))
    verts = compute_face_vertex(assets, idc, expc, euler, trans)
    # camera-space z should be ~10 - meanshape_z
    ms = np.asarray(assets.mean_shape).reshape(-1, 3)
    np.testing.assert_allclose(verts[0, :, 2], 10.0 - ms[:, 2], atol=1e-5)
    from real3dportrait_tpu.geometry import to_image

    pix = to_image(jnp.array([[[0.0, 0.0, 10.0]]]))
    np.testing.assert_allclose(pix, [[[112.0, 112.0]]], atol=1e-5)


def test_landmarks_2d_in_frame(assets):
    lm2d = compute_landmarks_2d(
        assets, jnp.zeros((1, 80)), jnp.zeros((1, 64)), jnp.zeros((1, 3)), jnp.zeros((1, 3))
    )
    assert lm2d.shape == (1, 68, 2)
    # the synthetic face is within +-1 world units at distance 10 with focal 1015:
    # it spans roughly 112 +- 101 pixels, inside the 224 frame
    assert np.all(np.asarray(lm2d) > 0) and np.all(np.asarray(lm2d) < 224)


def test_idexp_lm3d_scale_and_linearity(assets):
    idc = jax.random.normal(jax.random.PRNGKey(0), (3, 80)) * 0.1
    expc = jax.random.normal(jax.random.PRNGKey(1), (3, 64)) * 0.1
    lm = face3d_helper.reconstruct_idexp_lm3d(assets, idc, expc)
    assert lm.shape == (3, 68, 3)
    lm2 = face3d_helper.reconstruct_idexp_lm3d(assets, 2 * idc, 2 * expc)
    np.testing.assert_allclose(lm2, 2 * lm, rtol=1e-4, atol=1e-6)
    # x10 scale: idexp == 10 * (key_shape(id,exp) - key_mean)
    cano = face3d_helper.reconstruct_cano_lm3d(assets, idc, expc)
    cano0 = face3d_helper.reconstruct_cano_lm3d(assets, jnp.zeros((3, 80)), jnp.zeros((3, 64)))
    np.testing.assert_allclose(lm, 10 * (cano - cano0), rtol=1e-4, atol=1e-5)


def test_lm2d_btc_batching(assets):
    idc = jnp.ones((2, 3, 80)) * 0.05
    expc = jnp.ones((2, 3, 64)) * 0.05
    euler = jnp.zeros((2, 3, 3))
    trans = jnp.zeros((2, 3, 3))
    lm = face3d_helper.reconstruct_lm2d(assets, idc, expc, euler, trans)
    assert lm.shape == (2, 3, 68, 2)


def test_close_mouth_eyes(assets):
    lm = jax.random.normal(jax.random.PRNGKey(2), (4, 68, 3))
    closed = face3d_helper.close_mouth_for_idexp_lm3d(lm)
    assert closed.shape == lm.shape
    np.testing.assert_allclose(closed[:, 48:68], 0.0)
    closed_eyes = face3d_helper.close_eyes_for_idexp_lm3d(lm)
    # the sequential in-place snap contracts the eyelid gap to (u-l)/4 + 1.5eps
    gap0 = np.asarray(lm[:, 37:39, 1] - lm[:, [41, 40], 1])
    gap = np.asarray(closed_eyes[:, 37:39, 1] - closed_eyes[:, [41, 40], 1])
    np.testing.assert_allclose(gap, gap0 / 4 + 1.5 * 0.003, atol=1e-5)


def test_cam2world_lookat():
    look = jnp.zeros((1, 3))
    c2w = lookat_pose(jnp.zeros((1,)), jnp.zeros((1,)), look, radius=2.7)
    assert c2w.shape == (1, 4, 4)
    origin = c2w[0, :3, 3]
    np.testing.assert_allclose(jnp.linalg.norm(origin), 2.7, atol=1e-5)
    # frontal pose: camera on +z looking toward origin (forward = -z direction)
    np.testing.assert_allclose(origin, [0.0, 0.0, 2.7], atol=1e-5)
    forward = c2w[0, :3, 2]
    np.testing.assert_allclose(forward, [0.0, 0.0, -1.0], atol=1e-5)
    # rotation block orthonormal
    r = c2w[0, :3, :3]
    np.testing.assert_allclose(r @ r.T, jnp.eye(3), atol=1e-5)


def test_cam2world_roll():
    fwd = jnp.array([[0.0, 0.0, -1.0]])
    org = jnp.array([[0.0, 0.0, 2.7]])
    c2w0 = create_cam2world_matrix(fwd, org)
    c2w_roll = create_cam2world_matrix(fwd, org, roll=jnp.array([math.pi / 2]))
    # OpenCV-style y-down: up column is -y at roll 0, rotating to -x at 90deg
    np.testing.assert_allclose(c2w0[0, :3, 1], [0.0, -1.0, 0.0], atol=1e-5)
    np.testing.assert_allclose(c2w_roll[0, :3, 1], [-1.0, 0.0, 0.0], atol=1e-5)


def test_pose_sampler_bounds(rng):
    c2w = sample_uniform_pose(rng, 16)
    assert c2w.shape == (16, 4, 4)
    # all cameras at radius 2.7 around the pivot
    pivot = jnp.array([0.0, 0.0, 0.2])
    d = jnp.linalg.norm(c2w[:, :3, 3] - pivot, axis=-1)
    np.testing.assert_allclose(d, 2.7, atol=1e-4)


def test_intrinsics():
    intr = fov_to_intrinsics()
    assert intr.shape == (3, 3)
    assert abs(float(intr[0, 0]) - 4.2634) < 1e-3  # EG3D's focal for 18.837deg
    cam = pack_camera(jnp.eye(4)[None], intr)
    assert cam.shape == (1, 25)
    c2w, k = unpack_camera(cam)
    np.testing.assert_allclose(c2w[0], jnp.eye(4))
    np.testing.assert_allclose(k[0], intr)


def test_convert_eg3d_convention():
    euler = jnp.array([[0.0, 0.0, 0.0], [0.1, -0.2, 0.05]])
    trans = jnp.array([[0.0, 0.0, 0.0], [0.01, -0.02, 0.1]])
    c2w, conv_c2w, intr = convert_eg3d_convention(euler, trans)
    assert c2w.shape == (2, 4, 4) and conv_c2w.shape == (2, 4, 4) and intr.shape == (2, 3, 3)
    # convention pose is renormalized to radius 2.7
    np.testing.assert_allclose(
        jnp.linalg.norm(conv_c2w[:, :3, 3], axis=-1), [2.7, 2.7], atol=1e-5
    )
    # identity pose: camera sits at +z (model looks down z with dist 10 scaled by .27)
    np.testing.assert_allclose(c2w[0, :3, 3], [0.0, 0.006, 2.7 + 0.161], atol=1e-5)
    np.testing.assert_allclose(intr[0, 0, 0], 2985.29 / 700, rtol=1e-6)
    # rotation block: identity euler -> diag(1,-1,-1) flip
    np.testing.assert_allclose(c2w[0, :3, :3], np.diag([1.0, -1.0, -1.0]), atol=1e-6)


def test_smooth_camera_sequence():
    t = 25
    cams = jnp.concatenate(
        [jnp.broadcast_to(jnp.eye(4).reshape(16), (t, 16)), jnp.zeros((t, 9))], axis=-1
    )
    noisy = cams.at[:, 3].add(jax.random.normal(jax.random.PRNGKey(0), (t,)) * 0.05)
    sm = smooth_camera_sequence(noisy)
    assert sm.shape == noisy.shape
    assert float(jnp.var(sm[:, 3])) < float(jnp.var(noisy[:, 3]))
    # rotation stays orthonormal after smoothing
    r = sm[:, :16].reshape(t, 4, 4)[:, :3, :3]
    np.testing.assert_allclose(r @ jnp.swapaxes(r, 1, 2), jnp.eye(3)[None].repeat(t, 0), atol=1e-4)


def test_mirror_index():
    idx = mirror_index(jnp.arange(10), 4)
    np.testing.assert_array_equal(np.asarray(idx), [0, 1, 2, 3, 2, 1, 0, 1, 2, 3])


def test_geometry_jits(assets):
    f = jax.jit(lambda i, e, eu, t: compute_face_vertex(assets, i, e, eu, t))
    out = f(jnp.zeros((1, 80)), jnp.zeros((1, 64)), jnp.zeros((1, 3)), jnp.zeros((1, 3)))
    assert out.shape == (1, assets.n_vertices, 3)
