"""Camera pose construction, sampling, and convention conversion.

TPU-native (fully vectorized, PRNG-key-threaded) redesign of the reference
camera stack:

* `modules/eg3ds/camera_utils/pose_sampler.py:23,83,174,207` — look-at pose
  construction and gaussian/uniform pose sampling around the face;
* `data_gen/eg3d/convert_to_eg3d_convention.py:8,31,42` — conversion from
  the 3DMM-fit (OpenCV-style, per-sample python loop in the reference) camera
  to the EG3D rendering convention (here: one batched jnp function).

The EG3D camera vector fed to generators/discriminators is 25-d:
``concat(flatten(c2w 4x4), flatten(intrinsics 3x3))``.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from real3dportrait_tpu.geometry.bfm import compute_rotation

DEFAULT_FOV_DEGREES = 18.837
EG3D_CAMERA_RADIUS = 2.7


def normalize(v: jnp.ndarray, eps: float = 1e-9) -> jnp.ndarray:
    return v / (jnp.linalg.norm(v, axis=-1, keepdims=True) + eps)


def fov_to_intrinsics(fov_degrees: float = DEFAULT_FOV_DEGREES) -> jnp.ndarray:
    """FOV -> normalized 3x3 intrinsics (`pose_sampler.py:207`)."""
    focal = 1.0 / (math.tan(fov_degrees * math.pi / 360.0) * 1.414)
    return jnp.array(
        [[focal, 0.0, 0.5], [0.0, focal, 0.5], [0.0, 0.0, 1.0]], dtype=jnp.float32
    )


def create_cam2world_matrix(
    forward_vector: jnp.ndarray,
    origin: jnp.ndarray,
    roll: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """[B,3] forward, [B,3] origin (+optional [B] roll radians) -> [B,4,4].

    y-up OpenCV-ish convention matching `pose_sampler.py:174`: columns of the
    rotation block are (right, up, forward).
    """
    b = forward_vector.shape[0]
    forward = normalize(forward_vector)
    if roll is None:
        roll = jnp.zeros((b,), forward.dtype)
    roll = roll.reshape(b)
    up = jnp.stack([jnp.sin(roll), jnp.cos(roll), jnp.zeros_like(roll)], axis=-1)
    right = -normalize(jnp.cross(up, forward))
    up = normalize(jnp.cross(forward, right))
    rot = jnp.stack([right, up, forward], axis=-1)  # columns
    c2w = jnp.zeros((b, 4, 4), forward.dtype)
    c2w = c2w.at[:, :3, :3].set(rot)
    c2w = c2w.at[:, :3, 3].set(origin)
    c2w = c2w.at[:, 3, 3].set(1.0)
    return c2w


def lookat_pose(
    horizontal: jnp.ndarray,
    vertical: jnp.ndarray,
    lookat_position: jnp.ndarray,
    radius: float = EG3D_CAMERA_RADIUS,
    roll: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Spherical angles -> [B,4,4] cam2world looking at ``lookat_position``.

    ``horizontal``/``vertical`` are radians offset from the front view
    (0, 0 = frontal), matching `LookAtPoseSampler` with mean-centered inputs:
    the reference parameterizes horizontal/vertical around pi/2.
    """
    h = horizontal + math.pi / 2
    v = jnp.clip(vertical + math.pi / 2, 1e-5, math.pi - 1e-5)
    cam = jnp.stack(
        [
            radius * jnp.sin(v) * jnp.cos(math.pi - h),
            radius * jnp.cos(v),
            radius * jnp.sin(v) * jnp.sin(math.pi - h),
        ],
        axis=-1,
    )
    origin = cam + lookat_position
    forward = normalize(lookat_position - origin)
    return create_cam2world_matrix(forward, origin, roll)


def sample_uniform_pose(
    key: jax.Array,
    batch_size: int,
    pitch_range: float = math.radians(26.0),
    yaw_range: float = math.radians(38.0),
    lookat_position: jnp.ndarray | None = None,
    radius: float = EG3D_CAMERA_RADIUS,
) -> jnp.ndarray:
    """Sample [B,4,4] cam2world with uniform pitch/yaw around frontal.

    Replaces `UnifiedCameraPoseSampler.get_camera_pose` + the dataset's
    ±26°/±38° distillation pose sampling (`motion2video_dataset.py:103-209`),
    with the PRNG key passed explicitly.
    """
    if lookat_position is None:
        lookat_position = jnp.array([0.0, 0.0, 0.2], jnp.float32)
    k1, k2 = jax.random.split(key)
    pitch = jax.random.uniform(k1, (batch_size,), minval=-pitch_range, maxval=pitch_range)
    yaw = jax.random.uniform(k2, (batch_size,), minval=-yaw_range, maxval=yaw_range)
    look = jnp.broadcast_to(lookat_position, (batch_size, 3))
    return lookat_pose(yaw, pitch, look, radius=radius)


def pack_camera(c2w: jnp.ndarray, intrinsics: jnp.ndarray) -> jnp.ndarray:
    """[B,4,4],[B or 1,3,3] -> [B,25] EG3D camera conditioning vector."""
    b = c2w.shape[0]
    intr = jnp.broadcast_to(intrinsics.reshape(-1, 9), (b, 9))
    return jnp.concatenate([c2w.reshape(b, 16), intr], axis=-1)


def unpack_camera(camera: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B,25] -> ([B,4,4] c2w, [B,3,3] intrinsics)."""
    return camera[:, :16].reshape(-1, 4, 4), camera[:, 16:25].reshape(-1, 3, 3)


# ---------------------------------------------------------------------------
# 3DMM-fit -> EG3D convention
# ---------------------------------------------------------------------------

_EG3D_CONVENTION_FOCAL = 2985.29 / 700.0
_EG3D_TRANS_SCALE = 0.27
_EG3D_TRANS_OFFSET = jnp.array([0.0, 0.006, 0.161], jnp.float32)


def convert_eg3d_convention(
    euler: jnp.ndarray, trans: jnp.ndarray
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Batched 3DMM (euler, trans) -> EG3D rendering camera.

    Returns ``(c2w, convention_c2w, intrinsics)`` with shapes
    ``[B,4,4], [B,4,4], [B,3,3]`` — the vectorized equivalent of the
    reference's per-sample loop (`convert_to_eg3d_convention.py:42`):
    camera center ``c = -R @ (trans - 10*e_z)`` scaled by 0.27 with the fixed
    submission offsets, axes permuted by diag(1,-1,-1), and the convention
    pose renormalized to radius 2.7.
    """
    b = euler.shape[0]
    rot = compute_rotation(euler)  # [B,3,3], pts @ R convention
    t = trans.astype(jnp.float32).at[:, 2].add(-10.0)
    c = -jnp.einsum("bij,bj->bi", rot, t)
    c = c * _EG3D_TRANS_SCALE + _EG3D_TRANS_OFFSET[None]

    flip = jnp.diag(jnp.array([1.0, -1.0, -1.0], jnp.float32))
    pose_rot = rot @ flip[None]
    c2w = jnp.zeros((b, 4, 4), jnp.float32)
    c2w = c2w.at[:, :3, :3].set(pose_rot)
    c2w = c2w.at[:, :3, 3].set(c)
    c2w = c2w.at[:, 3, 3].set(1.0)

    radius = jnp.linalg.norm(c, axis=-1, keepdims=True)
    conv_c = c / jnp.maximum(radius, 1e-9) * EG3D_CAMERA_RADIUS
    conv_c2w = c2w.at[:, :3, 3].set(conv_c)

    intrinsics = jnp.array(
        [
            [_EG3D_CONVENTION_FOCAL, 0.0, 0.5],
            [0.0, _EG3D_CONVENTION_FOCAL, 0.5],
            [0.0, 0.0, 1.0],
        ],
        jnp.float32,
    )
    intrinsics = jnp.broadcast_to(intrinsics, (b, 3, 3))
    return c2w, conv_c2w, intrinsics


def smooth_camera_sequence(camera: jnp.ndarray, kernel_size: int = 7) -> jnp.ndarray:
    """Temporally smooth a [T,25] camera sequence (`infer_utils.py:40`).

    Box-filters the c2w entries along time (reflect padding); intrinsics are
    passed through. The rotation block is re-orthonormalized via SVD.
    """
    t = camera.shape[0]
    # reflect padding provides at most t-1 rows per side: clamp the kernel
    # for short sequences (odd, <= 2t-1)
    kernel_size = min(kernel_size, 2 * t - 1)
    if kernel_size % 2 == 0:
        kernel_size -= 1
    if t < 2 or kernel_size < 3:
        return camera
    pad = kernel_size // 2
    c2w = camera[:, :16]
    padded = jnp.concatenate([c2w[pad:0:-1], c2w, c2w[-2 : -2 - pad : -1]], axis=0)
    kernel = jnp.ones((kernel_size,), jnp.float32) / kernel_size
    smoothed = jax.vmap(
        lambda col: jnp.convolve(col, kernel, mode="valid"), in_axes=1, out_axes=1
    )(padded)
    sm = smoothed.reshape(t, 4, 4)
    u, _, vt = jnp.linalg.svd(sm[:, :3, :3])
    rot = u @ vt
    sm = sm.at[:, :3, :3].set(rot)
    return jnp.concatenate([sm.reshape(t, 16), camera[:, 16:]], axis=-1)


def mirror_index(idx: jnp.ndarray | int, length: int):
    """Ping-pong looping index (`inference/infer_utils.py:24`)."""
    period = 2 * (length - 1) if length > 1 else 1
    r = jnp.mod(idx, period)
    return jnp.where(r < length, r, period - r)
