"""BFM09 parametric 3D face model as pure JAX functions.

TPU-native re-design of the reference `ParametricFaceModel`
(`deep_3drecon/deep_3drecon_models/bfm.py:28` in yerfor/Real3DPortrait):
instead of a stateful torch module holding device buffers, the morphable
model is a frozen pytree of arrays (:class:`BFMAssets`) and every operation
is a pure, batched, jit-friendly function.

Conventions (kept bit-compatible with the reference so fitted coefficients
are interchangeable):

* shape  = mean + id_base @ id_coeff(80) + exp_base @ exp_coeff(64), row-major
  xyz interleaving (``[3N]`` flattened, reshaped to ``[N, 3]``).
* rotation: ``compute_rotation(euler)`` returns ``(Rz @ Ry @ Rx)^T`` so points
  transform as row vectors ``pts @ R + t`` (``bfm.py:204``).
* camera: looking down +z at distance 10; ``to_camera`` maps ``z -> 10 - z``.
* projection: pinhole with focal 1015 and principal point 112 on a 224 image
  (``bfm.py:13``), applied as ``pts @ P^T`` then perspective divide.
"""

from __future__ import annotations

import os
from typing import Any

import jax.numpy as jnp
import numpy as np
from flax.struct import dataclass as pytree_dataclass
from flax.struct import field

DEFAULT_CAMERA_DISTANCE = 10.0
DEFAULT_FOCAL = 1015.0
DEFAULT_CENTER = 112.0

# 68-landmark index groups (iBUG convention), used by loss weighting and the
# mouth/eye editing helpers.
LM68_EYE_RANGE = (17, 48)
LM68_MOUTH_RANGE = (48, 68)


@pytree_dataclass
class BFMAssets:
    """Frozen pytree of morphable-model bases.

    All arrays are float32 unless noted. ``n_vertices`` is N (35709 for the
    real BFM09 front model), ``n_faces`` is F (~70k), ``n_keypoints`` is 68
    (lm68 mode) or 468 (mediapipe mode).
    """

    mean_shape: Any      # [3N]   recentered mean shape
    id_base: Any         # [3N, 80]
    exp_base: Any        # [3N, 64]
    key_mean_shape: Any  # [K, 3]
    key_id_base: Any     # [3K, 80]
    key_exp_base: Any    # [3K, 64]
    keypoints: Any       # [K] int32 vertex indices
    face_buf: Any        # [F, 3] int32 triangle vertex indices (0-based)
    ncc_code: Any        # [N, 3] per-vertex NCC color in [-1, 1] (SECC)
    n_vertices: int = field(pytree_node=False, default=0)
    n_faces: int = field(pytree_node=False, default=0)
    n_keypoints: int = field(pytree_node=False, default=0)


def _make_assets(mean_shape, id_base, exp_base, keypoints, face_buf, ncc_code) -> BFMAssets:
    n = mean_shape.size // 3
    # recenter the mean shape (reference bfm.py:76-79, recenter=True)
    ms = mean_shape.reshape(-1, 3)
    ms = ms - ms.mean(axis=0, keepdims=True)
    key_mean_shape = ms[keypoints]
    key_id_base = id_base.reshape(n, 3, -1)[keypoints].reshape(-1, id_base.shape[-1])
    key_exp_base = exp_base.reshape(n, 3, -1)[keypoints].reshape(-1, exp_base.shape[-1])
    return BFMAssets(
        mean_shape=jnp.asarray(ms.reshape(-1), jnp.float32),
        id_base=jnp.asarray(id_base, jnp.float32),
        exp_base=jnp.asarray(exp_base, jnp.float32),
        key_mean_shape=jnp.asarray(key_mean_shape, jnp.float32),
        key_id_base=jnp.asarray(key_id_base, jnp.float32),
        key_exp_base=jnp.asarray(key_exp_base, jnp.float32),
        keypoints=jnp.asarray(keypoints, jnp.int32),
        face_buf=jnp.asarray(face_buf, jnp.int32),
        ncc_code=jnp.asarray(ncc_code, jnp.float32),
        n_vertices=int(n),
        n_faces=int(face_buf.shape[0]),
        n_keypoints=int(np.asarray(keypoints).shape[0]),
    )


def load_bfm(bfm_dir: str, keypoint_mode: str = "lm68") -> BFMAssets:
    """Load BFM09 assets from ``BFM_model_front.mat`` (+ optional aux npys).

    ``keypoint_mode``: ``lm68`` uses the model's 68 landmark indices;
    ``mediapipe`` uses the 468-point mapping npy if present in ``bfm_dir``.
    """
    from scipy.io import loadmat

    model = loadmat(os.path.join(bfm_dir, "BFM_model_front.mat"))
    mean_shape = model["meanshape"].astype(np.float32).reshape(-1)
    id_base = model["idBase"].astype(np.float32)
    exp_base = model["exBase"].astype(np.float32)
    face_buf = model["tri"].astype(np.int64) - 1
    if keypoint_mode == "mediapipe":
        kp = np.load(os.path.join(bfm_dir, "index_mp468_from_mesh35709.npy")).astype(np.int64)
        kp[kp < 0] = 0
    else:
        kp = np.squeeze(model["keypoints"]).astype(np.int64) - 1
    ncc_path = os.path.join(bfm_dir, "ncc_code.npy")
    if os.path.isfile(ncc_path):
        ncc = np.load(ncc_path).astype(np.float32)
        if ncc.shape[0] == 3 and ncc.shape[-1] != 3:
            ncc = ncc.T
    else:
        ncc = _default_ncc_code(mean_shape)
    return _make_assets(mean_shape, id_base, exp_base, kp, face_buf, ncc)


def _default_ncc_code(mean_shape: np.ndarray) -> np.ndarray:
    """Normalized Coordinate Code: mean-shape xyz min-max normalized to [-1,1].

    This is the standard PNCC construction (Zhu et al., Face Alignment Across
    Large Poses); used when no precomputed ``ncc_code.npy`` is available.
    """
    v = mean_shape.reshape(-1, 3).astype(np.float64)
    lo, hi = v.min(axis=0), v.max(axis=0)
    return (2.0 * (v - lo) / (hi - lo) - 1.0).astype(np.float32)


def synthetic_bfm(
    n_vertices: int = 512,
    n_keypoints: int = 68,
    n_id: int = 80,
    n_exp: int = 64,
    seed: int = 0,
) -> BFMAssets:
    """A deterministic small stand-in morphable model for tests/benchmarks.

    Vertices form a lat-long grid sphere scaled to the face-box scale of
    BFM09 (~±1e0 model units before the 0.27 EG3D rescale) with a proper
    local triangulation — face sizes then match the real mesh's statistics
    (tiny, local triangles), which the rasterizer's size bucketing relies
    on. Bases are random but small so shapes stay plausible.
    """
    rng = np.random.RandomState(seed)
    rows = max(int(np.sqrt(n_vertices / 2)), 2)
    cols = max(n_vertices // rows, 2)
    n_grid = rows * cols
    theta = np.linspace(0.15, np.pi - 0.15, rows)          # polar
    phi = np.linspace(0, 2 * np.pi, cols, endpoint=False)  # azimuth
    tt, pp = np.meshgrid(theta, phi, indexing="ij")
    pts = np.stack(
        [np.sin(tt) * np.cos(pp), np.cos(tt), np.sin(tt) * np.sin(pp)], axis=-1
    ).reshape(-1, 3)
    # pad to exactly n_vertices with jittered copies (degenerate-free extras)
    if n_grid < n_vertices:
        extra = pts[: n_vertices - n_grid] * 0.999
        pts = np.concatenate([pts, extra], axis=0)
    pts = pts[:n_vertices]
    mean_shape = (pts * 0.9).astype(np.float32).reshape(-1)

    def vid(r, c):
        return r * cols + (c % cols)

    quads = [
        (vid(r, c), vid(r + 1, c), vid(r + 1, c + 1), vid(r, c + 1))
        for r in range(rows - 1)
        for c in range(cols)
    ]
    face_buf = np.array(
        [(a, b, c) for a, b, c, d in quads] + [(a, c, d) for a, b, c, d in quads],
        np.int64,
    )
    face_buf = face_buf[(face_buf < n_vertices).all(axis=1)]

    id_base = (rng.randn(3 * n_vertices, n_id) * 1e-3).astype(np.float32)
    exp_base = (rng.randn(3 * n_vertices, n_exp) * 1e-3).astype(np.float32)
    kp = rng.choice(n_vertices, size=n_keypoints, replace=False).astype(np.int64)
    ncc = _default_ncc_code(mean_shape)
    return _make_assets(mean_shape, id_base, exp_base, kp, face_buf, ncc)


def load_or_synthetic_bfm(bfm_dir: str | None, keypoint_mode: str = "lm68") -> BFMAssets:
    if bfm_dir and os.path.isfile(os.path.join(bfm_dir, "BFM_model_front.mat")):
        return load_bfm(bfm_dir, keypoint_mode=keypoint_mode)
    return synthetic_bfm(n_keypoints=468 if keypoint_mode == "mediapipe" else 68)


# ---------------------------------------------------------------------------
# pure morphable-model ops (all batched over a leading B axis)
# ---------------------------------------------------------------------------


def compute_shape(assets: BFMAssets, id_coeff: jnp.ndarray, exp_coeff: jnp.ndarray) -> jnp.ndarray:
    """[B,80],[B,64] -> [B,N,3] posed-neutral face shape in model space."""
    flat = (
        id_coeff @ assets.id_base.T
        + exp_coeff @ assets.exp_base.T
        + assets.mean_shape[None, :]
    )
    return flat.reshape(id_coeff.shape[0], -1, 3)


def compute_key_shape(assets: BFMAssets, id_coeff: jnp.ndarray, exp_coeff: jnp.ndarray) -> jnp.ndarray:
    """[B,80],[B,64] -> [B,K,3] landmark subset of the face shape."""
    flat = (
        id_coeff @ assets.key_id_base.T
        + exp_coeff @ assets.key_exp_base.T
        + assets.key_mean_shape.reshape(-1)[None, :]
    )
    return flat.reshape(id_coeff.shape[0], -1, 3)


def compute_rotation(euler: jnp.ndarray) -> jnp.ndarray:
    """[B,3] radians (pitch-x, yaw-y, roll-z) -> [B,3,3] with pts @ R semantics.

    Matches the reference convention exactly: R = (Rz @ Ry @ Rx)^T
    (`deep_3drecon/deep_3drecon_models/bfm.py:204`).
    """
    x, y, z = euler[:, 0], euler[:, 1], euler[:, 2]
    cx, sx = jnp.cos(x), jnp.sin(x)
    cy, sy = jnp.cos(y), jnp.sin(y)
    cz, sz = jnp.cos(z), jnp.sin(z)
    one = jnp.ones_like(cx)
    zero = jnp.zeros_like(cx)
    rot_x = jnp.stack(
        [one, zero, zero, zero, cx, -sx, zero, sx, cx], axis=-1
    ).reshape(-1, 3, 3)
    rot_y = jnp.stack(
        [cy, zero, sy, zero, one, zero, -sy, zero, cy], axis=-1
    ).reshape(-1, 3, 3)
    rot_z = jnp.stack(
        [cz, -sz, zero, sz, cz, zero, zero, zero, one], axis=-1
    ).reshape(-1, 3, 3)
    rot = rot_z @ rot_y @ rot_x
    return jnp.swapaxes(rot, -1, -2)


def transform(shape: jnp.ndarray, rot: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """[B,N,3] @ [B,3,3] + [B,3] -> world-space shape."""
    return shape @ rot + trans[:, None, :]


def to_camera(shape: jnp.ndarray, camera_distance: float = DEFAULT_CAMERA_DISTANCE) -> jnp.ndarray:
    """Flip depth axis into the camera frame: z -> d - z (`bfm.py:243`)."""
    return shape.at[..., 2].set(camera_distance - shape[..., 2])


def perspective_projection_matrix(
    focal: float = DEFAULT_FOCAL, center: float = DEFAULT_CENTER
) -> jnp.ndarray:
    """Row-vector projection matrix P with pts @ P semantics (`bfm.py:13`)."""
    return jnp.array(
        [[focal, 0, center], [0, focal, center], [0, 0, 1]], dtype=jnp.float32
    ).T


def to_image(
    shape_cam: jnp.ndarray,
    focal: float = DEFAULT_FOCAL,
    center: float = DEFAULT_CENTER,
) -> jnp.ndarray:
    """[B,N,3] camera-space -> [B,N,2] pixel coordinates (224-scale)."""
    proj = shape_cam @ perspective_projection_matrix(focal, center)
    return proj[..., :2] / proj[..., 2:]


def compute_face_vertex(
    assets: BFMAssets,
    id_coeff: jnp.ndarray,
    exp_coeff: jnp.ndarray,
    euler: jnp.ndarray,
    trans: jnp.ndarray,
    camera_distance: float = DEFAULT_CAMERA_DISTANCE,
) -> jnp.ndarray:
    """Full chain: coeffs -> camera-space vertices [B,N,3] (`bfm.py:332`)."""
    shape = compute_shape(assets, id_coeff, exp_coeff)
    rot = compute_rotation(euler)
    shape = transform(shape, rot, trans)
    return to_camera(shape, camera_distance)


def compute_landmarks_2d(
    assets: BFMAssets,
    id_coeff: jnp.ndarray,
    exp_coeff: jnp.ndarray,
    euler: jnp.ndarray,
    trans: jnp.ndarray,
) -> jnp.ndarray:
    """coeffs -> [B,K,2] landmark pixel coordinates in the 224 fit frame."""
    key = compute_key_shape(assets, id_coeff, exp_coeff)
    rot = compute_rotation(euler)
    key = to_camera(transform(key, rot, trans))
    return to_image(key)
