"""Fixed-topology triangle rasterizer as XLA scatter ops.

TPU-native replacement for the pytorch3d ``MeshRasterizer`` dependency
(`deep_3drecon/util/mesh_renderer.py:35`). The BFM mesh has static topology
(~70k faces) and SECC rendering never needs gradients (the reference renders
SECC under no_grad even in training — `tasks/os_avatar/secc_img2plane_task.py
:175-178`), so a forward-only z-buffer design suffices (SURVEY.md §7).

Algorithm (O(F·K²), fully vectorized — no per-pixel loops):

1. project vertices to screen space;
2. every face emits a static K x K candidate-pixel patch anchored at its
   bbox corner; per candidate compute screen-space (affine) barycentrics,
   coverage, and interpolated depth — matching pytorch3d's default
   ``perspective_correct=False``;
3. pass 1: scatter-min candidate depths into the z-buffer;
4. pass 2: candidates whose depth equals the z-buffer win; scatter their
   interpolated vertex attributes (ties share identical depth, so any
   winner is correct).

Faces are processed in chunks under ``lax.map`` to bound memory; the
camera follows the reference SECC convention: u = c + f·x/z, v = c − f·y/z
(pytorch3d FoV camera composed with the wrapper's x-flip,
`mesh_renderer.py:70`).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_BIG = jnp.float32(1e9)


def project_to_screen(
    verts_cam: jnp.ndarray,
    focal: float,
    center: float,
    image_size: int,
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B,N,3] camera-space verts -> ([B,N,2] pixel uv, [B,N] depth).

    Pixel scale maps the 2*center fit frame onto image_size.
    """
    scale = image_size / (2.0 * center)
    x, y, z = verts_cam[..., 0], verts_cam[..., 1], verts_cam[..., 2]
    u = (center + focal * x / z) * scale
    v = (center - focal * y / z) * scale
    return jnp.stack([u, v], axis=-1), z


def _rasterize_chunk(
    face_verts_uv: jnp.ndarray,  # [F,3,2]
    face_verts_z: jnp.ndarray,   # [F,3]
    patch_size: int,
    image_size: int,
    znear: float,
    zfar: float,
):
    """Per-face candidate pixels: returns (flat_idx [F,K,K], depth, bary [F,K,K,3], valid)."""
    f = face_verts_uv.shape[0]
    k = patch_size
    v0, v1, v2 = face_verts_uv[:, 0], face_verts_uv[:, 1], face_verts_uv[:, 2]

    bb_min = jnp.floor(jnp.min(face_verts_uv, axis=1))  # [F,2]
    offs = jnp.arange(k, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    px = bb_min[:, None, None, 0] + dx[None] + 0.5
    py = bb_min[:, None, None, 1] + dy[None] + 0.5

    # signed-area barycentrics in screen space
    def edge(ax, ay, bx, by, cx, cy):
        return (cx - ax) * (by - ay) - (cy - ay) * (bx - ax)

    area = edge(v0[:, 0], v0[:, 1], v1[:, 0], v1[:, 1], v2[:, 0], v2[:, 1])
    area = area[:, None, None]
    w0 = edge(v1[:, 0, None, None], v1[:, 1, None, None],
              v2[:, 0, None, None], v2[:, 1, None, None], px, py)
    w1 = edge(v2[:, 0, None, None], v2[:, 1, None, None],
              v0[:, 0, None, None], v0[:, 1, None, None], px, py)
    w2 = edge(v0[:, 0, None, None], v0[:, 1, None, None],
              v1[:, 0, None, None], v1[:, 1, None, None], px, py)
    area_safe = jnp.where(jnp.abs(area) < 1e-9, 1.0, area)
    b0, b1, b2 = w0 / area_safe, w1 / area_safe, w2 / area_safe
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (jnp.abs(area) > 1e-9)

    depth = (
        b0 * face_verts_z[:, 0, None, None]
        + b1 * face_verts_z[:, 1, None, None]
        + b2 * face_verts_z[:, 2, None, None]
    )
    in_bounds = (px >= 0) & (px < image_size) & (py >= 0) & (py < image_size)
    valid = inside & in_bounds & (depth > znear) & (depth < zfar)

    xi = jnp.clip(px.astype(jnp.int32), 0, image_size - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, image_size - 1)
    flat_idx = jnp.where(valid, yi * image_size + xi, image_size * image_size)
    bary = jnp.stack([b0, b1, b2], axis=-1)
    return flat_idx, depth, bary, valid


@partial(
    jax.jit,
    static_argnames=(
        "focal", "center", "image_size", "patch_size", "znear", "zfar",
        "face_chunk",
    ),
)
def rasterize(
    verts_cam: jnp.ndarray,   # [B,N,3]
    faces: jnp.ndarray,       # [F,3] int32
    attributes: jnp.ndarray,  # [N,C] or [B,N,C] per-vertex attributes
    focal: float = 1015.0,
    center: float = 112.0,
    image_size: int = 512,
    patch_size: int = 16,
    znear: float = 5.0,
    zfar: float = 15.0,
    face_chunk: int = 8192,
) -> dict:
    """Z-buffered rasterization.

    Returns dict: ``mask`` [B,H,W] float (1 = covered), ``depth`` [B,H,W]
    (0 outside), ``image`` [B,H,W,C] interpolated attributes (0 outside).
    """
    b, n, _ = verts_cam.shape
    f = faces.shape[0]
    hw = image_size * image_size
    if attributes.ndim == 2:
        attributes = jnp.broadcast_to(attributes[None], (b, n, attributes.shape[-1]))
    c = attributes.shape[-1]

    # pad faces to a multiple of the chunk size with degenerate faces
    pad = (-f) % face_chunk
    faces_p = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    n_chunks = faces_p.shape[0] // face_chunk
    face_chunks = faces_p.reshape(n_chunks, face_chunk, 3)
    # degenerate pad faces (all-zero vertex index) have zero area -> dropped

    uv, z = project_to_screen(verts_cam, focal, center, image_size)

    def one_batch(uv_b, z_b, attr_b):
        def chunk_candidates(chunk_faces):
            fuv = uv_b[chunk_faces]          # [f,3,2]
            fz = z_b[chunk_faces]            # [f,3]
            return _rasterize_chunk(fuv, fz, patch_size, image_size, znear, zfar)

        # pass 1: z-buffer min
        def zbuf_step(zbuf, chunk_faces):
            idx, depth, _, valid = chunk_candidates(chunk_faces)
            d = jnp.where(valid, depth, _BIG).reshape(-1)
            zbuf = zbuf.at[idx.reshape(-1)].min(d, mode="drop")
            return zbuf, None

        zbuf, _ = jax.lax.scan(zbuf_step, jnp.full((hw,), _BIG), face_chunks)

        # pass 2: winners write attributes
        def attr_step(carry, chunk_faces):
            img, dep = carry
            idx, depth, bary, valid = chunk_candidates(chunk_faces)
            fattr = attr_b[chunk_faces]      # [f,3,C]
            pix_attr = jnp.einsum("fklv,fvc->fklc", bary, fattr)
            win = valid & (depth <= zbuf[idx] + 1e-6)
            flat = jnp.where(win, idx, hw).reshape(-1)
            img = img.at[flat].set(pix_attr.reshape(-1, c), mode="drop")
            dep = dep.at[flat].set(depth.reshape(-1), mode="drop")
            return (img, dep), None

        (img, dep), _ = jax.lax.scan(
            attr_step, (jnp.zeros((hw, c)), jnp.zeros((hw,))), face_chunks
        )
        mask = (zbuf < _BIG).astype(jnp.float32)
        return (
            mask.reshape(image_size, image_size),
            (dep * mask).reshape(image_size, image_size),
            (img * mask[:, None]).reshape(image_size, image_size, c),
        )

    masks, depths, images = jax.vmap(one_batch)(uv, z, attributes)
    return {"mask": masks, "depth": depths, "image": images}
