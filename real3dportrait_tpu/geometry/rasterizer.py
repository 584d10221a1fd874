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
import numpy as np

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
    ),
)
def rasterize_sorted(
    verts_cam: jnp.ndarray,   # [B,N,3]
    faces: jnp.ndarray,       # [F,3] int32
    attributes: jnp.ndarray,  # [N,C] or [B,N,C]
    focal: float = 1015.0,
    center: float = 112.0,
    image_size: int = 512,
    patch_size: int = 16,
    znear: float = 5.0,
    zfar: float = 15.0,
) -> dict:
    """Scatter-free z-buffering: sort candidates by packed (pixel, depth)
    key, then per-pixel winners come from a searchsorted gather.

    On TPU the drop-mode scatters of the two-pass variant dominate (~35ns
    per candidate measured on v5e); a single `lax.sort` of the packed keys
    plus gathers is ~20x faster at identical output. Depth is quantized
    into the key's low bits (<=1.2mm at 512² over the [5,15] frustum) —
    ties pick an arbitrary equal-depth winner, same as scatter order.
    """
    b, n, _ = verts_cam.shape
    f = faces.shape[0]
    hw = image_size * image_size
    if attributes.ndim == 2:
        attributes = jnp.broadcast_to(attributes[None], (b, n, attributes.shape[-1]))
    c = attributes.shape[-1]

    pix_bits = max(int(np.ceil(np.log2(hw + 1))), 1)
    depth_bits = 31 - pix_bits
    assert depth_bits >= 10, f"image too large for int32 keys ({image_size})"
    depth_scale = (2**depth_bits - 1) / (zfar - znear)

    uv, z = project_to_screen(verts_cam, focal, center, image_size)

    def one_batch(uv_b, z_b, attr_b):
        fuv = uv_b[faces]
        fz = z_b[faces]
        idx, depth, bary, valid = _rasterize_chunk(
            fuv, fz, patch_size, image_size, znear, zfar
        )
        flat_idx = idx.reshape(-1)
        depth_q = jnp.clip(
            ((depth.reshape(-1) - znear) * depth_scale), 0, 2**depth_bits - 1
        ).astype(jnp.int32)
        key = flat_idx * (2**depth_bits) + depth_q
        key = jnp.where(valid.reshape(-1), key, jnp.int32(2**31 - 1))
        cand_id = jnp.arange(key.shape[0], dtype=jnp.int32)
        sorted_key, sorted_cand = jax.lax.sort((key, cand_id), num_keys=1)
        sorted_pix = sorted_key // (2**depth_bits)

        # first candidate of each pixel run == min-depth winner; run starts
        # have UNIQUE pixel indices, so one parallel-safe scatter builds the
        # winner map (no searchsorted, no duplicate-index serialization)
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_pix[1:] != sorted_pix[:-1]]
        )
        target = jnp.where(is_first & (sorted_pix < hw), sorted_pix, hw)
        win_map = jnp.full((hw,), -1, jnp.int32).at[target].set(
            sorted_cand, mode="drop", unique_indices=True
        )
        covered = win_map >= 0
        win_cand = jnp.maximum(win_map, 0)

        win_face = win_cand // (patch_size * patch_size)
        win_bary = bary.reshape(-1, 3)[win_cand]
        win_depth = depth.reshape(-1)[win_cand]
        fattr = attr_b[faces[win_face]]             # [HW, 3, C]
        pix_attr = jnp.einsum("pv,pvc->pc", win_bary, fattr)

        m = covered.astype(jnp.float32)
        return (
            m.reshape(image_size, image_size),
            (win_depth * m).reshape(image_size, image_size),
            (pix_attr * m[:, None]).reshape(image_size, image_size, c),
        )

    masks, depths, images = jax.vmap(one_batch)(uv, z, attributes)
    return {"mask": masks, "depth": depths, "image": images}


def _candidate_keys_lane_major(
    face_uvz: jnp.ndarray,  # [F,3,3] (u, v, z) per vertex
    k: int,
    image_size: int,
    znear: float,
    zfar: float,
    depth_bits: int,
    depth_scale: float,
) -> jnp.ndarray:
    """Packed (pixel, depth) int32 keys for every candidate, [K*K*F].

    Lane-major layout: all per-candidate math runs on [K², F] arrays so the
    large face axis sits on the 128-lane dimension (the [F,K,K] layout of
    :func:`_rasterize_chunk` uses K=2..16 of 128 lanes — up to 64x wasted
    VPU/HBM width, measured as the second-largest raster phase). Only the
    keys are materialized; winners re-derive barycentrics/depth later from
    (face, pixel), which is cheaper than gathering 1.2M-row side tables.
    """
    face_uv = face_uvz[..., :2]
    face_z = face_uvz[..., 2]
    v0, v1, v2 = face_uv[:, 0], face_uv[:, 1], face_uv[:, 2]
    bb_min = jnp.floor(jnp.min(face_uv, axis=1))  # [F,2]
    offs = jnp.arange(k, dtype=jnp.float32)
    dy, dx = jnp.meshgrid(offs, offs, indexing="ij")
    dx = dx.reshape(-1, 1)  # [K²,1]
    dy = dy.reshape(-1, 1)
    px = bb_min[None, :, 0] + dx + 0.5  # [K²,F]
    py = bb_min[None, :, 1] + dy + 0.5

    def edge(ax, ay, bx, by, cx, cy):
        return (cx - ax) * (by - ay) - (cy - ay) * (bx - ax)

    area = edge(v0[:, 0], v0[:, 1], v1[:, 0], v1[:, 1],
                v2[:, 0], v2[:, 1])[None]  # [1,F]
    w0 = edge(v1[None, :, 0], v1[None, :, 1], v2[None, :, 0], v2[None, :, 1],
              px, py)
    w1 = edge(v2[None, :, 0], v2[None, :, 1], v0[None, :, 0], v0[None, :, 1],
              px, py)
    w2 = edge(v0[None, :, 0], v0[None, :, 1], v1[None, :, 0], v1[None, :, 1],
              px, py)
    area_safe = jnp.where(jnp.abs(area) < 1e-9, 1.0, area)
    b0, b1, b2 = w0 / area_safe, w1 / area_safe, w2 / area_safe
    inside = (b0 >= 0) & (b1 >= 0) & (b2 >= 0) & (jnp.abs(area) > 1e-9)

    depth = (b0 * face_z[None, :, 0] + b1 * face_z[None, :, 1]
             + b2 * face_z[None, :, 2])
    in_bounds = (px >= 0) & (px < image_size) & (py >= 0) & (py < image_size)
    valid = inside & in_bounds & (depth > znear) & (depth < zfar)

    xi = jnp.clip(px.astype(jnp.int32), 0, image_size - 1)
    yi = jnp.clip(py.astype(jnp.int32), 0, image_size - 1)
    dq = jnp.clip((depth - znear) * depth_scale, 0,
                  2**depth_bits - 1).astype(jnp.int32)
    key = (yi * image_size + xi) * (2**depth_bits) + dq
    return jnp.where(valid, key, jnp.int32(2**31 - 1)).reshape(-1)


def rasterize_grouped(
    verts_cam: jnp.ndarray,
    face_groups: tuple,        # ((faces [Fi,3] int32, patch_size_i), ...)
    attributes: jnp.ndarray,
    focal: float = 1015.0,
    center: float = 112.0,
    image_size: int = 512,
    znear: float = 5.0,
    zfar: float = 15.0,
) -> dict:
    """Sorted z-buffer with per-group patch sizes.

    Candidate count is the rasterizer's whole cost on TPU; a fixed-topology
    mesh lets us bucket faces ONCE by a projected-size bound (static
    groups), giving small faces a small K and only the rare large faces a
    big one — ~10x fewer candidates than a uniform worst-case K.

    Winner selection is scatter-free at candidate scale: sort packed
    (pixel, depth) keys, flag per-pixel run starts, then a SECOND sort
    compacts the ≤HW winners to the front so the final scatter writes HW
    elements instead of one per candidate (the 1.2M-update drop-scatter was
    the largest raster phase at ~12 ms/frame on v5e; the compaction sort
    costs ~2 ms). Winner barycentrics/depth are recomputed from (face,
    pixel) instead of gathered from candidate-sized side tables.
    """
    b = verts_cam.shape[0]
    hw = image_size * image_size
    if attributes.ndim == 2:
        attributes = jnp.broadcast_to(
            attributes[None], (b,) + attributes.shape
        )
    c = attributes.shape[-1]
    pix_bits = max(int(np.ceil(np.log2(hw + 1))), 1)
    depth_bits = 31 - pix_bits
    depth_scale = (2**depth_bits - 1) / (zfar - znear)

    uv, z = project_to_screen(verts_cam, focal, center, image_size)

    # static candidate->face map across all groups (cell-major per group:
    # candidate id = cell * F_i + face, matching the [K²,F] key layout)
    cand_face_np = np.concatenate([
        np.tile(np.arange(f.shape[0]), k * k) + off
        for (f, k), off in zip(
            face_groups,
            np.cumsum([0] + [f.shape[0] for f, _ in face_groups[:-1]]),
        )
    ])
    all_faces = jnp.concatenate([f for f, _ in face_groups], axis=0)
    cand_face = jnp.asarray(cand_face_np, jnp.int32)

    pix_y = (jnp.arange(hw, dtype=jnp.int32) // image_size
             ).astype(jnp.float32) + 0.5
    pix_x = (jnp.arange(hw, dtype=jnp.int32) % image_size
             ).astype(jnp.float32) + 0.5

    group_offsets = np.cumsum([0] + [f.shape[0] for f, _ in face_groups])

    def one_batch(uv_b, z_b, attr_b):
        # one packed per-face table [F,3,3+C] gathered ONCE per frame; the
        # key phase slices it per group and the winner phase gathers whole
        # rows — 340k gather rows/frame vs 860k with per-phase gathers
        vert_full = jnp.concatenate(
            [uv_b, z_b[..., None], attr_b], axis=-1
        )                                           # [N, 3+C]
        ftab = vert_full[all_faces]                 # [F, 3, 3+C]
        keys = [
            _candidate_keys_lane_major(
                ftab[group_offsets[i]:group_offsets[i + 1], :, :3],
                k, image_size, znear, zfar, depth_bits, depth_scale,
            )
            for i, (_, k) in enumerate(face_groups)
        ]
        key = jnp.concatenate(keys)

        cand_id = jnp.arange(key.shape[0], dtype=jnp.int32)
        sorted_key, sorted_cand = jax.lax.sort((key, cand_id), num_keys=1)
        sorted_pix = sorted_key >> depth_bits
        is_first = jnp.concatenate(
            [jnp.ones((1,), bool), sorted_pix[1:] != sorted_pix[:-1]]
        )
        # compaction sort: winners (one per covered pixel) move to the
        # front ordered by pixel id; everything else keys to the hw sentinel
        key2 = jnp.where(is_first & (sorted_pix < hw), sorted_pix,
                         jnp.int32(hw))
        win_pix_s, win_cand_s = jax.lax.sort((key2, sorted_cand), num_keys=1)
        win_map = jnp.full((hw,), -1, jnp.int32).at[win_pix_s[:hw]].set(
            win_cand_s[:hw], mode="drop", unique_indices=True
        )
        covered = win_map >= 0
        wc = jnp.maximum(win_map, 0)

        # re-derive the winner's barycentrics at its own pixel center
        wrow = ftab[cand_face[wc]]                  # [HW,3,3+C]
        wuv = wrow[..., :2]                         # [HW,3,2]
        wz = wrow[..., 2]                           # [HW,3]
        v0, v1, v2 = wuv[:, 0], wuv[:, 1], wuv[:, 2]

        def edge(a, bq, px, py):
            return ((px - a[:, 0]) * (bq[:, 1] - a[:, 1])
                    - (py - a[:, 1]) * (bq[:, 0] - a[:, 0]))

        area = edge(v0, v1, v2[:, 0], v2[:, 1])
        area_safe = jnp.where(jnp.abs(area) < 1e-9, 1.0, area)
        b0 = edge(v1, v2, pix_x, pix_y) / area_safe
        b1 = edge(v2, v0, pix_x, pix_y) / area_safe
        b2 = edge(v0, v1, pix_x, pix_y) / area_safe
        win_depth = b0 * wz[:, 0] + b1 * wz[:, 1] + b2 * wz[:, 2]
        win_bary = jnp.stack([b0, b1, b2], axis=-1)

        fattr = wrow[..., 3:]                       # [HW,3,C]
        pix_attr = jnp.einsum("pv,pvc->pc", win_bary, fattr)
        m = covered.astype(jnp.float32)
        return (
            m.reshape(image_size, image_size),
            (win_depth * m).reshape(image_size, image_size),
            (pix_attr * m[:, None]).reshape(image_size, image_size, c),
        )

    masks, depths_img, images = jax.vmap(one_batch)(uv, z, attributes)
    return {"mask": masks, "depth": depths_img, "image": images}


def split_faces_by_px_bound(
    faces: np.ndarray,             # [F,3]
    px_bound: np.ndarray,          # [F] per-face projected-extent bound (px)
    buckets: tuple[int, ...] = (2, 3, 4, 6, 8, 16),
) -> tuple:
    """Bucket faces once by a per-face projected-size bound (static topology
    => static groups): each face goes to the smallest patch size covering
    its bound. Candidate count is the rasterizer's whole cost on TPU, so the
    caller should compute the TIGHTEST sound bound it can."""
    faces = np.asarray(faces)
    groups = []
    prev = 0.0
    for i, k in enumerate(buckets):
        hi = k if i < len(buckets) - 1 else np.inf
        sel = (px_bound > prev) & (px_bound <= hi)
        if sel.any():
            groups.append((jnp.asarray(faces[sel], jnp.int32), k))
        prev = k
    return tuple(groups)


def split_faces_by_size(
    verts_canonical: np.ndarray,   # [N,3] model-space canonical vertices
    faces: np.ndarray,             # [F,3]
    focal: float,
    center: float,
    image_size: int,
    zmin: float = 8.0,
    buckets: tuple[int, ...] = (2, 4, 8, 16),
    margin_px: float = 1.0,
) -> tuple:
    """Conservative global-zmin bucketing: each face's bound assumes the
    worst-case depth ``zmin`` (sound for bounded trans/rotation). Use
    :func:`split_faces_by_px_bound` with a per-face bound when the pose is
    known (the SECC zero-pose contract) — it emits far fewer candidates."""
    faces = np.asarray(faces)
    v = np.asarray(verts_canonical)[faces]              # [F,3,3]
    extent = (v.max(axis=1) - v.min(axis=1))[..., :2].max(-1)  # max xy extent
    px_bound = extent * focal / zmin * (image_size / (2 * center)) + margin_px
    return split_faces_by_px_bound(faces, px_bound, buckets)


def rasterize(*args, method: str = "sort", **kwargs):
    """Z-buffered rasterization; dispatches to the sort-based kernel
    (TPU-fast, default) or the two-pass scatter variant.

    Returns dict: ``mask`` [B,H,W] float (1 = covered), ``depth`` [B,H,W]
    (0 outside), ``image`` [B,H,W,C] interpolated attributes (0 outside).
    """
    if method == "sort":
        kwargs.pop("face_chunk", None)
        return rasterize_sorted(*args, **kwargs)
    return rasterize_scatter(*args, **kwargs)


@partial(
    jax.jit,
    static_argnames=(
        "focal", "center", "image_size", "patch_size", "znear", "zfar",
        "face_chunk",
    ),
)
def rasterize_scatter(
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
    """Two-pass scatter z-buffer (reference implementation for the sort
    variant; kept for cross-checking and platforms with fast scatter)."""
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
