"""Two-pass importance-sampled tri-plane/tri-grid volume renderer.

TPU-first functional redesign of the EG3D `ImportanceRenderer`
(`modules/eg3ds/volumetric_rendering/renderer.py:107`):

* everything is a pure function of (planes, decoder params, rays, options,
  PRNG key) — no module state, fully jit/vmap/shard_map friendly;
* plane projections are static index permutations instead of 3x3 matrix
  inverses (the reference's `generate_planes`/`project_onto_planes` pair
  resolves to exactly these permutations);
* the ray axis is the natural sharding axis: all ops are elementwise over
  rays except the final reshape, so a `shard_map` over rays needs no
  collectives until image assembly (SURVEY.md §5 "written ray-sharded").

Plane layout is channels-last: triplane ``[B, 3, H, W, C]``; trigrid
``[B, 3, D, H, W, C]``.  Sample coordinates are world xyz in the
``box_warp``-scaled unit box.
"""

from __future__ import annotations

from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp

from real3dportrait_tpu.ops.grid_sample import (
    grid_sample_2d,
    grid_sample_2d_prepacked,
    grid_sample_2d_prepacked_corners,
    grid_sample_3d_packed,
    grid_sample_3d_prepacked4,
    grid_sample_3d_prepacked4_corners,
    pack_xy_cells,
)
from real3dportrait_tpu.rendering import math_utils
from real3dportrait_tpu.rendering.ray_marcher import march_rays, march_weights

# Static projections of world xyz onto the three planes, equal to the
# reference's coordinates @ inv(plane_axes) (renderer.py:30-63):
# plane 0 -> (x, y | z), plane 1 -> (x, z | y), plane 2 -> (z, x | y).
_PLANE_PERMS = ((0, 1, 2), (0, 2, 1), (2, 0, 1))


class RenderOptions(NamedTuple):
    """Static rendering options (hashable, safe as a jit static arg)."""

    depth_resolution: int = 48
    depth_resolution_importance: int = 48
    box_warp: float = 1.0
    ray_start: float | str = "auto"
    ray_end: float | str = "auto"
    white_back: bool = False
    disparity_space_sampling: bool = False
    density_noise: float = 0.0

    @classmethod
    def from_config(cls, cfg) -> "RenderOptions":
        return cls(
            depth_resolution=cfg.get("num_samples_coarse", 48),
            depth_resolution_importance=cfg.get("num_samples_fine", 48),
            box_warp=float(cfg.get("box_warp", 1.0)),
            ray_start=cfg.get("ray_near", "auto"),
            ray_end=cfg.get("ray_far", "auto"),
            white_back=bool(cfg.get("white_back", False)),
        )


def sample_from_planes(
    planes: jnp.ndarray, coordinates: jnp.ndarray, box_warp: float
) -> jnp.ndarray:
    """planes [B,3,H,W,C], coords [B,M,3] -> features [B,3,M,C]."""
    coords = (2.0 / box_warp) * coordinates
    outs = []
    for k, perm in enumerate(_PLANE_PERMS):
        uv = coords[..., jnp.array(perm[:2])]
        outs.append(grid_sample_2d(planes[:, k], uv))
    return jnp.stack(outs, axis=1)


def sample_from_trigrids(
    planes: jnp.ndarray, coordinates: jnp.ndarray, box_warp: float
) -> jnp.ndarray:
    """planes [B,3,D,H,W,C], coords [B,M,3] -> features [B,3,M,C].

    The tri-grid extends each plane with a shallow depth axis
    (`renderer.py:78`, triplane_depth D); the third projected coordinate
    indexes that axis trilinearly.
    """
    coords = (2.0 / box_warp) * coordinates
    outs = []
    for k, perm in enumerate(_PLANE_PERMS):
        xyz = coords[..., jnp.array(perm)]
        # packed variant: full-lane gather rows (4*C = one vector register
        # at C=32 bf16) instead of 8 narrow C-row gathers. Empirically the
        # fastest variant IN CONTEXT on v5e (an 8-corner 8*C pack wins in
        # isolation but regresses the full frame graph by ~40 ms).
        outs.append(grid_sample_3d_packed(planes[:, k], xyz))
    return jnp.stack(outs, axis=1)


def sample_features(
    planes: jnp.ndarray, coordinates: jnp.ndarray, box_warp: float
) -> jnp.ndarray:
    """Dispatch on plane rank: [B,3,H,W,C] triplane or [B,3,D,H,W,C] trigrid."""
    if planes.ndim == 5:
        return sample_from_planes(planes, coordinates, box_warp)
    if planes.ndim == 6:
        return sample_from_trigrids(planes, coordinates, box_warp)
    raise ValueError(f"planes must be rank 5 or 6, got {planes.ndim}")


def make_packed_sampler(planes: jnp.ndarray, box_warp: float):
    """Prepack the 2x2 xy cells of all three planes ONCE and return a
    ``coords [B,M,3] -> features [B,3,M,C]`` sampler.

    Used by :func:`render_rays`, where the coarse and fine passes sample
    ~1.5M points each from the same per-frame planes: sharing one pack
    across both passes halves the pack traffic, and wide-row gathers are
    the fast path on the transaction-bound TPU gather unit. Exactly
    equivalent to :func:`sample_features` (both delegate to the same
    packed sampling semantics, tested against the unpacked torch oracle).
    """
    small = planes.shape[-3] < 2 or planes.shape[-2] < 2
    if planes.ndim == 5 and not small:
        b, k, h, w, c = planes.shape
        packs = [pack_xy_cells(planes[:, i]) for i in range(k)]

        def sample2d(coordinates):
            coords = (2.0 / box_warp) * coordinates
            outs = []
            for i, perm in enumerate(_PLANE_PERMS):
                uv = coords[..., jnp.array(perm[:2])]
                outs.append(grid_sample_2d_prepacked(packs[i], (h, w, c), uv))
            return jnp.stack(outs, axis=1)

        return sample2d
    if planes.ndim == 6 and not small:
        b, k, d, h, w, c = planes.shape
        packs = [pack_xy_cells(planes[:, i]) for i in range(k)]

        def sample3d(coordinates):
            coords = (2.0 / box_warp) * coordinates
            outs = []
            for i, perm in enumerate(_PLANE_PERMS):
                xyz = coords[..., jnp.array(perm)]
                outs.append(
                    grid_sample_3d_prepacked4(packs[i], (d, h, w, c), xyz)
                )
            return jnp.stack(outs, axis=1)

        return sample3d
    return lambda coordinates: sample_features(planes, coordinates, box_warp)


def make_corner_sampler(planes: jnp.ndarray, box_warp: float):
    """Prepack the planes ONCE and return a ``coords [B,M,3] ->
    (rows_list, weights_list)`` sampler that SKIPS the per-corner weighted
    reduce, or ``None`` when the plane shape has no packed fast path.

    Each list entry is one gather's ``rows [B,M,4C]`` with ``weights
    [B,M,4]``; the weights already carry the 1/n_planes plane-mean factor, so
    a corner-aware decoder (``OSGDecoder`` on a tuple input) reconstructs
    ``net0(mean_k(sample_k))`` exactly as ``sum_i (rows_i * repeat(w_i, C))
    @ W0 + b0`` — one MXU matmul per gather, consuming the gather output in
    whatever layout it landed in. This removes the row->sample-major layout
    copies + multiply-reduces between sampler and decoder that the XLA trace
    priced at ~2 ms/frame (BASELINE.md round 5)."""
    small = planes.shape[-3] < 2 or planes.shape[-2] < 2
    if small or planes.ndim not in (5, 6):
        return None
    if planes.ndim == 5:
        b, k, h, w, c = planes.shape
        dims3 = None
    else:
        b, k, d, h, w, c = planes.shape
        dims3 = (d, h, w, c)
    packs = [pack_xy_cells(planes[:, i]) for i in range(k)]
    inv_k = 1.0 / k

    def sample_corners(coordinates):
        coords = (2.0 / box_warp) * coordinates
        rows_list, wts_list = [], []
        for i, perm in enumerate(_PLANE_PERMS):
            if dims3 is None:
                uv = coords[..., jnp.array(perm[:2])]
                pairs = grid_sample_2d_prepacked_corners(
                    packs[i], (h, w, c), uv)
            else:
                xyz = coords[..., jnp.array(perm)]
                pairs = grid_sample_3d_prepacked4_corners(
                    packs[i], dims3, xyz)
            for rows, wts in pairs:
                rows_list.append(rows)
                wts_list.append(wts * inv_k)
        return rows_list, wts_list

    return sample_corners


def run_model(
    planes: jnp.ndarray,
    decoder: Callable[[jnp.ndarray, jnp.ndarray], dict],
    coordinates: jnp.ndarray,
    directions: jnp.ndarray,
    options: RenderOptions,
    key: jax.Array | None = None,
) -> dict:
    """Sample plane features at coords and decode to {'rgb','sigma'}."""
    feats = sample_features(planes, coordinates, options.box_warp)
    out = decoder(feats, directions)
    if options.density_noise > 0 and key is not None:
        out = dict(out)
        out["sigma"] = out["sigma"] + (
            jax.random.normal(key, out["sigma"].shape, out["sigma"].dtype)
            * options.density_noise
        )
    return out


def _stratified_depths(
    ray_start: jnp.ndarray,
    ray_end: jnp.ndarray,
    n: int,
    key: jax.Array | None,
) -> jnp.ndarray:
    """[B,M,1] bounds -> [B,M,n,1] jittered (or midpoint) depths."""
    depths = math_utils.broadcast_linspace(ray_start, ray_end, n)  # [n,B,M,1]
    depths = jnp.moveaxis(depths, 0, 2)  # [B,M,n,1]
    delta = ((ray_end - ray_start) / (n - 1))[:, :, None, :]
    if key is None:
        jitter = 0.5
    else:
        jitter = jax.random.uniform(key, depths.shape, depths.dtype)
    return depths + jitter * delta


def _smooth_weights(weights: jnp.ndarray) -> jnp.ndarray:
    """max-pool(2, pad 1) then avg-pool(2) along samples (`renderer.py:241-245`)."""
    w = weights[..., 0]  # [B,M,S]
    padded = jnp.pad(w, ((0, 0), (0, 0), (1, 1)), constant_values=-jnp.inf)
    mx = jnp.maximum(padded[..., :-1], padded[..., 1:])  # [B,M,S+1]
    avg = (mx[..., :-1] + mx[..., 1:]) / 2.0  # [B,M,S]
    return avg + 0.01


def _sample_pdf(
    bins: jnp.ndarray, weights: jnp.ndarray, n_importance: int, key: jax.Array | None,
    eps: float = 1e-5,
) -> jnp.ndarray:
    """Inverse-CDF sampling (`renderer.py:254`). bins [R,S-1], weights [R,S-3]."""
    r, s = weights.shape
    weights = weights + eps
    pdf = weights / jnp.sum(weights, axis=-1, keepdims=True)
    cdf = jnp.cumsum(pdf, axis=-1)
    cdf = jnp.concatenate([jnp.zeros_like(cdf[:, :1]), cdf], axis=-1)  # [R,S-2]

    if key is None:
        u = jnp.broadcast_to(jnp.linspace(0.0, 1.0, n_importance), (r, n_importance))
    else:
        # sorted u: the sample SET is distributionally identical (order
        # statistics), and monotone inverse-CDF then yields sorted depths,
        # letting the coarse+fine merge skip the per-ray argsort
        u = jnp.sort(jax.random.uniform(key, (r, n_importance)), axis=-1)

    # searchsorted(side='right') as a comparison count, and the index
    # lookups as one-hot einsums: per-element gathers along the sample axis
    # lower to scalar gathers on TPU, while broadcasted compares + small
    # matmuls are VPU/MXU work (the same trick as _merge_sorted_samples).
    inds = jnp.sum(
        (cdf[:, None, :] <= u[:, :, None]).astype(jnp.int32), axis=-1
    )  # [R, n]
    below = jnp.clip(inds - 1, 0, None)  # j in [0, s]

    # ONE one-hot select for all four lookups: with above = min(j+1, s) and
    # bins indices clipped to the table, every quantity is a function of j
    # alone, so a single [R,n,s+2] one-hot einsum against a 4-channel payload
    # replaces four independent one-hot materializations (4x less one-hot
    # HBM traffic; values are bit-identical to the separate selects).
    nb = bins.shape[-1]
    assert nb == s + 2, f"bins/weights shape contract broken: {nb} != {s}+2"
    cdf_b_tab = jnp.concatenate([cdf, cdf[:, -1:]], axis=-1)        # cdf[min(t,s)]
    cdf_a_tab = jnp.concatenate([cdf[:, 1:], cdf[:, -1:], cdf[:, -1:]],
                                axis=-1)                            # cdf[min(t+1,s)]
    bins_b_tab = bins                                               # bins[t]
    bins_a_tab = jnp.concatenate([bins[:, 1 : s + 1], bins[:, s : s + 1],
                                  bins[:, s : s + 1]], axis=-1)     # bins[min(t+1,s)]
    payload = jnp.stack([cdf_b_tab, cdf_a_tab, bins_b_tab, bins_a_tab],
                        axis=-1).astype(jnp.float32)                # [R, s+2, 4]
    oh = jax.nn.one_hot(below, nb, dtype=jnp.float32)               # [R, n, s+2]
    sel = jnp.einsum("rns,rsc->rnc", oh, payload)
    cdf_b, cdf_a, bins_b, bins_a = (sel[..., 0], sel[..., 1],
                                    sel[..., 2], sel[..., 3])

    denom = cdf_a - cdf_b
    denom = jnp.where(denom < eps, 1.0, denom)
    return bins_b + (u - cdf_b) / denom * (bins_a - bins_b)


def sample_importance(
    depths: jnp.ndarray, weights: jnp.ndarray, n_importance: int, key: jax.Array | None
) -> jnp.ndarray:
    """Coarse depths [B,M,S,1] + marcher weights [B,M,S-1,1] -> fine depths.

    Gradients are stopped (the reference runs this under no_grad,
    `renderer.py:234`).
    """
    b, m, s, _ = depths.shape
    depths = jax.lax.stop_gradient(depths)
    weights = jax.lax.stop_gradient(weights)
    z = depths.reshape(b * m, s)
    w = _smooth_weights(weights.reshape(b, m, s - 1, 1)).reshape(b * m, s - 1)
    z_mid = (z[:, :-1] + z[:, 1:]) / 2.0
    fine = _sample_pdf(z_mid, w[:, 1:-1], n_importance, key)
    return fine.reshape(b, m, n_importance, 1)


def _merge_sorted_samples(depths1, colors1, densities1, depths2, colors2, densities2):
    """Merge two per-ray **sorted** sample sets without argsort.

    Target positions come from two searchsorted calls (stable w.r.t. ties:
    set 1 goes left of equal set-2 entries); a single inverse-permutation
    scatter then drives gathers for depths/colors/densities. Replaces the
    O(S log² S) bitonic argsort of the generic path with O(S log S) binary
    searches — both coarse (stratified) and fine (sorted-u inverse CDF)
    depths are sorted by construction.
    """
    b, m, s1, _ = depths1.shape
    s2 = depths2.shape[2]
    s = s1 + s2
    d1 = depths1.reshape(b * m, s1)
    d2 = depths2.reshape(b * m, s2)
    # searchsorted as comparison counts (S is small, the [R,S,S] compare is
    # cheap VPU work; vmap'd binary searches lower to serial scalar code)
    pos1 = jnp.arange(s1)[None] + jnp.sum(
        (d2[:, None, :] < d1[:, :, None]).astype(jnp.int32), axis=-1)
    pos2 = jnp.arange(s2)[None] + jnp.sum(
        (d1[:, None, :] <= d2[:, :, None]).astype(jnp.int32), axis=-1)
    pos = jnp.concatenate([pos1, pos2], axis=-1)  # [R, S]
    # Apply the permutation as a one-hot matmul instead of take_along_axis:
    # a per-element gather along the sample axis lowers to ~50M scalar
    # gathers on TPU (~900 ms in context), while selection by a [S,S]
    # one-hot permutation matrix is MXU work (~10 GFLOP, sub-ms) and exact
    # (each output row sums one 1.0*value and S-1 zeros). P[s, t] = 1 iff
    # output slot s takes concatenated entry t, i.e. t's target pos == s.
    perm = jax.nn.one_hot(pos, s, axis=-2, dtype=jnp.float32)  # [R, S, S]
    perm = perm.reshape(b, m, s, s)

    # ONE einsum over the concatenated (depth | color | density) payload:
    # the S x S permutation tensor dominates the traffic (~600 MB/frame at
    # 16k rays), so it must be read once, not once per merged quantity.
    c_dtype = colors1.dtype
    payload = jnp.concatenate([
        jnp.concatenate([depths1, depths2], axis=-2).astype(jnp.float32),
        jnp.concatenate([colors1, colors2], axis=-2).astype(jnp.float32),
        jnp.concatenate([densities1, densities2], axis=-2).astype(jnp.float32),
    ], axis=-1)
    merged = jnp.einsum("bmst,bmtc->bmsc", perm, payload)
    cc = colors1.shape[-1]
    return (
        merged[..., :1],
        merged[..., 1 : 1 + cc].astype(c_dtype),
        merged[..., 1 + cc :],
    )


def _march_merged(depths1, colors1, densities1, depths2, colors2, densities2,
                  white_back: bool = False):
    """Fused merge+march of two per-ray **sorted** sample sets.

    Equivalent to ``march_rays(*_merge_sorted_samples(...))`` but never
    materializes the merged color tensor: only (depth, sigma) go through the
    [R,S,S] one-hot permutation (payload c=2 instead of 2+C), the march
    weights are computed on the merged depth/sigma, and the per-sample
    composite weights are pulled BACK to concatenation order through the same
    permutation (``w_cat[t] = w_c[pos[t]]``), so the fat [R,S,C] color tensor
    is read exactly once by the final composite einsum. Bit-equal to the
    unfused path modulo fp32 summation order.
    """
    b, m, s1, _ = depths1.shape
    s2 = depths2.shape[2]
    s = s1 + s2
    d1 = depths1.reshape(b * m, s1)
    d2 = depths2.reshape(b * m, s2)
    pos1 = jnp.arange(s1)[None] + jnp.sum(
        (d2[:, None, :] < d1[:, :, None]).astype(jnp.int32), axis=-1)
    pos2 = jnp.arange(s2)[None] + jnp.sum(
        (d1[:, None, :] <= d2[:, :, None]).astype(jnp.int32), axis=-1)
    pos = jnp.concatenate([pos1, pos2], axis=-1)  # [R, S]
    perm = jax.nn.one_hot(pos, s, axis=-2, dtype=jnp.float32)  # [R, S_out, S_in]
    perm = perm.reshape(b, m, s, s)

    ds = jnp.concatenate([
        jnp.concatenate([depths1, depths2], axis=-2).astype(jnp.float32),
        jnp.concatenate([densities1, densities2], axis=-2).astype(jnp.float32),
    ], axis=-1)  # [B,M,S,2]
    merged = jnp.einsum("bmst,bmtc->bmsc", perm, ds)
    md, msig = merged[..., :1], merged[..., 1:]

    weights, w_c, depths_mid = march_weights(msig, md)

    # pull the per-sample composite weights back to concat order and
    # composite colors directly from the unmerged concatenation
    w_cat = jnp.einsum("bms,bmst->bmt", w_c, perm)  # [B,M,S_in]
    colors_cat = jnp.concatenate([colors1, colors2], axis=-2)
    if colors_cat.dtype == jnp.bfloat16:
        # bf16 fast path: read the fat color tensor once in bf16 and let the
        # MXU accumulate in fp32 (weights in [0,1] lose ~2^-9 relative in
        # bf16 — below the decoder's own bf16 activation noise)
        composite_rgb = jnp.einsum(
            "bmt,bmtc->bmc", w_cat.astype(jnp.bfloat16), colors_cat,
            preferred_element_type=jnp.float32)
    else:
        composite_rgb = jnp.einsum("bmt,bmtc->bmc", w_cat,
                                   colors_cat.astype(jnp.float32))

    weight_total = jnp.sum(weights, axis=-2)
    composite_depth = jnp.sum(weights * depths_mid, axis=-2) / weight_total
    composite_depth = jnp.nan_to_num(composite_depth, nan=jnp.inf)
    composite_depth = jnp.clip(composite_depth, jnp.min(md), jnp.max(md))

    if white_back:
        composite_rgb = composite_rgb + 1.0 - weight_total
    composite_rgb = composite_rgb * 2.0 - 1.0
    return composite_rgb, composite_depth, weights


def _unify_samples(depths1, colors1, densities1, depths2, colors2, densities2):
    """Merge coarse+fine along the sample axis, sorted by depth."""
    all_depths = jnp.concatenate([depths1, depths2], axis=-2)
    all_colors = jnp.concatenate([colors1, colors2], axis=-2)
    all_densities = jnp.concatenate([densities1, densities2], axis=-2)
    order = jnp.argsort(all_depths, axis=-2)
    all_depths = jnp.take_along_axis(all_depths, order, axis=-2)
    all_colors = jnp.take_along_axis(
        all_colors, jnp.broadcast_to(order, all_colors.shape[:-1] + (1,)).repeat(
            all_colors.shape[-1], axis=-1
        ), axis=-2,
    )
    all_densities = jnp.take_along_axis(all_densities, order, axis=-2)
    return all_depths, all_colors, all_densities


def render_rays(
    planes: jnp.ndarray,
    decoder: Callable[[jnp.ndarray, jnp.ndarray], dict],
    ray_origins: jnp.ndarray,
    ray_directions: jnp.ndarray,
    options: RenderOptions,
    key: jax.Array | None = None,
    axis_name: str | None = None,
) -> dict[str, Any]:
    """Full two-pass render (`renderer.py:118`).

    Returns dict with ``rgb`` [B,M,C] (feature image, first 3 channels are
    color), ``depth`` [B,M,1], ``weights_sum`` [B,M,1], ``is_ray_valid`` [B,M].

    ``axis_name``: set when called inside ``shard_map`` over the ray axis
    (context parallelism). Everything here is ray-local except the
    valid-population min/max fallback for rays that miss the box — with an
    axis name those two reductions run as ``pmin``/``pmax`` over the mesh so
    the sharded render is bit-identical to the unsharded one.
    """
    b, m, _ = ray_origins.shape
    keys = jax.random.split(key, 4) if key is not None else (None,) * 4

    # one shared xy-cell pack for both sampling passes. Decoders that
    # advertise ``supports_corners`` take the unreduced (rows, weights) form
    # and fold the corner reduce into their first matmul (see
    # make_corner_sampler); everyone else gets reduced [B,3,M,C] features.
    sample_fn = None
    if getattr(decoder, "supports_corners", False):
        sample_fn = make_corner_sampler(planes, options.box_warp)
    if sample_fn is None:
        sample_fn = make_packed_sampler(planes, options.box_warp)

    if options.ray_start == "auto" or options.ray_end == "auto":
        ray_start, ray_end, is_valid = math_utils.get_ray_limits_box(
            ray_origins, ray_directions, options.box_warp
        )
        # invalid rays collapse to a degenerate near interval taken from the
        # valid population (renderer.py:122-126)
        big = jnp.float32(1e10)
        start_min = jnp.min(jnp.where(is_valid[..., None], ray_start, big))
        start_max = jnp.max(jnp.where(is_valid[..., None], ray_start, -big))
        if axis_name is not None:
            start_min = jax.lax.pmin(start_min, axis_name)
            start_max = jax.lax.pmax(start_max, axis_name)
        ray_start = jnp.where(is_valid[..., None], ray_start, start_min)
        ray_end = jnp.where(is_valid[..., None], ray_end, start_max)
    else:
        ray_start = jnp.full((b, m, 1), float(options.ray_start), jnp.float32)
        ray_end = jnp.full((b, m, 1), float(options.ray_end), jnp.float32)
        is_valid = jnp.ones((b, m), bool)

    s_coarse = options.depth_resolution
    depths_coarse = _stratified_depths(ray_start, ray_end, s_coarse, keys[0])

    def eval_at(depths, rng):
        n_s = depths.shape[2]
        coords = (
            ray_origins[:, :, None, :] + depths * ray_directions[:, :, None, :]
        ).reshape(b, -1, 3)
        dirs = jnp.broadcast_to(
            ray_directions[:, :, None, :], (b, m, n_s, 3)
        ).reshape(b, -1, 3)
        out = decoder(sample_fn(coords), dirs)
        if options.density_noise > 0 and rng is not None:
            out = dict(out)
            out["sigma"] = out["sigma"] + (
                jax.random.normal(rng, out["sigma"].shape, out["sigma"].dtype)
                * options.density_noise
            )
        # march math (softplus/exp/cumprod over depth) runs fp32 regardless
        # of the sampling/decoder dtype; the fat COLOR tensor keeps the
        # decoder dtype — on the bf16 fast path that halves the
        # row->sample-major reshape traffic between decode and march (the
        # f32[524k,32] reshape+copy pair cost 1.6 ms/frame, XLA trace r5) —
        # and is composited by an MXU einsum with fp32 accumulation.
        colors = out["rgb"].reshape(b, m, n_s, -1)
        densities = out["sigma"].astype(jnp.float32).reshape(b, m, n_s, 1)
        return colors, densities

    colors_coarse, densities_coarse = eval_at(depths_coarse, keys[1])

    n_imp = options.depth_resolution_importance
    if n_imp > 0:
        _, _, weights = march_rays(
            colors_coarse, densities_coarse, depths_coarse, options.white_back
        )
        depths_fine = sample_importance(depths_coarse, weights, n_imp, keys[2])
        colors_fine, densities_fine = eval_at(depths_fine, keys[3])
        rgb, depth, weights = _march_merged(
            depths_coarse, colors_coarse, densities_coarse,
            depths_fine, colors_fine, densities_fine, options.white_back,
        )
    else:
        rgb, depth, weights = march_rays(
            colors_coarse, densities_coarse, depths_coarse, options.white_back
        )

    return {
        "rgb": rgb,
        "depth": depth,
        "weights_sum": jnp.sum(weights, axis=-2),
        "is_ray_valid": is_valid,
    }
