"""Micro-budget of the two-pass volume render at flagship geometry.

Times each internal stage of ``render_rays`` as its own jitted graph
(fetch-synced; BASELINE.md "Measurement discipline"): xy-cell pack, the
coarse/fine sampling gathers, the OSGDecoder MLP, the coarse march, the
inverse-CDF importance sampler, the sorted merge, and the final march.

Usage: python tools/profile_vol.py
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def timeit(fn, *args, n=10, warmup=2, label=""):
    import jax

    reduce = jax.jit(lambda x: sum(v.sum().astype("float32")
                                   for v in jax.tree_util.tree_leaves(x)))

    def sync(x):
        return float(reduce(x))

    out = fn(*args)
    sync(out)
    for _ in range(warmup):
        out = fn(*args)
    sync(out)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label:44s} {dt:8.2f} ms")
    return dt


def main():
    import jax
    import jax.numpy as jnp

    from real3dportrait_tpu.models.decoder import OSGDecoder
    from real3dportrait_tpu.ops.grid_sample import (
        grid_sample_3d_prepacked4,
        pack_xy_cells,
    )
    from real3dportrait_tpu.rendering import math_utils
    from real3dportrait_tpu.rendering.ray_marcher import march_rays
    from real3dportrait_tpu.rendering.renderer import (
        _merge_sorted_samples,
        _stratified_depths,
        sample_importance,
    )

    B, R, S = 1, 128 * 128, 48
    PR, C = 256, 32
    bf16 = os.environ.get("PROF_BF16", "1") == "1"
    dt_pl = jnp.bfloat16 if bf16 else jnp.float32

    key = jax.random.PRNGKey(0)
    planes = (jax.random.normal(key, (B, 3, 1, PR, PR, C)) * 0.1).astype(dt_pl)
    origins = jnp.zeros((B, R, 3)).at[..., 2].set(-1.2)
    d = jax.random.normal(key, (B, R, 3)) * jnp.array([0.15, 0.15, 0.0]) + jnp.array(
        [0.0, 0.0, 1.0]
    )
    dirs = d / jnp.linalg.norm(d, axis=-1, keepdims=True)

    ray_start, ray_end, _ = math_utils.get_ray_limits_box(origins, dirs, 1.0)
    ray_start = jnp.nan_to_num(ray_start, nan=0.6)
    ray_end = jnp.maximum(jnp.nan_to_num(ray_end, nan=1.8), ray_start + 0.1)

    depths = _stratified_depths(ray_start, ray_end, S, None)  # [B,R,S,1]
    coords = (origins[:, :, None, :] + depths * dirs[:, :, None, :]).reshape(B, -1, 3)

    decoder = OSGDecoder(hidden_dim=64, output_dim=C)
    dvars = decoder.init(key, jnp.zeros((B, 3, 8, C)), None)

    # --- stage timings -----------------------------------------------------
    pack = jax.jit(lambda p: [pack_xy_cells(p[:, i]) for i in range(3)])
    packs = pack(planes)
    timeit(pack, planes, label=f"pack_xy_cells x3 ({PR}^2 {dt_pl.__name__})")

    perms = ((0, 1, 2), (0, 2, 1), (2, 0, 1))

    def sample3(packs, coords):
        outs = []
        for i, perm in enumerate(perms):
            xyz = 2.0 * coords[..., jnp.array(perm)]
            outs.append(grid_sample_3d_prepacked4(packs[i], (1, PR, PR, C), xyz))
        return jnp.stack(outs, axis=1)

    sample_j = jax.jit(sample3)
    feats = sample_j(packs, coords)
    timeit(sample_j, packs, coords, label=f"sampling gathers (R*S={R*S/1e6:.2f}M x3)")

    dec_j = jax.jit(lambda v, f: decoder.apply(v, f, None))
    dec_out = dec_j(dvars, feats)
    timeit(dec_j, dvars, feats, label="OSGDecoder MLP")

    def sample_decode(packs, coords):
        return dec_j(dvars, sample3(packs, coords))

    sd_j = jax.jit(sample_decode)
    timeit(sd_j, packs, coords, label="sample+decode fused")

    colors = dec_out["rgb"].astype(jnp.float32).reshape(B, R, S, C)
    densities = dec_out["sigma"].astype(jnp.float32).reshape(B, R, S, 1)

    march_j = jax.jit(lambda c, s, z: march_rays(c, s, z, False))
    _, _, weights = march_j(colors, densities, depths)
    timeit(march_j, colors, densities, depths, label="march (coarse, S=48)")

    imp_j = jax.jit(lambda z, w: sample_importance(z, w, S, None))
    fine = imp_j(depths, weights)
    timeit(imp_j, depths, weights, label="sample_importance (inv-CDF)")

    merge_j = jax.jit(_merge_sorted_samples)
    md, mc, ms = merge_j(depths, colors, densities, fine, colors, densities)
    timeit(merge_j, depths, colors, densities, fine, colors, densities,
           label="merge sorted coarse+fine (96)")

    march2_j = jax.jit(lambda c, s, z: march_rays(c, s, z, False)[0])
    timeit(march2_j, mc, ms, md, label="march (final, S=96)")


if __name__ == "__main__":
    main()
