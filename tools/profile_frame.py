"""Component-budget profiler for the flagship frame on the real chip.

Times each slice of the per-frame graph in isolation (fetch-synced — see
BASELINE.md "Measurement discipline"): SECC raster, plane backbone, the two
sampling passes, decode/merge/march, MFE, WarpGenerator, SR fusion head.

Usage: python tools/profile_frame.py [slice ...]
  slices: secc frame mfe warpgen sr sample march  (default: secc frame)
"""

from __future__ import annotations

import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def timeit(fn, *args, n=10, warmup=2, label=""):
    import jax

    reduce = jax.jit(lambda x: sum(v.sum() for v in jax.tree_util.tree_leaves(x)))

    def sync(x):
        return float(reduce(x))

    out = fn(*args)
    sync(out)
    for _ in range(warmup):
        out = fn(*args)
    sync(out)  # drains the last warmup dispatch (in-order queue)
    t0 = time.time()
    for _ in range(n):
        out = fn(*args)
    sync(out)
    dt = (time.time() - t0) / n * 1000
    print(f"{label:40s} {dt:8.2f} ms")
    return dt


def main():
    which = set(sys.argv[1:]) or {"secc", "frame"}
    import jax
    import jax.numpy as jnp
    import numpy as np

    import __graft_entry__ as ge

    if "secc" in which:
        from real3dportrait_tpu.geometry import synthetic_bfm
        from real3dportrait_tpu.geometry.secc_renderer import SECCRenderer

        assets = synthetic_bfm(n_vertices=35709)
        rng = np.random.RandomState(0)
        res = int(os.environ.get("PROF_SECC_RES", "256"))
        fbs = tuple(int(v) for v in
                    os.environ.get("PROF_SECC_FB", "8,16").split(","))
        for fb in fbs:
            renderer = SECCRenderer(assets, rasterize_size=res,
                                    output_resolution=512)
            ident = jnp.asarray(np.tile(rng.randn(1, 80).astype(np.float32) * 0.1,
                                        (fb, 1)))
            exps = jnp.asarray(rng.randn(fb, 64).astype(np.float32) * 0.1)
            euler = jnp.zeros((fb, 3), jnp.float32)
            trans = jnp.zeros((fb, 3), jnp.float32)
            render = jax.jit(lambda i, e, u, t: renderer.render(i, e, u, t)[1])
            dt = timeit(render, ident, exps, euler, trans,
                        label=f"SECC raster fb={fb} res={res} (batch)")
            print(f"{'':40s} {dt / fb:8.2f} ms/frame")

    if which & {"frame", "slices"}:
        frame_step, (variables, cam, secc, cano, cond) = ge._flagship(tiny=False)
        fpc = getattr(frame_step, "frames_per_call", 1)

    if "frame" in which:
        step = jax.jit(frame_step)
        dt = timeit(step, variables, cam, secc, cano, cond,
                    label=f"frame_step b={fpc}")
        print(f"{'':40s} {dt / fpc:8.2f} ms/frame")

    if "slices" in which:
        # sub-slices of the synthesis step, each its own jitted graph
        from real3dportrait_tpu.geometry.camera import unpack_camera
        from real3dportrait_tpu.rendering.ray_sampler import sample_rays
        from real3dportrait_tpu.rendering.renderer import render_rays

        mdl = frame_step.model

        def secc_plane(m, cano, secc):
            return m.cal_plane_given_cano(cano, secc)

        def volume_only(m, planes, camera):
            c2w, intr = unpack_camera(camera)
            res = m.neural_rendering_resolution
            o, d = sample_rays(c2w, intr, res)
            if m.render_bf16:
                planes = planes.astype(jnp.bfloat16)
            out = render_rays(planes, m._decoder_fn(), o, d, m.render_options)
            return out["rgb"]

        def sr_only(m, rgb, feat, weights, cond):
            ws = jnp.ones((rgb.shape[0], 14, m.w_dim), rgb.dtype)
            return m._forward_sr(rgb, feat, ws, weights, cond, "none")[0]

        planes_fn = jax.jit(lambda v, c, s: mdl.apply(v, c, s, method=secc_plane))
        planes = planes_fn(variables, cano, secc)
        vol_fn = jax.jit(lambda v, p, c: mdl.apply(v, p, c, method=volume_only))
        b = cam.shape[0]
        res = mdl.neural_rendering_resolution
        feat = jnp.zeros((b, res, res, 32))
        weights = jnp.ones((b, res, res, 1))
        sr_fn = jax.jit(lambda v, r, f, w, c: mdl.apply(
            v, r, f, w, c, method=sr_only))

        t_p = timeit(planes_fn, variables, cano, secc,
                     label=f"secc plane backbone+fuse b={fpc}")
        t_v = timeit(vol_fn, variables, planes, cam,
                     label=f"volume render (2-pass) b={fpc}")
        t_s = timeit(sr_fn, variables, feat[..., :3], feat, weights, cond,
                     label=f"SR/torso fusion head b={fpc}")
        print(f"{'':40s} sum {(t_p + t_v + t_s) / fpc:8.2f} ms/frame")


if __name__ == "__main__":
    main()
