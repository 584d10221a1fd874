"""Camera rays from cam2world + intrinsics.

Functional equivalent of `modules/eg3ds/volumetric_rendering/ray_sampler.py:18`
(OpenCV camera convention, normalized intrinsics, pixel centers at
(i+0.5)/resolution).
"""

from __future__ import annotations

import jax.numpy as jnp


def sample_rays(
    cam2world: jnp.ndarray, intrinsics: jnp.ndarray, resolution: int
) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[B,4,4], [B,3,3], res -> (origins [B,res*res,3], dirs [B,res*res,3]).

    Pixels are traversed row-major (y outer, x inner), matching the image
    layout the renderer reshapes into.
    """
    n = cam2world.shape[0]
    fx = intrinsics[:, 0, 0][:, None]
    fy = intrinsics[:, 1, 1][:, None]
    cx = intrinsics[:, 0, 2][:, None]
    cy = intrinsics[:, 1, 2][:, None]
    sk = intrinsics[:, 0, 1][:, None]

    step = 1.0 / resolution
    coords = (jnp.arange(resolution, dtype=jnp.float32) + 0.5) * step
    yy, xx = jnp.meshgrid(coords, coords, indexing="ij")
    x_cam = xx.reshape(1, -1)
    y_cam = yy.reshape(1, -1)
    z_cam = jnp.ones_like(x_cam)

    x_lift = (x_cam - cx + cy * sk / fy - sk * y_cam / fy) / fx * z_cam
    y_lift = (y_cam - cy) / fy * z_cam
    cam_rel = jnp.stack([x_lift * jnp.ones((n, 1)), y_lift * jnp.ones((n, 1)),
                         jnp.broadcast_to(z_cam, (n, x_cam.shape[1])),
                         jnp.ones((n, x_cam.shape[1]))], axis=-1)

    world = jnp.einsum("bij,bmj->bmi", cam2world, cam_rel)[..., :3]
    origins = cam2world[:, :3, 3][:, None, :]
    dirs = world - origins
    dirs = dirs / jnp.linalg.norm(dirs, axis=-1, keepdims=True)
    origins = jnp.broadcast_to(origins, dirs.shape)
    return origins, dirs
