"""Ray/box math for the volume renderer.

Vectorized JAX equivalents of `modules/eg3ds/volumetric_rendering/math_utils.py`
(ray-AABB intersection and batched linspace).
"""

from __future__ import annotations

import jax.numpy as jnp


def get_ray_limits_box(
    rays_o: jnp.ndarray, rays_d: jnp.ndarray, box_side_length: float
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Intersect rays with the centered AABB of side ``box_side_length``.

    rays_o/rays_d: [..., 3].  Returns (t_min [...,1], t_max [...,1],
    is_valid [...]) — invalid rays get t_min=-1, t_max=-2 like the reference
    (`math_utils.py:46`), with validity returned explicitly instead of
    encoded in sign conventions.
    """
    half = box_side_length / 2.0
    invdir = 1.0 / rays_d  # inf for axis-parallel rays is fine under IEEE
    t_lo = (-half - rays_o) * invdir
    t_hi = (half - rays_o) * invdir
    t_near = jnp.minimum(t_lo, t_hi)
    t_far = jnp.maximum(t_lo, t_hi)
    tmin = jnp.max(t_near, axis=-1)
    tmax = jnp.min(t_far, axis=-1)
    is_valid = tmin <= tmax
    tmin = jnp.where(is_valid, tmin, -1.0)
    tmax = jnp.where(is_valid, tmax, -2.0)
    return tmin[..., None], tmax[..., None], is_valid


def broadcast_linspace(start: jnp.ndarray, stop: jnp.ndarray, num: int) -> jnp.ndarray:
    """Evenly spaced values: output shape [num, *start.shape] (`math_utils.py:101`)."""
    steps = jnp.arange(num, dtype=jnp.float32) / (num - 1)
    steps = steps.reshape((num,) + (1,) * start.ndim)
    return start[None] + steps * (stop - start)[None]
