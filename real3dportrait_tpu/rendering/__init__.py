from real3dportrait_tpu.rendering.math_utils import broadcast_linspace, get_ray_limits_box
from real3dportrait_tpu.rendering.ray_marcher import march_rays
from real3dportrait_tpu.rendering.ray_sampler import sample_rays
from real3dportrait_tpu.rendering.renderer import (
    RenderOptions,
    render_rays,
    run_model,
    sample_features,
    sample_from_planes,
    sample_from_trigrids,
    sample_importance,
)

__all__ = [
    "broadcast_linspace",
    "get_ray_limits_box",
    "march_rays",
    "sample_rays",
    "RenderOptions",
    "render_rays",
    "run_model",
    "sample_features",
    "sample_from_planes",
    "sample_from_trigrids",
    "sample_importance",
]
