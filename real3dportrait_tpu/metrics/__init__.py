from real3dportrait_tpu.metrics.image_metrics import (
    lpips, lpips_kind, lpips_surrogate, psnr, ssim,
)
from real3dportrait_tpu.metrics.gan_metrics import (
    calc_metric,
    frechet_distance,
    inception_score,
    kernel_distance,
    list_metrics,
    register_metric,
)

__all__ = [
    "psnr",
    "ssim",
    "lpips_surrogate",
    "lpips",
    "lpips_kind",
    "calc_metric",
    "frechet_distance",
    "kernel_distance",
    "inception_score",
    "register_metric",
    "list_metrics",
]
