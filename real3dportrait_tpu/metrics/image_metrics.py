"""Per-image quality metrics: PSNR, SSIM, perceptual distance.

These power validation logging and the BASELINE parity checks (PSNR/LPIPS
vs reference outputs). All functions take NHWC images; value ranges are
declared per-call via ``data_range``.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax


def psnr(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 2.0) -> jnp.ndarray:
    """Peak signal-to-noise ratio in dB (default range 2.0 for [-1,1] images)."""
    mse = jnp.mean(jnp.square(pred - target), axis=(-3, -2, -1))
    return 10.0 * jnp.log10(data_range**2 / jnp.maximum(mse, 1e-12))


def _gaussian_kernel(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - (size - 1) / 2
    g = jnp.exp(-0.5 * (x / sigma) ** 2)
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(pred: jnp.ndarray, target: jnp.ndarray, data_range: float = 2.0,
         kernel_size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    """Structural similarity (gaussian-windowed, per image) [B]."""
    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    k = _gaussian_kernel(kernel_size, sigma)
    c = pred.shape[-1]
    kern = jnp.broadcast_to(k[:, :, None, None], (kernel_size, kernel_size, 1, c))

    def filt(x):
        return lax.conv_general_dilated(
            x, kern.astype(x.dtype), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"), feature_group_count=c,
        )

    mu_p, mu_t = filt(pred), filt(target)
    mu_pp, mu_tt, mu_pt = mu_p * mu_p, mu_t * mu_t, mu_p * mu_t
    sigma_p = filt(pred * pred) - mu_pp
    sigma_t = filt(target * target) - mu_tt
    sigma_pt = filt(pred * target) - mu_pt
    ssim_map = ((2 * mu_pt + c1) * (2 * sigma_pt + c2)) / (
        (mu_pp + mu_tt + c1) * (sigma_p + sigma_t + c2)
    )
    return jnp.mean(ssim_map, axis=(-3, -2, -1))


def lpips_surrogate(pred: jnp.ndarray, target: jnp.ndarray, levels: int = 4) -> jnp.ndarray:
    """Multi-scale structural distance, a pretrained-free LPIPS stand-in.

    Averages (1 - SSIM)/2 over a dyadic pyramid; correlates with perceptual
    distance while requiring no VGG weights (unavailable in this
    environment). Swap for true LPIPS once weights exist.
    """
    total = 0.0
    n = 0
    for _ in range(levels):
        if min(pred.shape[1], pred.shape[2]) < 12:
            break
        total = total + (1.0 - ssim(pred, target)) / 2.0
        n += 1
        b, h, w, c = pred.shape
        pred = jax.image.resize(pred, (b, h // 2, w // 2, c), "linear")
        target = jax.image.resize(target, (b, h // 2, w // 2, c), "linear")
    return total / max(n, 1)


def lpips(pred: jnp.ndarray, target: jnp.ndarray, cfg=None) -> jnp.ndarray:
    """Real LPIPS(net='vgg') when ``cfg['lpips_vgg_ckpt']`` weights exist
    (see ``tools/convert_torch_ckpt.convert_lpips_vgg``), else the pyramid
    surrogate — flagged by :func:`lpips_kind`. [B,H,W,3] in [-1,1] -> [B]."""
    from real3dportrait_tpu.models.perceptual import make_lpips_fn

    fn = make_lpips_fn(cfg or {})
    if fn is not None:
        return fn(pred, target)
    return lpips_surrogate(pred, target)


def lpips_kind(cfg=None) -> str:
    """"lpips_vgg" when real weights are wired, else "surrogate" — callers
    must record this next to any reported LPIPS number."""
    from real3dportrait_tpu.models.perceptual import make_lpips_fn

    return "lpips_vgg" if make_lpips_fn(cfg or {}) is not None else "surrogate"
