"""Loss library: the reference's loss-dict x weight-dict pattern, as pure fns.

Sources across `tasks/os_avatar/*` (masked/weighted reconstruction terms,
GAN losses with R1, EG3D density regularization, SECC perturbation
regularization helpers) — each function documents its origin.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


# --- reconstruction ---------------------------------------------------------


def masked_mse(pred, target, mask=None):
    """Mean squared error over masked elements. mask broadcasts to pred."""
    err = jnp.square(pred - target)
    if mask is None:
        return jnp.mean(err)
    mask = jnp.broadcast_to(mask, err.shape)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def masked_l1(pred, target, mask=None, clamp_quantile: float | None = None):
    """L1 with optional per-image error clamping at a quantile
    (`secc_img2plane_task.py:745`, masked_error_loss): large outlier errors
    (e.g. hair wisps) are clipped so they don't dominate."""
    err = jnp.abs(pred - target)
    if clamp_quantile is not None:
        q = jnp.quantile(err.reshape(err.shape[0], -1), clamp_quantile, axis=1)
        q = q.reshape((-1,) + (1,) * (err.ndim - 1))
        err = jnp.minimum(err, q)
    if mask is None:
        return jnp.mean(err)
    mask = jnp.broadcast_to(mask, err.shape)
    return jnp.sum(err * mask) / jnp.maximum(jnp.sum(mask), 1.0)


def temporal_laplacian(x, mask=None):
    """Second-difference smoothness along T (`audio2motion_task.py:344`).

    x: [B,T,C]; penalizes |x[t-1] - 2x[t] + x[t+1]|^2.
    """
    lap = x[:, :-2] - 2 * x[:, 1:-1] + x[:, 2:]
    err = jnp.square(lap)
    if mask is None:
        return jnp.mean(err)
    m = jnp.broadcast_to(mask[:, 1:-1, None], err.shape)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


# mediapipe-468 landmark index sets used by the reference's weighting
# (`tasks/os_avatar/audio2motion_task.py:307-311`): topology facts of the
# mediapipe face mesh, required to reproduce the loss geometry exactly.
_MP468_UNMATCHED = (93, 127, 132, 234, 323, 356, 361, 454)
_MP468_UPPER_EYE = (161, 160, 159, 158, 157, 388, 387, 386, 385, 384)
_MP468_EYE = (33, 246, 161, 160, 159, 158, 157, 173, 133, 155, 154, 153,
              145, 144, 163, 7, 263, 466, 388, 387, 386, 385, 384, 398,
              362, 382, 381, 380, 374, 373, 390, 249)
_MP468_INNER_LIP = (78, 191, 80, 81, 82, 13, 312, 311, 310, 415, 308, 324,
                    318, 402, 317, 14, 87, 178, 88, 95)
_MP468_OUTER_LIP = (61, 185, 40, 39, 37, 0, 267, 269, 270, 409, 291, 375,
                    321, 405, 314, 17, 84, 181, 91, 146)


def weighted_lm3d_mse(pred_lm, gt_lm, mask=None, eye_weight=3.0, lip_weight=5.0,
                      n_landmarks=68):
    """Landmark MSE with eye/mouth up-weighting (`audio2motion_task.py:301`)."""
    weights = jnp.ones((n_landmarks,))
    if n_landmarks == 68:
        weights = weights.at[17:48].set(eye_weight).at[48:68].set(lip_weight)
    elif n_landmarks == 468:
        # exact reference weighting (`audio2motion_task.py:313-318`):
        # eye 3, upper-eye 20, lips 5, BFM-unmatched points 0
        weights = weights.at[jnp.array(_MP468_EYE)].set(eye_weight)
        weights = weights.at[jnp.array(_MP468_UPPER_EYE)].set(20.0)
        weights = weights.at[jnp.array(_MP468_INNER_LIP)].set(lip_weight)
        weights = weights.at[jnp.array(_MP468_OUTER_LIP)].set(lip_weight)
        weights = weights.at[jnp.array(_MP468_UNMATCHED)].set(0.0)
    err = jnp.square(pred_lm - gt_lm) * weights[None, None, :, None]
    if mask is None:
        return jnp.mean(err)
    m = jnp.broadcast_to(mask[:, :, None, None], err.shape)
    return jnp.sum(err * m) / jnp.maximum(jnp.sum(m), 1.0)


def kl_annealing_weight(step, lambda_kl: float, t1: int, t2: int):
    """Cyclic KL annealing (`audio2motion_task.py:219`): ramp 0->1 over t1,
    hold for t2, repeat."""
    phase = jnp.mod(jnp.asarray(step, jnp.float32), t1 + t2)
    return lambda_kl * jnp.clip(phase / t1, 0.0, 1.0)


# --- GAN --------------------------------------------------------------------


def g_nonsaturating_loss(fake_logits):
    """Generator softplus loss (`img2plane_task.py` run_G_*)."""
    return jnp.mean(jax.nn.softplus(-fake_logits))


def d_logistic_loss(real_logits, fake_logits):
    """Discriminator softplus loss."""
    return jnp.mean(jax.nn.softplus(fake_logits)) + jnp.mean(
        jax.nn.softplus(-real_logits)
    )


def r1_penalty(disc_fn, image, image_raw, camera):
    """R1 gradient penalty w.r.t. real images (`img2plane_task.py:358`).

    In JAX the reference's ``no_weight_gradients`` context is unnecessary:
    differentiating only w.r.t. the image inputs already excludes parameter
    grads (SURVEY.md §2.3).
    """

    def score(img, raw):
        return jnp.sum(disc_fn(img, raw, camera))

    g_img, g_raw = jax.grad(score, argnums=(0, 1))(image, image_raw)
    pen = jnp.sum(jnp.square(g_img), axis=(1, 2, 3)) + jnp.sum(
        jnp.square(g_raw), axis=(1, 2, 3)
    )
    return jnp.mean(pen)


def density_regularization(sample_fn, key, box_warp: float = 1.0,
                           n_points: int = 1000, p_dist: float = 0.004):
    """EG3D density TV regularization (`img2plane_task.py:292`, run_G_reg):
    sigma at random points should match sigma at slightly perturbed points.

    ``sample_fn(coords) -> {'sigma': [B,M,1]}``.
    """
    k1, k2 = jax.random.split(key)
    pts = jax.random.uniform(k1, (1, n_points, 3), minval=-0.5, maxval=0.5) * box_warp
    perturbed = pts + jax.random.normal(k2, pts.shape) * p_dist
    sigma = sample_fn(pts)["sigma"]
    sigma_p = sample_fn(perturbed)["sigma"]
    return jnp.mean(jnp.abs(sigma - sigma_p))


# --- rendering-weights regularizers ----------------------------------------


def weights_entropy_loss(weights_img):
    """Encourage the NeRF alpha image to be binary
    (`secc_img2plane_task.py:320`)."""
    a = jnp.clip(weights_img, 1e-5, 1 - 1e-5)
    return jnp.mean(-a * jnp.log2(a) - (1 - a) * jnp.log2(1 - a))


def weights_mask_match_loss(weights_img, head_mask):
    """L1 between the alpha image and the head segmentation
    (`secc_img2plane_task.py:322`)."""
    return jnp.mean(jnp.abs(weights_img - head_mask))


# --- lip-rect crops -----------------------------------------------------------


def lip_rect_centers(lm2d_px: jnp.ndarray) -> jnp.ndarray:
    """Mouth-rect centers from posed landmarks in pixels
    (`data_gen/runs/binarizer_nerf.py:97` get_lip_rect): the bbox center of
    the outer-lip ring, landmarks 48:60. lm2d_px: [B,68,2] (x,y) -> [B,2]
    (y,x) int32 centers."""
    lips = lm2d_px[:, 48:60, :]
    lo = jnp.min(lips, axis=1)
    hi = jnp.max(lips, axis=1)
    cxy = (lo + hi) * 0.5
    return jnp.stack([cxy[:, 1], cxy[:, 0]], axis=-1).astype(jnp.int32)


def crop_fixed_rect(img: jnp.ndarray, centers: jnp.ndarray,
                    size: int) -> jnp.ndarray:
    """Static-size, dynamic-position crop: img [B,H,W,C], centers [B,2]
    (y,x) -> [B,size,size,C].

    TPU-native replacement for the reference's per-sample variable-size lip
    rects (`secc_img2plane_task.py:294-307`): a fixed crop size keeps shapes
    static under jit (one compile, MXU-tileable), while the position stays
    per-sample via vmap'd ``lax.dynamic_slice``.
    """
    h, w = img.shape[1:3]

    def one(im, c):
        y = jnp.clip(c[0] - size // 2, 0, h - size)
        x = jnp.clip(c[1] - size // 2, 0, w - size)
        return jax.lax.dynamic_slice(im, (y, x, 0), (size, size, im.shape[-1]))

    return jax.vmap(one)(img, centers.astype(jnp.int32))


def lip_crop_losses(pred, target, centers, size: int,
                    perceptual_fn=None) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Mouth-crop L1 + perceptual pair (`secc_img2plane_task.py:294-307`,
    loss keys ``*_img_lip_mae`` / ``*_img_lip_lpips``)."""
    lip_pred = crop_fixed_rect(pred, centers, size)
    lip_tgt = crop_fixed_rect(target, centers, size)
    mae = jnp.mean(jnp.abs(lip_pred - lip_tgt))
    if perceptual_fn is None:
        perceptual_fn = laplacian_pyramid_loss
    return mae, perceptual_fn(lip_pred, lip_tgt)


# --- perceptual --------------------------------------------------------------


def laplacian_pyramid_loss(pred, target, levels: int = 3):
    """Multi-scale L1 (Laplacian pyramid) perceptual surrogate.

    Stands in for the reference's pretrained-VGG LPIPS
    (`tasks/os_avatar/loss_utils/vgg19_loss.py`) when no pretrained
    perceptual weights are available; tasks resolve the real criterion via
    :func:`real3dportrait_tpu.models.perceptual.make_perceptual_fn`, which
    returns :func:`~real3dportrait_tpu.models.perceptual.vgg19_perceptual`
    when ``cfg['vgg19_ckpt']`` points at converted weights and this fallback
    otherwise.
    """

    def down(x):
        b, h, w, c = x.shape
        return jax.image.resize(x, (b, h // 2, w // 2, c), "linear")

    loss = 0.0
    for _ in range(levels):
        loss = loss + jnp.mean(jnp.abs(pred - target))
        if min(pred.shape[1], pred.shape[2]) <= 8:
            break
        pd, td = down(pred), down(target)
        up_p = jax.image.resize(pd, pred.shape, "linear")
        up_t = jax.image.resize(td, target.shape, "linear")
        loss = loss + jnp.mean(jnp.abs((pred - up_p) - (target - up_t)))
        pred, target = pd, td
    return loss / levels


def weighted_loss_sum(losses: dict, weights: dict) -> jnp.ndarray:
    """total = sum(losses[k] * weights.get(k, 0)) — the reference's
    loss-dict x loss-weights reduction (`secc_img2plane_task.py:565-635`)."""
    total = 0.0
    for k, v in losses.items():
        w = weights.get(k, None)
        if w is None or w == 0:
            continue
        total = total + v * w
    return total
