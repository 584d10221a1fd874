"""VGG19 perceptual (LPIPS-style) loss with loadable weights.

Equivalent of the reference's ``VGG19Loss`` (`tasks/os_avatar/loss_utils/
vgg19_loss.py:9`): five feature taps (relu1_1, relu2_1, relu3_1, relu4_1,
relu5_1) of an ImageNet-pretrained VGG19, L1 between pred/target features,
layer weights [1/32, 1/16, 1/8, 1/4, 1].

TPU-native design notes:

* channels-last convs; the whole tap stack is one fused XLA graph (the
  reference's five sequential ``nn.Sequential`` slices collapse into it);
* the feature weights are *frozen data*, not trainable params: the loss is a
  pure function ``vgg19_perceptual(params, pred, target)`` whose params the
  task closes over, so they never enter optimizer/checkpoint trees;
* when no pretrained weights exist in the environment, tasks fall back to
  :func:`real3dportrait_tpu.training.losses.laplacian_pyramid_loss`.

Weights are produced by ``tools/convert_torch_ckpt.convert_vgg19`` from a
torchvision ``vgg19().features`` state_dict (OIHW -> HWIO) and saved as a
msgpack tree; :func:`load_vgg19_params` restores it.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

# torchvision vgg19 ``features`` indices of the convs up to conv5_1, with
# their channel widths; taps happen after the relu of the starred entries.
VGG19_CONVS = (
    # (features index, out_channels, tap_after_relu)
    (0, 64, True),     # conv1_1 -> relu1_1 (tap 0)
    (2, 64, False),    # conv1_2
    (5, 128, True),    # conv2_1 -> relu2_1 (tap 1)
    (7, 128, False),   # conv2_2
    (10, 256, True),   # conv3_1 -> relu3_1 (tap 2)
    (12, 256, False),
    (14, 256, False),
    (16, 256, False),
    (19, 512, True),   # conv4_1 -> relu4_1 (tap 3)
    (21, 512, False),
    (23, 512, False),
    (25, 512, False),
    (28, 512, True),   # conv5_1 -> relu5_1 (tap 4)
)
# maxpool sits immediately before these features indices
VGG19_POOL_BEFORE = (5, 10, 19, 28)

LAYER_WEIGHTS = (1.0 / 32, 1.0 / 16, 1.0 / 8, 1.0 / 4, 1.0)

_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
_STD = np.array([0.229, 0.224, 0.225], np.float32)


def init_vgg19_params(rng: np.random.RandomState | None = None) -> dict:
    """He-initialized VGG19-features params (for tests / ablation runs when
    no pretrained weights exist). Tree: ``{'conv<idx>': {'kernel', 'bias'}}``
    with HWIO kernels."""
    rng = rng or np.random.RandomState(0)
    params = {}
    in_ch = 3
    for idx, out_ch, _ in VGG19_CONVS:
        fan_in = 3 * 3 * in_ch
        params[f"conv{idx}"] = {
            "kernel": (rng.randn(3, 3, in_ch, out_ch) *
                       np.sqrt(2.0 / fan_in)).astype(np.float32),
            "bias": np.zeros((out_ch,), np.float32),
        }
        in_ch = out_ch
    return params


def vgg19_features(params: dict, x: jnp.ndarray) -> list[jnp.ndarray]:
    """x: [B,H,W,3] in [-1,1] -> the five tap activations."""
    x = (x + 1.0) * 0.5
    x = (x - _MEAN) / _STD
    taps = []
    for idx, _, tap in VGG19_CONVS:
        if idx in VGG19_POOL_BEFORE:
            # 2x2 max pool, stride 2 (torch MaxPool2d default)
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max,
                (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            )
        p = params[f"conv{idx}"]
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(p["kernel"]), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(p["bias"])
        x = jax.nn.relu(x)
        if tap:
            taps.append(x)
    return taps


def vgg19_perceptual(params: dict, pred: jnp.ndarray, target: jnp.ndarray,
                     max_size: int = 1024) -> jnp.ndarray:
    """Weighted multi-tap L1 feature distance (`vgg19_loss.py:18-26`).

    ``target`` features are stop-gradiented (the reference detaches y).
    """
    while pred.shape[1] > max_size:
        b, h, w, c = pred.shape
        pred = jax.image.resize(pred, (b, h // 2, w // 2, c), "linear")
        target = jax.image.resize(target, (b, h // 2, w // 2, c), "linear")
    f_pred = vgg19_features(params, pred)
    f_tgt = vgg19_features(params, jax.lax.stop_gradient(target))
    loss = 0.0
    for w_i, fp, ft in zip(LAYER_WEIGHTS, f_pred, f_tgt):
        loss = loss + w_i * jnp.mean(jnp.abs(fp - ft))
    return loss


def load_vgg19_params(path: str) -> dict | None:
    """Load converted VGG19 feature weights (msgpack, see
    ``tools/convert_torch_ckpt.convert_vgg19``); None if missing."""
    import os

    if not path or not os.path.exists(path):
        return None
    from flax import serialization

    with open(path, "rb") as f:
        tree = serialization.msgpack_restore(f.read())
    # basic sanity: all convs present with HWIO kernels
    for idx, out_ch, _ in VGG19_CONVS:
        k = tree.get(f"conv{idx}", {}).get("kernel")
        if k is None or k.shape[-1] != out_ch:
            raise ValueError(f"bad VGG19 weight tree at conv{idx} in {path}")
    return tree


def make_perceptual_fn(cfg) -> tuple:
    """Resolve the task's perceptual criterion from config.

    Mirrors the reference's ``lpips_mode`` dispatch
    (`img2plane_task.py:62-70`; shipped configs use ``vgg19_v2``,
    `egs/os_avatar/img2plane.yaml:56`). Returns ``(fn(pred, target) ->
    scalar, kind)``:

    * ``"vgg19_v2"`` — dual VGG19+VGGFace ``PerceptualLoss`` when both
      ``cfg['vgg19_ckpt']`` and ``cfg['vggface_ckpt']`` trees exist;
    * ``"vgg19"`` — five-tap VGG19 L1 when only ``cfg['vgg19_ckpt']`` exists;
    * ``"pyramid"`` — Laplacian-pyramid surrogate otherwise (no pretrained
      weights in the environment).
    """
    from real3dportrait_tpu.training.losses import laplacian_pyramid_loss

    mode = str(cfg.get("lpips_mode", "vgg19_v2"))
    params = load_vgg19_params(str(cfg.get("vgg19_ckpt", "") or ""))
    if params is not None:
        host = jax.tree_util.tree_map(np.asarray, params)
        if mode == "vgg19_v2":
            face = load_msgpack_params(str(cfg.get("vggface_ckpt", "") or ""))
            if face is not None:
                face_host = jax.tree_util.tree_map(np.asarray, face)
                return (lambda p, t: perceptual_v2(host, face_host, p, t)), "vgg19_v2"
        return (lambda p, t: vgg19_perceptual(host, p, t)), "vgg19"
    return (lambda p, t: laplacian_pyramid_loss(p, t)), "pyramid"


def make_lpips_fn(cfg):
    """LPIPS(net='vgg') evaluation metric from ``cfg['lpips_vgg_ckpt']``
    (a ``convert_lpips_vgg`` msgpack tree); None when weights are absent —
    callers fall back / flag scores as unavailable. This is the measurement
    path for the BASELINE "PSNR/LPIPS parity" promise."""
    tree = load_msgpack_params(str(cfg.get("lpips_vgg_ckpt", "") or ""))
    if tree is None:
        return None
    host = jax.tree_util.tree_map(np.asarray, tree)
    return lambda x, y: lpips_vgg(host, x, y)


# ---------------------------------------------------------------------------
# VGGFace (VGG16-face) second branch of the shipped perceptual criterion
# ---------------------------------------------------------------------------
# The released training configs set ``lpips_mode: vgg19_v2``
# (`egs/os_avatar/img2plane.yaml:56`), which is the dual-network
# ``PerceptualLoss`` of `modules/real3d/facev2v_warp/losses.py:116`:
# imagenet-VGG19 + VGGFace, L1 on the relu_{1..5}_1 taps, plus a 3-scale
# VGG19 pyramid on the relu_5_1 tap.

# torchvision vgg16 ``features`` conv indices up to conv5_1 with widths;
# VGGFace taps are the relus after the starred convs
# (`facev2v_warp/losses.py:101-114` layer_name_mapping 1,6,11,18,25).
VGGFACE_CONVS = (
    (0, 64, True),     # conv1_1 -> relu_1_1 (tap 0)
    (2, 64, False),
    (5, 128, True),    # conv2_1 -> relu_2_1
    (7, 128, False),
    (10, 256, True),   # conv3_1 -> relu_3_1
    (12, 256, False),
    (14, 256, False),
    (17, 512, True),   # conv4_1 -> relu_4_1
    (19, 512, False),
    (21, 512, False),
    (24, 512, True),   # conv5_1 -> relu_5_1
)
VGGFACE_POOL_BEFORE = (5, 10, 17, 24)

# vggface normalization (`facev2v_warp/func_utils.py:201-205`): x in [0,1]
# -> x*255 - BGRish mean, std 1
_VGGFACE_MEAN = np.array([129.186279296875, 104.76238250732422,
                          93.59396362304688], np.float32)


def init_vggface_params(rng: np.random.RandomState | None = None) -> dict:
    """He-initialized VGGFace-features params (tests / no-weights runs)."""
    rng = rng or np.random.RandomState(1)
    params = {}
    in_ch = 3
    for idx, out_ch, _ in VGGFACE_CONVS:
        fan_in = 3 * 3 * in_ch
        params[f"conv{idx}"] = {
            "kernel": (rng.randn(3, 3, in_ch, out_ch) *
                       np.sqrt(2.0 / fan_in)).astype(np.float32),
            "bias": np.zeros((out_ch,), np.float32),
        }
        in_ch = out_ch
    return params


def _conv_stack(params: dict, x: jnp.ndarray, convs, pool_before) -> list:
    taps = []
    for idx, _, tap in convs:
        if idx in pool_before:
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 2, 2, 1), (1, 2, 2, 1), "VALID",
            )
        p = params[f"conv{idx}"]
        x = jax.lax.conv_general_dilated(
            x, jnp.asarray(p["kernel"]), (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + jnp.asarray(p["bias"])
        x = jax.nn.relu(x)
        if tap:
            taps.append(x)
    return taps


def vggface_features(params: dict, x01: jnp.ndarray) -> list[jnp.ndarray]:
    """x01: [B,H,W,3] in [0,1] -> the five VGGFace tap activations."""
    x = x01 * 255.0 - _VGGFACE_MEAN
    return _conv_stack(params, x, VGGFACE_CONVS, VGGFACE_POOL_BEFORE)


def _vgg19_features01(params: dict, x01: jnp.ndarray) -> list[jnp.ndarray]:
    """vgg19 taps from a [0,1]-scaled input (PerceptualLoss convention)."""
    x = (x01 - _MEAN) / _STD
    return _conv_stack(params, x, VGG19_CONVS, VGG19_POOL_BEFORE)


def _nan_to_zero(v):
    return jnp.where(jnp.isnan(v), jnp.zeros_like(v), v)


def perceptual_v2(vgg19_params: dict, vggface_params: dict,
                  pred: jnp.ndarray, target: jnp.ndarray,
                  n_scale: int = 3) -> jnp.ndarray:
    """The SHIPPED ``lpips_mode=vgg19_v2`` criterion
    (`facev2v_warp/losses.py:135-174`): inputs [B,H,W,3] in [-1,1]
    (converted to the reference's [0,1] convention internally), resized to
    512; L1 over the five relu_*_1 taps of both networks (vggface term /255),
    plus ``n_scale`` halvings where only the relu_5_1 vgg19 tap (weight 1.0)
    is compared. Target features are detached."""
    pred01 = (pred + 1.0) * 0.5
    tgt01 = jax.lax.stop_gradient((target + 1.0) * 0.5)
    b, h, w, c = pred01.shape
    if h != 512:
        pred01 = jax.image.resize(pred01, (b, 512, 512, c), "linear",
                                  antialias=True)
        tgt01 = jax.image.resize(tgt01, (b, 512, 512, c), "linear",
                                 antialias=True)

    loss = 0.0
    f_pred = vggface_features(vggface_params, pred01)
    f_tgt = vggface_features(vggface_params, tgt01)
    for w_i, fp, ft in zip(LAYER_WEIGHTS, f_pred, f_tgt):
        loss = loss + _nan_to_zero(w_i * jnp.mean(jnp.abs(fp - ft)) / 255.0)
    g_pred = _vgg19_features01(vgg19_params, pred01)
    g_tgt = _vgg19_features01(vgg19_params, tgt01)
    for w_i, fp, ft in zip(LAYER_WEIGHTS, g_pred, g_tgt):
        loss = loss + _nan_to_zero(w_i * jnp.mean(jnp.abs(fp - ft)))

    x, y = pred01, tgt01
    for _ in range(n_scale):
        bb, hh, ww, cc = x.shape
        # F.interpolate(scale_factor=0.5, align_corners=False): plain
        # bilinear, NO antialias (torch's default) — jax defaults antialias
        # on for downsampling, which diverges
        x = jax.image.resize(x, (bb, hh // 2, ww // 2, cc), "linear",
                             antialias=False)
        y = jax.image.resize(y, (bb, hh // 2, ww // 2, cc), "linear",
                             antialias=False)
        fp = _vgg19_features01(vgg19_params, x)[-1]
        ft = _vgg19_features01(vgg19_params, y)[-1]
        # the reference loop reuses the LAST layer weight (1.0 for relu_5_1)
        loss = loss + _nan_to_zero(jnp.mean(jnp.abs(fp - ft)))
    return loss


# ---------------------------------------------------------------------------
# lpips-package LPIPS(net='vgg') — the standard evaluation metric
# ---------------------------------------------------------------------------
# Architecture (lpips/lpips.py, LPIPS(net='vgg', lpips=True)): scaling layer
# -> torchvision vgg16 features, taps relu1_2/2_2/3_3/4_3/5_3 -> per-pixel
# channel unit-normalization -> squared difference -> learned 1x1 "lin"
# convs (C->1, no bias) -> spatial mean -> sum over taps.

LPIPS_VGG16_CONVS = (
    (0, 64, False),
    (2, 64, True),     # relu1_2 (tap 0)
    (5, 128, False),
    (7, 128, True),    # relu2_2
    (10, 256, False),
    (12, 256, False),
    (14, 256, True),   # relu3_3
    (17, 512, False),
    (19, 512, False),
    (21, 512, True),   # relu4_3
    (24, 512, False),
    (26, 512, False),
    (28, 512, True),   # relu5_3
)
LPIPS_POOL_BEFORE = (5, 10, 17, 24)
# lpips ScalingLayer constants (shift/scale buffers)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def init_lpips_params(rng: np.random.RandomState | None = None) -> dict:
    """Random-init LPIPS-vgg tree (tests): ``{'conv<i>': .., 'lin<k>': ..}``."""
    rng = rng or np.random.RandomState(2)
    params = {}
    in_ch = 3
    lin_ch = []
    for idx, out_ch, tap in LPIPS_VGG16_CONVS:
        fan_in = 3 * 3 * in_ch
        params[f"conv{idx}"] = {
            "kernel": (rng.randn(3, 3, in_ch, out_ch) *
                       np.sqrt(2.0 / fan_in)).astype(np.float32),
            "bias": np.zeros((out_ch,), np.float32),
        }
        if tap:
            lin_ch.append(out_ch)
        in_ch = out_ch
    for k, c in enumerate(lin_ch):
        params[f"lin{k}"] = {
            "kernel": np.abs(rng.randn(c, 1)).astype(np.float32) * 0.1,
        }
    return params


def lpips_vgg(params: dict, x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """LPIPS distance per batch element: x, y [B,H,W,3] in [-1,1] -> [B]."""

    def feats(img):
        z = (img - _LPIPS_SHIFT) / _LPIPS_SCALE
        return _conv_stack(params, z, LPIPS_VGG16_CONVS, LPIPS_POOL_BEFORE)

    fx, fy = feats(x), feats(y)
    total = 0.0
    for k, (a, b_) in enumerate(zip(fx, fy)):
        a = a / jnp.sqrt(jnp.sum(jnp.square(a), axis=-1, keepdims=True) + 1e-10)
        b_ = b_ / jnp.sqrt(jnp.sum(jnp.square(b_), axis=-1, keepdims=True) + 1e-10)
        d = jnp.square(a - b_)  # [B,H,W,C]
        w = jnp.asarray(params[f"lin{k}"]["kernel"])  # [C,1]
        total = total + jnp.mean(d @ w, axis=(1, 2, 3))
    return total


def load_msgpack_params(path: str) -> dict | None:
    """Load any converted perceptual tree saved via ``save_vgg19``/msgpack."""
    import os

    if not path or not os.path.exists(path):
        return None
    from flax import serialization

    with open(path, "rb") as f:
        return serialization.msgpack_restore(f.read())
