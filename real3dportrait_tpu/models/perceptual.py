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

    Returns ``(fn(pred, target) -> scalar, kind)`` where kind is
    ``"vgg19"`` when pretrained weights were found at ``cfg['vgg19_ckpt']``,
    else ``"pyramid"`` (the Laplacian-pyramid surrogate). Mirrors the
    reference's ``lpips_mode`` dispatch (`img2plane_task.py:62-70`).
    """
    from real3dportrait_tpu.training.losses import laplacian_pyramid_loss

    params = load_vgg19_params(str(cfg.get("vgg19_ckpt", "") or ""))
    if params is not None:
        host = jax.tree_util.tree_map(np.asarray, params)
        return (lambda p, t: vgg19_perceptual(host, p, t)), "vgg19"
    return (lambda p, t: laplacian_pyramid_loss(p, t)), "pyramid"
