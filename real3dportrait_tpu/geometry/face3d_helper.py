"""Landmark-space morphable-model helpers.

Pure-function redesign of the reference ``Face3DHelper``
(`data_util/face3d_helper.py:10`): the x10-scaled id+exp landmark offset
(``idexp_lm3d``) is the motion representation consumed by the audio2motion
VAE and the syncnet, and the 2D landmark reconstruction drives 3DMM fitting.
"""

from __future__ import annotations

import jax.numpy as jnp

from real3dportrait_tpu.geometry import bfm as bfm_ops
from real3dportrait_tpu.geometry.bfm import BFMAssets

IDEXP_LM3D_SCALE = 10.0


def split_coeff(coeff: jnp.ndarray) -> dict:
    """Split a packed 257-dim 3DMM coefficient vector (`face3d_helper.py:50`)."""
    return {
        "identity": coeff[..., :80],
        "expression": coeff[..., 80:144],
        "texture": coeff[..., 144:224],
        "euler": coeff[..., 224:227],
        "gamma": coeff[..., 227:254],
        "translation": coeff[..., 254:257],
    }


def reconstruct_idexp_lm3d(
    assets: BFMAssets, id_coeff: jnp.ndarray, exp_coeff: jnp.ndarray
) -> jnp.ndarray:
    """[T,80],[T,64] -> [T,K,3] scaled identity+expression landmark offsets.

    The reference multiplies by 10 to bring offsets to a ~unit scale
    (`data_util/face3d_helper.py:207`).
    """
    flat = id_coeff @ assets.key_id_base.T + exp_coeff @ assets.key_exp_base.T
    return flat.reshape(id_coeff.shape[0], -1, 3) * IDEXP_LM3D_SCALE


def reconstruct_cano_lm3d(
    assets: BFMAssets, id_coeff: jnp.ndarray, exp_coeff: jnp.ndarray
) -> jnp.ndarray:
    """[T,80],[T,64] -> [T,K,3] canonical (pose-free) landmarks."""
    return bfm_ops.compute_key_shape(assets, id_coeff, exp_coeff)


def reconstruct_lm3d(
    assets: BFMAssets,
    id_coeff: jnp.ndarray,
    exp_coeff: jnp.ndarray,
    euler: jnp.ndarray,
    trans: jnp.ndarray,
    to_camera: bool = True,
) -> jnp.ndarray:
    """coeffs -> [T,K,3] posed landmarks, optionally in the camera frame."""
    lm = bfm_ops.compute_key_shape(assets, id_coeff, exp_coeff)
    rot = bfm_ops.compute_rotation(euler)
    lm = bfm_ops.transform(lm, rot, trans)
    if to_camera:
        lm = bfm_ops.to_camera(lm)
    return lm


def reconstruct_lm2d(
    assets: BFMAssets,
    id_coeff: jnp.ndarray,
    exp_coeff: jnp.ndarray,
    euler: jnp.ndarray,
    trans: jnp.ndarray,
) -> jnp.ndarray:
    """coeffs -> [T,K,2] normalized [0,1] image landmarks (224 fit frame).

    Supports [B,T,C] batched input like the reference (`face3d_helper.py:132`).
    """
    btc = id_coeff.ndim == 3
    if btc:
        b, t = id_coeff.shape[:2]
        id_coeff = id_coeff.reshape(b * t, -1)
        exp_coeff = exp_coeff.reshape(b * t, -1)
        euler = euler.reshape(b * t, -1)
        trans = trans.reshape(b * t, -1)
    lm3d = reconstruct_lm3d(assets, id_coeff, exp_coeff, euler, trans, to_camera=True)
    lm2d = bfm_ops.to_image(lm3d)
    # y flip + [0,1] normalization in the 224 frame
    lm2d = jnp.stack([lm2d[..., 0], 224.0 - lm2d[..., 1]], axis=-1) / 224.0
    if btc:
        lm2d = lm2d.reshape(b, t, -1, 2)
    return lm2d


def get_eye_mouth_lm(lm3d: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """[..., 68, 3] -> (eye landmarks [...,31,3], mouth landmarks [...,20,3])."""
    return lm3d[..., 17:48, :], lm3d[..., 48:68, :]


def close_mouth_for_idexp_lm3d(
    idexp_lm3d: jnp.ndarray, freeze_as_first_frame: bool = True
) -> jnp.ndarray:
    """Snap upper/lower lip landmarks together (`face3d_helper.py:249`).

    Used when editing driving motion to force a closed mouth; purely
    functional (returns a new array).
    """
    x = idexp_lm3d.reshape(-1, 68, 3)
    upper_out = jnp.arange(49, 54)
    lower_out = jnp.arange(59, 54, -1)
    upper_in = jnp.arange(61, 64)
    lower_in = jnp.arange(67, 64, -1)

    mid_out = (x[:, upper_out, 1] + x[:, lower_out, 1]) / 2
    x = x.at[:, upper_out, 1].set(mid_out)
    mid_out2 = (x[:, upper_out, 1] + x[:, lower_out, 1]) / 2
    x = x.at[:, lower_out, 1].set(mid_out2)

    mid_in = (x[:, upper_in, 1] + x[:, lower_in, 1]) / 2
    x = x.at[:, upper_in, 1].set(mid_in)
    mid_in2 = (x[:, upper_in, 1] + x[:, lower_in, 1]) / 2
    x = x.at[:, lower_in, 1].set(mid_in2)

    x = x.at[:, upper_out, 1].add(
        (0.03 - x[:, upper_out, 1].mean(axis=1) + x[:, upper_in, 1].mean(axis=1))[:, None]
    )
    x = x.at[:, lower_out, 1].add(
        (-0.03 - x[:, lower_out, 1].mean(axis=1) + x[:, lower_in, 1].mean(axis=1))[:, None]
    )
    if freeze_as_first_frame:
        x = x.at[:, 48:68].set(0.0)
    return x.reshape(idexp_lm3d.shape)


def close_eyes_for_idexp_lm3d(idexp_lm3d: jnp.ndarray, eps: float = 0.003) -> jnp.ndarray:
    """Snap eyelid landmarks together (`face3d_helper.py:267`)."""
    x = idexp_lm3d.reshape(-1, 68, 3)
    for upper, lower in ((jnp.arange(37, 39), jnp.arange(41, 39, -1)),
                         (jnp.arange(43, 45), jnp.arange(47, 45, -1))):
        mid = (x[:, upper, 1] + x[:, lower, 1]) / 2
        x = x.at[:, upper, 1].set(mid + eps)
        mid2 = (x[:, upper, 1] + x[:, lower, 1]) / 2
        x = x.at[:, lower, 1].set(mid2 - eps)
    return x.reshape(idexp_lm3d.shape)
