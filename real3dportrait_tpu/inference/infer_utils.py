"""Inference helpers: temporal smoothing, video-driven motion extraction.

Equivalents of `inference/infer_utils.py` (mirror_index lives in
geometry.camera; gaussian feature smoothing here) plus the video-driven
expression path of `real3d_infer.py` (drv_exp video -> fitted coefficients).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def smooth_features_1d(x: jnp.ndarray, kernel_size: int = 7, sigma: float = 2.0):
    """Gaussian smoothing along the time axis of [T, ...] features
    (`infer_utils.py:71`, smooth_features_xd)."""
    t = x.shape[0]
    kernel_size = min(kernel_size, 2 * t - 1)
    if kernel_size % 2 == 0:
        kernel_size -= 1
    if t < 2 or kernel_size < 3:
        return x
    half = kernel_size // 2
    g = jnp.exp(-0.5 * ((jnp.arange(kernel_size) - half) / sigma) ** 2)
    g = g / g.sum()
    flat = x.reshape(t, -1)
    padded = jnp.concatenate([flat[half:0:-1], flat, flat[-2 : -2 - half : -1]], 0)
    sm = jax.vmap(lambda col: jnp.convolve(col, g, mode="valid"),
                  in_axes=1, out_axes=1)(padded)
    return sm.reshape(x.shape)


def motion_from_video_landmarks(assets, lm2d_seq: np.ndarray,
                                smooth: bool = True) -> dict:
    """Driving-video landmarks [T,68,2] -> {exp, euler, trans} coefficient
    sequences (the drv_exp video path of `real3d_infer.py:104` infer_utils /
    `prepare_batch_from_inp`)."""
    from real3dportrait_tpu.geometry.fit_3dmm import fit_coeffs

    fit = fit_coeffs(assets, jnp.asarray(lm2d_seq))
    exp, euler, trans = fit.exp, fit.euler, fit.trans
    if smooth and len(exp) > 7:
        exp = smooth_features_1d(exp, kernel_size=5, sigma=1.0)
        euler = smooth_features_1d(euler)
        trans = smooth_features_1d(trans)
    return {"exp": exp, "euler": euler, "trans": trans, "id": fit.id}


def motion_from_video(video_path: str, assets,
                      landmark_extractor=None,
                      max_frames: int | None = None,
                      smooth: bool = True) -> dict:
    """Driving video file -> {exp, euler, trans, id} coefficient sequences.

    The video-driven mode of the reference (`real3d_infer.py:227-228` for
    drv_aud=*.mp4, `:286-288` for drv_pose=*.mp4, both via
    `fit_3dmm_for_a_video`): decode + resample the video to 25 fps, extract
    per-frame 68 landmarks (pluggable; the naive box-template extractor is
    the default since MediaPipe's runtime is not bundled), then run the
    jitted two-phase 3DMM fit with temporal regularization.
    """
    from real3dportrait_tpu.preprocess.pipeline import (
        naive_landmark_extractor,
        resample_video,
    )

    frames = resample_video(video_path, max_frames=max_frames)
    if len(frames) == 0:
        raise ValueError(f"no frames decoded from {video_path}")
    extractor = landmark_extractor or naive_landmark_extractor
    lm2d_seq = np.asarray(extractor(frames))
    return motion_from_video_landmarks(assets, lm2d_seq, smooth=smooth)


def load_motion_coeff_npy(path: str) -> dict | None:
    """Load a motion-coefficient dict from .npy if it holds one, else None.

    The reference's drv_aud/.npy and drv_pose/.npy files are pickled dicts
    with exp/euler/trans arrays (`real3d_infer.py:231-235,289-291`); a plain
    float array is NOT a coeff dict (the repo also accepts precomputed
    HuBERT features there).
    """
    arr = np.load(path, allow_pickle=True)
    obj = arr.item() if isinstance(arr, np.ndarray) and arr.dtype == object else arr
    if isinstance(obj, dict) and ("exp" in obj or "euler" in obj):
        return {k: np.asarray(v) for k, v in obj.items()}
    return None


def map_pose_to_source(euler, trans, src_euler, src_trans,
                       z_fix: bool = True, map_to_init: bool = True):
    """Driving-pose normalization (`real3d_infer.py:300-309`).

    * z-fix: the driving depth (trans z) is held at its first value so the
      head does not swim toward/away from the camera;
    * map-to-init: the whole sequence is offset so frame 0 coincides with
      the source image's fitted pose.
    """
    import jax.numpy as jnp

    euler = jnp.asarray(euler, jnp.float32)
    trans = jnp.asarray(trans, jnp.float32)
    if z_fix:
        trans = trans.at[:, 2].set(trans[0, 2])
    if map_to_init:
        euler = euler + (jnp.asarray(src_euler).reshape(1, 3) - euler[:1])
        trans = trans + (jnp.asarray(src_trans).reshape(1, 3) - trans[:1])
    return euler, trans
