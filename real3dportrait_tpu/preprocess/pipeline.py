"""Offline data preprocessing: raw video -> binarized training records.

Host-side equivalent of the reference `data_gen/` stages
(`docs/process_data/process_th1kh.md:1-33`):

1. resample video to 25 fps / 512² (cv2);
2. person segmentation -> head/torso/bg images + KNN-style background
   (`extract_segment_imgs.py:63`);
3. 478/68-point landmarks (pluggable extractor — MediaPipe's native runtime
   is not in this image; precomputed landmarks are accepted everywhere);
4. 3DMM fitting against the landmarks (the jitted `fit_coeffs` loop);
5. audio: 16 kHz wav -> mel + F0 (+ HuBERT when weights exist);
6. binarize into the indexed record store.

Every extractor is a plain callable so MediaPipe (or any other landmark /
segmentation runtime) can be plugged in where available.
"""

from __future__ import annotations

import os
from typing import Callable

import numpy as np


# --- video -----------------------------------------------------------------


def resample_video(path: str, fps: int = 25, size: int = 512,
                   max_frames: int | None = None) -> np.ndarray:
    """Video file -> [T, size, size, 3] uint8 at the target fps
    (`data_gen/utils/process_video/resample_video_to_25fps_resize_to_512.py`)."""
    import cv2

    cap = cv2.VideoCapture(path)
    src_fps = cap.get(cv2.CAP_PROP_FPS) or fps
    step = src_fps / fps
    frames = []
    idx, next_keep = 0, 0.0
    while True:
        ok, frame = cap.read()
        if not ok:
            break
        if idx >= next_keep:
            frame = cv2.resize(frame, (size, size), interpolation=cv2.INTER_AREA)
            frames.append(cv2.cvtColor(frame, cv2.COLOR_BGR2RGB))
            next_keep += step
            if max_frames and len(frames) >= max_frames:
                break
        idx += 1
    cap.release()
    return np.stack(frames) if frames else np.zeros((0, size, size, 3), np.uint8)


# --- segmentation ------------------------------------------------------------


def naive_person_segmenter(frames: np.ndarray) -> np.ndarray:
    """[T,H,W,3] uint8 -> [T,H,W] int segmap with the MediaPipe class
    convention (0 bg, 1 hair, 2 body/neck, 3 face, 4 clothes, 5 other).

    Median-background subtraction + center prior — a dependency-free stand-in
    for `mp_segmenter.py:156`; swap in a real segmenter via
    ``segment_frames(frames, segmenter=...)``.
    """
    bg = np.median(frames[:: max(len(frames) // 16, 1)], axis=0)
    diff = np.abs(frames.astype(np.int16) - bg.astype(np.int16)).sum(-1)
    person = diff > 40
    h, w = frames.shape[1:3]
    yy = np.arange(h)[:, None]
    segs = np.zeros(frames.shape[:3], np.int64)
    face_band = (yy > h * 0.15) & (yy < h * 0.55)
    body_band = yy >= h * 0.55
    hair_band = yy <= h * 0.15
    segs[person & np.broadcast_to(face_band, person.shape)] = 3
    segs[person & np.broadcast_to(body_band, person.shape)] = 4
    segs[person & np.broadcast_to(hair_band, person.shape)] = 1
    return segs


def segment_frames(frames: np.ndarray,
                   segmenter: Callable[[np.ndarray], np.ndarray] | None = None) -> dict:
    """frames -> {segmap, head_imgs, torso_imgs, com_imgs, bg_img}
    (`extract_segment_imgs.py:63`, KNN background -> median background)."""
    segmap = (segmenter or naive_person_segmenter)(frames)
    person = segmap > 0
    head = (segmap == 1) | (segmap == 3)
    torso = (segmap == 2) | (segmap == 4)
    # background: median of non-person pixels over time
    masked = np.where(person[..., None], np.nan, frames.astype(np.float32))
    with np.errstate(invalid="ignore"):
        bg = np.nanmedian(masked, axis=0)
    bg = np.nan_to_num(bg, nan=127.0).astype(np.uint8)

    def cut(mask):
        return np.where(mask[..., None], frames, 0).astype(np.uint8)

    return {
        "segmap": segmap.astype(np.int8),
        "head_imgs": cut(head),
        "torso_imgs": cut(torso),
        "com_imgs": np.where(person[..., None], frames, bg[None]).astype(np.uint8),
        "bg_img": bg,
    }


# --- landmarks ----------------------------------------------------------------


def _neutral_lm_template(bfm_dir: str | None = None) -> np.ndarray:
    """Canonical 68-landmark layout, unit-normalized to its own bbox.

    Reconstructed once from the (possibly synthetic) BFM at zero
    coefficients; used by the naive extractor to place landmarks inside a
    detected face box.
    """
    import jax.numpy as jnp

    from real3dportrait_tpu.geometry import face3d_helper, load_or_synthetic_bfm

    assets = load_or_synthetic_bfm(bfm_dir)
    lm = np.asarray(face3d_helper.reconstruct_lm2d(
        assets, jnp.zeros((1, 80)), jnp.zeros((1, 64)),
        jnp.zeros((1, 3)), jnp.zeros((1, 3))))[0]  # [68,2] in [0,1]
    lo, hi = lm.min(0), lm.max(0)
    return (lm - lo) / np.maximum(hi - lo, 1e-6)


def naive_landmark_extractor(frames: np.ndarray,
                             bfm_dir: str | None = None) -> np.ndarray:
    """[T,H,W,3] uint8 -> [T,68,2] normalized landmarks.

    Dependency-free stand-in for the MediaPipe face-landmarker
    (`data_gen/utils/process_video/extract_lm2d.py` in the reference, whose
    native runtime is not in this image): per-frame face bounding box from
    the segmentation prior, with the canonical BFM 68-landmark template
    placed inside it. Landmarks therefore track head translation/scale only
    (no expression) — enough to drive the 3DMM pose/exp fit mechanics;
    swap in a real extractor via the ``landmark_extractor`` plug points.
    """
    h, w = frames.shape[1:3]
    segs = naive_person_segmenter(frames)
    template = _neutral_lm_template(bfm_dir)
    out = np.zeros((len(frames), 68, 2), np.float32)
    prev_box = (0.3 * w, 0.2 * h, 0.7 * w, 0.6 * h)  # fallback center box
    for t in range(len(frames)):
        ys, xs = np.nonzero(segs[t] == 3)
        if len(xs) > 16:
            box = (xs.min(), ys.min(), xs.max(), ys.max())
            prev_box = box
        else:
            box = prev_box
        x0, y0, x1, y1 = box
        lm = template * np.array([max(x1 - x0, 4), max(y1 - y0, 4)]) + np.array([x0, y0])
        out[t] = lm / np.array([w, h])
    return out


# --- audio --------------------------------------------------------------------


def extract_audio_features(wav: np.ndarray, hubert_path: str | None = None) -> dict:
    """16 kHz wav -> {mel [T,80], f0 [T], hubert [T,1024]?} @50Hz."""
    from real3dportrait_tpu.audio import extract_f0, extract_mel, load_hubert_extractor

    out = {"mel": extract_mel(wav), "f0": extract_f0(wav)}
    hub = load_hubert_extractor(hubert_path)
    if hub is not None:
        out["hubert"] = hub(wav)
    t = min(len(out["mel"]), len(out["f0"]))
    return {k: v[:t] if k != "hubert" else v for k, v in out.items()}


def extract_blink(lm2d_seq: np.ndarray) -> np.ndarray:
    """68-landmark sequence [T,68,2] -> blink units [T,1] in {0,1}
    (`extract_blink.py`: eye aspect ratio thresholding)."""
    def ear(lm, idx):
        p = lm[:, idx]
        v1 = np.linalg.norm(p[:, 1] - p[:, 5], axis=-1)
        v2 = np.linalg.norm(p[:, 2] - p[:, 4], axis=-1)
        h = np.linalg.norm(p[:, 0] - p[:, 3], axis=-1)
        return (v1 + v2) / np.maximum(2 * h, 1e-8)

    left = ear(lm2d_seq, [36, 37, 38, 39, 40, 41])
    right = ear(lm2d_seq, [42, 43, 44, 45, 46, 47])
    ratio = (left + right) / 2
    return (ratio < 0.21).astype(np.int64)[:, None]


# --- end-to-end ------------------------------------------------------------------


def process_video_to_record(
    video_path: str,
    wav: np.ndarray,
    lm2d_seq: np.ndarray | None = None,
    landmark_extractor: Callable | None = None,
    segmenter: Callable | None = None,
    hubert_path: str | None = None,
    bfm_dir: str | None = None,
    max_frames: int | None = None,
    store_images: bool = False,
) -> dict:
    """One video + audio -> a binarizer-ready record.

    ``lm2d_seq``: precomputed [T,68,2] normalized landmarks; otherwise
    ``landmark_extractor(frames) -> lm2d_seq`` must be provided (MediaPipe
    plug point, `extract_lm2d.py`).
    """
    import jax.numpy as jnp

    from real3dportrait_tpu.geometry import load_or_synthetic_bfm
    from real3dportrait_tpu.geometry.fit_3dmm import fit_coeffs

    frames = resample_video(video_path, max_frames=max_frames)
    t = len(frames)
    if lm2d_seq is None:
        assert landmark_extractor is not None, (
            "no landmarks: pass lm2d_seq or a landmark_extractor "
            "(MediaPipe is not bundled in this image)"
        )
        lm2d_seq = landmark_extractor(frames)
    lm2d_seq = np.asarray(lm2d_seq)[:t]

    assets = load_or_synthetic_bfm(bfm_dir)
    fit = fit_coeffs(assets, jnp.asarray(lm2d_seq))
    audio = extract_audio_features(wav, hubert_path)
    # align audio (50Hz) to motion (25Hz)
    t = min(t, len(audio["f0"]) // 2, len(fit.exp))
    record = {
        "id": np.broadcast_to(np.asarray(fit.id), (t, 80)).copy(),
        "exp": np.asarray(fit.exp)[:t],
        "euler": np.asarray(fit.euler)[:t],
        "trans": np.asarray(fit.trans)[:t],
        "f0": audio["f0"][: 2 * t],
        "mel": audio["mel"][: 2 * t],
        "blink": np.repeat(extract_blink(lm2d_seq[:t]), 2, axis=0)[: 2 * t],
    }
    if "hubert" in audio:
        record["hubert"] = audio["hubert"][: 2 * t]
    if store_images:
        seg = segment_frames(frames[:t], segmenter)
        record.update(seg)
    return record
