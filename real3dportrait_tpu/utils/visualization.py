"""Visualization helpers: landmark overlays, validation image grids.

Equivalent of `utils/visualization/` (landmark drawing, debug grids used by
the validation dumps, `secc_img2plane_task.py:672-712`); cv2-based since
matplotlib is not guaranteed in this image.
"""

from __future__ import annotations

import numpy as np


def to_uint8(img: np.ndarray) -> np.ndarray:
    """[-1,1] float image -> uint8."""
    if img.dtype == np.uint8:
        return img
    return ((np.clip(img, -1, 1) + 1) * 127.5).astype(np.uint8)


def draw_landmarks(img: np.ndarray, lm2d: np.ndarray, radius: int = 2) -> np.ndarray:
    """Draw normalized [0,1] landmarks on an image (eyes red, mouth green,
    rest blue — the reference's color convention, `face3d_helper.py` demo)."""
    import cv2

    out = to_uint8(img).copy()
    h, w = out.shape[:2]
    for i, (x, y) in enumerate(np.asarray(lm2d)):
        if 36 <= i < 48:
            color = (255, 0, 0)
        elif 48 <= i < 68:
            color = (0, 255, 0)
        else:
            color = (0, 0, 255)
        cv2.circle(out, (int(x * w), int(y * h)), radius, color, -1)
    return out


def image_grid(images: list[np.ndarray], cols: int | None = None,
               pad: int = 2) -> np.ndarray:
    """Tile images (same HW) into one grid image for validation dumps."""
    images = [to_uint8(im) for im in images]
    n = len(images)
    cols = cols or int(np.ceil(np.sqrt(n)))
    rows = int(np.ceil(n / cols))
    h, w = images[0].shape[:2]
    grid = np.full((rows * (h + pad) - pad, cols * (w + pad) - pad, 3), 255,
                   np.uint8)
    for i, im in enumerate(images):
        r, c = divmod(i, cols)
        if im.ndim == 2 or im.shape[-1] == 1:
            im = np.repeat(im.reshape(h, w, 1), 3, axis=-1)
        grid[r * (h + pad): r * (h + pad) + h,
             c * (w + pad): c * (w + pad) + w] = im[..., :3]
    return grid


def depth_to_colormap(depth: np.ndarray) -> np.ndarray:
    """[H,W] depth -> uint8 heat image (validation depth dumps)."""
    import cv2

    d = np.asarray(depth, np.float32)
    mask = d > 0
    if mask.any():
        lo, hi = d[mask].min(), d[mask].max()
        norm = np.where(mask, (d - lo) / max(hi - lo, 1e-9), 0.0)
    else:
        norm = np.zeros_like(d)
    return cv2.applyColorMap((norm * 255).astype(np.uint8), cv2.COLORMAP_VIRIDIS)


def side_by_side(*images: np.ndarray) -> np.ndarray:
    """Horizontal concat of same-height images (the concat_debug out mode)."""
    ims = [to_uint8(im) for im in images]
    h = max(im.shape[0] for im in ims)
    padded = []
    for im in ims:
        if im.ndim == 2:
            im = np.repeat(im[..., None], 3, -1)
        if im.shape[0] != h:
            import cv2

            im = cv2.resize(im, (int(im.shape[1] * h / im.shape[0]), h))
        padded.append(im[..., :3])
    return np.concatenate(padded, axis=1)
