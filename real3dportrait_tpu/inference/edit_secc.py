"""SECC eye editing: pixel-space eyelid interpolation for blinks.

Equivalent of `inference/edit_secc.py:47` (blink_eye_for_secc) +
the periodic blink injection of `inference/real3d_infer.py:411-426`.

Because the BFM eyeball faces are removed before rasterization, the eye
openings appear as background-colored holes inside the face region; closing
the eye by ``p`` lowers the upper eyelid across each hole column. This is a
vectorized numpy re-design of the reference's per-column KNN/erosion loop.
"""

from __future__ import annotations

import numpy as np


def _eye_holes(secc: np.ndarray) -> np.ndarray:
    """[H,W,3] secc in [-1,1] -> bool mask of eye holes (bg inside eye region)."""
    h, w = secc.shape[:2]
    face = np.any(secc > -0.99, axis=-1)
    prior = np.zeros((h, w), bool)
    prior[h // 4 : h // 2, w // 4 : 3 * w // 4] = True
    return (~face) & prior


def blink_eye_for_secc(secc: np.ndarray, close_percent: float = 0.5) -> np.ndarray:
    """Close the eyes of one SECC map [H,W,3] by ``close_percent`` in [0,1]."""
    if close_percent <= 0:
        return secc
    secc = secc.copy()
    holes = _eye_holes(secc)
    if not holes.any():
        return secc
    h = secc.shape[0]
    cols = np.nonzero(holes.any(axis=0))[0]
    row_idx = np.arange(h)
    for c in cols:
        rows = row_idx[holes[:, c]]
        top, bot = rows.min(), rows.max()
        lid = max(top - 1, 0)
        new_top = int(round(top + close_percent * (bot - top)))
        # upper eyelid (skin color just above the hole) slides down
        secc[top : new_top + 1, c] = secc[lid, c]
    return secc


def inject_blink_to_secc_sequence(
    secc_seq: np.ndarray,
    fps: int = 25,
    period_s: float = 5.0,
    blink_frames: int = 5,
    seed: int = 0,
) -> np.ndarray:
    """Add periodic blinks to [T,H,W,3] SECC maps (`real3d_infer.py:411`).

    Every ~period_s a blink with a triangular close-open profile over
    ``blink_frames`` frames is applied.
    """
    t = len(secc_seq)
    out = secc_seq.copy()
    rng = np.random.RandomState(seed)
    period = int(period_s * fps)
    profile = np.concatenate([
        np.linspace(0.25, 1.0, blink_frames // 2 + 1)[1:],
        np.linspace(1.0, 0.25, blink_frames - blink_frames // 2),
    ])
    start = rng.randint(period // 2, period)
    while start + len(profile) < t:
        for k, p in enumerate(profile):
            out[start + k] = blink_eye_for_secc(out[start + k], float(p))
        start += period + rng.randint(-fps, fps)
    return out
