"""Binarizer: per-video feature dicts -> the indexed record store.

Equivalent of `data_gen/runs/binarizer_th1kh.py:42-120`: each processed
video contributes one record {id, exp, euler, trans, f0, hubert|mel, blink,
images/segmaps or their directory}. Upstream feature extraction (resample,
MediaPipe segmentation/landmarks, 3DMM fit, HuBERT/mel/F0) runs host-side;
this module validates and packs.
"""

from __future__ import annotations

import os
from typing import Iterable

import numpy as np

from real3dportrait_tpu.data.indexed_dataset import IndexedDatasetBuilder

REQUIRED_KEYS = ("id", "exp", "euler", "trans", "f0")
AUDIO_KEYS = ("hubert", "mel")


def validate_record(rec: dict) -> dict:
    for k in REQUIRED_KEYS:
        assert k in rec, f"missing key {k}"
    assert any(k in rec for k in AUDIO_KEYS), "need hubert or mel features"
    t = len(rec["exp"])
    assert np.asarray(rec["exp"]).shape[-1] == 64
    assert np.asarray(rec["euler"]).shape == (t, 3)
    assert np.asarray(rec["trans"]).shape == (t, 3)
    audio_key = "hubert" if "hubert" in rec else "mel"
    t_audio = len(rec[audio_key])
    # audio features at 50Hz, motion at 25Hz
    assert abs(t_audio - 2 * t) <= 4, (t_audio, t)
    return rec


def binarize(records: Iterable[dict], out_path: str, compress: bool = False) -> int:
    """Write validated records; returns the number written."""
    os.makedirs(os.path.dirname(os.path.abspath(out_path)), exist_ok=True)
    n = 0
    with IndexedDatasetBuilder(out_path, compress=compress) as builder:
        for rec in records:
            builder.add_item(validate_record(rec))
            n += 1
    return n


def make_synthetic_records(n_videos: int = 2, t: int = 64, seed: int = 0,
                           audio_key: str = "hubert") -> list[dict]:
    """Small synthetic corpus for tests/smoke training."""
    rng = np.random.RandomState(seed)
    dim = 1024 if audio_key == "hubert" else 80
    recs = []
    for _ in range(n_videos):
        recs.append({
            "id": rng.randn(t, 80).astype(np.float32) * 0.1,
            "exp": rng.randn(t, 64).astype(np.float32) * 0.1,
            "euler": rng.randn(t, 3).astype(np.float32) * 0.1,
            "trans": rng.randn(t, 3).astype(np.float32) * 0.05,
            "f0": np.abs(rng.randn(2 * t)).astype(np.float32) * 200,
            audio_key: rng.randn(2 * t, dim).astype(np.float32),
            "blink": np.zeros((2 * t, 1), np.int64),
        })
    return recs
