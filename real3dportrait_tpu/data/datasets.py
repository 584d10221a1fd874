"""Task datasets over the indexed record store.

Equivalents of `tasks/os_avatar/dataset_utils/`:

* :class:`Audio2MotionDataset` — variable-length (hubert, f0, exp, blink)
  sequences, token-bucketed, padded to multiples of 8 frames
  (`audio2motion_dataset.py:116`);
* :class:`Motion2VideoDataset` — (src, tgt) frame pairs >= min_offset apart
  with images, SECC coefficients and camera (`motion2video_dataset.py:213`).

Record schema written by the binarizer (`binarizer_th1kh.py:42-120`):
``{'id', 'exp', 'euler', 'trans', 'f0', 'hubert' or 'mel', 'blink',
'img_dir' / packed images ...}`` per video.
"""

from __future__ import annotations

import numpy as np

from real3dportrait_tpu.data.collate import batch_by_size, collate_nd, make_mask, round_up
from real3dportrait_tpu.data.indexed_dataset import IndexedDataset


class Audio2MotionDataset:
    def __init__(self, path: str, cfg, shuffle: bool = True, seed: int = 0):
        self.ds = IndexedDataset(path)
        self.cfg = cfg
        self.shuffle = shuffle
        self.rng = np.random.RandomState(seed)
        self.audio_key = "hubert" if cfg.get("audio_type", "hubert") == "hubert" else "mel"
        self.sizes = []
        self.min_len = int(cfg.get("sample_min_length", 32))
        for item in self.ds:
            self.sizes.append(len(item["exp"]))

    def __len__(self):
        return len(self.ds)

    def _clip(self, item):
        t = len(item["exp"])
        max_t = min(t, int(self.cfg.get("max_frames", 600)))
        max_t -= max_t % 8
        start = self.rng.randint(0, max(t - max_t, 0) + 1) if self.shuffle else 0
        sl = slice(start, start + max_t)
        audio = np.asarray(item[self.audio_key], np.float32)
        return {
            "audio": audio[2 * start : 2 * (start + max_t)],
            "f0": np.asarray(item["f0"], np.float32)[2 * start : 2 * (start + max_t)],
            "y": np.asarray(item["exp"], np.float32)[sl],
            "blink": np.asarray(item.get("blink",
                                         np.zeros((t, 1), np.int64)))[2 * start : 2 * (start + max_t)],
            "id": np.asarray(item["id"], np.float32)[:1],
        }

    def batches(self):
        """Yield padded, token-bucketed batches indefinitely."""
        indices = [i for i in range(len(self)) if self.sizes[i] >= self.min_len]
        assert indices, "no sequences longer than sample_min_length"
        while True:
            if self.shuffle:
                self.rng.shuffle(indices)
            groups = batch_by_size(
                indices, self.sizes,
                max_tokens=int(self.cfg.get("max_tokens_per_batch", 20000)),
                max_sentences=int(self.cfg.get("max_sentences_per_batch", 512)),
            )
            for group in groups:
                items = [self._clip(self.ds[i]) for i in group]
                t_max = round_up(max(len(x["y"]) for x in items), 8)
                yield {
                    "audio": collate_nd([x["audio"] for x in items], max_len=2 * t_max),
                    "f0": collate_nd([x["f0"][:, None] for x in items],
                                     max_len=2 * t_max)[..., 0],
                    "y": collate_nd([x["y"] for x in items], max_len=t_max),
                    "y_mask": make_mask([len(x["y"]) for x in items], max_len=t_max),
                    "blink": collate_nd([x["blink"].astype(np.int32) for x in items],
                                        max_len=2 * t_max),
                    "mouth_amp": np.full((len(items), 1), 0.4, np.float32),
                }


class Motion2VideoDataset:
    """(src, tgt) frame-pair sampler for the secc2plane/torso stages."""

    def __init__(self, path: str, cfg, shuffle: bool = True, seed: int = 0,
                 min_offset: int = 25):
        self.ds = IndexedDataset(path)
        self.cfg = cfg
        self.shuffle = shuffle
        self.min_offset = min_offset
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.ds)

    def sample_pair(self, item) -> dict:
        t = len(item["exp"])
        i = self.rng.randint(0, t)
        lo, hi = max(0, i - self.min_offset), min(t - 1, i + self.min_offset)
        candidates = list(range(0, lo)) + list(range(hi + 1, t))
        j = self.rng.choice(candidates) if candidates else (t - 1 - i)
        out = {"src_idx": i, "tgt_idx": j}
        for k in ("id", "exp", "euler", "trans"):
            arr = np.asarray(item[k], np.float32)
            out[f"src_{k}"] = arr[i] if arr.ndim > 1 else arr
            out[f"tgt_{k}"] = arr[j] if arr.ndim > 1 else arr
        for k in ("head_imgs", "com_imgs", "torso_imgs", "bg_img", "segmaps"):
            if k in item:
                arr = item[k]
                out[f"src_{k}"] = arr[i] if k != "bg_img" else arr
                out[f"tgt_{k}"] = arr[j] if k != "bg_img" else arr
        return out

    def batches(self, batch_size: int | None = None):
        b = batch_size or int(self.cfg.get("batch_size", 4))
        while True:
            idxs = self.rng.randint(0, len(self.ds), size=b)
            pairs = [self.sample_pair(self.ds[int(i)]) for i in idxs]
            batch = {}
            for k in pairs[0]:
                batch[k] = np.stack([np.asarray(p[k]) for p in pairs])
            yield batch
