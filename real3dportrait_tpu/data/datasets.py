"""Task datasets over the indexed record store.

Equivalents of `tasks/os_avatar/dataset_utils/`:

* :class:`Audio2MotionDataset` — variable-length (hubert, f0, exp, blink)
  sequences, token-bucketed, padded to multiples of 8 frames
  (`audio2motion_dataset.py:116`);
* :class:`Motion2VideoDataset` — (src, tgt) frame pairs >= min_offset apart
  with images, SECC coefficients and camera (`motion2video_dataset.py:213`);
* :class:`SyncNetDataset` — mined (audio, mouth-landmark, label) clip pairs
  with the reference's positive/negative phase mix
  (`audio_lm3d_syncnet.py:174-251`, `syncnet_dataset.py:56-82`).

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


class SyncNetDataset:
    """Clip-pair miner for the SyncNet stage.

    Yields fixed-shape batches ``{'hubert_clip' [N,10,A], 'mouth_clip'
    [N,5,60], 'label' [N]}`` with the reference's phase mix
    (`audio_lm3d_syncnet.py:174-183`): positives 0.4, same-person
    small-temporal-offset negatives 0.3 (offset in +-[2,5] frames),
    large-offset negatives 0.2 (+-[5,10]), cross-person negatives 0.1
    (random-offset audio from a different video). A 5-frame mouth window
    (0.2 s at 25 fps) pairs with a 10-frame audio window (50 Hz features),
    `audio_lm3d_syncnet.py:171-173`.

    TPU-native notes: mining is host-side numpy over the binarized store, so
    the jitted step always sees the same static clip-batch shape (one
    compile); mouth landmarks come from the same jitted
    ``reconstruct_idexp_lm3d`` graph the audio2motion stage uses and are
    cached per video.
    """

    PHASES = (("pos", 0.4), ("neg_small", 0.3), ("neg_large", 0.2),
              ("neg_swap", 0.1))
    CLIP_LEN = 5  # video frames; audio clips are 2x (`:171-173`)

    def __init__(self, path: str, cfg, assets=None, shuffle: bool = True,
                 seed: int = 0, cache_videos: int = 64):
        self.ds = IndexedDataset(path)
        self.cfg = cfg
        self.rng = np.random.RandomState(seed)
        # landmark rep must match the task's model input dims
        # (`audio_lm3d_syncnet.py:143-160`): lip/centered modes slice the
        # 20 mouth points of the 68-lm set; lm68/lm468 feed the full set
        self.keypoint_mode = cfg.get("syncnet_keypoint_mode", "lm468")
        if assets is None:
            from real3dportrait_tpu.geometry import load_or_synthetic_bfm

            assets = load_or_synthetic_bfm(
                cfg.get("bfm_dir"),
                keypoint_mode="mediapipe" if self.keypoint_mode == "lm468"
                else "lm68",
            )
        self.assets = assets
        self.audio_key = ("hubert" if cfg.get("audio_type", "hubert") == "hubert"
                          else "mel")
        self.cache_videos = cache_videos
        self._cache: dict[int, tuple[np.ndarray, np.ndarray]] = {}

    def __len__(self):
        return len(self.ds)

    def _mouth_and_audio(self, idx: int) -> tuple[np.ndarray, np.ndarray]:
        """Cached ([t,lm_dim] landmark offsets, [2t,A] audio) per video."""
        if idx not in self._cache:
            import jax.numpy as jnp

            from real3dportrait_tpu.geometry.face3d_helper import (
                reconstruct_idexp_lm3d,
            )

            item = self.ds[idx]
            exp = np.asarray(item["exp"], np.float32)
            t = len(exp)
            idc = np.asarray(item["id"], np.float32).reshape(-1, 80)
            if len(idc) != t:  # global id -> broadcast (`syncnet_dataset.py:67`)
                idc = np.broadcast_to(idc[:1], (t, 80))
            lm = np.asarray(reconstruct_idexp_lm3d(
                self.assets, jnp.asarray(idc), jnp.asarray(exp)))
            if self.keypoint_mode in ("lm68", "lm468"):
                mouth = lm.reshape(t, -1)  # full landmark motion rep
            else:
                mouth = lm[:, 48:68].reshape(t, -1)
            audio = np.asarray(item[self.audio_key], np.float32)
            t = min(t, len(audio) // 2)
            if len(self._cache) >= self.cache_videos:
                self._cache.pop(next(iter(self._cache)))
            self._cache[idx] = (mouth[:t], audio[: 2 * t])
        return self._cache[idx]

    def _usable(self) -> list[int]:
        need = self.CLIP_LEN + 11  # room for the largest offset
        idxs = [i for i in range(len(self.ds))
                if len(self.ds[i]["exp"]) >= need]
        assert idxs, f"no videos with >= {need} frames for syncnet mining"
        return idxs

    def mine_clip(self, phase: str, idxs: list[int]) -> tuple:
        L = self.CLIP_LEN
        rng = self.rng
        i = idxs[rng.randint(len(idxs))]
        mouth, audio = self._mouth_and_audio(i)
        t = len(mouth)
        if phase == "pos":
            offset = 0
        elif phase == "neg_small":
            offset = int(rng.choice([-1, 1])) * rng.randint(2, 6)
        elif phase == "neg_large":
            offset = int(rng.choice([-1, 1])) * rng.randint(5, 11)
        else:  # neg_swap: random offset, audio from a different video
            offset = rng.randint(-10, 11)
        t0 = rng.randint(max(0, -offset), t - L - max(0, offset) + 1)
        mouth_clip = mouth[t0 : t0 + L]
        if phase == "neg_swap" and len(idxs) > 1:
            j = idxs[rng.randint(len(idxs))]
            while j == i:
                j = idxs[rng.randint(len(idxs))]
            _, audio = self._mouth_and_audio(j)
            a0 = min(2 * (t0 + offset), len(audio) - 2 * L)
        else:
            a0 = 2 * (t0 + offset)
        audio_clip = audio[a0 : a0 + 2 * L]
        return mouth_clip, audio_clip, (1.0 if phase == "pos" else 0.0), phase

    def batches(self, num_clip_pairs: int | None = None):
        n = num_clip_pairs or int(self.cfg.get("syncnet_num_clip_pairs", 256))
        counts = {k: int(n * r) for k, r in self.PHASES}
        counts["pos"] += n - sum(counts.values())  # remainder -> positives
        idxs = self._usable()
        while True:
            mouth_lst, mel_lst, labels, phases = [], [], [], []
            for phase, count in counts.items():
                for _ in range(count):
                    m, a, lab, ph = self.mine_clip(phase, idxs)
                    mouth_lst.append(m)
                    mel_lst.append(a)
                    labels.append(lab)
                    phases.append(ph)
            yield {
                "hubert_clip": np.stack(mel_lst),
                "mouth_clip": np.stack(mouth_lst),
                "label": np.asarray(labels, np.float32),
                "phase": phases,  # host-side diagnostic; dropped before jit
            }


class Motion2VideoDataset:
    """(src, tgt) frame-pair sampler for the secc2plane/torso stages
    (`motion2video_dataset.py:213-341`).

    Reference parity: the temporal offset between the pair is adaptive —
    ``min(max_offset, max((t-1-j)//2, j//2))`` with resampling (`:298-301`)
    — and each frame carries neighbor-frame perturbed expressions
    ``*_pertube_exp_1`` (the +-1-frame exp) and ``*_pertube_exp_2`` (its
    mirror ``2*exp - exp_1``, `:290-294,336-339`) that feed the SECC-plane
    Laplacian regularizer of the task.
    """

    def __init__(self, path: str, cfg, shuffle: bool = True, seed: int = 0,
                 min_offset: int | None = None):
        self.ds = IndexedDataset(path)
        self.cfg = cfg
        self.shuffle = shuffle
        # cfg-driven cap on the adaptive offset (reference hardcodes 50)
        self.max_offset = int(min_offset if min_offset is not None
                              else cfg.get("sample_pair_max_offset", 50))
        self.rng = np.random.RandomState(seed)

    def __len__(self):
        return len(self.ds)

    def _pertube_exps(self, exp: np.ndarray, i: int) -> tuple:
        """Neighbor-frame perturbation pair for frame i (`:290-294`)."""
        t = len(exp)
        cands = [k for k in (i - 1, i + 1) if 0 <= k < t]
        p1 = exp[int(self.rng.choice(cands))]
        return p1, 2.0 * exp[i] - p1

    def sample_pair(self, item) -> dict:
        t = len(item["exp"])
        i = self.rng.randint(0, t)
        # adaptive min offset with resampling (`:298-301`): pairs near the
        # clip edges accept smaller offsets instead of being rejected forever
        j = self.rng.randint(0, t)
        for _ in range(20):
            min_off = min(self.max_offset, max((t - 1 - j) // 2, j // 2))
            if abs(j - i) >= min_off:
                break
            j = self.rng.randint(0, t)
        out = {"src_idx": i, "tgt_idx": j}
        for k in ("id", "exp", "euler", "trans"):
            arr = np.asarray(item[k], np.float32)
            out[f"src_{k}"] = arr[i] if arr.ndim > 1 else arr
            out[f"tgt_{k}"] = arr[j] if arr.ndim > 1 else arr
        exp = np.asarray(item["exp"], np.float32)
        (out["src_pertube_exp_1"],
         out["src_pertube_exp_2"]) = self._pertube_exps(exp, i)
        (out["tgt_pertube_exp_1"],
         out["tgt_pertube_exp_2"]) = self._pertube_exps(exp, j)
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
