import numpy as np
import pytest

from real3dportrait_tpu.config import FrozenConfig
from real3dportrait_tpu.data import (
    Audio2MotionDataset,
    IndexedDataset,
    IndexedDatasetBuilder,
    Motion2VideoDataset,
    batch_by_size,
    collate_nd,
    make_mask,
)
from real3dportrait_tpu.data.binarizer import binarize, make_synthetic_records


def test_indexed_dataset_roundtrip(tmp_path):
    path = str(tmp_path / "store")
    items = [{"a": np.arange(i + 1), "s": f"item{i}"} for i in range(5)]
    with IndexedDatasetBuilder(path) as b:
        for it in items:
            b.add_item(it)
    ds = IndexedDataset(path)
    assert len(ds) == 5
    for i, it in enumerate(ds):
        np.testing.assert_array_equal(it["a"], items[i]["a"])
        assert it["s"] == items[i]["s"]
    # random access
    assert ds[3]["s"] == "item3"
    ds.close()


def test_indexed_dataset_append_and_compress(tmp_path):
    path = str(tmp_path / "store")
    with IndexedDatasetBuilder(path, compress=True) as b:
        b.add_item({"x": np.zeros(100)})
    with IndexedDatasetBuilder(path, append=True) as b:
        b.add_item({"x": np.ones(100)})
    ds = IndexedDataset(path)
    assert len(ds) == 2
    np.testing.assert_array_equal(ds[1]["x"], 1.0)


def test_collate_and_mask():
    items = [np.ones((3, 2)), np.ones((5, 2)) * 2]
    out = collate_nd(items)
    assert out.shape == (2, 5, 2)
    assert out[0, 3:].sum() == 0
    mask = make_mask([3, 5])
    np.testing.assert_array_equal(mask[0], [1, 1, 1, 0, 0])


def test_batch_by_size_budgets():
    sizes = [10, 20, 30, 40, 100]
    batches = batch_by_size(list(range(5)), sizes, max_tokens=80, max_sentences=3)
    # every batch respects the token budget: len(batch) * max_size <= 80
    for b in batches:
        assert len(b) * max(sizes[i] for i in b) <= 80 or len(b) == 1
        assert len(b) <= 3
    assert sorted(i for b in batches for i in b) == list(range(5))


def test_binarize_and_audio2motion_dataset(tmp_path):
    path = str(tmp_path / "a2m")
    n = binarize(make_synthetic_records(n_videos=3, t=64), path)
    assert n == 3
    cfg = FrozenConfig({"audio_type": "hubert", "sample_min_length": 32,
                        "max_frames": 48, "max_tokens_per_batch": 2000,
                        "max_sentences_per_batch": 8})
    ds = Audio2MotionDataset(path, cfg, seed=0)
    batch = next(ds.batches())
    b, t = batch["y"].shape[:2]
    assert t % 8 == 0 and t <= 48
    assert batch["audio"].shape == (b, 2 * t, 1024)
    assert batch["f0"].shape == (b, 2 * t)
    assert batch["y_mask"].shape == (b, t)
    assert batch["blink"].shape == (b, 2 * t, 1)


def test_binarize_rejects_bad_record(tmp_path):
    recs = make_synthetic_records(1)
    del recs[0]["exp"]
    with pytest.raises(AssertionError):
        binarize(recs, str(tmp_path / "bad"))


def test_motion2video_pairs(tmp_path):
    path = str(tmp_path / "m2v")
    recs = make_synthetic_records(n_videos=2, t=64)
    for r in recs:
        r["head_imgs"] = np.zeros((64, 8, 8, 3), np.float32)
    binarize(recs, path)
    cfg = FrozenConfig({"batch_size": 3})
    ds = Motion2VideoDataset(path, cfg, seed=0, min_offset=10)
    batch = next(ds.batches())
    assert batch["src_exp"].shape == (3, 64)
    assert batch["tgt_euler"].shape == (3, 3)
    assert batch["src_head_imgs"].shape == (3, 8, 8, 3)
    # pairs respect the ADAPTIVE minimum offset (`motion2video_dataset.py:
    # 298-301`): min(cap, max((t-1-j)//2, j//2)) for t=64, cap=10
    j = batch["tgt_idx"]
    min_off = np.minimum(10, np.maximum((63 - j) // 2, j // 2))
    assert np.all(np.abs(batch["src_idx"] - j) >= min_off)
    # neighbor-frame perturbed expressions and their mirrors (`:290-294`)
    assert batch["tgt_pertube_exp_1"].shape == (3, 64)
    np.testing.assert_allclose(
        batch["tgt_pertube_exp_2"], 2 * batch["tgt_exp"] - batch["tgt_pertube_exp_1"],
        rtol=1e-5, atol=1e-6,
    )


def test_syncnet_dataset_mining_mix(tmp_path):
    from real3dportrait_tpu.data import SyncNetDataset

    path = str(tmp_path / "sync")
    binarize(make_synthetic_records(n_videos=3, t=40), path)
    # shipped mode: full 468-landmark motion rep (lm_dim = 1404)
    cfg = FrozenConfig({"syncnet_num_clip_pairs": 40})
    ds = SyncNetDataset(path, cfg, seed=0)
    batch = next(ds.batches())
    # fixed clip-batch shapes: 5-frame mouth window, 10-frame audio window
    assert batch["mouth_clip"].shape == (40, 5, 468 * 3)
    # legacy lip mode still slices the 20 mouth points of the 68-lm set
    ds_lip = SyncNetDataset(path, FrozenConfig(
        {"syncnet_num_clip_pairs": 8, "syncnet_keypoint_mode": "lip"}), seed=0)
    assert next(ds_lip.batches())["mouth_clip"].shape == (8, 5, 60)
    assert batch["hubert_clip"].shape == (40, 10, 1024)
    assert batch["label"].shape == (40,)
    # the reference's phase mix 0.4/0.3/0.2/0.1 (`audio_lm3d_syncnet.py:174`)
    from collections import Counter

    mix = Counter(batch["phase"])
    assert mix == {"pos": 16, "neg_small": 12, "neg_large": 8, "neg_swap": 4}
    labels_by_phase = {
        ph: batch["label"][i] for i, ph in enumerate(batch["phase"])
    }
    assert labels_by_phase["pos"] == 1.0
    assert all(batch["label"][i] == 0.0 for i, ph in enumerate(batch["phase"])
               if ph != "pos")
    # mouth clips carry real landmark structure, not zeros
    assert float(np.abs(batch["mouth_clip"]).max()) > 0


@pytest.mark.slow  # fast-tier budget (>15 s on a 1-CPU box)
def test_syncnet_task_consumes_mined_batches(tmp_path):
    import jax

    from real3dportrait_tpu.training.tasks.syncnet_task import SyncNetTask

    binarize(make_synthetic_records(n_videos=2, t=40),
             str(tmp_path / "train"))
    cfg = FrozenConfig({"binary_data_dir": str(tmp_path),
                        "syncnet_num_clip_pairs": 16, "batch_size": 4})
    task = SyncNetTask(cfg)
    batch = next(iter(task.train_data()))
    assert "phase" not in batch  # stripped before the jitted step
    state = task.build(jax.random.PRNGKey(0))
    state, metrics = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))
