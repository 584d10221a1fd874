import pytest

# heavy end-to-end module: excluded from the fast gating tier
pytestmark = pytest.mark.slow
import os

import jax
import jax.numpy as jnp
import numpy as np

from real3dportrait_tpu.config import FrozenConfig
from real3dportrait_tpu.data.binarizer import binarize, make_synthetic_records

TINY_GAN = {
    "batch_size": 1,
    "final_resolution": 32,
    "neural_rendering_resolution": 8,
    "secc_cond_resolution": 32,
    "triplane_hid_dim": 8,
    "triplane_depth": 2,
    "num_samples_coarse": 6,
    "num_samples_fine": 6,
    "sr_channel0": 16,
    "sr_channel1": 8,
    "base_channel": 256,
    "max_channel": 32,
    "num_fp16_layers_in_discriminator": 0,
    "num_fp16_layers_in_super_resolution": 0,
    "group_size_for_mini_batch_std": 1,
    "reg_interval_g": 2,
    "reg_interval_d": 2,
    "update_src2src_interval": 2,
    "start_adv_iters": 0,
    "stop_update_i2p_iters": 100,
    "group_warmup_iters": 0,
    "start_update_sr_iters": 0,
    "torso_model_scale": "tiny",
}


def _make_store(tmp_path, with_images=True):
    recs = make_synthetic_records(n_videos=2, t=40)
    if with_images:
        rng = np.random.RandomState(0)
        for r in recs:
            r["head_imgs"] = rng.randint(0, 255, (40, 32, 32, 3), dtype=np.uint8)
            r["com_imgs"] = rng.randint(0, 255, (40, 32, 32, 3), dtype=np.uint8)
            r["torso_imgs"] = rng.randint(0, 255, (40, 32, 32, 3), dtype=np.uint8)
            r["segmaps"] = rng.randint(0, 6, (40, 32, 32)).astype(np.int8)
            r["bg_img"] = rng.randint(0, 255, (32, 32, 3), dtype=np.uint8)
    binarize(recs, os.path.join(str(tmp_path), "train"))


def test_secc_task_trains_from_records(tmp_path):
    from real3dportrait_tpu.training.tasks.secc_img2plane_task import SeccImg2PlaneTask

    _make_store(tmp_path)
    cfg = FrozenConfig({**TINY_GAN, "binary_data_dir": str(tmp_path)})
    task = SeccImg2PlaneTask(cfg)
    batch = next(iter(task.train_data()))
    assert batch["src_img"].shape == (1, 32, 32, 3)
    assert batch["secc_cond"].shape == (1, 32, 32, 9)
    assert batch["camera"].shape == (1, 25)
    state = task.build(jax.random.PRNGKey(0))
    state, metrics = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(metrics["total_loss"]))


def test_torso_task_trains_from_records(tmp_path):
    from real3dportrait_tpu.training.tasks.secc_img2plane_torso_task import (
        SeccImg2PlaneTorsoTask,
    )

    _make_store(tmp_path)
    cfg = FrozenConfig({**TINY_GAN, "binary_data_dir": str(tmp_path)})
    task = SeccImg2PlaneTorsoTask(cfg)
    batch = next(iter(task.train_data()))
    assert batch["ref_torso_img"].shape == (1, 32, 32, 3)
    assert batch["segmap"].shape == (1, 32, 32, 6)
    assert batch["kp_src"].shape == (1, 68, 3)
    # kp in [-1,1]
    assert float(jnp.abs(batch["kp_src"]).max()) <= 1.5
    state = task.build(jax.random.PRNGKey(0))
    state, metrics = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(metrics["total_loss"]))
