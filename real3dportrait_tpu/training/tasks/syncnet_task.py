"""SyncNet training task.

Equivalent of `tasks/os_avatar/audio_lm3d_syncnet.py:34`: trains the
audio/mouth-landmark sync discriminator with BCE on cosine similarity over
positive and mined-negative clip pairs. Negative mining (same-person
temporal offsets + cross-person swaps, ratios 0.4/0.3/0.2/0.1) happens in
:class:`real3dportrait_tpu.data.datasets.SyncNetDataset`; the step consumes
fixed-shape (hubert_clip, mouth_clip, label) batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from real3dportrait_tpu.models.syncnet import LandmarkHubertSyncNet, cal_sync_loss
from real3dportrait_tpu.training.schedulers import exponential_schedule
from real3dportrait_tpu.training.tasks.base_task import BaseTask
from real3dportrait_tpu.training.train_state import TrainState


class SyncNetTask(BaseTask):
    def __init__(self, cfg):
        super().__init__(cfg)
        # syncnet_keypoint_mode mirrors `audio_lm3d_syncnet.py:52-64`: the
        # shipped lineage is lm468 (468 mediapipe landmarks x 3 = 1404-d).
        mode = cfg.get("syncnet_keypoint_mode", "lm468")
        self.lm_dim = {"lip": 60, "centered_lip": 60, "centered_lip2d": 40,
                       "lm68": 68 * 3, "lm468": 468 * 3}[mode]
        self.model = LandmarkHubertSyncNet(
            lm_dim=self.lm_dim,
            audio_dim=1024,
            num_layers_per_block=int(cfg.get("syncnet_num_layers_per_block", 3)),
            base_hid_size=int(cfg.get("syncnet_base_hid_size", 128)),
            out_dim=int(cfg.get("syncnet_out_hid_size", 1024)),
        )
        schedule = exponential_schedule(
            float(cfg.get("lr", 1e-3)),
            float(cfg.get("lr_decay_rate", 0.98)),
            int(cfg.get("lr_decay_interval", 5000)),
        )
        from real3dportrait_tpu.training.schedulers import with_grad_accumulation

        self.optimizer = with_grad_accumulation(optax.adam(schedule), cfg)

    def build(self, rng) -> TrainState:
        hubert = jnp.zeros((1, 10, 1024))
        mouth = jnp.zeros((1, 5, self.lm_dim))
        variables = self.model.init(rng, hubert, mouth)
        params = variables["params"]
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params={"syncnet": params},
            variables={},
            opt_states={"syncnet": self.optimizer.init(params)},
            extra={},
        )

    def _loss(self, params, batch):
        audio_emb, mouth_emb = self.model.apply(
            {"params": params}, batch["hubert_clip"], batch["mouth_clip"]
        )
        loss, sim = cal_sync_loss(audio_emb, mouth_emb, batch["label"])
        return jnp.mean(loss), {"sync_bce": jnp.mean(loss), "cos_sim": jnp.mean(sim)}

    def train_step(self, state: TrainState, batch, rng):
        (loss, metrics), grads = jax.value_and_grad(
            lambda p: self._loss(p, batch), has_aux=True
        )(state.params["syncnet"])
        updates, opt_state = self.optimizer.update(
            grads, state.opt_states["syncnet"], state.params["syncnet"]
        )
        params = optax.apply_updates(state.params["syncnet"], updates)
        metrics["total_loss"] = loss
        return (
            state.replace(
                step=state.step + 1,
                params={"syncnet": params},
                opt_states={"syncnet": opt_state},
            ),
            metrics,
        )

    def val_step(self, state, batch, rng):
        loss, metrics = self._loss(state.params["syncnet"], batch)
        return {"val_loss": loss, **{f"val_{k}": v for k, v in metrics.items()}}

    def _mined_batches(self, split: str, shuffle: bool, seed: int):
        import os

        store = os.path.join(str(self.cfg.get("binary_data_dir", "")), split)
        if not os.path.isfile(store + ".idx"):
            return None
        from real3dportrait_tpu.data.datasets import SyncNetDataset

        ds = SyncNetDataset(store, self.cfg, shuffle=shuffle, seed=seed)
        # the 'phase' key is a host-side list of strings (mix diagnostics);
        # strip it before the batch crosses into the jitted step
        return ({k: v for k, v in b.items() if k != "phase"}
                for b in ds.batches())

    def train_data(self):
        real = self._mined_batches("train", True, int(self.cfg.get("seed", 0)))
        yield from (real if real is not None else super().train_data())

    def val_data(self):
        real = self._mined_batches("val", False, 1234)
        yield from (real if real is not None else super().val_data())

    def synthetic_batch(self, rng: np.random.RandomState) -> dict:
        b = int(self.cfg.get("batch_size", 4))
        label = (rng.rand(b) > 0.5).astype(np.float32)
        return {
            "hubert_clip": rng.randn(b, 10, 1024).astype(np.float32),
            "mouth_clip": rng.randn(b, 5, self.lm_dim).astype(np.float32),
            "label": label,
        }
