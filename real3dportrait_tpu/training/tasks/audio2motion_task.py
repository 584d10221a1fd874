"""Audio2Motion VAE training task.

Equivalent of `tasks/os_avatar/audio2motion_task.py:26`: trains the
pitch-conditioned flow-VAE with cyclically annealed KL, masked MSE on
expression coefficients and on reconstructed 3D landmarks (eye/lip
weighted), temporal laplacian smoothness, L2 magnitude regularization, and
an optional frozen-syncnet lip-sync loss over random 5-frame clips.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from real3dportrait_tpu.geometry import face3d_helper, load_or_synthetic_bfm
from real3dportrait_tpu.models.audio2motion import PitchContourVAEModel
from real3dportrait_tpu.models.syncnet import LandmarkHubertSyncNet, cal_sync_loss
from real3dportrait_tpu.training import losses as L
from real3dportrait_tpu.training.schedulers import build_schedule
from real3dportrait_tpu.training.tasks.base_task import BaseTask
from real3dportrait_tpu.training.train_state import TrainState


class Audio2MotionTask(BaseTask):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.model = PitchContourVAEModel(
            in_out_dim=64,
            audio_in_dim=1024 if cfg.get("audio_type", "hubert") == "hubert" else 80,
            use_prior_flow=bool(cfg.get("use_flow", True)),
            use_pitch=bool(cfg.get("use_pitch", True)),
            use_mouth_amp_embed=bool(cfg.get("use_mouth_amp_embed", True)),
            use_eye_amp_embed=bool(cfg.get("use_eye_amp_embed", False)),
        )
        # the reference trains audio2motion against MEDIAPIPE-468 landmarks
        # (`audio2motion_task.py:50`, Face3DHelper(keypoint_mode='mediapipe'))
        self.keypoint_mode = cfg.get("audio2motion_keypoint_mode", "mediapipe")
        self.assets = load_or_synthetic_bfm(cfg.get("bfm_dir"),
                                            keypoint_mode=self.keypoint_mode)
        from real3dportrait_tpu.training.schedulers import with_grad_accumulation

        self.optimizer = with_grad_accumulation(optax.chain(
            optax.clip_by_global_norm(float(cfg.get("clip_grad_norm", 1.0)) or 1e9),
            optax.adam(
                build_schedule(cfg),
                b1=float(cfg.get("optimizer_adam_beta1", 0.9)),
                b2=float(cfg.get("optimizer_adam_beta2", 0.999)),
            ),
        ), cfg)
        self.use_syncnet = bool(cfg.get("syncnet_ckpt_dir")) and float(
            cfg.get("lambda_sync", 0.0)
        ) > 0
        if self.use_syncnet:
            # lm468 feeds ALL 468x3 idexp landmarks to the syncnet
            # (`audio2motion_task.py:51,185`); lm68 modes feed the 20-point
            # mouth slice (48:68)
            self.sync_lm_dim = (468 * 3 if self.keypoint_mode == "mediapipe"
                                else 60)
            self.syncnet = LandmarkHubertSyncNet(
                lm_dim=self.sync_lm_dim,
                base_hid_size=int(cfg.get("syncnet_base_hid_size", 128)),
                out_dim=int(cfg.get("syncnet_out_hid_size", 1024)),
            )

    def build(self, rng) -> TrainState:
        batch = jax.tree_util.tree_map(jnp.asarray,
                                       self.synthetic_batch(np.random.RandomState(0)))
        r1, r2 = jax.random.split(rng)
        variables = self.model.init({"params": r1, "noise": r2}, batch, train=True)
        params = {"model": variables["params"]}
        extra = {}
        if self.use_syncnet:
            sv = self.syncnet.init(r1, jnp.zeros((1, 10, 1024)),
                                   jnp.zeros((1, 5, self.sync_lm_dim)))
            from real3dportrait_tpu.training import checkpoint as ckpt

            restored, _ = ckpt.get_last_checkpoint(self.cfg["syncnet_ckpt_dir"])
            sync_params = sv["params"]
            if restored is not None:
                from flax import serialization

                merged, stats = ckpt.partial_load(
                    serialization.to_state_dict({"p": sync_params}),
                    restored.get("params", restored),
                    prefix_map={"syncnet": "p"},
                )
                sync_params = serialization.from_state_dict({"p": sync_params}, merged)["p"]
            params["syncnet"] = jax.tree_util.tree_map(jnp.asarray, sync_params)
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            variables={},
            opt_states={"model": self.optimizer.init(params["model"])},
            extra=extra,
        )

    # ------------------------------------------------------------------

    def _losses(self, params, state, batch, rng):
        cfg = self.cfg
        out = self.model.apply({"params": params["model"]}, batch, train=True,
                               rngs={"noise": rng})
        pred, mask = out["pred"], batch["y_mask"]
        gt = batch["y"]
        losses = {
            "mse_exp": L.masked_mse(pred, gt, mask[..., None]),
            "lap_exp": L.temporal_laplacian(pred, mask),
            "l2_reg_exp": jnp.mean(jnp.square(pred)),
            "kl": out["loss_kl"],
        }
        # landmark-space loss: idexp lm3d from predicted vs gt exp
        idc = jnp.zeros((pred.shape[0] * pred.shape[1], 80))
        pred_lm = face3d_helper.reconstruct_idexp_lm3d(
            self.assets, idc, pred.reshape(-1, 64)
        ).reshape(pred.shape[0], pred.shape[1], -1, 3)
        gt_lm = face3d_helper.reconstruct_idexp_lm3d(
            self.assets, idc, gt.reshape(-1, 64)
        ).reshape(*pred_lm.shape)
        losses["mse_lm3d"] = L.weighted_lm3d_mse(pred_lm, gt_lm, mask,
                                                 n_landmarks=pred_lm.shape[2])

        if self.use_syncnet:
            # random 5-frame clips (`audio2motion_task.py:194-216`)
            t = pred.shape[1]
            n_clips = min(int(cfg.get("syncnet_num_clip_pairs", 8192)) // 64, t - 5)
            starts = jax.random.randint(jax.random.fold_in(rng, 1), (n_clips,), 0,
                                        t - 5)
            if self.keypoint_mode == "mediapipe":
                # full 468-landmark motion rep (`audio2motion_task.py:185`)
                mouth = pred_lm.reshape(pred.shape[0], t, -1)
            else:
                mouth = pred_lm[:, :, 48:68].reshape(pred.shape[0], t, -1)
            hub = batch["audio"]

            def clip_at(s):
                return (
                    jax.lax.dynamic_slice_in_dim(hub, 2 * s, 10, axis=1),
                    jax.lax.dynamic_slice_in_dim(mouth, s, 5, axis=1),
                )

            hub_clips, mouth_clips = jax.vmap(clip_at)(starts)
            hub_clips = hub_clips.reshape(-1, 10, hub.shape[-1])
            mouth_clips = mouth_clips.reshape(-1, 5, mouth.shape[-1])
            a_emb, m_emb = self.syncnet.apply({"params": params["syncnet"]},
                                              hub_clips, mouth_clips)
            sync_loss, _ = cal_sync_loss(jax.lax.stop_gradient(a_emb), m_emb, 1.0)
            losses["sync"] = jnp.mean(sync_loss)

        weights = {
            "mse_exp": float(cfg.get("lambda_mse_exp", 0.5)),
            "mse_lm3d": float(cfg.get("lambda_mse_lm3d", 0.5)),
            "lap_exp": float(cfg.get("lambda_lap_exp", 1.0)),
            "l2_reg_exp": float(cfg.get("lambda_l2_reg_exp", 0.1)),
            "sync": float(cfg.get("lambda_sync", 0.0)),
        }
        kl_w = L.kl_annealing_weight(
            state.step, float(cfg.get("lambda_kl", 0.02)),
            int(cfg.get("lambda_kl_t1", 2000)), int(cfg.get("lambda_kl_t2", 2000)),
        )
        total = L.weighted_loss_sum(losses, weights) + kl_w * losses["kl"]
        return total, losses

    def train_step(self, state: TrainState, batch, rng):
        def loss_fn(model_params):
            params = dict(state.params)
            params["model"] = model_params
            return self._losses(params, state, batch, rng)

        (total, losses), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            state.params["model"]
        )
        updates, opt_state = self.optimizer.update(
            grads, state.opt_states["model"], state.params["model"]
        )
        new_params = dict(state.params)
        new_params["model"] = optax.apply_updates(state.params["model"], updates)
        metrics = dict(losses)
        metrics["total_loss"] = total
        metrics["grad_norm"] = optax.global_norm(grads)
        return (
            state.replace(step=state.step + 1, params=new_params,
                          opt_states={"model": opt_state}),
            metrics,
        )

    def val_step(self, state, batch, rng):
        total, losses = self._losses(state.params, state, batch, rng)
        return {"val_loss": total, **{f"val_{k}": v for k, v in losses.items()}}

    def train_data(self):
        """Binarized dataset when available; synthetic smoke batches otherwise."""
        import os

        store = os.path.join(str(self.cfg.get("binary_data_dir", "")), "train")
        if os.path.isfile(store + ".idx"):
            from real3dportrait_tpu.data import Audio2MotionDataset

            ds = Audio2MotionDataset(store, self.cfg, shuffle=True,
                                     seed=int(self.cfg.get("seed", 0)))
            yield from ds.batches()
        else:
            yield from super().train_data()

    def val_data(self):
        import os

        store = os.path.join(str(self.cfg.get("binary_data_dir", "")), "val")
        if os.path.isfile(store + ".idx"):
            from real3dportrait_tpu.data import Audio2MotionDataset

            ds = Audio2MotionDataset(store, self.cfg, shuffle=False, seed=1234)
            yield from ds.batches()
        else:
            yield from super().val_data()

    def synthetic_batch(self, rng: np.random.RandomState) -> dict:
        b = int(self.cfg.get("batch_size", 2))
        t50 = 2 * int(self.cfg.get("sample_min_length", 32))
        audio_dim = 1024 if self.cfg.get("audio_type", "hubert") == "hubert" else 80
        return {
            "audio": rng.randn(b, t50, audio_dim).astype(np.float32),
            "f0": np.abs(rng.randn(b, t50)).astype(np.float32) * 200,
            "y": (rng.randn(b, t50 // 2, 64) * 0.1).astype(np.float32),
            "y_mask": np.ones((b, t50 // 2), np.float32),
            "blink": np.zeros((b, t50, 1), np.int32),
            "mouth_amp": np.full((b, 1), 0.4, np.float32),
        }
