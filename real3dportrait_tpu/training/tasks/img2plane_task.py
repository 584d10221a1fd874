"""Img2plane distillation from a frozen EG3D teacher.

Equivalent of `tasks/os_avatar/img2plane_task.py:61`: the teacher
TriPlaneGenerator samples z and renders a reference view and a novel
(multi-view) view; the student OSAvatarImg2Plane reconstructs both from the
teacher's reference image. Losses: L1 + perceptual on image and raw,
adversarial vs the dual discriminator (gated on ``start_adv_iters``),
R1, and density regularization. The teacher's params live in
``state.params['teacher']`` and receive no gradients (listed in
``not_save_modules``).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from real3dportrait_tpu.geometry import fov_to_intrinsics, pack_camera, sample_uniform_pose
from real3dportrait_tpu.models.dual_discriminator import DualDiscriminator
from real3dportrait_tpu.models.eg3d import TriPlaneGenerator
from real3dportrait_tpu.models.img2plane import OSAvatarImg2Plane
from real3dportrait_tpu.training import losses as L
from real3dportrait_tpu.training.tasks.base_task import BaseTask
from real3dportrait_tpu.training.train_state import TrainState


class Img2PlaneTask(BaseTask):
    def __init__(self, cfg):
        super().__init__(cfg)
        common = dict(
            triplane_hid_dim=int(cfg.get("triplane_hid_dim", 32)),
            neural_rendering_resolution=int(cfg.get("neural_rendering_resolution", 128)),
            final_resolution=int(cfg.get("final_resolution", 512)),
            num_samples_coarse=int(cfg.get("num_samples_coarse", 48)),
            num_samples_fine=int(cfg.get("num_samples_fine", 48)),
            sr_num_fp16_res=int(cfg.get("num_fp16_layers_in_super_resolution", 4)),
        )
        self.student = OSAvatarImg2Plane(
            triplane_depth=int(cfg.get("triplane_depth", 3)),
            triplane_feature_type=cfg.get("triplane_feature_type", "trigrid"),
            backbone_scale=cfg.get("img2plane_backbone_scale", "b0"),
            sr_channel0=int(cfg.get("sr_channel0", 256)),
            sr_channel1=int(cfg.get("sr_channel1", 128)),
            **common,
        )
        self.teacher = TriPlaneGenerator(
            z_dim=int(cfg.get("z_dim", 512)),
            w_dim=int(cfg.get("w_dim", 512)),
            plane_resolution=int(cfg.get("teacher_plane_resolution", 256)),
            channel_base=int(cfg.get("base_channel", 32768)),
            channel_max=int(cfg.get("max_channel", 512)),
            mapping_layers=int(cfg.get("mapping_network_depth", 2)),
            **common,
        )
        self.disc = DualDiscriminator(
            img_resolution=int(cfg.get("final_resolution", 512)),
            channel_base=int(cfg.get("base_channel", 32768)),
            channel_max=int(cfg.get("max_channel", 512)),
            num_fp16_res=int(cfg.get("num_fp16_layers_in_discriminator", 4)),
            mbstd_group_size=int(cfg.get("group_size_for_mini_batch_std", 2)),
        )
        from real3dportrait_tpu.training.schedulers import (
            gan_lr_schedule, with_grad_accumulation,
        )

        # base LR warmup + stepped decay + 1e-5 floor (`img2plane_task.py:
        # 43-58` ScheduleForImg2Plane); group gates scale updates in the step
        decay = float(cfg.get("lr_decay_rate", 0.95))
        interval = int(cfg.get("lr_decay_interval", 5000))
        warm = int(cfg.get("warmup_updates", 0))
        self.opt_g = with_grad_accumulation(optax.adam(
            gan_lr_schedule(float(cfg.get("lr_g", 1e-4)), decay, interval,
                            warm, floor=1e-5),
            b1=float(cfg.get("optimizer_adam_beta1_g", 0.0)),
            b2=float(cfg.get("optimizer_adam_beta2_g", 0.99))), cfg)
        self.opt_d = with_grad_accumulation(optax.adam(
            float(cfg.get("lr_d", 2e-4)),
            b1=float(cfg.get("optimizer_adam_beta1_d", 0.0)),
            b2=float(cfg.get("optimizer_adam_beta2_d", 0.99))), cfg)

    def build(self, rng) -> TrainState:
        cfg = self.cfg
        b = int(cfg.get("batch_size", 1))
        final = int(cfg.get("final_resolution", 512))
        r1, r2, r3, r4 = jax.random.split(rng, 4)
        img = jnp.zeros((b, final, final, 3))
        cam = jnp.asarray(self.synthetic_batch(np.random.RandomState(0))["camera"])
        student_vars = self.student.init({"params": r1, "noise": r2}, img, cam)
        teacher_vars = self.teacher.init(
            {"params": r3, "noise": r2}, jnp.zeros((b, self.teacher.z_dim)), cam
        )
        res = self.student.neural_rendering_resolution
        disc_vars = self.disc.init(r4, img, jnp.zeros((b, res, res, 3)), cam)
        params = {
            "student": student_vars["params"],
            "teacher": teacher_vars["params"],
            "disc": disc_vars["params"],
        }
        variables = {
            "student": {k: v for k, v in student_vars.items() if k != "params"},
            "teacher": {k: v for k, v in teacher_vars.items() if k != "params"},
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            variables=variables,
            opt_states={
                "gen": self.opt_g.init(params["student"]),
                "disc": self.opt_d.init(params["disc"]),
            },
            extra={},
        )

    # -- teacher batch preparation (`img2plane_task.py:175-203`) --------------

    def prepare_batch(self, state, batch, rng):
        r_z, r_pose = jax.random.split(rng)
        b = batch["camera"].shape[0]
        z = jax.random.normal(r_z, (b, self.teacher.z_dim))
        tvars = {"params": jax.lax.stop_gradient(state.params["teacher"]),
                 **state.variables["teacher"]}
        ref_cam = batch["camera"]
        mv_cam = batch["camera_mv"]
        ref = self.teacher.apply(tvars, z, ref_cam, noise_mode="const")
        mv = self.teacher.apply(tvars, z, mv_cam, noise_mode="const")
        return {
            "ref_img": jax.lax.stop_gradient(ref["image"]),
            "ref_raw": jax.lax.stop_gradient(ref["image_raw"]),
            "mv_img": jax.lax.stop_gradient(mv["image"]),
            "mv_raw": jax.lax.stop_gradient(mv["image_raw"]),
            "ref_cam": ref_cam,
            "mv_cam": mv_cam,
        }

    def _g_loss(self, student_params, disc_params, state, prepared, rng):
        cfg = self.cfg
        svars = {"params": student_params, **state.variables["student"]}
        planes = self.student.apply(svars, prepared["ref_img"],
                                    method=lambda m, i: m.cal_cano_plane(i))
        out_ref = self.student.apply(svars, prepared["ref_img"], prepared["ref_cam"],
                                     planes=planes)
        out_mv = self.student.apply(svars, prepared["ref_img"], prepared["mv_cam"],
                                    planes=planes)
        losses = {
            "mse_ref": L.masked_l1(out_ref["image"], prepared["ref_img"]),
            "mse_ref_raw": L.masked_l1(out_ref["image_raw"], prepared["ref_raw"]),
            "mse_mv": L.masked_l1(out_mv["image"], prepared["mv_img"]),
            "mse_mv_raw": L.masked_l1(out_mv["image_raw"], prepared["mv_raw"]),
            "percep": L.laplacian_pyramid_loss(out_mv["image"], prepared["mv_img"]),
        }
        fake_logits = self.disc.apply(
            {"params": jax.lax.stop_gradient(disc_params)},
            out_mv["image"], out_mv["image_raw"], prepared["mv_cam"],
        )
        adv_on = (state.step >= int(cfg.get("start_adv_iters", 30000))).astype(jnp.float32)
        losses["adv"] = L.g_nonsaturating_loss(fake_logits) * adv_on
        weights = {
            "mse_ref": float(cfg.get("lambda_mse", 1.0)),
            "mse_ref_raw": float(cfg.get("lambda_mse", 1.0)),
            "mse_mv": float(cfg.get("lambda_mse", 1.0)),
            "mse_mv_raw": float(cfg.get("lambda_mse", 1.0)),
            "percep": float(cfg.get("lambda_lpips", 0.5)),
            "adv": float(cfg.get("lambda_adv", 0.002)),
        }
        total = L.weighted_loss_sum(losses, weights)
        return total, (losses, out_mv)

    def train_step(self, state: TrainState, batch, rng):
        cfg = self.cfg
        r_prep, r_g = jax.random.split(rng)
        prepared = self.prepare_batch(state, batch, r_prep)

        (g_total, (losses, out_mv)), g_grads = jax.value_and_grad(
            self._g_loss, has_aux=True
        )(state.params["student"], state.params["disc"], state, prepared, r_g)
        g_updates, g_opt = self.opt_g.update(
            g_grads, state.opt_states["gen"], state.params["student"]
        )
        # per-group gates on the *updates* (ScheduleForImg2Plane param
        # groups, `img2plane_task.py:51-55`): backbone from step 0, decoder
        # from min(2000, start_adv), SR (pretrained from EG3D) from start_adv
        start_adv = int(cfg.get("start_adv_iters", 30000))
        step = state.step
        gates = {
            "decoder": (step >= min(2000, start_adv)).astype(jnp.float32),
            "superresolution": (step >= start_adv).astype(jnp.float32),
        }
        g_updates = {
            k: jax.tree_util.tree_map(
                lambda u: u * gates.get(k, jnp.asarray(1.0)), sub)
            for k, sub in g_updates.items()
        }
        student_params = optax.apply_updates(state.params["student"], g_updates)

        def d_loss_fn(disc_params):
            real_logits = self.disc.apply({"params": disc_params},
                                          prepared["mv_img"], prepared["mv_raw"],
                                          prepared["mv_cam"])
            fake_logits = self.disc.apply(
                {"params": disc_params},
                jax.lax.stop_gradient(out_mv["image"]),
                jax.lax.stop_gradient(out_mv["image_raw"]),
                prepared["mv_cam"],
            )
            return L.d_logistic_loss(real_logits, fake_logits)

        d_total, d_grads = jax.value_and_grad(d_loss_fn)(state.params["disc"])

        reg_d = int(cfg.get("reg_interval_d", 16))
        do_r1 = (state.step % reg_d) == 0

        def r1_branch(p):
            def r1_value(pp):
                return L.r1_penalty(
                    lambda i, r, c: self.disc.apply({"params": pp}, i, r, c),
                    prepared["mv_img"], prepared["mv_raw"], prepared["mv_cam"],
                )
            return jax.value_and_grad(r1_value)(p)

        r1_val, r1_grads = jax.lax.cond(
            do_r1, r1_branch,
            lambda p: (jnp.asarray(0.0), jax.tree_util.tree_map(jnp.zeros_like, p)),
            state.params["disc"],
        )
        gp_w = float(cfg.get("lambda_gradient_penalty", 5.0)) / 2.0 * reg_d
        d_grads = jax.tree_util.tree_map(lambda g, r: g + gp_w * r, d_grads, r1_grads)
        d_updates, d_opt = self.opt_d.update(
            d_grads, state.opt_states["disc"], state.params["disc"]
        )
        disc_params = optax.apply_updates(state.params["disc"], d_updates)

        metrics = {f"g/{k}": v for k, v in losses.items()}
        metrics.update({"total_loss": g_total, "d/loss": d_total, "d/r1": r1_val})
        new_params = dict(state.params)
        new_params["student"] = student_params
        new_params["disc"] = disc_params
        return (
            state.replace(step=state.step + 1, params=new_params,
                          opt_states={"gen": g_opt, "disc": d_opt}),
            metrics,
        )

    def val_step(self, state, batch, rng):
        prepared = self.prepare_batch(state, batch, rng)
        total, (losses, _) = self._g_loss(
            state.params["student"], state.params["disc"], state, prepared, rng
        )
        return {"val_loss": total, **{f"val_{k}": v for k, v in losses.items()}}

    def synthetic_batch(self, rng: np.random.RandomState) -> dict:
        """Camera-only batches (`motion2video_dataset.py:103-209`,
        Img2Plane_Dataset): poses sampled ±26° pitch / ±38° yaw."""
        b = int(self.cfg.get("batch_size", 1))
        key = jax.random.PRNGKey(rng.randint(0, 2**31 - 1))
        k1, k2 = jax.random.split(key)
        intr = fov_to_intrinsics()
        return {
            "camera": np.asarray(pack_camera(sample_uniform_pose(k1, b), intr)),
            "camera_mv": np.asarray(pack_camera(sample_uniform_pose(k2, b), intr)),
        }
