"""EG3D generator training (the teacher for img2plane distillation).

Equivalent of the reference `tasks/eg3ds/eg3d_task.py` (task_cls of
`egs/egs_bases/eg3d/base.yaml`): adversarial training of the
TriPlaneGenerator against the camera-conditioned dual discriminator with
generator-pose conditioning swap (gpc_reg_prob), R1 lazy regularization,
density regularization, and generator EMA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from real3dportrait_tpu.geometry import fov_to_intrinsics, pack_camera, sample_uniform_pose
from real3dportrait_tpu.models.dual_discriminator import DualDiscriminator
from real3dportrait_tpu.models.eg3d import TriPlaneGenerator
from real3dportrait_tpu.training import losses as L
from real3dportrait_tpu.training.tasks.base_task import BaseTask
from real3dportrait_tpu.training.train_state import TrainState


class EG3DTask(BaseTask):
    def __init__(self, cfg):
        super().__init__(cfg)
        self.gen = TriPlaneGenerator(
            z_dim=int(cfg.get("z_dim", 512)),
            w_dim=int(cfg.get("w_dim", 512)),
            plane_resolution=int(cfg.get("teacher_plane_resolution", 256)),
            triplane_hid_dim=int(cfg.get("triplane_hid_dim", 32)),
            neural_rendering_resolution=int(cfg.get("neural_rendering_resolution", 128)),
            final_resolution=int(cfg.get("final_resolution", 512)),
            channel_base=int(cfg.get("base_channel", 32768)),
            channel_max=int(cfg.get("max_channel", 512)),
            mapping_layers=int(cfg.get("mapping_network_depth", 2)),
            sr_num_fp16_res=int(cfg.get("num_fp16_layers_in_super_resolution", 4)),
            num_samples_coarse=int(cfg.get("num_samples_coarse", 48)),
            num_samples_fine=int(cfg.get("num_samples_fine", 48)),
        )
        self.disc = DualDiscriminator(
            img_resolution=int(cfg.get("final_resolution", 512)),
            channel_base=int(cfg.get("base_channel", 32768)),
            channel_max=int(cfg.get("max_channel", 512)),
            num_fp16_res=int(cfg.get("num_fp16_layers_in_discriminator", 4)),
            mbstd_group_size=int(cfg.get("group_size_for_mini_batch_std", 2)),
        )
        from real3dportrait_tpu.training.schedulers import with_grad_accumulation

        self.opt_g = with_grad_accumulation(optax.adam(
            float(cfg.get("lr_g", 0.0025)),
            b1=float(cfg.get("optimizer_adam_beta1_g", 0.0)),
            b2=float(cfg.get("optimizer_adam_beta2_g", 0.99))), cfg)
        self.opt_d = with_grad_accumulation(optax.adam(
            float(cfg.get("lr_d", 0.002)),
            b1=float(cfg.get("optimizer_adam_beta1_d", 0.0)),
            b2=float(cfg.get("optimizer_adam_beta2_d", 0.99))), cfg)

    def build(self, rng) -> TrainState:
        b = int(self.cfg.get("batch_size", 4))
        r1, r2, r3 = jax.random.split(rng, 3)
        z = jnp.zeros((b, self.gen.z_dim))
        cam = jnp.asarray(self.synthetic_batch(np.random.RandomState(0))["camera"])
        gen_vars = self.gen.init({"params": r1, "noise": r2}, z, cam)
        res = self.gen.neural_rendering_resolution
        final = self.gen.final_resolution
        disc_vars = self.disc.init(
            r3, jnp.zeros((b, final, final, 3)), jnp.zeros((b, res, res, 3)), cam
        )
        params = {
            "gen": gen_vars["params"],
            "disc": disc_vars["params"],
            "gen_ema": jax.tree_util.tree_map(jnp.copy, gen_vars["params"]),
        }
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            variables={k: v for k, v in gen_vars.items() if k != "params"},
            opt_states={"gen": self.opt_g.init(params["gen"]),
                        "disc": self.opt_d.init(params["disc"])},
            extra={},
        )

    def _gen_images(self, gen_params, state, batch, rng):
        cfg = self.cfg
        rz, rswap, rnoise = jax.random.split(rng, 3)
        b = batch["camera"].shape[0]
        z = jax.random.normal(rz, (b, self.gen.z_dim))
        # generator pose conditioning swap: with prob gpc_reg_prob the
        # mapping sees a different camera than the one rendered
        swap = jax.random.bernoulli(rswap, float(cfg.get("gpc_reg_prob", 0.5)), (b, 1))
        cond_cam = jnp.where(swap, batch["camera_swap"], batch["camera"])
        variables = {"params": gen_params, **state.variables}
        ws = self.gen.apply(variables, z, cond_cam,
                            method=lambda m, zz, cc: m.map_latents(zz, cc))
        out = self.gen.apply(variables, ws, batch["camera"],
                             method=lambda m, w, c: m.synthesis(w, c))
        return out

    def _g_loss(self, gen_params, disc_params, state, batch, rng):
        cfg = self.cfg
        rg, rreg = jax.random.split(rng)
        out = self._gen_images(gen_params, state, batch, rg)
        fake_logits = self.disc.apply(
            {"params": jax.lax.stop_gradient(disc_params)},
            out["image"], out["image_raw"], batch["camera"],
        )
        losses = {"adv": L.g_nonsaturating_loss(fake_logits)}

        # density regularization every reg_interval_g (lazy, grads flow
        # through the plane backbone like the reference's run_G_reg)
        reg_g = int(cfg.get("reg_interval_g", 4))
        variables = {"params": gen_params, **state.variables}

        def density(_):
            return L.density_regularization(
                lambda pts: self.gen.apply(
                    variables, out["plane"], pts, None,
                    method=lambda m, p, c, d: m.sample_points(p, c, d),
                ),
                rreg, box_warp=float(cfg.get("box_warp", 1.0)),
                p_dist=float(cfg.get("density_reg_p_dist", 0.004)),
            )

        losses["density_reg"] = jax.lax.cond(
            (state.step % reg_g) == 0, density, lambda _: jnp.asarray(0.0), None
        )
        total = losses["adv"] + (
            float(cfg.get("lambda_density_reg", 0.25)) * reg_g * losses["density_reg"]
        )
        return total, (losses, out)

    def train_step(self, state: TrainState, batch, rng):
        cfg = self.cfg
        rg, rd = jax.random.split(rng)
        (g_total, (losses, out)), g_grads = jax.value_and_grad(
            self._g_loss, has_aux=True
        )(state.params["gen"], state.params["disc"], state, batch, rg)
        reg_val = losses["density_reg"]

        g_updates, g_opt = self.opt_g.update(g_grads, state.opt_states["gen"],
                                             state.params["gen"])
        gen_params = optax.apply_updates(state.params["gen"], g_updates)

        def d_loss_fn(disc_params):
            real_logits = self.disc.apply({"params": disc_params}, batch["real_img"],
                                          batch["real_raw"], batch["camera"])
            fake_logits = self.disc.apply(
                {"params": disc_params},
                jax.lax.stop_gradient(out["image"]),
                jax.lax.stop_gradient(out["image_raw"]), batch["camera"],
            )
            return L.d_logistic_loss(real_logits, fake_logits)

        d_total, d_grads = jax.value_and_grad(d_loss_fn)(state.params["disc"])
        reg_d = int(cfg.get("reg_interval_d", 16))
        do_r1 = (state.step % reg_d) == 0

        def r1_branch(p):
            def r1_value(pp):
                return L.r1_penalty(
                    lambda i, r, c: self.disc.apply({"params": pp}, i, r, c),
                    batch["real_img"], batch["real_raw"], batch["camera"],
                )
            return jax.value_and_grad(r1_value)(p)

        r1_val, r1_grads = jax.lax.cond(
            do_r1, r1_branch,
            lambda p: (jnp.asarray(0.0), jax.tree_util.tree_map(jnp.zeros_like, p)),
            state.params["disc"],
        )
        gp_w = float(cfg.get("lambda_gradient_penalty", 5.0)) / 2.0 * reg_d
        d_grads = jax.tree_util.tree_map(lambda g, r: g + gp_w * r, d_grads, r1_grads)
        d_updates, d_opt = self.opt_d.update(d_grads, state.opt_states["disc"],
                                             state.params["disc"])
        disc_params = optax.apply_updates(state.params["disc"], d_updates)

        beta = 0.5 ** (1.0 / max(float(cfg.get("ema_interval", 400)), 1.0))
        gen_ema = jax.tree_util.tree_map(
            lambda e, p: e * beta + p * (1 - beta), state.params["gen_ema"], gen_params
        )
        metrics = {"total_loss": g_total, "g/adv": losses["adv"],
                   "g/density_reg": reg_val, "d/loss": d_total, "d/r1": r1_val}
        return (
            state.replace(
                step=state.step + 1,
                params={"gen": gen_params, "disc": disc_params, "gen_ema": gen_ema},
                opt_states={"gen": g_opt, "disc": d_opt},
            ),
            metrics,
        )

    def val_step(self, state, batch, rng):
        total, (losses, _) = self._g_loss(state.params["gen"], state.params["disc"],
                                          state, batch, rng)
        return {"val_loss": total, **{f"val_{k}": v for k, v in losses.items()}}

    def synthetic_batch(self, rng: np.random.RandomState) -> dict:
        b = int(self.cfg.get("batch_size", 4))
        final = int(self.cfg.get("final_resolution", 512))
        res = int(self.cfg.get("neural_rendering_resolution", 128))
        key = jax.random.PRNGKey(rng.randint(0, 2**31 - 1))
        k1, k2 = jax.random.split(key)
        intr = fov_to_intrinsics()
        return {
            "camera": np.asarray(pack_camera(sample_uniform_pose(k1, b), intr)),
            "camera_swap": np.asarray(pack_camera(sample_uniform_pose(k2, b), intr)),
            "real_img": rng.uniform(-1, 1, (b, final, final, 3)).astype(np.float32),
            "real_raw": rng.uniform(-1, 1, (b, res, res, 3)).astype(np.float32),
        }
