"""SECC-conditioned motion-to-plane GAN training.

Functional redesign of `tasks/os_avatar/secc_img2plane_task.py:69`: one
train_step performs the generator update then the discriminator update
(the reference's per-optimizer loop, `utils/commons/trainer.py:369`), all
step-indexed statefulness expressed as data:

* src2src self-reconstruction every ``update_src2src_interval`` steps
  (input selection by step, `secc_img2plane_task.py:261`);
* adversarial terms gated on ``start_adv_iters``; two-stage training
  freezes the NeRF subtrees via gradient gates when adv starts
  (`:549-559`), and the cano img2plane backbone after
  ``stop_update_i2p_iters``;
* EG3D density regularization every ``reg_interval_g`` (lazy, via cond);
* R1 penalty every ``reg_interval_d`` with interval-scaled weight;
* SECC-perturbation plane regularization with a self-tuning lambda carried
  in ``state.extra`` (`:433-464`, adaptive update `:592-613`).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import optax

from real3dportrait_tpu.geometry import fov_to_intrinsics, lookat_pose, pack_camera
from real3dportrait_tpu.models.dual_discriminator import DualDiscriminator
from real3dportrait_tpu.models.img2plane import OSAvatarSECCImg2Plane
from real3dportrait_tpu.training import losses as L
from real3dportrait_tpu.training.tasks.base_task import BaseTask
from real3dportrait_tpu.training.train_state import TrainState


class SeccImg2PlaneTask(BaseTask):
    GEN_CLS = OSAvatarSECCImg2Plane

    def __init__(self, cfg):
        super().__init__(cfg)
        from real3dportrait_tpu.models.perceptual import make_perceptual_fn

        # VGG19 LPIPS when cfg['vgg19_ckpt'] has converted weights, else the
        # Laplacian-pyramid surrogate (`img2plane_task.py:62-70`)
        self.percep_fn, self.percep_kind = make_perceptual_fn(cfg)
        self.gen = self.build_generator(cfg)
        self.disc = DualDiscriminator(
            img_resolution=int(cfg.get("final_resolution", 512)),
            channel_base=int(cfg.get("base_channel", 32768)),
            channel_max=int(cfg.get("max_channel", 512)),
            num_fp16_res=int(cfg.get("num_fp16_layers_in_discriminator", 4)),
            mbstd_group_size=int(cfg.get("group_size_for_mini_batch_std", 2)),
            disc_c_noise=0.0,
        )
        from real3dportrait_tpu.training.schedulers import (
            gan_lr_schedule, with_grad_accumulation,
        )

        # base LR: warmup + stepped decay + floor (`ScheduleForLM3DImg2Plane
        # EG3D`, ref `secc_img2plane_task.py:40-66`); per-group ramps/gates
        # multiply the updates in ``train_step`` (see ``_grad_gates``)
        decay = float(cfg.get("lr_decay_rate", 0.95))
        interval = int(cfg.get("lr_decay_interval", 5000))
        warm = int(cfg.get("warmup_updates", 0))
        self.opt_g = with_grad_accumulation(optax.adam(
            gan_lr_schedule(float(cfg.get("lr_g", 1e-4)), decay, interval, warm),
            b1=float(cfg.get("optimizer_adam_beta1_g", 0.0)),
            b2=float(cfg.get("optimizer_adam_beta2_g", 0.99)),
        ), cfg)
        self.opt_d = with_grad_accumulation(optax.adam(
            gan_lr_schedule(float(cfg.get("lr_d", 2e-4)), decay, interval, warm),
            b1=float(cfg.get("optimizer_adam_beta1_d", 0.0)),
            b2=float(cfg.get("optimizer_adam_beta2_d", 0.99)),
        ), cfg)

    def build_generator(self, cfg):
        return OSAvatarSECCImg2Plane(
            triplane_hid_dim=int(cfg.get("triplane_hid_dim", 32)),
            triplane_depth=int(cfg.get("triplane_depth", 3)),
            triplane_feature_type=cfg.get("triplane_feature_type", "trigrid"),
            neural_rendering_resolution=int(cfg.get("neural_rendering_resolution", 128)),
            final_resolution=int(cfg.get("final_resolution", 512)),
            backbone_mode=cfg.get("img2plane_backbone_mode", "segformer"),
            backbone_scale=cfg.get("img2plane_backbone_scale", "b0"),
            head_norm_mode=cfg.get("head_norm_mode", "gn"),
            secc_segformer_scale=cfg.get("secc_segformer_scale", "b0"),
            pncc_cond_mode=cfg.get("pncc_cond_mode", "cano_src_tgt"),
            plane_fusion_mode=cfg.get("phase1_plane_fusion_mode", "add"),
            sr_num_fp16_res=int(cfg.get("num_fp16_layers_in_super_resolution", 4)),
            num_samples_coarse=int(cfg.get("num_samples_coarse", 48)),
            num_samples_fine=int(cfg.get("num_samples_fine", 48)),
            sr_channel0=int(cfg.get("sr_channel0", 256)),
            sr_channel1=int(cfg.get("sr_channel1", 128)),
        )

    # -- init -------------------------------------------------------------

    def _gen_apply_kwargs(self, batch):
        """Per-task forward inputs; overridden by the torso task."""
        return {}

    def build(self, rng) -> TrainState:
        batch = jax.tree_util.tree_map(
            jnp.asarray, self.synthetic_batch(np.random.RandomState(0))
        )
        r1, r2, r3 = jax.random.split(rng, 3)
        # jit the inits: eager (op-by-op) flax init of these graphs costs
        # minutes of dispatch overhead on CPU; compiled init is seconds.
        gen_vars = jax.jit(self.gen.init)(
            {"params": r1, "noise": r2},
            batch["src_img"], batch["camera"], secc=batch["secc_cond"],
            **self._gen_apply_kwargs(batch),
        )
        disc_vars = jax.jit(self.disc.init)(
            r3, batch["tgt_img"],
            jnp.zeros_like(batch["tgt_img"][:, : self.gen.neural_rendering_resolution,
                                            : self.gen.neural_rendering_resolution]),
            batch["camera"],
        )
        params = {"gen": gen_vars["params"], "disc": disc_vars["params"]}
        if bool(self.cfg.get("use_gen_ema", True)):
            # EMA snapshot of the generator used for eval/inference
            # (reference `ema_interval`, EG3D convention)
            params["gen_ema"] = jax.tree_util.tree_map(jnp.copy, gen_vars["params"])
        return TrainState(
            step=jnp.zeros((), jnp.int32),
            params=params,
            variables={k: v for k, v in gen_vars.items() if k != "params"},
            opt_states={
                "gen": self.opt_g.init(params["gen"]),
                "disc": self.opt_d.init(params["disc"]),
            },
            extra={
                "lambda_pertube_secc": jnp.asarray(
                    float(self.cfg.get("lambda_pertube_secc_init", 0.0))
                ),
                "lambda_pertube_blink_secc": jnp.asarray(
                    float(self.cfg.get("lambda_pertube_blink_secc_init", 0.0))
                ),
            },
        )

    @property
    def ema_beta(self) -> float:
        # half-life of ema_interval steps: beta = 0.5 ** (1/interval)
        interval = float(self.cfg.get("ema_interval", 400))
        return 0.5 ** (1.0 / max(interval, 1.0))

    # -- per-param-group LR multipliers ------------------------------------

    def _grad_gates(self, step) -> dict:
        """Per-group LR multipliers, applied to the *updates* in train_step
        (the torch ``param_groups[i]['lr']`` ramps of
        ``ScheduleForLM3DImg2PlaneEG3D``, ref `secc_img2plane_task.py:49-66`
        — under Adam's normalization a gradient-side multiplier would be a
        no-op, so it must scale the update):

        * cano img2plane: ``lr_mul_cano_img2plane * min(1, step/(start_adv
          +20000))`` warmup ramp, 0 until ``group_warmup_iters`` and after
          ``stop_update_i2p_iters``;
        * secc img2plane: 1 during stage 1;
        * decoder: 0 until ``group_warmup_iters``;
        * superresolution: 0 until ``start_update_sr_iters`` (the SR comes
          pretrained from EG3D, ref hardcodes 30 000).

        The two-stage gates (`:549-559`: adv start freezes the NeRF
        subtrees) compose multiplicatively.
        """
        cfg = self.cfg
        step_f = jnp.asarray(step, jnp.float32)
        start_adv = int(cfg.get("start_adv_iters", 200000))
        stop_i2p = int(cfg.get("stop_update_i2p_iters", 70000))
        group_warm = int(cfg.get("group_warmup_iters", 6000))
        start_sr = int(cfg.get("start_update_sr_iters", 30000))
        two_stage = bool(cfg.get("two_stage_training", True))
        also_dec = bool(cfg.get("also_update_decoder", False))
        in_stage1 = (step < start_adv) if two_stage else jnp.asarray(True)
        ramp = jnp.minimum(1.0, step_f / float(start_adv + 20000))
        i2p = float(cfg.get("lr_mul_cano_img2plane", 1.0)) * ramp
        return {
            "img2plane_backbone": jnp.where(
                (step >= group_warm) & (step < stop_i2p) & in_stage1, i2p, 0.0
            ),
            "secc_img2plane_backbone": jnp.where(in_stage1, 1.0, 0.0),
            "decoder": jnp.where(
                (in_stage1 | also_dec) & (step >= group_warm), 1.0, 0.0
            ),
            "superresolution": jnp.where(step >= start_sr, 1.0, 0.0),
        }

    @staticmethod
    def _apply_gates(updates: dict, gates: dict) -> dict:
        out = {}
        for key, sub in updates.items():
            gate = gates.get(key, jnp.asarray(1.0))
            out[key] = jax.tree_util.tree_map(lambda g: g * gate, sub)
        return out

    # -- generator losses ----------------------------------------------------

    def _gen_forward(self, gen_params, state, batch, rng):
        variables = {"params": gen_params, **state.variables}

        def fwd(img, camera, secc):
            return self.gen.apply(
                variables, img, camera, secc=secc, key=rng,
                **self._gen_apply_kwargs(batch),
            )

        if bool(self.cfg.get("remat_generator", False)):
            # rematerialize backbone activations in the backward pass: trades
            # FLOPs for HBM, enabling larger batches (jax.checkpoint)
            fwd = jax.checkpoint(fwd)
        return fwd(batch["src_img"], batch["camera"], batch["secc_cond"])

    def _recon_losses(self, out, batch, losses: dict):
        cfg = self.cfg
        res = self.gen.neural_rendering_resolution
        tgt = batch["tgt_img"]
        tgt_raw = jax.image.resize(
            tgt, (tgt.shape[0], res, res, tgt.shape[-1]), "linear"
        )
        losses["mse"] = L.masked_l1(out["image"], tgt, clamp_quantile=0.95)
        losses["mse_raw"] = L.masked_l1(out["image_raw"], tgt_raw, clamp_quantile=0.95)
        losses["percep"] = self.percep_fn(out["image"], tgt)
        if "lip_center" in batch:
            # mouth-crop L1 + perceptual — the loss that makes a *talking*
            # head articulate (`secc_img2plane_task.py:294-307`)
            size = int(cfg.get("lip_rect_size", max(tgt.shape[1] // 5, 8)))
            losses["lip_mae"], losses["lip_percep"] = L.lip_crop_losses(
                out["image"], tgt, batch["lip_center"], size, self.percep_fn
            )
        if "head_mask" in batch:
            mask_raw = jax.image.resize(
                batch["head_mask"].astype(jnp.float32),
                (tgt.shape[0], res, res, 1), "nearest",
            )
            losses["weights_l1"] = L.weights_mask_match_loss(out["weights_img"], mask_raw)
        losses["weights_entropy"] = L.weights_entropy_loss(out["weights_img"])
        return losses

    def _maybe_src2src(self, state, batch) -> dict:
        """src2src every N steps: the target becomes the source frame itself
        (`secc_img2plane_task.py:261`). Applied once per step so G and D see
        the same camera-consistent (real, fake, conditioning) triple."""
        interval = int(self.cfg.get("update_src2src_interval", 16))
        if interval <= 0:
            return batch
        is_s2s = (state.step % interval) == 0
        batch = dict(batch)
        batch["tgt_img"] = jnp.where(is_s2s, batch["src_img"], batch["tgt_img"])
        batch["secc_cond"] = jnp.where(
            is_s2s, batch["secc_cond_src"], batch["secc_cond"]
        )
        batch["camera"] = jnp.where(is_s2s, batch["camera_src"], batch["camera"])
        if "lip_center" in batch and "lip_center_src" in batch:
            batch["lip_center"] = jnp.where(
                is_s2s, batch["lip_center_src"], batch["lip_center"]
            )
        return batch

    def _g_loss(self, gen_params, disc_params, state, batch, rng):
        cfg = self.cfg
        step = state.step
        r_fwd, r_reg, r_pert = jax.random.split(rng, 3)

        out = self._gen_forward(gen_params, state, batch, r_fwd)
        losses: dict = {}
        self._recon_losses(out, batch, losses)
        if "facev2v_losses" in out:
            losses.update(out["facev2v_losses"])

        # adversarial, gated on start_adv_iters
        fake_logits = self.disc.apply(
            {"params": jax.lax.stop_gradient(disc_params)},
            out["image"], out["image_raw"], batch["camera"],
        )
        adv_on = (step >= int(cfg.get("start_adv_iters", 200000))).astype(jnp.float32)
        losses["adv"] = L.g_nonsaturating_loss(fake_logits) * adv_on

        # density regularization every reg_interval_g
        reg_g = int(cfg.get("reg_interval_g", 4))
        do_reg = (step % reg_g) == 0

        def density(_):
            variables = {"params": gen_params, **state.variables}
            return L.density_regularization(
                lambda pts: self.gen.apply(
                    variables, out["plane"], pts, None,
                    method=lambda m, p, c, d: m.sample_points(p, c, d),
                ),
                r_reg,
                box_warp=float(cfg.get("box_warp", 1.0)),
                p_dist=float(cfg.get("density_reg_p_dist", 0.004)),
            )

        losses["density_reg"] = jax.lax.cond(
            do_reg, density, lambda _: jnp.asarray(0.0), None
        )

        # SECC-conditioning regularizers every ``reg_interval_g_cond`` steps
        # (`secc_img2plane_task.py:185-226,430-462`): perturbed / blinked tgt
        # SECCs must map to planes close to the original / interpolated ones.
        # All variants run through ONE batched cal_secc_plane (stacked on the
        # batch axis): tracing k separate backbone applies multiplies HLO
        # size — and compile time — by k, while a single k*B-row apply is one
        # subgraph and fills the MXU better. lax.cond skips it on off steps;
        # the weights are interval-scaled like the reference's lazy R1.
        reg_cond = int(cfg.get("reg_interval_g_cond", 4))
        do_cond = ((step + 1) % reg_cond) == 0
        variables = {"params": gen_params, **state.variables}

        pertube_mode = cfg.get("secc_pertube_mode", "randn")
        use_pertube = pertube_mode != "none"
        use_blink = "blink_secc_1" in batch
        variant_keys = []
        if use_pertube:
            variant_keys.append("__base__")
            variant_keys.append(
                "pertube_secc_1" if "pertube_secc_1" in batch else "__randn__"
            )
            if pertube_mode == "laplacian" and "pertube_secc_2" in batch:
                variant_keys.append("pertube_secc_2")
        if use_blink:
            variant_keys += ["blink_secc_1", "blink_secc_2", "blink_secc_3"]

        if variant_keys:
            head = batch["secc_cond"][..., :-3]

            def variant_cond(key):
                if key == "__base__":
                    return batch["secc_cond"]
                if key == "__randn__":
                    # synthetic fallback: image-space noise on the tgt chans
                    scale = float(cfg.get("secc_pertube_randn_scale", 0.01))
                    noise = jax.random.normal(
                        r_pert, batch["secc_cond"][..., -3:].shape) * scale
                    return jnp.concatenate(
                        [head, batch["secc_cond"][..., -3:] + noise], axis=-1
                    )
                return jnp.concatenate([head, batch[key]], axis=-1)

            def cond_losses(_):
                stacked = jnp.concatenate(
                    [variant_cond(k) for k in variant_keys], axis=0
                )
                planes = self.gen.apply(
                    variables, stacked, method=lambda m, s: m.cal_secc_plane(s)
                )
                planes = dict(zip(
                    variant_keys, jnp.split(planes, len(variant_keys), axis=0)
                ))
                pert = blink = jnp.asarray(0.0)
                if use_pertube:
                    base = planes["__base__"]
                    p1 = planes.get("pertube_secc_1", planes.get("__randn__"))
                    if "pertube_secc_2" in planes:
                        pert = jnp.mean(jnp.abs(
                            base - (p1 + planes["pertube_secc_2"]) / 2.0))
                    else:
                        pert = jnp.mean(jnp.abs(base - p1))
                if use_blink:
                    # the mid-blink plane should equal the mean of the end
                    # planes (`:453-462`)
                    blink = jnp.mean(jnp.abs(
                        planes["blink_secc_2"]
                        - (planes["blink_secc_1"] + planes["blink_secc_3"]) / 2.0
                    ))
                return pert, blink

            pert_l, blink_l = jax.lax.cond(
                do_cond, cond_losses,
                lambda _: (jnp.asarray(0.0), jnp.asarray(0.0)), None,
            )
            if use_pertube:
                losses["pertube_secc"] = pert_l
            if use_blink:
                losses["pertube_blink_secc"] = blink_l

        weights = {
            "mse": float(cfg.get("lambda_mse", 1.0)),
            "mse_raw": float(cfg.get("lambda_mse", 1.0)),
            "percep": float(cfg.get("lambda_lpips", 0.5)),
            "weights_l1": float(cfg.get("lambda_weights_l1", 0.1)),
            "weights_entropy": float(cfg.get("lambda_weights_entropy", 0.01)),
            "adv": float(cfg.get("lambda_th1kh_mv_adv", 0.002)),
            "lip_mae": float(cfg.get("lambda_lip_mae", 0.5)),
            "lip_percep": float(cfg.get("lambda_lip_lpips", 0.05)),
            "density_reg": float(cfg.get("lambda_density_reg", 0.25)) * reg_g,
            "facev2v/occlusion_reg_l1": float(cfg.get("lam_occlusion_reg_l1", 0.0)),
            "facev2v/occlusion_2_reg_l1": float(cfg.get("lam_occlusion_2_reg_l1", 0.0)),
            "facev2v/occlusion_2_weights_entropy": float(
                cfg.get("lam_occlusion_weights_entropy", 0.001)
            ),
        }
        total = L.weighted_loss_sum(losses, weights)
        # adaptive lambdas from state.extra, interval-scaled (`:612-613`)
        if "pertube_secc" in losses:
            total = total + (state.extra["lambda_pertube_secc"] * reg_cond
                             * losses["pertube_secc"])
        if "pertube_blink_secc" in losses:
            total = total + (state.extra["lambda_pertube_blink_secc"] * reg_cond
                             * losses["pertube_blink_secc"])
        return total, (losses, out)

    # -- discriminator losses --------------------------------------------------

    def _d_loss(self, disc_params, fake_image, fake_raw, batch):
        res = self.gen.neural_rendering_resolution
        tgt = batch["tgt_img"]
        real_raw = jax.image.resize(tgt, (tgt.shape[0], res, res, tgt.shape[-1]),
                                    "linear")
        real_logits = self.disc.apply({"params": disc_params}, tgt, real_raw,
                                      batch["camera"])
        fake_logits = self.disc.apply({"params": disc_params}, fake_image, fake_raw,
                                      batch["camera"])
        return L.d_logistic_loss(real_logits, fake_logits), (real_logits, fake_logits)

    # -- the step ---------------------------------------------------------------

    def train_step(self, state: TrainState, batch, rng):
        cfg = self.cfg
        rg, rd = jax.random.split(rng)
        batch = self._maybe_src2src(state, batch)

        # G update
        (g_total, (losses, out)), g_grads = jax.value_and_grad(
            self._g_loss, has_aux=True
        )(state.params["gen"], state.params["disc"], state, batch, rg)
        g_updates, g_opt = self.opt_g.update(
            g_grads, state.opt_states["gen"], state.params["gen"]
        )
        # per-group LR multipliers scale the *updates* (torch param_groups lr)
        g_updates = self._apply_gates(g_updates, self._grad_gates(state.step))
        gen_params = optax.apply_updates(state.params["gen"], g_updates)

        # D update (only meaningful once adversarial is on, but cheap to run)
        fake_image = jax.lax.stop_gradient(out["image"])
        fake_raw = jax.lax.stop_gradient(out["image_raw"])
        (d_total, _), d_grads = jax.value_and_grad(self._d_loss, has_aux=True)(
            state.params["disc"], fake_image, fake_raw, batch
        )

        # R1 every reg_interval_d, interval-scaled (lazy regularization)
        reg_d = int(cfg.get("reg_interval_d", 16))
        do_r1 = (state.step % reg_d) == 0

        def r1_branch(disc_params):
            res = self.gen.neural_rendering_resolution
            tgt = batch["tgt_img"]
            real_raw = jax.image.resize(
                tgt, (tgt.shape[0], res, res, tgt.shape[-1]), "linear"
            )

            def r1_value(p):
                return L.r1_penalty(
                    lambda i, r, c: self.disc.apply({"params": p}, i, r, c),
                    tgt, real_raw, batch["camera"],
                )

            val, grads = jax.value_and_grad(r1_value)(disc_params)
            return val, grads

        def no_r1(disc_params):
            return jnp.asarray(0.0), jax.tree_util.tree_map(jnp.zeros_like, disc_params)

        r1_val, r1_grads = jax.lax.cond(do_r1, r1_branch, no_r1, state.params["disc"])
        gp_w = float(cfg.get("lambda_gradient_penalty", 5.0)) / 2.0 * reg_d
        d_grads = jax.tree_util.tree_map(
            lambda g, r: g + gp_w * r, d_grads, r1_grads
        )
        d_updates, d_opt = self.opt_d.update(
            d_grads, state.opt_states["disc"], state.params["disc"]
        )
        disc_params = optax.apply_updates(state.params["disc"], d_updates)

        # adaptive perturbation lambdas (`secc_img2plane_task.py:592-613`):
        # log10-space proportional control toward the target loss, clamped to
        # the reference's caps; only moves on cond-reg steps, device-side
        # (the reference pulls .item() to host every step)
        extra = dict(state.extra)
        reg_cond = int(cfg.get("reg_interval_g_cond", 4))
        do_cond = ((state.step + 1) % reg_cond) == 0
        lr_lam = float(cfg.get("lr_lambda_pertube_secc", 0.01))

        def tune_lambda(lam, loss_val, target, cap):
            if target == 0.0:  # reference zeroes the lambda outright
                return jnp.zeros_like(lam)
            grad = jnp.log10(loss_val + 1e-15) - np.log10(target + 1e-15)
            return jnp.where(
                do_cond, jnp.clip(lam + lr_lam * grad, 0.0, cap), lam
            )

        if "pertube_secc" in losses:
            extra["lambda_pertube_secc"] = tune_lambda(
                extra["lambda_pertube_secc"], losses["pertube_secc"],
                float(cfg.get("target_pertube_secc_loss", 0.0)), 0.2,
            )
        if "pertube_blink_secc" in losses:
            extra["lambda_pertube_blink_secc"] = tune_lambda(
                extra["lambda_pertube_blink_secc"], losses["pertube_blink_secc"],
                float(cfg.get("target_pertube_blink_secc_loss", 0.3)), 2.0,
            )

        metrics = {f"g/{k}": v for k, v in losses.items()}
        metrics.update({f"g/{k}": v for k, v in extra.items()
                        if k.startswith("lambda_")})
        metrics.update({
            "total_loss": g_total,
            "d/loss": d_total,
            "d/r1": r1_val,
            # NaN/explosion observability (reference print_nan_grads +
            # trainer.py:420-433 nan scan)
            "g/grad_norm": optax.global_norm(g_grads),
            "d/grad_norm": optax.global_norm(d_grads),
        })
        new_params = {"gen": gen_params, "disc": disc_params}
        if "gen_ema" in state.params:
            beta = self.ema_beta
            new_params["gen_ema"] = jax.tree_util.tree_map(
                lambda e, p: e * beta + p * (1.0 - beta),
                state.params["gen_ema"], gen_params,
            )
        new_state = state.replace(
            step=state.step + 1,
            params=new_params,
            opt_states={"gen": g_opt, "disc": d_opt},
            extra=extra,
        )
        return new_state, metrics

    def val_step(self, state, batch, rng):
        out = self._gen_forward(state.params["gen"], state, batch, None)
        losses: dict = {}
        self._recon_losses(out, batch, losses)
        psnr = -10.0 * jnp.log10(
            jnp.mean(jnp.square(out["image"] - batch["tgt_img"])) / 4.0 + 1e-10
        )
        return {"val_loss": losses["mse"], "val_psnr": psnr,
                **{f"val_{k}": v for k, v in losses.items()}}

    # -- validation visual regression ----------------------------------------

    def val_images(self, state, batch, rng, max_samples: int | None = None
                   ) -> dict:
        """Per-validation image dumps (`secc_img2plane_task.py:672-714`).

        For each sample: a horizontal strip ``[ref | mv | recon_raw |
        pred_raw | recon | pred | ref_secc | mv_secc]`` (recon = driven by
        the ref frame's own SECC+camera; pred = driven by the mv frame's)
        plus a ``[recon | pred]`` depth pair — rendered with the EMA
        generator. Returns ``{name: uint8 HxWx3}``; the trainer writes them
        under ``work_dir/val_images/iter<step>/``.
        """
        from real3dportrait_tpu.utils import visualization as viz

        params = state.params.get("gen_ema", state.params["gen"])
        n = min(int(batch["src_img"].shape[0]),
                max_samples or int(self.cfg.get("num_valid_plots", 4)))
        batch = {k: v[:n] if hasattr(v, "ndim") and getattr(v, "ndim", 0) > 0
                 else v for k, v in batch.items()}
        pred = self._gen_forward(params, state, batch, rng)
        recon_b = dict(batch)
        recon_b["secc_cond"] = batch.get("secc_cond_src", batch["secc_cond"])
        recon_b["camera"] = batch.get("camera_src", batch["camera"])
        recon = self._gen_forward(params, state, recon_b, rng)

        final = int(batch["tgt_img"].shape[1])

        def up(x):
            x = jnp.asarray(x, jnp.float32)
            return np.asarray(jax.image.resize(
                x, (x.shape[0], final, final, x.shape[-1]), "bilinear"))

        ref = np.asarray(batch["src_img"])
        mv = np.asarray(batch["tgt_img"])
        pred_img, recon_img = np.asarray(pred["image"]), np.asarray(recon["image"])
        pred_raw, recon_raw = up(pred["image_raw"]), up(recon["image_raw"])
        # cond layout cano|src|tgt (`pncc_cond_mode=cano_src_tgt`)
        has_src = batch["secc_cond"].shape[-1] >= 9
        ref_secc = up(batch["secc_cond"][..., 3:6] if has_src
                      else batch["secc_cond"][..., -3:])
        mv_secc = up(batch["secc_cond"][..., -3:])

        images = {}
        for i in range(n):
            images[f"ref_mv_reconraw_predraw_recon_pred_{i:05d}"] = (
                viz.side_by_side(ref[i], mv[i], recon_raw[i], pred_raw[i],
                                 recon_img[i], pred_img[i], ref_secc[i],
                                 mv_secc[i]))
            images[f"depth_recon_pred_{i:05d}"] = np.concatenate([
                viz.depth_to_colormap(np.asarray(recon["image_depth"])[i, ..., 0]),
                viz.depth_to_colormap(np.asarray(pred["image_depth"])[i, ..., 0]),
            ], axis=1)

        probe = self.ood_probe_batch()
        if probe is not None:
            ood = self._gen_forward(params, state, probe, rng)
            images["ood_probe"] = viz.to_uint8(np.asarray(ood["image"])[0])
        return images

    def ood_probe_batch(self) -> dict | None:
        """A FIXED held-out probe re-rendered every validation so successive
        dumps are comparable (`secc_img2plane_task.py:715-741`, the Macron
        probe). When ``cfg['ood_image']`` exists its segmented head crop is
        the probe image (with coefficients fitted from
        ``cfg['ood_landmarks']`` when provided); otherwise a deterministic
        synthetic identity stands in. Cached after the first call."""
        import os

        if not hasattr(self, "_ood_probe"):
            r = self._secc_renderer()
            final = int(self.cfg.get("final_resolution", 512))
            rng = np.random.RandomState(777)
            idc = jnp.asarray(rng.randn(1, 80).astype(np.float32) * 0.1)
            exp = jnp.asarray(rng.randn(1, 64).astype(np.float32) * 0.1)
            src_img = None
            path = str(self.cfg.get("ood_image", "") or "")
            if path and os.path.exists(path):
                import cv2

                from real3dportrait_tpu.preprocess.pipeline import (
                    naive_person_segmenter,
                )
                from real3dportrait_tpu.preprocess.segment_utils import (
                    prepare_source,
                )

                img = cv2.cvtColor(cv2.imread(path), cv2.COLOR_BGR2RGB)
                img = cv2.resize(img, (final, final))
                segmap = naive_person_segmenter(img[None])[0]
                head = prepare_source(img, segmap)["head_img"]
                src_img = jnp.asarray(head, jnp.float32)[None] / 127.5 - 1.0
                lm_path = str(self.cfg.get("ood_landmarks", "") or "")
                if lm_path and os.path.exists(lm_path):
                    from real3dportrait_tpu.geometry.fit_3dmm import fit_coeffs

                    lm2d = np.load(lm_path).reshape(1, -1, 2).astype(np.float32)
                    fit = fit_coeffs(r.assets, jnp.asarray(lm2d))
                    idc, exp = fit.id.reshape(1, 80), fit.exp.reshape(1, 64)
            zero3 = jnp.zeros((1, 3), jnp.float32)
            _, cano_secc = r.render(idc, jnp.zeros_like(exp), zero3, zero3)
            _, ref_secc = r.render(idc, exp, zero3, zero3)
            if src_img is None:
                # synthetic stand-in: the ref SECC doubles as the probe image
                src_img = ref_secc
            from real3dportrait_tpu.geometry import (
                convert_eg3d_convention, fov_to_intrinsics, pack_camera,
            )

            _, c2w, _ = convert_eg3d_convention(zero3, zero3)
            cam = pack_camera(c2w, fov_to_intrinsics())
            secc_ch = int(self.cfg.get("pncc_cond_mode", "cano_src_tgt") == "cano_src_tgt")
            parts = ([cano_secc, ref_secc, ref_secc] if secc_ch
                     else [cano_secc, ref_secc])
            self._ood_probe = {
                "src_img": src_img,
                "tgt_img": src_img,
                "secc_cond": jnp.concatenate(parts, axis=-1),
                "camera": jnp.asarray(cam).reshape(1, 25),
                "camera_src": jnp.asarray(cam).reshape(1, 25),
            }
        return self._ood_probe

    # -- real data: binarized video records -> model batches -----------------

    def _secc_renderer(self):
        if not hasattr(self, "_secc_r"):
            from real3dportrait_tpu.geometry import load_or_synthetic_bfm
            from real3dportrait_tpu.geometry.secc_renderer import SECCRenderer

            bfm_dir = self.cfg.get("bfm_dir")
            assets = load_or_synthetic_bfm(bfm_dir)
            # z-buffer at secc_resolution (256² default; raster cost scales
            # with candidate count), upsampled to the cond-map size
            self._secc_r = SECCRenderer(
                assets, bfm_dir,
                rasterize_size=int(self.cfg.get("secc_resolution", 256)),
                output_resolution=int(self.cfg.get("final_resolution", 512)),
            )
        return self._secc_r

    def _to_img(self, x: np.ndarray) -> jnp.ndarray:
        final = int(self.cfg.get("final_resolution", 512))
        x = jnp.asarray(x)
        if x.dtype == jnp.uint8:
            x = x.astype(jnp.float32) / 127.5 - 1.0
        if x.shape[1] != final:
            x = jax.image.resize(
                x, (x.shape[0], final, final, x.shape[-1]), "bilinear"
            )
        return x

    def prepare_batch_from_records(self, rec: dict) -> dict:
        """Motion2VideoDataset pair batch -> train-step inputs.

        The reference renders SECC maps under no_grad inside prepare_batch
        (`secc_img2plane_task.py:164-248`); here they're rendered on device
        before the jitted step.
        """
        from real3dportrait_tpu.geometry import convert_eg3d_convention, pack_camera
        from real3dportrait_tpu.geometry.face3d_helper import reconstruct_lm2d
        from real3dportrait_tpu.inference.edit_secc import blink_eye_for_secc

        if not hasattr(self, "_prep_rng"):
            self._prep_rng = np.random.RandomState(int(self.cfg.get("seed", 0)))
        rng = self._prep_rng
        r = self._secc_renderer()
        src_id = jnp.asarray(rec["src_id"], jnp.float32)
        zero = jnp.zeros_like(jnp.asarray(rec["src_euler"], jnp.float32))
        zero_t = jnp.zeros_like(zero)
        _, cano = r.render(src_id, jnp.zeros_like(jnp.asarray(rec["src_exp"])),
                           zero, zero_t)
        _, src_secc = r.render(src_id, jnp.asarray(rec["src_exp"]), zero, zero_t)
        _, tgt_secc = r.render(src_id, jnp.asarray(rec["tgt_exp"]), zero, zero_t)

        # perturbed-expression SECCs for the cond regularizer (`:185-198`):
        # neighbor-frame exps when the dataset provides them (laplacian mode),
        # else gaussian-noised exps (randn mode)
        extra_seccs = {}
        mode = self.cfg.get("secc_pertube_mode", "randn")
        if mode != "none":
            if mode == "laplacian" and "tgt_pertube_exp_1" in rec:
                # neighbor-frame exps from the dataset (`:185-192`)
                p1 = jnp.asarray(rec["tgt_pertube_exp_1"], jnp.float32)
                p2 = jnp.asarray(rec["tgt_pertube_exp_2"], jnp.float32)
            else:
                # randn mode: gaussian-noised exps (`:193-198`)
                scale = float(self.cfg.get("secc_pertube_randn_scale", 0.01))
                noise = rng.randn(*np.shape(rec["tgt_exp"])).astype(np.float32)
                p1 = jnp.asarray(rec["tgt_exp"], jnp.float32) + noise * scale
                p2 = 2 * jnp.asarray(rec["tgt_exp"], jnp.float32) - p1
            _, extra_seccs["pertube_secc_1"] = r.render(src_id, p1, zero, zero_t)
            if mode == "laplacian":
                _, extra_seccs["pertube_secc_2"] = r.render(src_id, p2, zero, zero_t)

        # blink-interpolated SECC triplet (`:200-226`): with prob 1/4 perturb
        # the src secc, else the tgt; percents p1<p2<p3 spanning [0,1]
        if bool(self.cfg.get("use_blink_reg", True)):
            base = np.asarray(jnp.where(
                rng.rand() < float(self.cfg.get("pertube_ref_prob", 0.25)),
                src_secc, tgt_secc))
            b = base.shape[0]
            p1s = rng.rand(b) * 0.5
            p3s = 0.5 + rng.rand(b) * 0.5
            p2s = (p1s + p3s) / 2
            for key, ps in (("blink_secc_1", p1s), ("blink_secc_2", p2s),
                            ("blink_secc_3", p3s)):
                extra_seccs[key] = jnp.asarray(np.stack([
                    blink_eye_for_secc(base[i], float(ps[i])) for i in range(b)
                ]))

        # mouth-rect centers in pixels of the posed frames (`:243-246`)
        final = int(self.cfg.get("final_resolution", 512))

        def lip_center(exp, euler, trans):
            lm2d = reconstruct_lm2d(
                r.assets, src_id, jnp.asarray(exp, jnp.float32),
                jnp.asarray(euler, jnp.float32), jnp.asarray(trans, jnp.float32),
            )
            from real3dportrait_tpu.training.losses import lip_rect_centers

            return lip_rect_centers(lm2d * final)

        def cam(euler, trans):
            _, conv, intr = convert_eg3d_convention(
                jnp.asarray(euler, jnp.float32), jnp.asarray(trans, jnp.float32)
            )
            return pack_camera(conv, intr[0])

        src_img = self._to_img(rec["src_head_imgs"])
        tgt_img = self._to_img(rec["tgt_head_imgs"])
        return {
            "src_img": src_img,
            "tgt_img": tgt_img,
            "secc_cond": jnp.concatenate([cano, src_secc, tgt_secc], axis=-1),
            "secc_cond_src": jnp.concatenate([cano, src_secc, src_secc], axis=-1),
            "camera": cam(rec["tgt_euler"], rec["tgt_trans"]),
            "camera_src": cam(rec["src_euler"], rec["src_trans"]),
            "head_mask": (jnp.mean(tgt_img, -1, keepdims=True) > -0.999).astype(
                jnp.float32
            ),
            "lip_center": lip_center(rec["tgt_exp"], rec["tgt_euler"],
                                     rec["tgt_trans"]),
            "lip_center_src": lip_center(rec["src_exp"], rec["src_euler"],
                                         rec["src_trans"]),
            **extra_seccs,
        }

    def _record_batches(self, split: str):
        import os

        store = os.path.join(str(self.cfg.get("binary_data_dir", "")), split)
        if not os.path.isfile(store + ".idx"):
            return None
        from real3dportrait_tpu.data import Motion2VideoDataset

        ds = Motion2VideoDataset(store, self.cfg,
                                 shuffle=(split == "train"),
                                 seed=int(self.cfg.get("seed", 0)))
        def gen():
            for rec in ds.batches():
                yield self.prepare_batch_from_records(rec)
        return gen()

    def train_data(self):
        real = self._record_batches("train")
        if real is not None:
            yield from real
        else:
            yield from super().train_data()

    def val_data(self):
        real = self._record_batches("val")
        if real is not None:
            yield from real
        else:
            yield from super().val_data()

    # -- synthetic smoke batches ---------------------------------------------

    def synthetic_batch(self, rng: np.random.RandomState) -> dict:
        cfg = self.cfg
        b = int(cfg.get("batch_size", 1))
        final = int(cfg.get("final_resolution", 512))
        secc_size = int(cfg.get("secc_cond_resolution", final))

        def cam(seed):
            import jax.numpy as jnp_

            yaw = jnp_.asarray(rng.uniform(-0.3, 0.3, (b,)).astype(np.float32))
            pitch = jnp_.asarray(rng.uniform(-0.2, 0.2, (b,)).astype(np.float32))
            c2w = lookat_pose(yaw, pitch, jnp_.zeros((b, 3)))
            return np.asarray(pack_camera(c2w, fov_to_intrinsics()))

        secc_ch = 9 if cfg.get("pncc_cond_mode", "cano_src_tgt") == "cano_src_tgt" else 6
        batch = {
            "src_img": rng.uniform(-1, 1, (b, final, final, 3)).astype(np.float32),
            "tgt_img": rng.uniform(-1, 1, (b, final, final, 3)).astype(np.float32),
            "secc_cond": rng.uniform(-1, 1, (b, secc_size, secc_size, secc_ch)).astype(np.float32),
            "secc_cond_src": rng.uniform(-1, 1, (b, secc_size, secc_size, secc_ch)).astype(np.float32),
            "camera": cam(0),
            "camera_src": cam(1),
            "head_mask": (rng.rand(b, final, final, 1) > 0.5).astype(np.float32),
            "lip_center": rng.randint(final // 4, 3 * final // 4,
                                      (b, 2)).astype(np.int32),
            "lip_center_src": rng.randint(final // 4, 3 * final // 4,
                                          (b, 2)).astype(np.int32),
        }
        if bool(cfg.get("use_blink_reg", True)):
            for i in (1, 2, 3):
                batch[f"blink_secc_{i}"] = rng.uniform(
                    -1, 1, (b, secc_size, secc_size, 3)).astype(np.float32)
        return batch
