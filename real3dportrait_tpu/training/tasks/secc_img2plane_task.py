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
        self.gen = self.build_generator(cfg)
        self.disc = DualDiscriminator(
            img_resolution=int(cfg.get("final_resolution", 512)),
            channel_base=int(cfg.get("base_channel", 32768)),
            channel_max=int(cfg.get("max_channel", 512)),
            num_fp16_res=int(cfg.get("num_fp16_layers_in_discriminator", 4)),
            mbstd_group_size=int(cfg.get("group_size_for_mini_batch_std", 2)),
            disc_c_noise=0.0,
        )
        self.opt_g = optax.adam(
            float(cfg.get("lr_g", 1e-4)),
            b1=float(cfg.get("optimizer_adam_beta1_g", 0.0)),
            b2=float(cfg.get("optimizer_adam_beta2_g", 0.99)),
        )
        self.opt_d = optax.adam(
            float(cfg.get("lr_d", 2e-4)),
            b1=float(cfg.get("optimizer_adam_beta1_d", 0.0)),
            b2=float(cfg.get("optimizer_adam_beta2_d", 0.99)),
        )

    def build_generator(self, cfg):
        return OSAvatarSECCImg2Plane(
            triplane_hid_dim=int(cfg.get("triplane_hid_dim", 32)),
            triplane_depth=int(cfg.get("triplane_depth", 3)),
            triplane_feature_type=cfg.get("triplane_feature_type", "trigrid"),
            neural_rendering_resolution=int(cfg.get("neural_rendering_resolution", 128)),
            final_resolution=int(cfg.get("final_resolution", 512)),
            backbone_scale=cfg.get("img2plane_backbone_scale", "b0"),
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
                )
            },
        )

    @property
    def ema_beta(self) -> float:
        # half-life of ema_interval steps: beta = 0.5 ** (1/interval)
        interval = float(self.cfg.get("ema_interval", 400))
        return 0.5 ** (1.0 / max(interval, 1.0))

    # -- gradient gates ----------------------------------------------------

    def _grad_gates(self, step) -> dict:
        cfg = self.cfg
        start_adv = int(cfg.get("start_adv_iters", 200000))
        stop_i2p = int(cfg.get("stop_update_i2p_iters", 70000))
        two_stage = bool(cfg.get("two_stage_training", True))
        also_dec = bool(cfg.get("also_update_decoder", False))
        in_stage1 = (step < start_adv) if two_stage else jnp.asarray(True)
        lr_mul_i2p = float(cfg.get("lr_mul_cano_img2plane", 1.0))
        return {
            "img2plane_backbone": jnp.where(
                (step < stop_i2p) & in_stage1, lr_mul_i2p, 0.0
            ),
            "secc_img2plane_backbone": jnp.where(in_stage1, 1.0, 0.0),
            "decoder": jnp.where(in_stage1 | also_dec, 1.0, 0.0),
            "superresolution": jnp.asarray(1.0),
        }

    @staticmethod
    def _apply_gates(grads: dict, gates: dict) -> dict:
        out = {}
        for key, sub in grads.items():
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
        losses["percep"] = L.laplacian_pyramid_loss(out["image"], tgt)
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

        # SECC perturbation plane regularization, adaptively weighted
        scale = float(cfg.get("secc_pertube_randn_scale", 0.01))
        if cfg.get("secc_pertube_mode", "randn") != "none":
            variables = {"params": gen_params, **state.variables}
            secc_plane = self.gen.apply(
                variables, batch["secc_cond"],
                method=lambda m, s: m.cal_secc_plane(s),
            )
            pert = batch["secc_cond"] + jax.random.normal(
                r_pert, batch["secc_cond"].shape
            ) * scale
            secc_plane_p = self.gen.apply(
                variables, pert, method=lambda m, s: m.cal_secc_plane(s)
            )
            losses["pertube_secc"] = jnp.mean(jnp.abs(secc_plane - secc_plane_p))

        weights = {
            "mse": float(cfg.get("lambda_mse", 1.0)),
            "mse_raw": float(cfg.get("lambda_mse", 1.0)),
            "percep": float(cfg.get("lambda_lpips", 0.5)),
            "weights_l1": float(cfg.get("lambda_weights_l1", 0.1)),
            "weights_entropy": float(cfg.get("lambda_weights_entropy", 0.01)),
            "adv": float(cfg.get("lambda_th1kh_mv_adv", 0.002)),
            "density_reg": float(cfg.get("lambda_density_reg", 0.25)) * reg_g,
            "facev2v/occlusion_reg_l1": float(cfg.get("lam_occlusion_reg_l1", 0.0)),
            "facev2v/occlusion_2_reg_l1": float(cfg.get("lam_occlusion_2_reg_l1", 0.0)),
            "facev2v/occlusion_2_weights_entropy": float(
                cfg.get("lam_occlusion_weights_entropy", 0.001)
            ),
        }
        total = L.weighted_loss_sum(losses, weights)
        if "pertube_secc" in losses:
            total = total + state.extra["lambda_pertube_secc"] * losses["pertube_secc"]
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
        g_grads = self._apply_gates(g_grads, self._grad_gates(state.step))
        g_updates, g_opt = self.opt_g.update(
            g_grads, state.opt_states["gen"], state.params["gen"]
        )
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

        # adaptive perturbation lambda (`secc_img2plane_task.py:592-613`)
        extra = dict(state.extra)
        if "pertube_secc" in losses:
            target = float(cfg.get("target_pertube_secc_loss", 0.0))
            lr_lam = float(cfg.get("lr_lambda_pertube_secc", 0.01))
            lam = extra["lambda_pertube_secc"]
            lam = jnp.clip(
                lam + lr_lam * jnp.sign(losses["pertube_secc"] - target), 0.0, 10.0
            )
            extra["lambda_pertube_secc"] = lam

        metrics = {f"g/{k}": v for k, v in losses.items()}
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

        r = self._secc_renderer()
        src_id = jnp.asarray(rec["src_id"], jnp.float32)
        zero = jnp.zeros_like(jnp.asarray(rec["src_euler"], jnp.float32))
        zero_t = jnp.zeros_like(zero)
        _, cano = r.render(src_id, jnp.zeros_like(jnp.asarray(rec["src_exp"])),
                           zero, zero_t)
        _, src_secc = r.render(src_id, jnp.asarray(rec["src_exp"]), zero, zero_t)
        _, tgt_secc = r.render(src_id, jnp.asarray(rec["tgt_exp"]), zero, zero_t)

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
        return {
            "src_img": rng.uniform(-1, 1, (b, final, final, 3)).astype(np.float32),
            "tgt_img": rng.uniform(-1, 1, (b, final, final, 3)).astype(np.float32),
            "secc_cond": rng.uniform(-1, 1, (b, secc_size, secc_size, secc_ch)).astype(np.float32),
            "secc_cond_src": rng.uniform(-1, 1, (b, secc_size, secc_size, secc_ch)).astype(np.float32),
            "camera": cam(0),
            "camera_src": cam(1),
            "head_mask": (rng.rand(b, final, final, 1) > 0.5).astype(np.float32),
        }
