"""Torso-stage GAN training: only the warp/fusion SR head learns.

Equivalent of `tasks/os_avatar/secc_img2plane_torso_task.py:54`: the head
modules (img2plane/secc2plane/decoder) come frozen from a secc_img2plane
checkpoint (partial restore via ``init_from_ckpt``/``reload_head_ckpt``);
only ``superresolution`` (which owns the torso warp + fusion nets) and the
discriminator update. GT is the composed person+background image.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from real3dportrait_tpu.models.img2plane import OSAvatarSECCImg2PlaneTorso
from real3dportrait_tpu.training.tasks.secc_img2plane_task import SeccImg2PlaneTask


class SeccImg2PlaneTorsoTask(SeccImg2PlaneTask):
    def build_generator(self, cfg):
        return OSAvatarSECCImg2PlaneTorso(
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
            torso_kp_num=int(cfg.get("torso_kp_num", 4)),
            torso_scale=cfg.get("torso_model_scale", "standard"),
            fuse_mode=cfg.get("htbsr_head_weight_fuse_mode", "v2"),
            head_threshold=float(cfg.get("htbsr_head_threshold", 0.9)),
            torso_version=cfg.get("torso_model_version", "v2"),
            torso_inp_mode=cfg.get("torso_inp_mode", "rgb_alpha"),
            backbone_mode=cfg.get("img2plane_backbone_mode", "segformer"),
            head_norm_mode=cfg.get("head_norm_mode", "gn"),
        )

    def _gen_apply_kwargs(self, batch):
        return {
            "cond": {
                "ref_torso_img": batch["ref_torso_img"],
                "bg_img": batch["bg_img"],
                "segmap": batch["segmap"],
                "kp_src": batch["kp_src"],
                "kp_drv": batch["kp_drv"],
            }
        }

    def _grad_gates(self, step) -> dict:
        # only the SR/torso head trains (`secc_img2plane_torso_task.py:54-90`)
        return {
            "img2plane_backbone": jnp.asarray(0.0),
            "secc_img2plane_backbone": jnp.asarray(0.0),
            "decoder": jnp.asarray(0.0),
            "superresolution": jnp.asarray(1.0),
        }

    def prepare_batch_from_records(self, rec: dict) -> dict:
        batch = super().prepare_batch_from_records(rec)
        import jax.numpy as jnp

        from real3dportrait_tpu.geometry import face3d_helper

        # GT for the torso stage is the composed person+bg image
        if "tgt_com_imgs" in rec:
            batch["tgt_img"] = self._to_img(rec["tgt_com_imgs"])
        batch["ref_torso_img"] = self._to_img(
            rec.get("src_torso_imgs", rec["src_head_imgs"])
        )
        bg = rec.get("src_bg_img")
        batch["bg_img"] = (
            self._to_img(bg) if bg is not None else jnp.zeros_like(batch["src_img"])
        )
        final = batch["src_img"].shape[1]
        if "src_segmaps" in rec:
            seg = jnp.asarray(rec["src_segmaps"], jnp.int32)
            segmap = jax.nn.one_hot(seg, 6)
            if segmap.shape[1] != final:
                segmap = jax.image.resize(
                    segmap, (segmap.shape[0], final, final, 6), "nearest"
                )
        else:
            segmap = jnp.zeros((batch["src_img"].shape[0], final, final, 6)
                               ).at[..., 4].set(1.0)
        batch["segmap"] = segmap

        # driving keypoints: 2D landmarks from the fitted coefficients,
        # mapped to [-1,1] (`secc_img2plane_torso_task.py:125-187`)
        assets = self._secc_renderer().assets

        def kp(id_c, exp_c, euler, trans):
            lm = face3d_helper.reconstruct_lm2d(
                assets, jnp.asarray(id_c), jnp.asarray(exp_c),
                jnp.asarray(euler), jnp.asarray(trans),
            )
            lm3 = jnp.concatenate([lm * 2 - 1, jnp.zeros_like(lm[..., :1])], -1)
            return lm3

        batch["kp_src"] = kp(rec["src_id"], rec["src_exp"], rec["src_euler"],
                             rec["src_trans"])
        batch["kp_drv"] = kp(rec["src_id"], rec["tgt_exp"], rec["tgt_euler"],
                             rec["tgt_trans"])
        return batch

    def ood_probe_batch(self) -> dict | None:
        probe = super().ood_probe_batch()
        if probe is not None and "ref_torso_img" not in probe:
            res = int(probe["src_img"].shape[1])
            probe.update({
                "ref_torso_img": probe["src_img"],
                "bg_img": probe["src_img"],
                "segmap": jnp.zeros((1, res, res, 6)).at[..., 4].set(1.0),
                "kp_src": jnp.zeros((1, 68, 3)),
                "kp_drv": jnp.zeros((1, 68, 3)),
            })
        return probe

    def synthetic_batch(self, rng: np.random.RandomState) -> dict:
        batch = super().synthetic_batch(rng)
        cfg = self.cfg
        b = int(cfg.get("batch_size", 1))
        final = int(cfg.get("final_resolution", 512))
        seg = np.zeros((b, final, final, 6), np.float32)
        seg[..., 4] = 1.0
        batch.update({
            "ref_torso_img": rng.uniform(-1, 1, (b, final, final, 3)).astype(np.float32),
            "bg_img": rng.uniform(-1, 1, (b, final, final, 3)).astype(np.float32),
            "segmap": seg,
            "kp_src": rng.uniform(-0.8, 0.8, (b, 68, 3)).astype(np.float32),
            "kp_drv": rng.uniform(-0.8, 0.8, (b, 68, 3)).astype(np.float32),
        })
        return batch
