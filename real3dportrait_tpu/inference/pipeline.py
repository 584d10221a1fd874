"""End-to-end one-shot talking-portrait synthesis.

TPU-native redesign of `inference/real3d_infer.py:112` (GeneFace2Infer).
Host work happens once per request (decoding inputs, optional HuBERT);
everything per-frame — audio2motion sampling, SECC rasterization, the
SECC-conditioned volume render, SR/torso/background fusion — is a jitted
device graph. The canonical tri-plane is computed ONCE per video and fed to
every frame step (the reference's ``cache_backbone`` optimization as
explicit dataflow, `modules/real3d/secc_img2plane.py:93-112`).

Without released checkpoints in this environment, ``mock_weights=True``
random-initializes every model: the full pipeline mechanics (shapes, jit
boundaries, streaming) are identical, only the pixels are untrained.
"""

from __future__ import annotations

import os
from typing import Any, Callable

import jax
import jax.numpy as jnp
import numpy as np

from real3dportrait_tpu.config import FrozenConfig, load_config
from real3dportrait_tpu.geometry import (
    convert_eg3d_convention,
    face3d_helper,
    load_or_synthetic_bfm,
    mirror_index,
    pack_camera,
    smooth_camera_sequence,
)
from real3dportrait_tpu.geometry.fit_3dmm import fit_coeffs
from real3dportrait_tpu.geometry.secc_renderer import SECCRenderer
from real3dportrait_tpu.models.audio2motion import PitchContourVAEModel
from real3dportrait_tpu.models.img2plane import (
    OSAvatarSECCImg2Plane,
    OSAvatarSECCImg2PlaneTorso,
)


# Inference sampling quadrature. The reference integrates 48 coarse + 48
# fine samples/ray (`egs/egs_bases/eg3d/base.yaml` num_samples_coarse/fine);
# the weight-independent quadrature study (tools/study_sampling, BASELINE.md
# round 4) measured reduced schemes on an adversarial thin-shell field:
# 'balanced' (24+32) renders 68.6 dB PSNR of the reference scheme's own
# render and 'fast' (16+32) 64.5 dB — both far beyond 8-bit visibility
# (~48 dB) — while per-frame sampling cost scales with rows/ray (the
# gathers are the measured per-frame floor). 'reference' restores the exact
# reference quadrature; 'config' uses the YAML's num_samples_coarse/fine
# (the training values) untouched.
SAMPLING_PRESETS: dict[str, tuple[int, int] | None] = {
    "reference": (48, 48),
    "balanced": (24, 32),
    "fast": (16, 32),
    "config": None,
}

# The preset the inference CLI ships as its default AND the one bench.py
# headlines — one constant so the CLI, the bench, and the recorded note can
# never desynchronize (ADVICE r4). The bench record co-reports the
# 'reference' quadrature numbers alongside, and tools/eval_parity stamps the
# fast-vs-reference render delta, so the trade is explicit and measurable.
SHIPPED_SAMPLING_PRESET = "fast"


def _resize_np(img: np.ndarray, size: int) -> np.ndarray:
    out = jax.image.resize(jnp.asarray(img, jnp.float32),
                           (size, size, img.shape[-1]), "bilinear")
    return np.asarray(out)


class Real3DPortraitPipeline:
    def __init__(
        self,
        cfg: FrozenConfig | None = None,
        mock_weights: bool = False,
        a2m_ckpt_dir: str = "",
        secc2video_ckpt_dir: str = "",
        bfm_dir: str | None = None,
        use_torso: bool = True,
        hubert_path: str | None = None,
        seed: int = 0,
    ):
        root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
        if cfg is None:
            cfg = load_config(os.path.join(root, "configs", "secc_img2plane_torso.yaml"))
        self.cfg = cfg
        self.use_torso = use_torso
        self.rng = jax.random.PRNGKey(seed)

        # geometry
        self.assets = load_or_synthetic_bfm(bfm_dir)
        # Rasterize the SECC z-buffer at a reduced resolution (default 192²)
        # and bilinearly upsample the smooth NCC cond maps to the backbone's
        # input size: the SECC backbone reads them through a 7x7 stride-4
        # patch embed, and a 192² raster keeps 39 dB fidelity in that
        # stride-4 view vs a native 512² raster (BASELINE.md r4) while the
        # rasterizer is the per-frame inference bottleneck.
        self.secc_renderer = SECCRenderer(
            self.assets, bfm_dir,
            rasterize_size=int(cfg.get("secc_resolution", 192)),
            output_resolution=int(cfg.get("final_resolution", 512)),
        )

        # audio2motion
        audio_type = cfg.get("audio_type", "hubert")
        self.audio_in_dim = 1024 if audio_type == "hubert" else 80
        self.a2m = PitchContourVAEModel(
            in_out_dim=64, audio_in_dim=self.audio_in_dim,
            use_prior_flow=bool(cfg.get("use_flow", True)),
            norm_mode=cfg.get("a2m_norm_mode", "gn"),
        )

        # motion2video
        # library default is 'config' (honor the YAML's num_samples_*); the
        # inference CLI passes the shipped default 'fast' explicitly
        preset = cfg.get("sampling_preset", "config")
        if preset not in SAMPLING_PRESETS:
            raise ValueError(f"sampling_preset must be one of "
                             f"{sorted(SAMPLING_PRESETS)}, got {preset!r}")
        picked = SAMPLING_PRESETS[preset]
        if picked is None:  # 'config': the YAML training values
            n_coarse = int(cfg.get("num_samples_coarse", 48))
            n_fine = int(cfg.get("num_samples_fine", 48))
        else:
            n_coarse, n_fine = picked
        model_kwargs = dict(
            triplane_hid_dim=int(cfg.get("triplane_hid_dim", 32)),
            triplane_depth=int(cfg.get("triplane_depth", 3)),
            triplane_feature_type=cfg.get("triplane_feature_type", "trigrid"),
            neural_rendering_resolution=int(cfg.get("neural_rendering_resolution", 128)),
            final_resolution=int(cfg.get("final_resolution", 512)),
            backbone_mode=cfg.get("img2plane_backbone_mode", "segformer"),
            backbone_scale=cfg.get("img2plane_backbone_scale", "b0"),
            head_norm_mode=cfg.get("head_norm_mode", "gn"),
            plane_fusion_mode=cfg.get("phase1_plane_fusion_mode", "add"),
            secc_segformer_scale=cfg.get("secc_segformer_scale", "b0"),
            pncc_cond_mode=cfg.get("pncc_cond_mode", "cano_src_tgt"),
            sr_num_fp16_res=int(cfg.get("num_fp16_layers_in_super_resolution", 4)),
            num_samples_coarse=n_coarse,
            num_samples_fine=n_fine,
            sr_channel0=int(cfg.get("sr_channel0", 256)),
            sr_channel1=int(cfg.get("sr_channel1", 128)),
            render_bf16=bool(cfg.get("render_bf16", False)),
        )
        if use_torso:
            self.model = OSAvatarSECCImg2PlaneTorso(
                torso_kp_num=int(cfg.get("torso_kp_num", 4)),
                torso_scale=cfg.get("torso_model_scale", "standard"),
                fuse_mode=cfg.get("htbsr_head_weight_fuse_mode", "v2"),
                head_threshold=float(cfg.get("htbsr_head_threshold", 0.9)),
                torso_version=cfg.get("torso_model_version", "v2"),
                torso_inp_mode=cfg.get("torso_inp_mode", "rgb_alpha"),
                **model_kwargs,
            )
        else:
            self.model = OSAvatarSECCImg2Plane(**model_kwargs)

        self.res = int(cfg.get("final_resolution", 512))
        self._init_weights(mock_weights, a2m_ckpt_dir, secc2video_ckpt_dir)
        self._build_jit_fns()
        self.hubert_fn = None
        # device-resident JAX HuBERT preferred: a msgpack tree converted by
        # tools/convert_torch_ckpt.convert_hubert keeps the whole audio
        # front-end on TPU (replaces extract_hubert.py:19 host-torch)
        if hubert_path and str(hubert_path).endswith(".msgpack"):
            try:
                from flax import serialization

                from real3dportrait_tpu.audio.hubert import (
                    hubert_large, make_jax_hubert_extractor,
                )

                with open(hubert_path, "rb") as f:
                    variables = serialization.msgpack_restore(f.read())
                self.hubert_fn = make_jax_hubert_extractor(variables,
                                                           hubert_large())
            except Exception:
                self.hubert_fn = None
        if self.hubert_fn is None:
            try:
                from real3dportrait_tpu.audio import load_hubert_extractor

                self.hubert_fn = load_hubert_extractor(hubert_path)
            except Exception:
                pass

    # -- weights ---------------------------------------------------------

    def _init_weights(self, mock: bool, a2m_dir: str, s2v_dir: str):
        res = self.res
        r1, r2, r3 = jax.random.split(self.rng, 3)
        t50 = 32
        a2m_batch = {
            "audio": jnp.zeros((1, t50, self.audio_in_dim)),
            "f0": jnp.zeros((1, t50)),
            "y_mask": jnp.ones((1, t50 // 2)),
            "blink": jnp.zeros((1, t50, 1), jnp.int32),
        }
        self.a2m_params = self.a2m.init(
            {"params": r1, "noise": r2}, a2m_batch, train=False
        )["params"]

        img = jnp.zeros((1, res, res, 3))
        secc = jnp.zeros((1, res, res, 9))
        cam = jnp.concatenate([jnp.eye(4).reshape(1, 16), jnp.eye(3).reshape(1, 9)], -1)
        kwargs: dict[str, Any] = {"secc": secc}
        if self.use_torso:
            kwargs["cond"] = self._mock_cond(np.zeros((res, res, 3), np.float32))
        variables = self.model.init({"params": r3, "noise": r2}, img, cam, **kwargs)
        self.model_variables = dict(variables)

        from real3dportrait_tpu.training import checkpoint as ckpt

        if not mock:
            from flax import serialization

            if a2m_dir:
                restored, path = ckpt.get_last_checkpoint(a2m_dir)
                if restored is not None:
                    src = restored.get("params", {}).get("model", restored)
                    self.a2m_params = serialization.from_state_dict(self.a2m_params, src)
                    print(f"| loaded audio2motion from {path}")
            if s2v_dir:
                restored, path = ckpt.get_last_checkpoint(s2v_dir)
                if restored is not None:
                    src = restored.get("params", {}).get("gen", restored)
                    self.model_variables["params"] = serialization.from_state_dict(
                        self.model_variables["params"], src
                    )
                    # converted torch checkpoints also carry non-param
                    # collections (noise_const buffers etc.)
                    for coll, tree in restored.get("variables", {}).items():
                        if coll in self.model_variables:
                            self.model_variables[coll] = serialization.from_state_dict(
                                self.model_variables[coll], tree
                            )
                    print(f"| loaded secc2video from {path}")

    def _mock_cond(self, src_img: np.ndarray) -> dict:
        res = self.res
        seg = jnp.zeros((1, res, res, 6)).at[..., 4].set(1.0)
        img = jnp.asarray(src_img, jnp.float32)[None]
        return {
            "ref_torso_img": img,
            "bg_img": img,
            "segmap": seg,
            "kp_src": jnp.zeros((1, 68, 3)),
            "kp_drv": jnp.zeros((1, 68, 3)),
        }

    # -- jitted stages ------------------------------------------------------

    def _build_jit_fns(self):
        model, a2m = self.model, self.a2m

        @jax.jit
        def a2m_infer(params, batch, key, temperature):
            out = a2m.apply({"params": params}, batch, train=False,
                            temperature=temperature, rngs={"noise": key})
            return out["pred"]

        @jax.jit
        def cal_cano(variables, img):
            return model.apply(variables, img, method=lambda m, i: m.cal_cano_plane(i))

        if self.use_torso:

            @jax.jit
            def frame_step(variables, camera, secc_cond, cano, cond):
                out = model.apply(variables, None, camera, cond, secc=secc_cond,
                                  cano_planes=cano)
                return out["image"], out["image_raw"], out["image_depth"]

            @jax.jit
            def cal_torso_appearance(variables, cond):
                return model.apply(
                    variables, cond,
                    method=lambda m, c: m.cal_torso_appearance(c),
                )

            @jax.jit
            def cal_bg_feat(variables, cond):
                return model.apply(
                    variables, cond,
                    method=lambda m, c: m.cal_bg_feat(c),
                )

            self._cal_torso_appearance = cal_torso_appearance
            self._cal_bg_feat = cal_bg_feat

        else:

            @jax.jit
            def frame_step(variables, camera, secc_cond, cano, cond):
                out = model.apply(variables, None, camera, secc=secc_cond,
                                  cano_planes=cano)
                return out["image"], out["image_raw"], out["image_depth"]

        self._a2m_infer = a2m_infer
        self._cal_cano = cal_cano
        self._frame_step = frame_step

    # -- stages ---------------------------------------------------------------

    def fit_source(self, src_lm2d: np.ndarray | None) -> dict:
        """Source 3DMM coefficients from 68 2D landmarks (or neutral mock)."""
        if src_lm2d is None:
            return {"id": jnp.zeros((1, 80)), "exp": jnp.zeros((1, 64)),
                    "euler": jnp.zeros((1, 3)), "trans": jnp.zeros((1, 3))}
        fit = fit_coeffs(self.assets, jnp.asarray(src_lm2d)[None]
                         if src_lm2d.ndim == 2 else jnp.asarray(src_lm2d))
        return {"id": fit.id, "exp": fit.exp[:1], "euler": fit.euler[:1],
                "trans": fit.trans[:1]}

    def audio_to_features(self, wav: np.ndarray | None,
                          hubert: np.ndarray | None = None) -> tuple[np.ndarray, np.ndarray]:
        """wav -> (audio features [T,C] @50Hz, f0 [T])."""
        from real3dportrait_tpu.audio import extract_f0, extract_mel

        if hubert is not None:
            feats = hubert
        elif self.hubert_fn is not None and self.audio_in_dim == 1024:
            feats = self.hubert_fn(wav)
        elif self.audio_in_dim == 1024:
            # no HuBERT weights in this environment: tile mel into the
            # hubert feature width so the graph runs end-to-end
            mel = extract_mel(wav)
            feats = np.tile(mel, (1, 1024 // 80 + 1))[:, :1024]
        else:
            feats = extract_mel(wav)
        f0 = extract_f0(wav) if wav is not None else np.zeros((len(feats),), np.float32)
        t = min(len(feats), len(f0)) if len(f0) else len(feats)
        t = t - t % 8  # pad discipline: multiples of 8 (`real3d_infer.py:328`)
        f0 = f0[:t] if len(f0) >= t else np.pad(f0, (0, t - len(f0)))
        return feats[:t], f0

    def audio_to_motion(self, feats: np.ndarray, f0: np.ndarray,
                        temperature: float = 0.2, mouth_amp: float = 0.4,
                        key=None) -> jnp.ndarray:
        """[T,C] @50Hz -> exp sequence [T/2, 64] @25Hz."""
        key = key if key is not None else jax.random.PRNGKey(0)
        t50 = feats.shape[0]
        batch = {
            "audio": jnp.asarray(feats)[None],
            "f0": jnp.asarray(f0)[None],
            "y_mask": jnp.ones((1, t50 // 2)),
            "blink": jnp.zeros((1, t50, 1), jnp.int32),
            "mouth_amp": jnp.full((1, 1), mouth_amp),
        }
        return self._a2m_infer(self.a2m_params, batch, key,
                               jnp.asarray(temperature))[0]

    def synthesize(
        self,
        src_img: np.ndarray,                  # [H,W,3] in [-1,1] float or uint8
        exp_seq: jnp.ndarray,                 # [T,64]
        src_coeffs: dict,
        pose_seq: tuple | None = None,        # (euler [T,3], trans [T,3]) or None
        bg_img: np.ndarray | None = None,
        blink_mode: str = "periodic",         # periodic | none
        callback: Callable[[int, np.ndarray], None] | None = None,
        debug_mode: bool = False,             # concat final|raw|depth per frame
        stream_only: bool = False,            # low_memory: frames go to callback only
        frame_batch: int = 1,                 # frames rendered per device step
        segmap: np.ndarray | None = None,     # [H,W] class map; else segmenter
        segmenter: Callable | None = None,    # frames->[T,H,W] class map
        prepare_source_images: bool = True,   # head/torso/bg split + real kp
    ) -> np.ndarray:
        """Render all frames; returns [T,H,W,3] float in [-1,1]."""
        res = self.res
        if src_img.dtype == np.uint8:
            src_img = src_img.astype(np.float32) / 127.5 - 1.0
        # batched multi-identity mode: [N,H,W,3] sources share one driving
        # signal (throughput mode, BASELINE.json config 3)
        batched = src_img.ndim == 4
        if not batched:
            src_img = src_img[None]
        if src_img.shape[1] != res:
            src_img = np.stack([_resize_np(s, res) for s in src_img])
        img = jnp.asarray(src_img)
        n_ident = img.shape[0]

        t = exp_seq.shape[0]
        idc = jnp.broadcast_to(src_coeffs["id"], (t, 80))
        if pose_seq is None:
            euler = jnp.broadcast_to(src_coeffs["euler"], (t, 3))
            trans = jnp.broadcast_to(src_coeffs["trans"], (t, 3))
        else:
            euler, trans = map(jnp.asarray, pose_seq)
            if euler.shape[0] < t:  # ping-pong loop the pose video
                idx = mirror_index(jnp.arange(t), euler.shape[0])
                euler, trans = euler[idx], trans[idx]
            euler, trans = euler[:t], trans[:t]
            # z-fix + map-to-init-pose (`real3d_infer.py:300-309`)
            from real3dportrait_tpu.inference.infer_utils import map_pose_to_source

            euler, trans = map_pose_to_source(
                euler, trans, src_coeffs["euler"], src_coeffs["trans"],
                map_to_init=bool(self.cfg.get("map_to_init_pose", True)),
            )

        # cameras (EG3D convention) + temporal smoothing
        _, conv_c2w, intr = convert_eg3d_convention(euler, trans)
        cameras = smooth_camera_sequence(pack_camera(conv_c2w, intr[0]))

        # SECC maps: canonical (zero pose+exp), source, per-frame target
        zero = jnp.zeros((1, 3))
        _, cano_secc = self.secc_renderer.render(
            src_coeffs["id"], jnp.zeros((1, 64)), zero, zero
        )
        _, src_secc = self.secc_renderer.render(
            src_coeffs["id"], src_coeffs["exp"], zero, zero
        )

        # source preparation (`real3d_infer.py:246-262`): segment the source,
        # split head (the img2plane input) / inpainted torso / background,
        # and drive the torso warp with REAL keypoints reconstructed from the
        # fitted coefficients (`real3d_infer.py:271-274,428-432`)
        kp_drv_seq = None
        if prepare_source_images and not batched:
            from real3dportrait_tpu.geometry.face3d_helper import reconstruct_lm2d
            from real3dportrait_tpu.inference.infer_utils import smooth_features_1d
            from real3dportrait_tpu.preprocess.pipeline import naive_person_segmenter
            from real3dportrait_tpu.preprocess.segment_utils import prepare_source

            img_u8 = ((np.asarray(src_img[0]) + 1) * 127.5).clip(0, 255).astype(np.uint8)
            if segmap is None:
                segmap = (segmenter or naive_person_segmenter)(img_u8[None])[0]
            segmap = np.asarray(segmap).astype(np.int64)
            bg_u8 = None
            if bg_img is not None:
                bg_u8 = bg_img if bg_img.dtype == np.uint8 else (
                    (bg_img + 1) * 127.5).clip(0, 255).astype(np.uint8)
                bg_u8 = _resize_np(bg_u8.astype(np.float32), res).astype(np.uint8)
            prep = prepare_source(img_u8, segmap, bg_img=bg_u8)
            to_pm1 = lambda u8: jnp.asarray(u8.astype(np.float32) / 127.5 - 1.0)[None]
            head_img = to_pm1(prep["head_img"])

            def kp_of(idc_, exp_, euler_, trans_):
                lm = reconstruct_lm2d(self.assets, idc_, exp_, euler_, trans_)
                lm = jnp.clip((lm - 0.5) / 0.5, -1, 1)
                return jnp.concatenate([lm, jnp.zeros_like(lm[..., :1])], -1)

            kp_src = kp_of(src_coeffs["id"], src_coeffs["exp"],
                           src_coeffs["euler"], src_coeffs["trans"])
            kp_drv_seq = kp_of(idc, exp_seq, euler, trans)  # [T,68,3]
            # temporal smoothing of the driving kps (`real3d_infer.py:452`)
            kp_drv_seq = smooth_features_1d(
                kp_drv_seq.reshape(t, -1), kernel_size=7).reshape(t, 68, 3)

            cond = {
                "ref_torso_img": to_pm1(prep["torso_img"]),
                "bg_img": to_pm1(prep["bg_img"]),
                "segmap": jnp.asarray(prep["segmap_onehot"])[None],
                "kp_src": kp_src,
                "kp_drv": kp_drv_seq[:1],  # per-frame below
            }
            # the canonical plane sees the head-only image (`:469`)
            cano_plane = self._cal_cano(self.model_variables, head_img)
        else:
            cano_plane = self._cal_cano(self.model_variables, img)
            seg = jnp.zeros((n_ident, res, res, 6)).at[..., 4].set(1.0)
            cond = {
                "ref_torso_img": img,
                "bg_img": img,
                "segmap": seg,
                "kp_src": jnp.zeros((n_ident, 68, 3)),
                "kp_drv": jnp.zeros((n_ident, 68, 3)),
            }
            if bg_img is not None:
                if bg_img.dtype == np.uint8:
                    bg_img = bg_img.astype(np.float32) / 127.5 - 1.0
                bg = jnp.asarray(_resize_np(bg_img, res))[None]
                cond["bg_img"] = jnp.broadcast_to(bg, img.shape)

        # periodic blink schedule (`real3d_infer.py:411-426`): per-frame eye
        # close percents; only blink frames pay a host round trip for the
        # pixel-space eyelid edit
        blink_percent = np.zeros((t,), np.float32)
        if blink_mode == "periodic":
            from real3dportrait_tpu.inference.edit_secc import blink_eye_for_secc

            period, n_blink = 25 * 5, 5
            profile = np.concatenate([
                np.linspace(0.25, 1.0, n_blink // 2 + 1)[1:],
                np.linspace(1.0, 0.25, n_blink - n_blink // 2),
            ])
            start = period // 2
            while start + n_blink < t:
                blink_percent[start : start + n_blink] = profile
                start += period

        if self.use_torso:
            # per-video torso appearance cache: the appearance extractor
            # (the 3D-conv half of the SR head) depends only on the source
            # torso image + segmap — compute once, reuse every frame (same
            # dataflow as the cano-plane cache)
            cond["torso_appearance"] = self._cal_torso_appearance(
                self.model_variables, cond
            )
            # per-video background cache: the bg encoder (3x 3x3 convs at
            # mid res, ~97 GFLOP/frame at 512^2) depends only on the bg image
            cond["bg_feat"] = self._cal_bg_feat(self.model_variables, cond)

        assert frame_batch == 1 or n_ident == 1, (
            "frame batching and multi-identity batching are mutually exclusive"
        )
        fb = max(int(frame_batch), 1)
        if fb > 1:
            # batch frames along the render's batch (ray) axis: the cached
            # plane and conditioning broadcast; one device step renders fb
            # frames (BASELINE north star: "batching frames across the ray
            # dimension")
            cano_plane = jnp.broadcast_to(cano_plane, (fb,) + cano_plane.shape[1:])
            cond = jax.tree_util.tree_map(
                lambda v: jnp.broadcast_to(v, (fb,) + v.shape[1:]), cond)

        frames = []

        def consume(pending) -> np.ndarray:
            """Fetch + deliver one completed step's frames (host side)."""
            start_p, image, raw, depth = pending
            if fb > 1:
                n_valid = min(fb, t - start_p)
                for k in range(n_valid):
                    frame = np.asarray(image[k])
                    if callback is not None:
                        callback(start_p + k, frame)
                    if not stream_only:
                        frames.append(frame)
                return frame
            if debug_mode:
                from real3dportrait_tpu.utils.visualization import (
                    depth_to_colormap, side_by_side, to_uint8,
                )

                frame = side_by_side(
                    to_uint8(np.asarray(image[0])),
                    to_uint8(np.asarray(raw[0])),
                    depth_to_colormap(np.asarray(depth[0, ..., 0])),
                ).astype(np.float32) / 127.5 - 1.0
            else:
                frame = np.asarray(image if batched else image[0])
            if callback is not None:
                callback(start_p, frame)
            if not stream_only:
                frames.append(frame)
            return frame

        # Double-buffered loop (VERDICT r4 ask #6): dispatch step t BEFORE
        # fetching step t-1's frames, so the ~40 MB/s tunnel download of
        # frame t-1 overlaps step t's device work (the queue is in-order;
        # the reference's --low_memory_usage streaming loop is
        # `real3d_infer.py:455-474`). Only blink frames pay a host
        # round trip that breaks the overlap (the eyelid edit is pixel-space).
        pending = None
        last_frame = None
        for start in range(0, t, fb) if fb > 1 else range(t):
            if fb > 1:
                idxs = np.minimum(np.arange(start, start + fb), t - 1)
                _, tgt_secc = self.secc_renderer.render(
                    idc[idxs], exp_seq[idxs],
                    jnp.zeros((fb, 3)), jnp.zeros((fb, 3)),
                )
                if np.any(blink_percent[idxs] > 0):
                    edited = np.array(tgt_secc)  # writable copy (np.asarray of a jax array is read-only)
                    for k, j in enumerate(idxs):
                        if blink_percent[j] > 0:
                            edited[k] = blink_eye_for_secc(edited[k],
                                                           float(blink_percent[j]))
                    tgt_secc = jnp.asarray(edited)
                secc_cond = jnp.concatenate([
                    jnp.broadcast_to(cano_secc, tgt_secc.shape),
                    jnp.broadcast_to(src_secc, tgt_secc.shape),
                    tgt_secc,
                ], axis=-1)
                cam_i = cameras[idxs]
            else:
                i = start
                _, tgt_secc = self.secc_renderer.render(
                    idc[i : i + 1], exp_seq[i : i + 1], zero, zero
                )
                if blink_percent[i] > 0:
                    edited = blink_eye_for_secc(np.asarray(tgt_secc[0]),
                                                float(blink_percent[i]))
                    tgt_secc = jnp.asarray(edited)[None]
                secc_cond = jnp.concatenate([cano_secc, src_secc, tgt_secc], axis=-1)
                secc_cond = jnp.broadcast_to(
                    secc_cond, (n_ident,) + secc_cond.shape[1:]
                )
                cam_i = jnp.broadcast_to(cameras[i : i + 1], (n_ident, 25))
            if kp_drv_seq is not None:
                if fb > 1:
                    cond = dict(cond, kp_drv=kp_drv_seq[idxs])
                else:
                    cond = dict(cond, kp_drv=jnp.broadcast_to(
                        kp_drv_seq[start : start + 1], (n_ident, 68, 3)))
            image, raw, depth = self._frame_step(
                self.model_variables, cam_i, secc_cond, cano_plane, cond
            )
            if pending is not None:
                last_frame = consume(pending)
            pending = (start, image, raw, depth)
        if pending is not None:
            last_frame = consume(pending)
        if stream_only:
            # low-memory mode: frames went to the callback; return an empty
            # array with the right trailing shape rather than a surprising
            # single-frame stack
            return np.zeros((0,) + np.asarray(last_frame).shape, np.float32)
        return np.stack(frames)

    # -- top level -----------------------------------------------------------

    def motion_from_video(self, video_path: str,
                          landmark_extractor=None,
                          max_frames: int | None = None) -> dict:
        """Fit {exp, euler, trans} from a driving video (the reference's
        drv_aud/drv_pose=*.mp4 modes, `real3d_infer.py:227-228,286-288`)."""
        from real3dportrait_tpu.inference.infer_utils import motion_from_video

        return motion_from_video(video_path, self.assets,
                                 landmark_extractor=landmark_extractor,
                                 max_frames=max_frames)

    def run(
        self,
        src_img: np.ndarray,
        wav: np.ndarray | None = None,
        hubert: np.ndarray | None = None,
        drv_motion: dict | None = None,       # {exp[,euler,trans]} video-driven
        src_lm2d: np.ndarray | None = None,
        pose_seq: tuple | None = None,
        bg_img: np.ndarray | None = None,
        temperature: float = 0.2,
        mouth_amp: float = 0.4,
        out_path: str | None = None,
        fps: int = 25,
        out_mode: str = "final",              # final | concat_debug
        low_memory: bool = False,
        frame_batch: int = 1,
        blink_mode: str = "periodic",         # periodic | none
        min_face_area_percent: float = 0.2,
    ) -> np.ndarray:
        """Full audio- or video-driven synthesis; frames [T,H,W,3] in [-1,1].

        Driving signal precedence mirrors the reference
        (`real3d_infer.py:200-237`): ``drv_motion`` (a coefficient dict fit
        from a driving video or loaded from .npy) bypasses audio2motion and
        drives the expression directly; otherwise ``wav``/``hubert`` go
        through the VAE. ``low_memory``: stream frames straight into the
        video writer instead of accumulating them (--low_memory_usage).
        """
        if src_lm2d is not None and src_img.ndim == 3:
            # enlarge-to-face crop (`real3d_infer.py:76,196`)
            from real3dportrait_tpu.preprocess.segment_utils import crop_on_face_area

            lm_px = np.asarray(src_lm2d)
            if lm_px.max() <= 1.5:  # normalized landmarks -> pixels
                lm_px = lm_px * np.array(src_img.shape[:2][::-1])
            src_img = crop_on_face_area(src_img, lm_px,
                                        min_percent=min_face_area_percent)
        coeffs = self.fit_source(src_lm2d)
        if drv_motion is not None:
            exp_seq = jnp.asarray(drv_motion["exp"])
        else:
            feats, f0 = self.audio_to_features(wav, hubert)
            # sampling key derived from the pipeline seed (`--seed`,
            # `real3d_infer.py:599`: seeds the VAE noise draw)
            self.rng, sample_key = jax.random.split(self.rng)
            exp_seq = self.audio_to_motion(feats, f0, temperature=temperature,
                                           mouth_amp=mouth_amp, key=sample_key)
        debug = out_mode == "concat_debug"
        if low_memory and out_path:
            writer = StreamingVideoWriter(out_path, fps=fps)
            frames = self.synthesize(
                src_img, exp_seq, coeffs, pose_seq=pose_seq, bg_img=bg_img,
                debug_mode=debug, stream_only=True, frame_batch=frame_batch,
                blink_mode=blink_mode,
                callback=lambda i, f: writer.append(f),
            )
            writer.close()
            return frames
        frames = self.synthesize(src_img, exp_seq, coeffs, pose_seq=pose_seq,
                                 bg_img=bg_img, debug_mode=debug,
                                 frame_batch=frame_batch, blink_mode=blink_mode)
        if out_path:
            write_video(frames, out_path, fps=fps, wav=wav)
        return frames


class StreamingVideoWriter:
    """Incremental frame writer (low-memory path): cv2 H.264/mp4v when
    available (this image ships OpenCV but no ffmpeg), then imageio, then a
    raw uint8 stream."""

    def __init__(self, out_path: str, fps: int = 25):
        self.out_path = out_path
        self.fps = fps
        self._cv2 = None
        self._writer = None
        self._fallback = None
        self.count = 0

    def _open(self, u8: np.ndarray):
        try:
            import cv2

            h, w = u8.shape[:2]
            vw = cv2.VideoWriter(self.out_path,
                                 cv2.VideoWriter_fourcc(*"mp4v"),
                                 self.fps, (w, h))
            if vw.isOpened():
                self._cv2 = vw
                return
        except Exception:
            pass
        try:
            import imageio

            self._writer = imageio.get_writer(self.out_path, fps=self.fps)
        except Exception:
            self._fallback = open(self.out_path + ".raw", "wb")
            self._shape = u8.shape

    def append(self, frame: np.ndarray):
        u8 = ((np.clip(frame, -1, 1) + 1) * 127.5).astype(np.uint8)
        if (self._cv2 is None and self._writer is None
                and self._fallback is None):
            self._open(u8)
        if self._cv2 is not None:
            self._cv2.write(u8[..., ::-1])  # RGB -> BGR
        elif self._writer is not None:
            self._writer.append_data(u8)
        else:
            self._fallback.write(u8.tobytes())
        self.count += 1

    def close(self):
        if self._cv2 is not None:
            self._cv2.release()
        if self._writer is not None:
            self._writer.close()
        if self._fallback is not None:
            self._fallback.close()
            import json

            with open(self.out_path + ".meta.json", "w") as f:
                json.dump({"frames": self.count, "shape": list(self._shape),
                           "dtype": "uint8"}, f)


def write_video(frames: np.ndarray, out_path: str, fps: int = 25,
                wav: np.ndarray | None = None) -> None:
    """Write frames ([-1,1] floats) to a video file, or NPY fallback.

    Audio muxing needs an ffmpeg binary (`inference/real3d_infer.py:534`);
    when absent (this image) the wav is saved alongside as ``<out>.wav``.
    """
    u8 = ((np.clip(frames, -1, 1) + 1) * 127.5).astype(np.uint8)
    w = StreamingVideoWriter(out_path, fps=fps)
    for f in frames:
        w.append(f)
    w.close()
    if w._fallback is not None:
        print(f"| no video backend; wrote raw frames to {out_path}.raw")
    if wav is not None:
        _mux_or_save_audio(out_path, wav)


def _mux_or_save_audio(video_path: str, wav: np.ndarray,
                       sr: int = 16000) -> None:
    """ffmpeg audio mux when the binary exists; else save the wav next to
    the video so players / downstream tools can combine them."""
    import shutil
    import struct
    import subprocess

    wav_path = video_path + ".wav"
    pcm = (np.clip(np.asarray(wav, np.float32), -1, 1) * 32767).astype("<i2")
    with open(wav_path, "wb") as f:
        data = pcm.tobytes()
        f.write(b"RIFF" + struct.pack("<I", 36 + len(data)) + b"WAVE")
        f.write(b"fmt " + struct.pack("<IHHIIHH", 16, 1, 1, sr, sr * 2, 2, 16))
        f.write(b"data" + struct.pack("<I", len(data)) + data)
    if shutil.which("ffmpeg"):
        muxed = video_path + ".muxed.mp4"
        try:
            subprocess.run(["ffmpeg", "-y", "-i", video_path, "-i", wav_path,
                            "-c:v", "copy", "-c:a", "aac", "-shortest", muxed],
                           check=True, capture_output=True)
            import os

            os.replace(muxed, video_path)
            os.remove(wav_path)
        except Exception:
            pass
