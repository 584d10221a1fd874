"""Inference CLI.

Flag surface mirrors `inference/real3d_infer.py:582-624`:

``python -m real3dportrait_tpu.inference.cli --src_img face.png
--drv_aud speech.wav [--drv_pose pose.npy] [--bg_img bg.png]
--out_name out.mp4 [--mock_weights] [--temperature 0.2] ...``
"""

from __future__ import annotations

import argparse


def load_image(path: str):
    import numpy as np

    if path.endswith(".npy"):
        return np.load(path)
    try:
        import imageio

        return np.asarray(imageio.imread(path))[..., :3]
    except Exception:
        from PIL import Image

        return __import__("numpy").asarray(Image.open(path).convert("RGB"))


def load_wav(path: str):
    import numpy as np

    if path.endswith(".npy"):
        return np.load(path).astype(np.float32)
    import wave

    with wave.open(path, "rb") as w:
        assert w.getframerate() == 16000, "expecting 16 kHz wav"
        data = np.frombuffer(w.readframes(w.getnframes()), dtype=np.int16)
        if w.getnchannels() > 1:
            data = data.reshape(-1, w.getnchannels()).mean(-1)
        return (data / 32768.0).astype(np.float32)


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--src_img", required=True)
    p.add_argument("--drv_aud", required=True,
                   help="16kHz wav, .npy (HuBERT features or a motion-coeff "
                        "dict), or .mp4 (video-driven expression, "
                        "`real3d_infer.py:227-228`)")
    p.add_argument("--drv_pose", default="static",
                   help="'static', .npy coeff dict (euler,trans), or .mp4 "
                        "(pose fit from a driving video, "
                        "`real3d_infer.py:286-288`)")
    p.add_argument("--map_to_init_pose", default="True",
                   help="offset the driving pose so frame 0 matches the source"
                        " (`real3d_infer.py:598`)")
    p.add_argument("--bg_img", default="")
    p.add_argument("--out_name", default="output.mp4")
    p.add_argument("--out_mode", default="final", choices=["final", "concat_debug"])
    p.add_argument("--a2m_ckpt", default="")
    p.add_argument("--s2v_ckpt", default="")
    p.add_argument("--bfm_dir", default="")
    p.add_argument("--hubert_path", default="")
    p.add_argument("--temperature", type=float, default=0.2)
    p.add_argument("--mouth_amp", type=float, default=0.45)
    p.add_argument("--blink_mode", default="period", choices=["period", "none"],
                   help="periodic eyelid edits on the SECC maps "
                        "(`real3d_infer.py:594`)")
    p.add_argument("--head_torso_threshold", type=float, default=None,
                   help="0.1~1.0; turn up if the hair is translucent "
                        "(-> htbsr_head_threshold, `real3d_infer.py:159-160`)")
    p.add_argument("--min_face_area_percent", type=float, default=0.2,
                   help="crop the source so the face covers at least this "
                        "fraction (`real3d_infer.py:600`)")
    p.add_argument("--seed", type=int, default=None,
                   help="sampling seed; default = time-derived "
                        "(`real3d_infer.py:599`)")
    from real3dportrait_tpu.inference.pipeline import SHIPPED_SAMPLING_PRESET

    p.add_argument("--sampling_preset", default=SHIPPED_SAMPLING_PRESET,
                   choices=["reference", "balanced", "fast", "config"],
                   help="volume-render quadrature: reference=48+48 samples/"
                        "ray (the exact reference scheme), balanced=24+32 "
                        "(68.6 dB PSNR of it), fast=16+32 (64.5 dB; the "
                        "default — both are far beyond 8-bit visibility, "
                        "see BASELINE.md round 4), config=YAML values")
    p.add_argument("--fps", type=int, default=25)
    p.add_argument("--mock_weights", action="store_true",
                   help="random-init models (no checkpoints available)")
    p.add_argument("--low_memory_usage", action="store_true",
                   help="stream frames to the writer instead of buffering")
    p.add_argument("--frame_batch", type=int, default=1,
                   help="frames rendered per device step (throughput mode)")
    p.add_argument("--head_only", action="store_true", help="skip torso/bg fusion")
    p.add_argument("--hparams", default="", help="config overrides a.b=1,c=2")
    args = p.parse_args()

    import numpy as np

    from real3dportrait_tpu.config import load_config, parse_overrides
    from real3dportrait_tpu.inference.pipeline import Real3DPortraitPipeline

    import os

    root = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    cfg = load_config(os.path.join(root, "configs", "secc_img2plane_torso.yaml"),
                      overrides=args.hparams)
    cfg = cfg.replace(
        map_to_init_pose=args.map_to_init_pose in ("True", "true", "1", True)
    )
    if args.head_torso_threshold is not None:
        cfg = cfg.replace(htbsr_head_threshold=args.head_torso_threshold)
    cfg = cfg.replace(sampling_preset=args.sampling_preset)

    import time

    seed = args.seed if args.seed is not None else int(time.time()) % (2**31)
    pipe = Real3DPortraitPipeline(
        cfg=cfg,
        mock_weights=args.mock_weights or not (args.a2m_ckpt and args.s2v_ckpt),
        a2m_ckpt_dir=args.a2m_ckpt,
        secc2video_ckpt_dir=args.s2v_ckpt,
        bfm_dir=args.bfm_dir or None,
        use_torso=not args.head_only,
        hubert_path=args.hubert_path or None,
        seed=seed,
    )

    src = load_image(args.src_img)
    wav, hubert, drv_motion = None, None, None
    if args.drv_aud.endswith(".mp4"):
        # video-driven expression: 3DMM fit over the driving video
        drv_motion = pipe.motion_from_video(args.drv_aud)
        print(f"| extracted {len(drv_motion['exp'])} exp frames from {args.drv_aud}")
    elif args.drv_aud.endswith(".npy"):
        from real3dportrait_tpu.inference.infer_utils import load_motion_coeff_npy

        drv_motion = load_motion_coeff_npy(args.drv_aud)
        if drv_motion is None:  # plain array: precomputed HuBERT features
            hubert = np.load(args.drv_aud).astype(np.float32)
    else:
        wav = load_wav(args.drv_aud)
    pose = None
    if args.drv_pose not in ("", "static"):
        if args.drv_pose.endswith(".mp4"):
            pose_coeffs = pipe.motion_from_video(args.drv_pose)
            pose = (np.asarray(pose_coeffs["euler"]),
                    np.asarray(pose_coeffs["trans"]))
            print(f"| extracted {len(pose[0])} pose frames from {args.drv_pose}")
        else:
            pose_arr = np.load(args.drv_pose, allow_pickle=True)
            if isinstance(pose_arr, np.ndarray) and pose_arr.dtype == object:
                pose_arr = pose_arr.item()
            pose = (np.asarray(pose_arr["euler"]), np.asarray(pose_arr["trans"]))
    bg = load_image(args.bg_img) if args.bg_img else None

    frames = pipe.run(
        src, wav=wav, hubert=hubert, drv_motion=drv_motion,
        pose_seq=pose, bg_img=bg,
        temperature=args.temperature, mouth_amp=args.mouth_amp,
        out_path=args.out_name, fps=args.fps,
        out_mode=args.out_mode, low_memory=args.low_memory_usage,
        frame_batch=args.frame_batch,
        blink_mode="periodic" if args.blink_mode == "period" else "none",
        min_face_area_percent=args.min_face_area_percent,
    )
    print(f"| wrote {len(frames)} frames -> {args.out_name}")


if __name__ == "__main__":
    main()
