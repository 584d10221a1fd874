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
    p.add_argument("--drv_aud", required=True, help="16kHz wav or .npy features")
    p.add_argument("--drv_pose", default="static", help="'static' or .npy (euler,trans)")
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
    p.add_argument("--mouth_amp", type=float, default=0.4)
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

    pipe = Real3DPortraitPipeline(
        cfg=cfg,
        mock_weights=args.mock_weights or not (args.a2m_ckpt and args.s2v_ckpt),
        a2m_ckpt_dir=args.a2m_ckpt,
        secc2video_ckpt_dir=args.s2v_ckpt,
        bfm_dir=args.bfm_dir or None,
        use_torso=not args.head_only,
        hubert_path=args.hubert_path or None,
    )

    src = load_image(args.src_img)
    wav, hubert = None, None
    if args.drv_aud.endswith(".npy"):
        hubert = np.load(args.drv_aud).astype(np.float32)  # precomputed features
    else:
        wav = load_wav(args.drv_aud)
    pose = None
    if args.drv_pose not in ("", "static"):
        pose_arr = np.load(args.drv_pose, allow_pickle=True)
        if isinstance(pose_arr, np.ndarray) and pose_arr.dtype == object:
            pose_arr = pose_arr.item()
        pose = (np.asarray(pose_arr["euler"]), np.asarray(pose_arr["trans"]))
    bg = load_image(args.bg_img) if args.bg_img else None

    frames = pipe.run(
        src, wav=wav, hubert=hubert, pose_seq=pose, bg_img=bg,
        temperature=args.temperature, mouth_amp=args.mouth_amp,
        out_path=args.out_name, fps=args.fps,
        out_mode=args.out_mode, low_memory=args.low_memory_usage,
        frame_batch=args.frame_batch,
    )
    print(f"| wrote {len(frames)} frames -> {args.out_name}")


if __name__ == "__main__":
    main()
