"""Weight-drop parity kit: convert -> render -> PSNR/LPIPS in one entrypoint.

The BASELINE.json acceptance criterion is PSNR/LPIPS parity against the
released `240210_real3dportrait_orig` checkpoints. This tool is the whole
pipeline for the day those weights appear, and it runs end-to-end TODAY
against self-generated fixtures (``--selftest``), so nothing needs
hand-assembly later:

1. (optional) ``--torch_a2m/--torch_s2v``: convert the torch checkpoints
   with `tools.convert_torch_ckpt` into native msgpack ckpts;
2. build the flagship pipeline (`configs/real3d_orig.yaml` geometry) from
   the converted (or ``--mock_weights`` random) weights;
3. render the fixture batch: ``<fixtures>/inputs.npz`` holds src_img +
   driving coefficients (id/exp/euler/trans), ``<fixtures>/ref_frames.npy``
   holds the reference-rendered frames (export them on a CUDA box with
   `/root/reference/inference/real3d_infer.py`, out_mode final, same
   drivers);
4. report per-frame + mean PSNR and LPIPS (real `lpips_vgg` when
   ``lpips_vgg_ckpt`` weights are wired, else the pyramid surrogate —
   the kind is stamped into the report), pass/fail against tolerances.

Expected tolerances once real weights exist (documented here so the
weight-drop day has a contract): mean PSNR >= 30 dB and LPIPS(vgg) <= 0.10
over 16 fixture frames — bf16 plane sampling and folded BatchNorms are the
only numeric deviations from the torch graph, both measured < 2e-3 per
tensor in the converter's oracle tests (tests/test_ckpt_convert.py).

Usage::

    # the weight-drop day
    python tools/eval_parity.py --torch_a2m .../audio2secc_vae \
        --torch_s2v .../secc2plane_torso_orig \
        --fixtures fixtures/golden --out /tmp/parity

    # today (no weights): full-mechanics selftest, PSNR must be inf
    python tools/eval_parity.py --selftest --out /tmp/parity
"""

from __future__ import annotations

import json
import os
import sys

import numpy as np

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def build_pipeline(args, a2m_dir: str, s2v_dir: str):
    from real3dportrait_tpu.config import load_config
    from real3dportrait_tpu.inference.pipeline import Real3DPortraitPipeline

    cfg = load_config(os.path.join(HERE, "configs", "real3d_orig.yaml"),
                      overrides=args.hparams)
    # parity renders must integrate with the reference's exact quadrature
    # (48+48); the inference-speed presets are not parity-comparable
    if "sampling_preset" not in (args.hparams or ""):
        cfg = cfg.replace(sampling_preset="reference")
    return Real3DPortraitPipeline(
        cfg=cfg,
        mock_weights=args.mock_weights or not (a2m_dir and s2v_dir),
        a2m_ckpt_dir=a2m_dir,
        secc2video_ckpt_dir=s2v_dir,
        bfm_dir=args.bfm_dir or None,
        use_torso=True,
        seed=0,
    )


def render_fixture_frames(pipe, inputs: dict) -> np.ndarray:
    """Render the fixture drivers exactly as the reference per-frame loop
    does (`real3d_infer.py:436-489`): id/exp sequences + euler/trans pose."""
    import jax.numpy as jnp

    src_img = np.asarray(inputs["src_img"])
    coeffs = {
        "id": jnp.asarray(inputs["id"][:1]),
        "exp": jnp.asarray(inputs["src_exp"][:1]) if "src_exp" in inputs
        else jnp.zeros((1, 64)),
        "euler": jnp.asarray(inputs["euler"][:1]),
        "trans": jnp.asarray(inputs["trans"][:1]),
    }
    return pipe.synthesize(
        src_img,
        jnp.asarray(inputs["exp"]),
        coeffs,
        pose_seq=(np.asarray(inputs["euler"]), np.asarray(inputs["trans"])),
        blink_mode="none",
        prepare_source_images=bool(inputs.get("prepare_source_images", False)),
    )


def make_selftest_fixtures(pipe, path: str, t: int = 4,
                           res: int | None = None) -> None:
    """Generate a synthetic fixture batch + 'reference' frames rendered by
    THIS pipeline (so the selftest closes with PSNR = inf): proves convert ->
    assemble -> render -> metric runs unchanged before real weights exist."""
    res = res or pipe.res
    rng = np.random.RandomState(0)
    inputs = {
        "src_img": rng.uniform(-1, 1, (res, res, 3)).astype(np.float32),
        "id": np.tile(rng.randn(1, 80).astype(np.float32) * 0.1, (t, 1)),
        "exp": rng.randn(t, 64).astype(np.float32) * 0.1,
        "euler": np.zeros((t, 3), np.float32),
        "trans": np.zeros((t, 3), np.float32),
    }
    os.makedirs(path, exist_ok=True)
    np.savez(os.path.join(path, "inputs.npz"), **inputs)
    frames = render_fixture_frames(pipe, inputs)
    np.save(os.path.join(path, "ref_frames.npy"), np.asarray(frames))
    print(f"| wrote selftest fixtures ({t} frames @ {res}^2) -> {path}")


def evaluate(pipe, fixtures: str, out_dir: str, psnr_min: float,
             lpips_max: float) -> dict:
    import jax.numpy as jnp

    from real3dportrait_tpu.metrics import lpips, lpips_kind, psnr

    inputs = dict(np.load(os.path.join(fixtures, "inputs.npz")))
    ref = np.load(os.path.join(fixtures, "ref_frames.npy"))
    if ref.dtype == np.uint8:
        ref = ref.astype(np.float32) / 127.5 - 1.0

    frames = np.asarray(render_fixture_frames(pipe, inputs))
    k = min(len(frames), len(ref))
    frames, ref = frames[:k], ref[:k]

    psnr_v = np.asarray(psnr(jnp.asarray(frames), jnp.asarray(ref)))
    lpips_v = np.asarray(lpips(jnp.asarray(frames), jnp.asarray(ref), pipe.cfg))
    kind = lpips_kind(pipe.cfg)
    report = {
        "frames": int(k),
        "psnr_per_frame": [round(float(v), 3) for v in psnr_v],
        "psnr_mean": round(float(psnr_v.mean()), 3),
        "lpips_kind": kind,
        "lpips_per_frame": [round(float(v), 5) for v in lpips_v],
        "lpips_mean": round(float(lpips_v.mean()), 5),
        "tolerances": {"psnr_min": psnr_min, "lpips_max": lpips_max,
                       "lpips_tolerance_applies": kind == "lpips_vgg"},
        "pass": bool(psnr_v.mean() >= psnr_min
                     and (kind != "lpips_vgg" or lpips_v.mean() <= lpips_max)),
    }
    os.makedirs(out_dir, exist_ok=True)
    with open(os.path.join(out_dir, "parity_report.json"), "w") as f:
        json.dump(report, f, indent=2)
    np.save(os.path.join(out_dir, "rendered_frames.npy"), frames)
    return report


def preset_delta(pipe_ref, args, inputs: dict) -> dict:
    """Render the fixture drivers under the shipped 'fast' preset with the
    SAME weights as the reference-preset pipeline and measure the delta —
    the number that decides whether the shipped default is visually lossless
    (VERDICT r4 ask #4). With mock weights today this exercises the full
    mechanics and gives an untrained-field bound; with real weights it is
    the product claim itself."""
    import jax.numpy as jnp

    from real3dportrait_tpu.inference.pipeline import (
        Real3DPortraitPipeline, SHIPPED_SAMPLING_PRESET,
    )
    from real3dportrait_tpu.metrics import lpips, lpips_kind, psnr

    ref_frames = np.asarray(render_fixture_frames(pipe_ref, inputs))

    cfg_fast = pipe_ref.cfg.replace(sampling_preset=SHIPPED_SAMPLING_PRESET)
    pipe_fast = Real3DPortraitPipeline(
        cfg=cfg_fast, mock_weights=True, bfm_dir=args.bfm_dir or None,
        use_torso=True, seed=0,
    )
    # identical weights: quadrature changes sample counts, not params
    pipe_fast.model_variables = pipe_ref.model_variables
    fast_frames = np.asarray(render_fixture_frames(pipe_fast, inputs))

    k = min(len(fast_frames), len(ref_frames))
    psnr_v = np.asarray(psnr(jnp.asarray(fast_frames[:k]),
                             jnp.asarray(ref_frames[:k])))
    lpips_v = np.asarray(lpips(jnp.asarray(fast_frames[:k]),
                               jnp.asarray(ref_frames[:k]), pipe_ref.cfg))
    return {
        "fast_preset": SHIPPED_SAMPLING_PRESET,
        "frames": int(k),
        "psnr_fast_vs_reference_mean": round(float(psnr_v.mean()), 3),
        "psnr_fast_vs_reference_min": round(float(psnr_v.min()), 3),
        "lpips_kind": lpips_kind(pipe_ref.cfg),
        "lpips_fast_vs_reference_mean": round(float(lpips_v.mean()), 5),
        "weights": "mock" if args.mock_weights or args.selftest else "real",
    }


def main(argv=None) -> int:
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--torch_a2m", default="", help="released audio2secc torch ckpt")
    p.add_argument("--torch_s2v", default="", help="released secc2video torch ckpt")
    p.add_argument("--a2m_ckpt", default="", help="already-converted native ckpt dir")
    p.add_argument("--s2v_ckpt", default="", help="already-converted native ckpt dir")
    p.add_argument("--fixtures", default="", help="dir with inputs.npz + ref_frames.npy")
    p.add_argument("--out", required=True)
    p.add_argument("--bfm_dir", default="")
    p.add_argument("--mock_weights", action="store_true")
    p.add_argument("--selftest", action="store_true",
                   help="mock weights + self-generated fixtures (PSNR must be inf)")
    p.add_argument("--psnr_min", type=float, default=30.0)
    p.add_argument("--lpips_max", type=float, default=0.10)
    p.add_argument("--hparams", default="", help="config overrides a=1,b=2")
    p.add_argument("--no_preset_delta", action="store_true",
                   help="skip the fast-vs-reference quadrature delta render")
    args = p.parse_args(argv)

    a2m_dir, s2v_dir = args.a2m_ckpt, args.s2v_ckpt
    if args.torch_a2m or args.torch_s2v:
        from tools.convert_torch_ckpt import main as convert_main

        conv_out = os.path.join(args.out, "converted")
        conv_args = ["--out", conv_out, "--backbone_mode", "composite"]
        if args.torch_a2m:
            conv_args += ["--audio2secc", args.torch_a2m]
            a2m_dir = os.path.join(conv_out, "audio2secc")
        if args.torch_s2v:
            conv_args += ["--secc2video", args.torch_s2v]
            s2v_dir = os.path.join(conv_out, "secc2video")
        convert_main(conv_args)

    if args.selftest:
        args.mock_weights = True
    pipe = build_pipeline(args, a2m_dir, s2v_dir)

    fixtures = args.fixtures
    if args.selftest and not fixtures:
        fixtures = os.path.join(args.out, "fixtures")
        make_selftest_fixtures(pipe, fixtures)

    report = evaluate(pipe, fixtures, args.out, args.psnr_min, args.lpips_max)

    if not args.no_preset_delta:
        inputs = dict(np.load(os.path.join(fixtures, "inputs.npz")))
        report["sampling_preset_delta"] = preset_delta(pipe, args, inputs)
        with open(os.path.join(args.out, "parity_report.json"), "w") as f:
            json.dump(report, f, indent=2)

    print(json.dumps({k: report[k] for k in
                      ("frames", "psnr_mean", "lpips_mean", "lpips_kind", "pass")}))
    if "sampling_preset_delta" in report:
        print(json.dumps({"sampling_preset_delta":
                          report["sampling_preset_delta"]}))
    print(f"| full report -> {os.path.join(args.out, 'parity_report.json')}")
    return 0 if report["pass"] else 1


if __name__ == "__main__":
    sys.exit(main())
