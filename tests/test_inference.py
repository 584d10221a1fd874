import numpy as np
import pytest

# heavy end-to-end module: excluded from the fast gating tier
pytestmark = pytest.mark.slow

from real3dportrait_tpu.config import FrozenConfig

TINY_CFG = FrozenConfig({
    "final_resolution": 64,
    "neural_rendering_resolution": 16,
    "secc_resolution": 64,
    "triplane_hid_dim": 8,
    "triplane_depth": 2,
    "num_samples_coarse": 6,
    "num_samples_fine": 6,
    "sr_channel0": 16,
    "sr_channel1": 8,
    "num_fp16_layers_in_super_resolution": 0,
    "torso_model_scale": "tiny",
    "audio_type": "hubert",
    "use_flow": True,
})


@pytest.fixture(scope="module")
def pipe():
    from real3dportrait_tpu.inference.pipeline import Real3DPortraitPipeline

    return Real3DPortraitPipeline(cfg=TINY_CFG, mock_weights=True, use_torso=True)


def test_audio_features():
    from real3dportrait_tpu.audio import extract_f0, extract_mel

    sr = 16000
    t = np.arange(sr)  # 1 second
    wav = (0.5 * np.sin(2 * np.pi * 220.0 * t / sr)).astype(np.float32)
    mel = extract_mel(wav)
    assert mel.shape[1] == 80
    assert 45 <= mel.shape[0] <= 55  # ~50 fps
    f0 = extract_f0(wav)
    voiced = f0[f0 > 0]
    assert len(voiced) > 10
    np.testing.assert_allclose(np.median(voiced), 220.0, rtol=0.05)


def test_fit_3dmm_recovers_pose():
    import jax.numpy as jnp

    from real3dportrait_tpu.geometry import face3d_helper, synthetic_bfm
    from real3dportrait_tpu.geometry.fit_3dmm import fit_coeffs

    assets = synthetic_bfm(n_vertices=256)
    true_euler = jnp.array([[0.1, -0.15, 0.05]])
    true_trans = jnp.array([[0.05, -0.02, 0.1]])
    true_exp = jnp.zeros((1, 64)).at[0, 0].set(0.3)
    lm2d = face3d_helper.reconstruct_lm2d(
        assets, jnp.zeros((1, 80)), true_exp, true_euler, true_trans
    )
    fit = fit_coeffs(assets, lm2d, n_pose_iters=150, n_joint_iters=150, lr=0.03)
    pred = face3d_helper.reconstruct_lm2d(assets, fit.id, fit.exp, fit.euler, fit.trans)
    err = float(jnp.abs(pred - lm2d).mean())
    assert err < 0.01  # sub-pixel in the normalized frame
    assert float(fit.loss) < 1e-3


def test_pipeline_end_to_end(pipe):
    rng = np.random.RandomState(0)
    src = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    sr = 16000
    wav = (0.3 * np.sin(2 * np.pi * 180 * np.arange(int(0.6 * sr)) / sr)).astype(np.float32)
    frames = pipe.run(src, wav=wav, temperature=0.2)
    assert frames.ndim == 4 and frames.shape[1:] == (64, 64, 3)
    assert frames.shape[0] >= 5  # ~0.6s at 25fps => ~14 frames (padded to /8)
    assert np.isfinite(frames).all()
    assert frames.min() >= -1.0 and frames.max() <= 1.0


def test_pipeline_pose_driven(pipe):
    rng = np.random.RandomState(1)
    src = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    feats = rng.randn(16, 1024).astype(np.float32)
    f0 = np.abs(rng.randn(16)).astype(np.float32) * 200
    exp_seq = pipe.audio_to_motion(feats, f0)
    assert exp_seq.shape == (8, 64)
    # short pose sequence gets ping-pong looped to the frame count
    pose = (rng.randn(3, 3).astype(np.float32) * 0.1,
            rng.randn(3, 3).astype(np.float32) * 0.05)
    coeffs = pipe.fit_source(None)
    frames = pipe.synthesize(src, exp_seq, coeffs, pose_seq=pose)
    assert frames.shape[0] == 8


def test_pipeline_video_writer(tmp_path):
    from real3dportrait_tpu.inference.pipeline import write_video

    frames = np.zeros((3, 16, 16, 3), np.float32)
    out = str(tmp_path / "out.mp4")
    write_video(frames, out)
    import os

    assert os.path.isfile(out) or os.path.isfile(out + ".npy")


def test_pipeline_batched_multi_identity(pipe):
    rng = np.random.RandomState(2)
    srcs = rng.uniform(-1, 1, (2, 64, 64, 3)).astype(np.float32)
    feats = rng.randn(16, 1024).astype(np.float32)
    f0 = np.abs(rng.randn(16)).astype(np.float32) * 200
    exp_seq = pipe.audio_to_motion(feats, f0)
    coeffs = pipe.fit_source(None)
    frames = pipe.synthesize(srcs, exp_seq, coeffs, blink_mode="none")
    assert frames.shape == (8, 2, 64, 64, 3)  # [T, N, H, W, 3]
    # identities differ because canonical planes differ
    assert float(np.abs(frames[:, 0] - frames[:, 1]).mean()) > 1e-4


def test_audio2motion_task_uses_binarized_store(tmp_path):
    from real3dportrait_tpu.config import FrozenConfig
    from real3dportrait_tpu.data.binarizer import binarize, make_synthetic_records
    from real3dportrait_tpu.training.tasks.audio2motion_task import Audio2MotionTask

    import os

    store_dir = str(tmp_path)
    binarize(make_synthetic_records(n_videos=2, t=48), os.path.join(store_dir, "train"))
    cfg = FrozenConfig({"batch_size": 2, "sample_min_length": 16, "lr": 1e-3,
                        "binary_data_dir": store_dir, "max_frames": 32,
                        "max_tokens_per_batch": 500, "max_sentences_per_batch": 4})
    task = Audio2MotionTask(cfg)
    batch = next(iter(task.train_data()))
    assert batch["audio"].shape[-1] == 1024
    assert batch["y"].shape[-1] == 64
    # and the batch trains
    import jax, jax.numpy as jnp

    state = task.build(jax.random.PRNGKey(0))
    batch = jax.tree_util.tree_map(jnp.asarray, batch)
    state, metrics = jax.jit(task.train_step)(state, batch, jax.random.PRNGKey(0))
    assert bool(jnp.isfinite(metrics["total_loss"]))


def test_pipeline_frame_batched(pipe):
    rng = np.random.RandomState(3)
    src = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    feats = rng.randn(24, 1024).astype(np.float32)
    f0 = np.abs(rng.randn(24)).astype(np.float32) * 200
    exp_seq = pipe.audio_to_motion(feats, f0)  # 12 frames
    coeffs = pipe.fit_source(None)
    ref = pipe.synthesize(src, exp_seq, coeffs, blink_mode="none", frame_batch=1)
    fast = pipe.synthesize(src, exp_seq, coeffs, blink_mode="none", frame_batch=4)
    assert fast.shape == ref.shape == (12, 64, 64, 3)
    np.testing.assert_allclose(fast, ref, atol=2e-3)
    # non-divisible frame count (12 % 5 != 0) also works
    fast5 = pipe.synthesize(src, exp_seq, coeffs, blink_mode="none", frame_batch=5)
    assert fast5.shape == (12, 64, 64, 3)


def _write_test_mp4(path: str, t: int = 12, size: int = 64) -> bool:
    """Synthetic driving video: a person-ish blob whose face region drifts
    horizontally. Returns False if no cv2 video backend is available."""
    import cv2

    vw = cv2.VideoWriter(path, cv2.VideoWriter_fourcc(*"mp4v"), 25, (size, size))
    if not vw.isOpened():
        return False
    for i in range(t):
        frame = np.zeros((size, size, 3), np.uint8)
        cx = size // 2 + int(6 * np.sin(2 * np.pi * i / t))
        # face blob in the face band (0.15..0.55 of height), body below
        cv2.circle(frame, (cx, int(size * 0.35)), size // 6, (200, 170, 150), -1)
        cv2.rectangle(frame, (cx - size // 4, int(size * 0.6)),
                      (cx + size // 4, size - 1), (90, 90, 160), -1)
        vw.write(frame)
    vw.release()
    return True


def test_video_driven(pipe, tmp_path):
    """drv_aud=*.mp4 mode: exp fit from a driving video drives the synthesis
    directly (`real3d_infer.py:227-228`), pose from a second driving video
    (`real3d_infer.py:286-288`)."""
    vid = str(tmp_path / "drv.mp4")
    if not _write_test_mp4(vid):
        pytest.skip("no cv2 video encoder in this image")

    motion = pipe.motion_from_video(vid, max_frames=12)
    assert motion["exp"].shape[1] == 64
    assert motion["euler"].shape == motion["trans"].shape == (motion["exp"].shape[0], 3)
    t = motion["exp"].shape[0]
    assert t >= 8
    # the drifting face must induce a non-constant fitted pose
    assert float(np.std(np.asarray(motion["trans"]), axis=0).max()) > 1e-4

    rng = np.random.RandomState(4)
    src = rng.uniform(-1, 1, (64, 64, 3)).astype(np.float32)
    frames = pipe.run(
        src,
        drv_motion={k: np.asarray(v) for k, v in motion.items()},
        pose_seq=(np.asarray(motion["euler"]), np.asarray(motion["trans"])),
        blink_mode="none",
    )
    assert frames.shape == (t, 64, 64, 3)
    assert np.isfinite(frames).all()


def test_motion_coeff_npy_detection(tmp_path):
    """drv_aud=*.npy holding a coeff dict is detected as video-style motion;
    a plain float array is treated as precomputed audio features
    (`real3d_infer.py:231-235`)."""
    from real3dportrait_tpu.inference.infer_utils import load_motion_coeff_npy

    coeffs = {"exp": np.zeros((5, 64), np.float32),
              "euler": np.zeros((5, 3), np.float32),
              "trans": np.zeros((5, 3), np.float32)}
    p1 = str(tmp_path / "motion.npy")
    np.save(p1, coeffs, allow_pickle=True)
    out = load_motion_coeff_npy(p1)
    assert out is not None and out["exp"].shape == (5, 64)

    p2 = str(tmp_path / "hubert.npy")
    np.save(p2, np.zeros((10, 1024), np.float32))
    assert load_motion_coeff_npy(p2) is None


def test_cli_video_driven_smoke(tmp_path, monkeypatch):
    """End-to-end CLI run with an mp4 driver + reference knobs
    (`real3d_infer.py:592-601`)."""
    import sys

    vid = str(tmp_path / "drv.mp4")
    if not _write_test_mp4(vid):
        pytest.skip("no cv2 video encoder in this image")
    src_p = str(tmp_path / "src.npy")
    np.save(src_p, np.random.RandomState(0).uniform(0, 255, (64, 64, 3)).astype(np.uint8))
    out_p = str(tmp_path / "out.mp4")
    tiny_overrides = ",".join(f"{k}={v}" for k, v in TINY_CFG.to_dict().items()
                              if k != "audio_type")
    argv = ["cli", "--src_img", src_p, "--drv_aud", vid, "--drv_pose", vid,
            "--out_name", out_p, "--mock_weights", "--blink_mode", "none",
            "--head_torso_threshold", "0.8", "--min_face_area_percent", "0.2",
            "--seed", "0", "--hparams", tiny_overrides]
    monkeypatch.setattr(sys, "argv", argv)
    from real3dportrait_tpu.inference.cli import main as cli_main

    cli_main()
    import os

    assert (os.path.isfile(out_p) or os.path.isfile(out_p + ".npy")
            or os.path.isfile(out_p + ".raw"))


def test_map_pose_to_source():
    """z-fix + map-to-init-pose (`real3d_infer.py:300-309`)."""
    import numpy as np

    from real3dportrait_tpu.inference.infer_utils import map_pose_to_source

    rng = np.random.RandomState(0)
    euler = rng.randn(6, 3).astype(np.float32) * 0.2
    trans = rng.randn(6, 3).astype(np.float32) * 0.1
    src_e = np.asarray([0.1, -0.2, 0.05], np.float32)
    src_t = np.asarray([0.02, 0.03, -0.4], np.float32)
    e2, t2 = map_pose_to_source(euler, trans, src_e, src_t)
    # frame 0 coincides with the source pose
    np.testing.assert_allclose(np.asarray(e2[0]), src_e, atol=1e-6)
    np.testing.assert_allclose(np.asarray(t2[0]), src_t, atol=1e-6)
    # relative motion is preserved
    np.testing.assert_allclose(np.asarray(e2[3] - e2[0]),
                               euler[3] - euler[0], atol=1e-6)
    # depth is constant (z-fix applied before the offset)
    assert np.allclose(np.asarray(t2[:, 2]), src_t[2], atol=1e-6)
    # disabled mapping keeps the raw (z-fixed) sequence
    e3, t3 = map_pose_to_source(euler, trans, src_e, src_t, map_to_init=False)
    np.testing.assert_allclose(np.asarray(e3), euler, atol=1e-6)
    assert np.allclose(np.asarray(t3[:, 2]), trans[0, 2], atol=1e-6)


def test_sampling_presets_plumb_to_model():
    """--sampling_preset overrides the YAML quadrature; 'config' honors it."""
    from real3dportrait_tpu.inference.pipeline import (
        Real3DPortraitPipeline, SAMPLING_PRESETS)

    assert SAMPLING_PRESETS["reference"] == (48, 48)
    cfg = TINY_CFG.replace(sampling_preset="balanced")
    p = Real3DPortraitPipeline(cfg=cfg, mock_weights=True, use_torso=False)
    assert (p.model.num_samples_coarse, p.model.num_samples_fine) == (24, 32)
    p2 = Real3DPortraitPipeline(cfg=TINY_CFG, mock_weights=True,
                                use_torso=False)
    assert (p2.model.num_samples_coarse, p2.model.num_samples_fine) == (6, 6)
