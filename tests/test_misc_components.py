import jax
import jax.numpy as jnp
import numpy as np

from real3dportrait_tpu.inference.infer_utils import (
    motion_from_video_landmarks,
    smooth_features_1d,
)
from real3dportrait_tpu.models.temporal_att import TemporalAttNet
from real3dportrait_tpu.ops.upfirdn2d import filtered_lrelu, setup_filter


def test_temporal_att_net(rng):
    net = TemporalAttNet(seq_len=5, probe_size=16)
    window = jax.random.normal(rng, (2, 5, 8, 8, 6))
    variables = net.init(jax.random.PRNGKey(0), window)
    out = net.apply(variables, window)
    assert out.shape == (2, 8, 8, 6)
    # attention-weighted average stays within the window's convex hull
    lo = np.asarray(window.min(axis=1))
    hi = np.asarray(window.max(axis=1))
    o = np.asarray(out)
    assert np.all(o >= lo - 1e-5) and np.all(o <= hi + 1e-5)


def test_filtered_lrelu_shapes_and_activation():
    f = setup_filter([1, 3, 3, 1])
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    y = filtered_lrelu(x, f, up=2, down=2)
    assert y.shape == x.shape  # up then down restores the size
    # pure upsample variant doubles the size
    y2 = filtered_lrelu(x, f, up=2, down=1)
    assert y2.shape == (1, 16, 16, 4)
    # negative inputs attenuated by the slope
    big_neg = filtered_lrelu(jnp.full((1, 8, 8, 1), -1.0), f)
    big_pos = filtered_lrelu(jnp.full((1, 8, 8, 1), 1.0), f)
    assert abs(float(big_neg[0, 4, 4, 0])) < abs(float(big_pos[0, 4, 4, 0]))


def test_smooth_features_1d():
    t = 30
    x = jnp.zeros((t, 4)).at[:, 0].set(
        jnp.sin(jnp.linspace(0, 6, t))
        + jax.random.normal(jax.random.PRNGKey(0), (t,)) * 0.3
    )
    sm = smooth_features_1d(x)
    assert sm.shape == x.shape
    # high-frequency energy reduced
    assert float(jnp.var(jnp.diff(sm[:, 0]))) < float(jnp.var(jnp.diff(x[:, 0])))
    # length-1 passthrough
    one = jnp.ones((1, 4))
    np.testing.assert_array_equal(np.asarray(smooth_features_1d(one)), np.asarray(one))


def test_motion_from_video_landmarks():
    from real3dportrait_tpu.geometry import face3d_helper, synthetic_bfm

    assets = synthetic_bfm(n_vertices=256)
    t = 9
    euler = jnp.asarray(np.linspace([0, -0.1, 0], [0.05, 0.1, 0.02], t), jnp.float32)
    trans = jnp.zeros((t, 3))
    exp = jnp.zeros((t, 64))
    lm2d = face3d_helper.reconstruct_lm2d(assets, jnp.zeros((t, 80)), exp, euler, trans)
    out = motion_from_video_landmarks(assets, np.asarray(lm2d))
    assert out["exp"].shape == (t, 64)
    assert out["euler"].shape == (t, 3)
    # recovered yaw trend should correlate with ground truth
    corr = np.corrcoef(np.asarray(out["euler"][:, 1]), np.asarray(euler[:, 1]))[0, 1]
    assert corr > 0.8


def test_mfcc_vad_griffinlim():
    from real3dportrait_tpu.audio import extract_mel, extract_mfcc, griffin_lim, vad

    sr = 16000
    t = np.arange(sr)
    tone = (0.4 * np.sin(2 * np.pi * 300 * t / sr)).astype(np.float32)
    silence = np.zeros(sr, np.float32)
    wav = np.concatenate([tone, silence])
    mf = extract_mfcc(wav)
    assert mf.shape[1] == 13
    activity = vad(wav)
    # first half voiced, second half silent
    half = len(activity) // 2
    assert activity[: half - 3].mean() > 0.9
    assert activity[half + 3 :].mean() < 0.1
    # griffin-lim reconstructs a tone with dominant energy at ~300 Hz
    n_fft = 512
    idx = np.arange(n_fft)[None, :] + 320 * np.arange(40)[:, None]
    mag = np.abs(np.fft.rfft(tone[idx] * np.hanning(n_fft), axis=-1))
    rec = griffin_lim(mag, n_iters=10)
    spec = np.abs(np.fft.rfft(rec[: sr // 2]))
    freq = np.fft.rfftfreq(sr // 2, 1 / sr)
    assert abs(freq[np.argmax(spec)] - 300) < 20


def test_visualization_helpers():
    from real3dportrait_tpu.utils.visualization import (
        depth_to_colormap, draw_landmarks, image_grid, side_by_side,
    )

    img = np.zeros((32, 32, 3), np.float32)
    lm = np.random.RandomState(0).rand(68, 2)
    drawn = draw_landmarks(img, lm)
    assert drawn.dtype == np.uint8 and drawn.sum() > 0
    grid = image_grid([img, img, img])
    assert grid.ndim == 3
    depth = depth_to_colormap(np.random.RandomState(0).rand(16, 16))
    assert depth.shape == (16, 16, 3)
    sbs = side_by_side(img, img[:16])
    assert sbs.shape[0] == 32 and sbs.shape[1] > 32


def test_precision_recall_and_ppl():
    from real3dportrait_tpu.metrics.gan_metrics import (
        perceptual_path_length, precision_recall,
    )

    rng = np.random.RandomState(0)
    a = rng.randn(200, 8)
    p, r = precision_recall(a, a + rng.randn(200, 8) * 0.01)
    assert p > 0.9 and r > 0.9
    p2, r2 = precision_recall(a, a + 10.0)
    assert p2 < 0.1 and r2 < 0.1

    # smooth generator -> small ppl; discontinuous-ish -> larger
    import jax.numpy as jnp

    def smooth(z):
        return jnp.broadcast_to(z[:, :1, None, None], (z.shape[0], 32, 32, 1)) * jnp.ones((1, 32, 32, 3)) * 0.01

    ppl_val = perceptual_path_length(smooth, z_dim=8, n_samples=8, epsilon=1e-2)
    assert np.isfinite(ppl_val) and ppl_val >= 0


def test_visualization_suite():
    """Spec/attention/t-SNE/landmark-video helpers (`utils/visualization/`)."""
    import numpy as np

    from real3dportrait_tpu.utils import visualization as V

    fig = V.spec_to_figure(np.random.rand(50, 80),
                           f0s={"f0": np.random.rand(50) * 300})
    img = V.figure_to_image(fig)
    assert img.ndim == 3 and img.shape[-1] == 3

    att = V.plot_attention_img(np.random.rand(16, 16))
    assert att.shape == (16, 16, 3) and att.dtype == np.uint8

    emb = V.tsne_scatter(np.random.randn(30, 8),
                         labels=np.repeat([0, 1, 2], 10))
    assert V.figure_to_image(emb).shape[-1] == 3

    # numpy t-SNE fallback directly (sklearn may or may not exist)
    y = V._tsne_numpy(np.random.randn(24, 6), perplexity=5, n_iter=50)
    assert y.shape == (24, 2) and np.isfinite(y).all()


def test_render_lm3d_video(tmp_path):
    import os
    import shutil

    import numpy as np
    import pytest

    if shutil.which("ffmpeg") is None:
        pytest.skip("no ffmpeg in image")
    from real3dportrait_tpu.utils.visualization import render_lm3d_video

    seq = np.random.randn(4, 68, 3).astype(np.float32)
    out = str(tmp_path / "lm.mp4")
    render_lm3d_video(seq, out, fps=4, size=64)
    assert os.path.exists(out) and os.path.getsize(out) > 0
