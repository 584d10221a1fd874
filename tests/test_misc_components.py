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
