import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real3dportrait_tpu.models import (
    Discriminator,
    DualDiscriminator,
    FullyConnectedLayer,
    Generator,
    MappingNetwork,
    MinibatchStdLayer,
    OSGDecoder,
    SuperresolutionHybrid8XDC,
    SynthesisNetwork,
    modulated_conv2d,
)
from real3dportrait_tpu.ops.upfirdn2d import (
    conv2d_resample,
    downsample2d,
    filter2d,
    setup_filter,
    upfirdn2d,
    upsample2d,
)


# --- upfirdn2d --------------------------------------------------------------


def test_setup_filter():
    f = setup_filter([1, 3, 3, 1])
    assert f.shape == (4, 4)
    np.testing.assert_allclose(float(f.sum()), 1.0, rtol=1e-6)


def test_upsample_downsample_shapes_and_dc():
    x = jnp.full((2, 8, 8, 3), 0.7)
    f = setup_filter([1, 3, 3, 1])
    up = upsample2d(x, f)
    assert up.shape == (2, 16, 16, 3)
    # DC gain preserved away from borders
    np.testing.assert_allclose(np.asarray(up[:, 4:-4, 4:-4]), 0.7, rtol=1e-5)
    down = downsample2d(up, f)
    assert down.shape == (2, 8, 8, 3)
    np.testing.assert_allclose(np.asarray(down[:, 2:-2, 2:-2]), 0.7, rtol=1e-5)


def test_filter2d_preserves_shape():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 9, 9, 2))
    f = setup_filter([1, 3, 3, 1])
    y = filter2d(x, f)
    assert y.shape == x.shape


def test_upfirdn2d_matches_torch():
    """Golden check against torch's reference upfirdn2d implementation."""
    import torch

    def torch_upfirdn2d_ref(x, f, up, down, padding, gain=1.0):
        # reference _upfirdn2d_ref from the original StyleGAN codebase
        b, c, ih, iw = x.shape
        px0, px1, py0, py1 = padding
        x = x.reshape(b, c, ih, 1, iw, 1)
        x = torch.nn.functional.pad(x, [0, up - 1, 0, 0, 0, up - 1])
        x = x.reshape(b, c, ih * up, iw * up)
        x = torch.nn.functional.pad(x, [max(px0, 0), max(px1, 0), max(py0, 0), max(py1, 0)])
        x = x[:, :, max(-py0, 0): x.shape[2] - max(-py1, 0), max(-px0, 0): x.shape[3] - max(-px1, 0)]
        ff = f * (gain ** (f.ndim / 2))
        ff = ff.flip(list(range(f.ndim)))[None, None].repeat(c, 1, 1, 1)
        x = torch.nn.functional.conv2d(x, ff, groups=c)
        return x[:, :, ::down, ::down]

    rng = np.random.RandomState(0)
    x = rng.randn(2, 3, 6, 7).astype(np.float32)
    f = np.outer([1, 3, 3, 1], [1, 3, 3, 1]).astype(np.float32)
    f /= f.sum()
    for up, down, pad in [(1, 1, (1, 1, 1, 1)), (2, 1, (2, 1, 2, 1)), (1, 2, (1, 1, 1, 1)), (2, 2, (2, 2, 2, 2))]:
        ref = torch_upfirdn2d_ref(torch.from_numpy(x), torch.from_numpy(f), up, down, pad, gain=up * up)
        ours = upfirdn2d(
            jnp.asarray(x.transpose(0, 2, 3, 1)), jnp.asarray(f), up=up, down=down,
            padding=pad, gain=up * up,
        )
        np.testing.assert_allclose(
            np.asarray(ours).transpose(0, 3, 1, 2), ref.numpy(), rtol=1e-4, atol=1e-5,
            err_msg=f"up={up} down={down}",
        )


def test_phase_up_conv_matches_dilated(monkeypatch):
    """The phase-decomposed (pixel-shuffle) up-conv must equal the
    lhs-dilated lowering bit-for-bit across kernel sizes, paddings, and
    odd/even input sizes (it is the default up path; R3DP_UP_MODE=dilated
    restores the old lowering)."""
    from real3dportrait_tpu.ops.upfirdn2d import conv2d_resample, setup_filter

    f = setup_filter([1, 3, 3, 1])
    rng = np.random.RandomState(0)
    for (h, w_), k, pad in [
        ((8, 8), 3, 1), ((7, 9), 3, 1), ((8, 8), 4, (1, 2, 1, 2)),
        ((6, 6), 1, 0), ((9, 7), 3, (2, 1, 0, 1)), ((8, 8), 5, 2),
    ]:
        x = jnp.asarray(rng.randn(2, h, w_, 4).astype(np.float32))
        wgt = jnp.asarray(rng.randn(k, k, 4, 6).astype(np.float32) * 0.1)
        monkeypatch.setenv("R3DP_UP_MODE", "dilated")
        want = conv2d_resample(x, wgt, f=f, up=2, padding=pad)
        monkeypatch.setenv("R3DP_UP_MODE", "phase")
        got = conv2d_resample(x, wgt, f=f, up=2, padding=pad)
        assert got.shape == want.shape, (k, pad, got.shape, want.shape)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=1e-5, atol=1e-5,
                                   err_msg=f"k={k} pad={pad} hw={(h, w_)}")


def test_conv2d_resample_up2_resolution():
    x = jax.random.normal(jax.random.PRNGKey(0), (1, 8, 8, 4))
    w = jax.random.normal(jax.random.PRNGKey(1), (3, 3, 4, 6)) * 0.1
    f = setup_filter([1, 3, 3, 1])
    y = conv2d_resample(x, w, f=f, up=2, padding=1)
    assert y.shape == (1, 16, 16, 6)
    y2 = conv2d_resample(x, w, f=f, down=2, padding=1)
    assert y2.shape == (1, 4, 4, 6)
    y3 = conv2d_resample(x, w, padding=1)
    assert y3.shape == (1, 8, 8, 6)


# --- modulated conv ---------------------------------------------------------


def test_modulated_conv2d_equivalence_to_explicit_weights():
    """Activation-scaling path == materialized per-sample modulated weights."""
    rng = np.random.RandomState(0)
    b, h, w_, cin, cout, k = 2, 6, 6, 4, 5, 3
    x = jnp.asarray(rng.randn(b, h, w_, cin).astype(np.float32))
    weight = jnp.asarray(rng.randn(k, k, cin, cout).astype(np.float32))
    styles = jnp.asarray(rng.rand(b, cin).astype(np.float32) + 0.5)

    out = modulated_conv2d(x, weight, styles, padding=k // 2)

    # explicit: w_b = weight * style / sqrt(sum((weight*style)^2))
    from jax import lax

    outs = []
    for i in range(b):
        wmod = weight * styles[i][None, None, :, None]
        d = 1.0 / np.sqrt((np.asarray(wmod) ** 2).sum(axis=(0, 1, 2)) + 1e-8)
        wmod = wmod * d[None, None, None, :]
        o = lax.conv_general_dilated(
            x[i : i + 1], wmod, (1, 1), ((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        outs.append(o)
    ref = jnp.concatenate(outs, axis=0)
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), rtol=1e-4, atol=1e-5)


# --- layers / networks ------------------------------------------------------


def test_fully_connected_lr_multiplier_invariant_at_init(rng):
    x = jax.random.normal(rng, (4, 16))
    m1 = FullyConnectedLayer(8, lr_multiplier=1.0)
    m2 = FullyConnectedLayer(8, lr_multiplier=0.01)
    p1 = m1.init(jax.random.PRNGKey(7), x)
    p2 = m2.init(jax.random.PRNGKey(7), x)
    y1 = m1.apply(p1, x)
    y2 = m2.apply(p2, x)
    np.testing.assert_allclose(np.asarray(y1), np.asarray(y2), rtol=1e-4, atol=1e-5)


def test_mapping_network_shapes_and_truncation(rng):
    m = MappingNetwork(z_dim=32, c_dim=25, w_dim=16, num_ws=5, num_layers=2)
    z = jax.random.normal(rng, (3, 32))
    c = jax.random.normal(jax.random.PRNGKey(1), (3, 25))
    variables = m.init(jax.random.PRNGKey(0), z, c)
    ws = m.apply(variables, z, c)
    assert ws.shape == (3, 5, 16)
    # truncation toward w_avg (zeros at init) shrinks the norm
    ws_trunc = m.apply(variables, z, c, truncation_psi=0.5)
    assert float(jnp.abs(ws_trunc).mean()) < float(jnp.abs(ws).mean())
    # EMA update mutates w_avg
    _, mutated = m.apply(variables, z, c, update_emas=True, mutable=["ema"])
    assert float(jnp.abs(mutated["ema"]["w_avg"]).sum()) > 0


@pytest.mark.slow  # fast-tier budget (>15 s on a 1-CPU box)
def test_synthesis_network_tiny(rng):
    net = SynthesisNetwork(w_dim=16, img_resolution=32, img_channels=3,
                           channel_base=512, channel_max=64)
    assert net.num_ws == 1 + 2 * 3 + 1  # blocks at 4,8,16,32
    ws = jax.random.normal(rng, (2, net.num_ws, 16))
    variables = net.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, ws)
    img = net.apply(variables, ws, noise_mode="const")
    assert img.shape == (2, 32, 32, 3)
    assert bool(jnp.isfinite(img).all())


def test_generator_tiny(rng):
    g = Generator(z_dim=16, c_dim=0, w_dim=16, img_resolution=16, img_channels=3,
                  mapping_layers=2, channel_base=256, channel_max=32)
    z = jax.random.normal(rng, (2, 16))
    variables = g.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)}, z)
    img = g.apply(variables, z, noise_mode="const")
    assert img.shape == (2, 16, 16, 3)


def test_minibatch_std():
    x = jax.random.normal(jax.random.PRNGKey(0), (4, 4, 4, 8))
    y = MinibatchStdLayer(group_size=2).apply({}, x)
    assert y.shape == (4, 4, 4, 9)
    # identical samples within group -> zero std channel
    x_same = jnp.tile(x[:1], (4, 1, 1, 1))
    y_same = MinibatchStdLayer(group_size=2).apply({}, x_same)
    np.testing.assert_allclose(np.asarray(y_same[..., -1]), 0.0, atol=1e-4)


def test_discriminator_tiny(rng):
    d = Discriminator(c_dim=0, img_resolution=32, img_channels=3,
                      channel_base=512, channel_max=64, num_fp16_res=0,
                      mbstd_group_size=2, mapping_layers=2)
    img = jax.random.normal(rng, (2, 32, 32, 3))
    variables = d.init(jax.random.PRNGKey(0), img)
    out = d.apply(variables, img)
    assert out.shape == (2, 1)


def test_dual_discriminator_tiny(rng):
    d = DualDiscriminator(img_resolution=32, channel_base=512, channel_max=64,
                          num_fp16_res=0, mbstd_group_size=2)
    image = jax.random.normal(rng, (2, 32, 32, 3))
    raw = jax.random.normal(jax.random.PRNGKey(1), (2, 8, 8, 3))
    cam = jax.random.normal(jax.random.PRNGKey(2), (2, 25))
    variables = d.init(jax.random.PRNGKey(0), image, raw, cam)
    out = d.apply(variables, image, raw, cam)
    assert out.shape == (2, 1)
    assert bool(jnp.isfinite(out).all())


def test_osg_decoder(rng):
    dec = OSGDecoder(hidden_dim=16, output_dim=8)
    feats = jax.random.normal(rng, (2, 3, 100, 12))
    variables = dec.init(jax.random.PRNGKey(0), feats)
    out = dec.apply(variables, feats)
    assert out["rgb"].shape == (2, 100, 8)
    assert out["sigma"].shape == (2, 100, 1)
    # sigmoid clamp range
    assert float(out["rgb"].min()) >= -0.001 - 1e-5
    assert float(out["rgb"].max()) <= 1.001 + 1e-5


def test_superresolution_tiny(rng):
    sr = SuperresolutionHybrid8XDC(
        w_dim=16, sr_num_fp16_res=0, input_resolution=16,
        block0_channels=16, block1_channels=8, final_resolution=64,
    )
    rgb = jax.random.normal(rng, (1, 16, 16, 3))
    feat = jax.random.normal(jax.random.PRNGKey(1), (1, 16, 16, 8))
    ws = jnp.ones((1, 1, 16))
    variables = sr.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                        rgb, feat, ws)
    out = sr.apply(variables, rgb, feat, ws, noise_mode="const")
    assert out.shape == (1, 64, 64, 3)
    # lower-res inputs are resized up to input_resolution first
    out2 = sr.apply(variables, rgb[:, :8, :8], feat[:, :8, :8], ws, noise_mode="const")
    assert out2.shape == (1, 64, 64, 3)
