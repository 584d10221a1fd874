import jax
import jax.numpy as jnp
import numpy as np
import pytest

from real3dportrait_tpu.models.audio2motion import (
    FVAE,
    PitchContourVAEModel,
    ResidualCouplingBlock,
    VAEModel,
    WN,
    f0_to_coarse,
)
from real3dportrait_tpu.models.syncnet import (
    LandmarkHubertSyncNet,
    cal_sync_loss,
    clip_loss,
)


def test_f0_to_coarse_range():
    f0 = jnp.array([[0.0, 50.0, 220.0, 1100.0, 2000.0]])
    c = f0_to_coarse(f0)
    assert c.dtype == jnp.int32
    assert int(c.min()) >= 1 and int(c.max()) <= 255
    # zero f0 (unvoiced) maps to bin 1... well, mel(0)=0 -> stays 0 -> clip to 1
    assert int(c[0, 0]) == 1
    # monotonic in voiced range
    assert int(c[0, 1]) < int(c[0, 2]) < int(c[0, 3])


def test_wn_mask_and_cond(rng):
    wn = WN(hidden_channels=16, kernel_size=3, dilation_rate=1, n_layers=3,
            gin_channels=8)
    x = jax.random.normal(rng, (2, 20, 16))
    g = jax.random.normal(jax.random.PRNGKey(1), (2, 20, 8))
    mask = jnp.ones((2, 20, 1)).at[:, 15:].set(0.0)
    variables = wn.init(jax.random.PRNGKey(0), x, mask, g)
    out = wn.apply(variables, x, mask, g)
    assert out.shape == x.shape
    np.testing.assert_allclose(np.asarray(out[:, 15:]), 0.0, atol=1e-6)


def test_coupling_block_invertible(rng):
    block = ResidualCouplingBlock(channels=16, hidden_channels=32, kernel_size=3,
                                  dilation_rate=1, n_layers=2, n_flows=2,
                                  gin_channels=8)
    x = jax.random.normal(rng, (2, 12, 16))
    mask = jnp.ones((2, 12, 1))
    g = jax.random.normal(jax.random.PRNGKey(1), (2, 12, 8))
    variables = block.init(jax.random.PRNGKey(0), x, mask, g)
    z = block.apply(variables, x, mask, g, reverse=False)
    x_rec = block.apply(variables, z, mask, g, reverse=True)
    np.testing.assert_allclose(np.asarray(x_rec), np.asarray(x), rtol=1e-4, atol=1e-5)


def test_fvae_train_and_infer(rng):
    fvae = FVAE(in_out_channels=8, hidden_channels=16, latent_size=4,
                kernel_size=3, enc_n_layers=2, dec_n_layers=2, gin_channels=8,
                glow_hidden=8, glow_n_blocks=2)
    t = 16
    x = jax.random.normal(rng, (2, t, 8))
    mask = jnp.ones((2, t))
    g = jax.random.normal(jax.random.PRNGKey(1), (2, t, 8))
    variables = fvae.init({"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
                          x, mask, g)
    x_recon, loss_kl, z_p, m_q, logs_q = fvae.apply(
        variables, x, mask, g, rngs={"noise": jax.random.PRNGKey(2)}
    )
    assert x_recon.shape == x.shape
    assert z_p.shape == (2, t // 4, 4)
    assert bool(jnp.isfinite(loss_kl))
    x_gen, z = fvae.apply(variables, None, mask, g, infer=True, temperature=0.7,
                          rngs={"noise": jax.random.PRNGKey(3)})
    assert x_gen.shape == x.shape


@pytest.mark.slow  # fast-tier budget (>15 s on a 1-CPU box)
@pytest.mark.parametrize("cls,audio_dim", [(PitchContourVAEModel, 32), (VAEModel, 32)])
def test_vae_models(cls, audio_dim, rng):
    model = cls(in_out_dim=16, audio_in_dim=audio_dim, feat_dim=16)
    b, t50 = 2, 32
    batch = {
        "audio": jax.random.normal(rng, (b, t50, audio_dim)),
        "f0": jnp.abs(jax.random.normal(jax.random.PRNGKey(1), (b, t50))) * 200,
        "y_mask": jnp.ones((b, t50 // 2)),
        "y": jax.random.normal(jax.random.PRNGKey(2), (b, t50 // 2, 16)),
        "blink": jnp.zeros((b, t50, 1), jnp.int32),
        "mouth_amp": jnp.full((b, 1), 0.4),
    }
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "noise": jax.random.PRNGKey(1)},
        batch, train=True,
    )
    out = model.apply(variables, batch, train=True, rngs={"noise": jax.random.PRNGKey(2)})
    assert out["pred"].shape == (b, t50 // 2, 16)
    assert bool(jnp.isfinite(out["loss_kl"]))
    gen = model.apply(variables, batch, train=False, temperature=0.5,
                      rngs={"noise": jax.random.PRNGKey(3)})
    assert gen["pred"].shape == (b, t50 // 2, 16)
    # temperature 0 -> deterministic mode of the prior
    gen_a = model.apply(variables, batch, train=False, temperature=0.0,
                        rngs={"noise": jax.random.PRNGKey(4)})
    gen_b = model.apply(variables, batch, train=False, temperature=0.0,
                        rngs={"noise": jax.random.PRNGKey(5)})
    np.testing.assert_allclose(np.asarray(gen_a["pred"]), np.asarray(gen_b["pred"]),
                               atol=1e-6)


@pytest.mark.slow  # fast-tier budget (>15 s on a 1-CPU box)
def test_syncnet_embeddings_and_losses(rng):
    net = LandmarkHubertSyncNet(base_hid_size=16, out_dim=32)
    hubert = jax.random.normal(rng, (4, 10, 1024))
    mouth = jax.random.normal(jax.random.PRNGKey(1), (4, 5, 60))
    variables = net.init(jax.random.PRNGKey(0), hubert, mouth)
    a, m = net.apply(variables, hubert, mouth)
    assert a.shape == m.shape
    np.testing.assert_allclose(np.linalg.norm(np.asarray(a), axis=-1), 1.0, rtol=1e-4)
    loss, d = cal_sync_loss(a, m, 1.0)
    assert loss.shape == (4,) and bool(jnp.isfinite(loss).all())
    # positive pair with itself: maximal similarity, near-zero loss
    loss_self, d_self = cal_sync_loss(a, a, 1.0)
    np.testing.assert_allclose(np.asarray(d_self), 1.0, atol=1e-5)
    assert float(loss_self.max()) < 1e-4
    cl = clip_loss(a, m)
    assert set(cl) == {"audio_loss", "motion_loss", "clip_loss"}
