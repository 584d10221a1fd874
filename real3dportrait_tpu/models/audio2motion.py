"""Audio -> 3DMM expression: conditional flow-VAE.

Flax redesign of `modules/audio2motion/vae.py` + `flow_base.py`:
HuBERT (1024-d @50Hz, downsampled to 25Hz) plus pitch/blink/amplitude
conditioning drives a conv VAE (stride-4 latent) with a WaveNet-conditioned
decoder and a residual-coupling (Glow) prior sampled with temperature at
inference.

Layout is [B, T, C] (channels-last) throughout; every sampling site takes an
explicit PRNG stream ('noise') instead of global RNG. Weight-norm reparam on
the WN convs is dropped (plain convs; XLA folds the scale anyway) — weights
are therefore not bit-compatible with torch checkpoints, but shapes and
semantics are.
"""

from __future__ import annotations

import math
from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

F0_BIN = 256
F0_MAX = 1100.0
F0_MIN = 50.0
_F0_MEL_MIN = 1127 * math.log(1 + F0_MIN / 700)
_F0_MEL_MAX = 1127 * math.log(1 + F0_MAX / 700)


def f0_to_coarse(f0: jnp.ndarray) -> jnp.ndarray:
    """Hz -> 1..255 mel-scaled pitch bins (`utils/commons/pitch_utils.py:17`)."""
    f0_mel = 1127 * jnp.log(1 + f0 / 700)
    scaled = (f0_mel - _F0_MEL_MIN) * (F0_BIN - 2) / (_F0_MEL_MAX - _F0_MEL_MIN) + 1
    f0_mel = jnp.where(f0_mel > 0, scaled, f0_mel)
    f0_mel = jnp.clip(f0_mel, 1, F0_BIN - 1)
    return jnp.floor(f0_mel + 0.5).astype(jnp.int32)


def downsample_time(x: jnp.ndarray, factor: int = 2, method: str = "nearest") -> jnp.ndarray:
    """[B,T,C] -> [B,T//factor,C] (the 50Hz->25Hz audio downsampler).

    ``nearest`` matches torch ``F.interpolate(mode='nearest', scale=1/f)``
    exactly: output i reads input ``i*f`` (`vae.py:386`)."""
    if method == "nearest":
        t_out = x.shape[1] // factor
        return x[:, : t_out * factor : factor]
    b, t, c = x.shape
    return jax.image.resize(x, (b, t // factor, c), method)


class WN(nn.Module):
    """Non-causal WaveNet stack with gated units and global conditioning
    (`flow_base.py:21`)."""

    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x: jnp.ndarray, x_mask: jnp.ndarray | None = None,
                 g: jnp.ndarray | None = None) -> jnp.ndarray:
        """x [B,T,H], x_mask [B,T,1] or None, g [B,T,Cg]."""
        h = self.hidden_channels
        if x_mask is None:
            x_mask = jnp.ones_like(x[..., :1])
        if g is not None:
            g_all = nn.Conv(2 * h * self.n_layers, (1,), name="cond_layer")(g)
        output = jnp.zeros_like(x)
        for i in range(self.n_layers):
            dilation = self.dilation_rate**i
            x_in = nn.Conv(
                2 * h, (self.kernel_size,), kernel_dilation=dilation,
                padding=((self.kernel_size * dilation - dilation) // 2,),
                name=f"in_{i}",
            )(x)
            if g is not None:
                x_in = x_in + g_all[..., i * 2 * h : (i + 1) * 2 * h]
            t_act = jnp.tanh(x_in[..., :h])
            s_act = jax.nn.sigmoid(x_in[..., h:])
            acts = t_act * s_act
            res_skip_channels = 2 * h if i < self.n_layers - 1 else h
            res_skip = nn.Conv(res_skip_channels, (1,), name=f"res_skip_{i}")(acts)
            if i < self.n_layers - 1:
                x = (x + res_skip[..., :h]) * x_mask
                output = output + res_skip[..., h:]
            else:
                output = output + res_skip
        return output * x_mask


class ResidualCouplingLayer(nn.Module):
    """Mean-only affine coupling (`flow_base.py:614`)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        half = self.channels // 2
        x0, x1 = x[..., :half], x[..., half:]
        h = nn.Conv(self.hidden_channels, (1,), name="pre")(x0) * x_mask
        h = WN(self.hidden_channels, self.kernel_size, self.dilation_rate,
               self.n_layers, self.gin_channels, name="enc")(h, x_mask, g)
        m = nn.Conv(half, (1,), kernel_init=nn.initializers.zeros,
                    bias_init=nn.initializers.zeros, name="post")(h) * x_mask
        if not reverse:
            x1 = (m + x1) * x_mask
        else:
            x1 = (x1 - m) * x_mask
        return jnp.concatenate([x0, x1], axis=-1)


class ResidualCouplingBlock(nn.Module):
    """n_flows x (coupling + channel flip) (`flow_base.py:670`)."""

    channels: int
    hidden_channels: int
    kernel_size: int
    dilation_rate: int
    n_layers: int
    n_flows: int = 4
    gin_channels: int = 0

    @nn.compact
    def __call__(self, x, x_mask, g=None, reverse: bool = False):
        layers = [
            ResidualCouplingLayer(
                self.channels, self.hidden_channels, self.kernel_size,
                self.dilation_rate, self.n_layers, self.gin_channels,
                name=f"flow_{i}",
            )
            for i in range(self.n_flows)
        ]
        order = range(self.n_flows) if not reverse else range(self.n_flows - 1, -1, -1)
        for i in order:
            if not reverse:
                x = layers[i](x, x_mask, g, reverse=False)
                x = jnp.flip(x, axis=-1)  # Flip (`flow_base.py:389`)
            else:
                x = jnp.flip(x, axis=-1)
                x = layers[i](x, x_mask, g, reverse=True)
        return x


class FVAEEncoder(nn.Module):
    """Stride-s conv + WN -> (m, logs) posterior (`vae.py:99`)."""

    hidden_channels: int
    latent_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    strides: Sequence[int] = (4,)

    @nn.compact
    def __call__(self, x, x_mask, g, key):
        for s in self.strides:
            x = nn.Conv(self.hidden_channels, (s * 2,), strides=(s,),
                        padding=(s // 2,))(x)
        stride = 1
        for s in self.strides:
            stride *= s
        mask = x_mask[:, ::stride][:, : x.shape[1]]
        x = x * mask
        x = WN(self.hidden_channels, self.kernel_size, 1, self.n_layers,
               self.gin_channels, name="wn")(x, mask, g) * mask
        x = nn.Conv(self.latent_channels * 2, (1,), name="out_proj")(x)
        m, logs = x[..., : self.latent_channels], x[..., self.latent_channels :]
        z = m + jax.random.normal(key, m.shape) * jnp.exp(logs)
        return z, m, logs, mask


class FVAEDecoder(nn.Module):
    """Transposed-conv upsample + WN decoder (`vae.py:127`)."""

    hidden_channels: int
    out_channels: int
    kernel_size: int
    n_layers: int
    gin_channels: int = 0
    strides: Sequence[int] = (4,)

    @nn.compact
    def __call__(self, x, x_mask, g):
        for s in self.strides:
            x = nn.ConvTranspose(self.hidden_channels, (s,), strides=(s,))(x)
        x = x * x_mask
        x = WN(self.hidden_channels, self.kernel_size, 1, self.n_layers,
               self.gin_channels, name="wn")(x, x_mask, g) * x_mask
        return nn.Conv(self.out_channels, (1,), name="out_proj")(x)


class FVAE(nn.Module):
    """Flow-prior VAE (`vae.py:150`)."""

    in_out_channels: int = 64
    hidden_channels: int = 256
    latent_size: int = 16
    kernel_size: int = 5
    enc_n_layers: int = 8
    dec_n_layers: int = 4
    gin_channels: int = 64
    strides: Sequence[int] = (4,)
    use_prior_glow: bool = True
    glow_hidden: int = 64
    glow_kernel_size: int = 3
    glow_n_blocks: int = 4

    @nn.compact
    def __call__(self, x, x_mask, g, infer: bool = False, temperature: float = 1.0):
        """x [B,T,C] (None at inference), x_mask [B,T], g [B,T,Cg]."""
        mask3 = x_mask[..., None]
        g_sqz = g
        for s in self.strides:
            g_sqz = nn.Conv(self.gin_channels, (s * 2,), strides=(s,),
                            padding=(s // 2,), name="g_pre_net")(g_sqz)

        if not infer:
            z_q, m_q, logs_q, mask_sqz = FVAEEncoder(
                self.hidden_channels, self.latent_size, self.kernel_size,
                self.enc_n_layers, self.gin_channels, self.strides,
                name="encoder",
            )(x, mask3, g_sqz, self.make_rng("noise"))
            x_recon = FVAEDecoder(
                self.hidden_channels, self.in_out_channels, self.kernel_size,
                self.dec_n_layers, self.gin_channels, self.strides,
                name="decoder",
            )(z_q, mask3, g)
            # KL via flow prior: E_q[log q(z) - log p(flow(z))]; the coupling
            # layers are mean-only + flips, so the flow log-det is exactly 0
            # (`vae.py:235-241`)
            logqx = -0.5 * (
                jnp.square((z_q - m_q) * jnp.exp(-logs_q))
                + 2 * logs_q + math.log(2 * math.pi)
            )
            if self.use_prior_glow:
                z_p = ResidualCouplingBlock(
                    self.latent_size, self.glow_hidden, self.glow_kernel_size,
                    1, self.glow_n_blocks, 4, self.gin_channels,
                    name="prior_flow",
                )(z_q, mask_sqz, g_sqz, reverse=False)
            else:
                z_p = z_q
            logpx = -0.5 * (jnp.square(z_p) + math.log(2 * math.pi))
            loss_kl = (
                jnp.sum((logqx - logpx) * mask_sqz)
                / jnp.maximum(jnp.sum(mask_sqz), 1.0)
                / self.latent_size
            )
            return x_recon, loss_kl, z_p, m_q, logs_q
        else:
            b, t_sqz = g_sqz.shape[0], g_sqz.shape[1]
            z_p = (
                jax.random.normal(self.make_rng("noise"), (b, t_sqz, self.latent_size))
                * temperature
            )
            if self.use_prior_glow:
                z_p = ResidualCouplingBlock(
                    self.latent_size, self.glow_hidden, self.glow_kernel_size,
                    1, self.glow_n_blocks, 4, self.gin_channels,
                    name="prior_flow",
                )(z_p, jnp.ones_like(z_p[..., :1]), g_sqz, reverse=True)
            x_recon = FVAEDecoder(
                self.hidden_channels, self.in_out_channels, self.kernel_size,
                self.dec_n_layers, self.gin_channels, self.strides,
                name="decoder",
            )(z_p, jnp.ones_like(x_mask)[..., None], g)
            return x_recon, z_p


class PitchContourVAEModel(nn.Module):
    """Main audio2motion model with pitch/blink/amplitude conditioning
    (`vae.py:340`, the configuration shipped for Real3D-Portrait)."""

    in_out_dim: int = 64
    audio_in_dim: int = 1024
    feat_dim: int = 128
    use_prior_flow: bool = True
    use_pitch: bool = True
    use_mouth_amp_embed: bool = True
    use_eye_amp_embed: bool = False
    # "gn": GroupNorm in the mel/pitch encoders (fresh training, TPU-native
    # replacement for the reference's BatchNorm1d); "folded_bn": no norm,
    # biased first conv — for converted reference checkpoints where the
    # inference-mode BN affine is folded in (tools/convert_torch_ckpt).
    norm_mode: str = "gn"

    def _cond_encoder(self, x: jnp.ndarray, name: str) -> jnp.ndarray:
        """conv -> norm -> GELU -> conv (reference `vae.py:348-353`)."""
        fd = self.feat_dim
        x = nn.Conv(fd, (3,), padding=1,
                    use_bias=(self.norm_mode == "folded_bn"),
                    name=f"{name}_conv0")(x)
        if self.norm_mode == "gn":
            x = nn.GroupNorm(num_groups=8, name=f"{name}_gn")(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU() is erf-exact
        return nn.Conv(fd, (3,), padding=1, use_bias=False,
                       name=f"{name}_conv1")(x)

    @nn.compact
    def __call__(self, batch: dict, train: bool = True, temperature: float = 1.0) -> dict:
        """batch: audio [B,T,1024] @50Hz, f0 [B,T], y_mask [B,T/2] @25Hz,
        y [B,T/2,64] (training), blink [B,T,1], mouth_amp [B,1]."""
        fd = self.feat_dim
        mask = batch["y_mask"]
        mel = downsample_time(batch["audio"], 2, "nearest")

        cond_feats = []
        mel_feat = self._cond_encoder(mel, "mel_encoder")
        cond_feats.append(mel_feat)

        if self.use_pitch:
            f0 = downsample_time(batch["f0"][..., None], 2, "nearest")[..., 0]
            pitch_emb = nn.Embed(300, fd, name="pitch_embed")(f0_to_coarse(f0))
            cond_feats.append(self._cond_encoder(pitch_emb, "pitch_encoder"))

        blink = batch.get("blink")
        if blink is None:
            blink = jnp.zeros(batch["audio"].shape[:2] + (1,), jnp.int32)
        blink_feat = nn.Embed(2, fd, name="blink_embed")(blink[..., 0])
        cond_feats.append(downsample_time(blink_feat, 2, "nearest"))

        t_cond = mel_feat.shape[1]
        if self.use_mouth_amp_embed:
            amp = batch.get("mouth_amp",
                            jnp.full((mel.shape[0], 1), 0.4, mel.dtype))
            amp_embed = self.param("mouth_amp_embed",
                                   nn.initializers.normal(1.0), (fd,))
            cond_feats.append(
                jnp.broadcast_to((amp[:, :, None] * amp_embed[None, None]),
                                 (mel.shape[0], t_cond, fd))
            )
        if self.use_eye_amp_embed:
            amp = batch.get("eye_amp", jnp.full((mel.shape[0], 1), 0.4, mel.dtype))
            amp_embed = self.param("eye_amp_embed",
                                   nn.initializers.normal(1.0), (fd,))
            cond_feats.append(
                jnp.broadcast_to((amp[:, :, None] * amp_embed[None, None]),
                                 (mel.shape[0], t_cond, fd))
            )

        cond = nn.Dense(fd, name="cond_proj")(jnp.concatenate(cond_feats, axis=-1))

        vae = FVAE(
            in_out_channels=self.in_out_dim, hidden_channels=256, latent_size=16,
            kernel_size=5, enc_n_layers=8, dec_n_layers=4, gin_channels=fd,
            use_prior_glow=self.use_prior_flow, glow_hidden=64,
            glow_kernel_size=3, glow_n_blocks=4, name="vae",
        )
        if train:
            x_recon, loss_kl, z_p, m_q, logs_q = vae(
                batch["y"], mask, cond, infer=False
            )
            x_recon = x_recon * mask[..., None]
            return {"pred": x_recon, "mask": mask, "loss_kl": loss_kl,
                    "z_p": z_p, "m_q": m_q, "logs_q": logs_q}
        x_recon, z_p = vae(None, mask, cond, infer=True, temperature=temperature)
        return {"pred": x_recon * mask[..., None], "mask": mask, "z_p": z_p}


class VAEModel(PitchContourVAEModel):
    """Plain audio-only variant (`vae.py:272`): no pitch/amp conditioning."""

    feat_dim: int = 64
    use_pitch: bool = False
    use_mouth_amp_embed: bool = False
    use_eye_amp_embed: bool = False
