"""Audio/mouth-landmark sync discriminator.

Flax redesign of `modules/syncnet/models.py:58` (``LandmarkHubertSyncNet``):
two conv towers embed 5-frame mouth-landmark clips (20 lm x 3) and 10-frame
HuBERT clips into a shared space; cosine similarity + BCE is the sync loss.
Used frozen as a lip-sync loss in audio2motion training. BatchNorm becomes
GroupNorm (TPU-native, batch-size independent).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class ChannelAffine(nn.Module):
    """Per-channel ``x*scale + bias`` — eval-time form of the reference's
    BatchNorm1d, populated by ``tools/convert_torch_ckpt.convert_syncnet``."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        return x * scale + bias


class ConvGNRelu1d(nn.Module):
    """conv -> norm -> (+residual) -> relu (`models.py:8`, Conv1d block).

    norm_mode "gn" for fresh TPU training (GroupNorm: batch-size independent,
    no cross-device stats) or "affine" for converted torch checkpoints
    (eval-mode BatchNorm1d folded to a per-channel affine).
    """

    out_channels: int
    kernel: int = 3
    stride: int = 1
    padding: int = 1
    residual: bool = False
    norm_mode: str = "gn"

    @nn.compact
    def __call__(self, x):  # [B,T,C]
        y = nn.Conv(self.out_channels, (self.kernel,), strides=(self.stride,),
                    padding=(self.padding,))(x)
        if self.norm_mode == "affine":
            y = ChannelAffine(name="norm")(y)
        else:
            # keep >=4 channels per group so normalization stays well-posed
            # even at T=1 (the towers collapse the time axis to one step)
            g = max(1, min(self.out_channels // 4, 32))
            while self.out_channels % g:
                g -= 1
            y = nn.GroupNorm(num_groups=g)(y)
        if self.residual:
            y = y + x
        return nn.relu(y)


class _Tower(nn.Module):
    """Shared topology of the two towers (`models.py:66-140`); layers are
    named ``layer_{i}`` matching the reference's nn.Sequential indices so the
    checkpoint converter maps 1:1."""

    base: int
    out_dim: int
    n_res: int
    first_ch: int
    second_stride: int
    norm_mode: str = "gn"

    @nn.compact
    def __call__(self, x):
        nm = self.norm_mode

        def lay(i, ch, kernel=3, stride=1, padding=1, residual=False):
            return ConvGNRelu1d(ch, kernel=kernel, stride=stride,
                                padding=padding, residual=residual,
                                norm_mode=nm, name=f"layer_{i}")

        i = 0
        x = lay(i, self.first_ch)(x); i += 1
        x = lay(i, self.base)(x); i += 1
        for _ in range(self.n_res):
            x = lay(i, self.base, residual=True)(x); i += 1
        x = lay(i, 2 * self.base, stride=2)(x); i += 1
        for _ in range(self.n_res):
            x = lay(i, 2 * self.base, residual=True)(x); i += 1
        x = lay(i, 4 * self.base, stride=self.second_stride)(x); i += 1
        for _ in range(self.n_res):
            x = lay(i, 4 * self.base, residual=True)(x); i += 1
        x = lay(i, 4 * self.base)(x); i += 1
        x = lay(i, 4 * self.base, padding=0)(x); i += 1
        x = lay(i, 4 * self.base, kernel=1, padding=0)(x); i += 1
        x = lay(i, self.out_dim, kernel=1, padding=0)(x)
        return x


class LandmarkHubertSyncNet(nn.Module):
    """lm_dim 60 = 20 mouth lm x 3; the shipped checkpoint lineage trains
    with ``syncnet_keypoint_mode: lm468`` -> lm_dim = 468*3 = 1404
    (`egs/os_avatar/audio_lm3d_syncnet.yaml:19`,
    `tasks/os_avatar/audio_lm3d_syncnet.py:62-64`)."""

    lm_dim: int = 60
    audio_dim: int = 1024
    num_layers_per_block: int = 3
    base_hid_size: int = 128
    out_dim: int = 1024
    norm_mode: str = "gn"

    @nn.compact
    def __call__(self, hubert: jnp.ndarray, mouth_lm: jnp.ndarray):
        """hubert [B,10,1024], mouth_lm [B,5,lm_dim] -> (audio_emb,
        mouth_emb), both L2-normalized [B, out_dim]."""
        n_res = self.num_layers_per_block - 1
        audio = _Tower(self.base_hid_size, self.out_dim, n_res,
                       self.base_hid_size, 2, norm_mode=self.norm_mode,
                       name="hubert_encoder")(hubert)
        mouth = _Tower(self.base_hid_size, self.out_dim, n_res, 96, 1,
                       norm_mode=self.norm_mode, name="mouth_encoder")(mouth_lm)
        audio = audio.reshape(audio.shape[0], -1)
        mouth = mouth.reshape(mouth.shape[0], -1)
        audio = audio / (jnp.linalg.norm(audio, axis=-1, keepdims=True) + 1e-8)
        mouth = mouth / (jnp.linalg.norm(mouth, axis=-1, keepdims=True) + 1e-8)
        return audio, mouth


def cal_sync_loss(audio_emb: jnp.ndarray, mouth_emb: jnp.ndarray,
                  label: jnp.ndarray | float) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Cosine-similarity BCE sync loss (`models.py:152`). Returns
    (per-sample loss [B], cosine sim [B])."""
    d = jnp.sum(audio_emb * mouth_emb, axis=-1)
    gt = jnp.broadcast_to(jnp.asarray(label, jnp.float32), d.shape)
    p = jnp.clip(d, 1e-7, 1 - 1e-7)
    loss = -(gt * jnp.log(p) + (1 - gt) * jnp.log(1 - p))
    return loss, d


def clip_loss(audio_features: jnp.ndarray, motion_features: jnp.ndarray,
              logit_scale: jnp.ndarray | float = 1.0) -> dict:
    """Symmetric InfoNCE over in-batch pairs (`models.py:31`, CLIPLoss)."""
    logits_a = logit_scale * audio_features @ motion_features.T
    logits_m = logits_a.T
    labels = jnp.arange(logits_a.shape[0])

    def ce(logits):
        logp = jax.nn.log_softmax(logits, axis=-1)
        return -jnp.mean(logp[jnp.arange(len(labels)), labels])

    audio_loss = ce(logits_a)
    motion_loss = ce(logits_m)
    return {
        "audio_loss": audio_loss,
        "motion_loss": motion_loss,
        "clip_loss": (audio_loss + motion_loss) / 2,
    }
