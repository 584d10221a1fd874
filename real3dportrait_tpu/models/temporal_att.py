"""Temporal attention net for motion-plane smoothing.

Equivalent of `modules/real3d/segformer.py:604` (TemporalAttNet, enabled by
``use_motion_smo_net``): a windowed sequence of SECC motion planes is
reduced to per-frame attention weights and averaged — smoothing temporal
jitter in the predicted residual planes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from flax import linen as nn


class TemporalAttNet(nn.Module):
    seq_len: int = 5
    probe_size: int = 32  # reference pools from 224²; any static size works

    @nn.compact
    def __call__(self, planes_window: jnp.ndarray) -> jnp.ndarray:
        """[B, T, H, W, C] window of planes -> smoothed plane [B, H, W, C]."""
        b, t, h, w, c = planes_window.shape
        x = planes_window.reshape(b * t, h, w, c)
        x = jax.image.resize(x, (b * t, self.probe_size, self.probe_size, c),
                             "bilinear")
        for ch in (64, 32, 16):
            x = nn.Conv(ch, (3, 3), padding=1)(x)
            x = nn.leaky_relu(x, 0.02)
            x = nn.avg_pool(x, (2, 2), strides=(2, 2))
        x = x.mean(axis=(1, 2))          # [B*T, 16]
        x = x.reshape(b, t, -1).mean(-1)  # per-frame scalar [B, T]
        assert t == self.seq_len, (t, self.seq_len)
        x = nn.Dense(self.seq_len, name="to_attention_weights")(x)
        weights = jax.nn.softmax(x, axis=-1)  # [B, T]
        return jnp.einsum("bt,bthwc->bhwc", weights, planes_window)
