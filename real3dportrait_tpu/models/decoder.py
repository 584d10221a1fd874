"""Tri-plane feature decoder (the tiny NeRF MLP).

Equivalent of EG3D's ``OSGDecoder`` (`modules/eg3ds/models/triplane.py:166`):
two equalized-LR dense layers with softplus, MipNeRF sigmoid clamping on rgb.
This MLP is the inner loop of volume rendering — it runs once per depth
sample per ray — so it is kept purely dense (MXU-friendly) and dtype-flexible.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from real3dportrait_tpu.models.stylegan2 import FullyConnectedLayer


class OSGDecoder(nn.Module):
    """[B, n_planes, M, C] features -> {'rgb': [B,M,out_dim], 'sigma': [B,M,1]}."""

    hidden_dim: int = 64
    output_dim: int = 32
    lr_multiplier: float = 1.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, sampled_features, ray_directions=None) -> dict:
        """``sampled_features`` is either the reduced ``[B, n_planes, M, C]``
        feature tensor, or the unreduced ``(rows_list, weights_list)`` pair
        from :func:`rendering.renderer.make_corner_sampler` — the latter
        folds plane-mean + corner reduce into net0's matmul (the weights
        already carry the 1/n_planes factor), which keeps the wide sampling
        gather rows on the MXU path with no layout copies."""
        if isinstance(sampled_features, tuple):
            rows_list, wts_list = sampled_features
            b, m = rows_list[0].shape[:2]
            corners = [
                (r.reshape(b * m, r.shape[-1]),
                 wts.reshape(b * m, wts.shape[-1]))
                for r, wts in zip(rows_list, wts_list)
            ]
            x = FullyConnectedLayer(self.hidden_dim,
                                    lr_multiplier=self.lr_multiplier,
                                    name="net0")(None, corners=corners)
        else:
            x = sampled_features.mean(axis=1).astype(self.dtype)
            b, m, c = x.shape
            x = x.reshape(b * m, c)
            x = FullyConnectedLayer(self.hidden_dim,
                                    lr_multiplier=self.lr_multiplier,
                                    name="net0")(x)
        x = jax.nn.softplus(x)
        x = FullyConnectedLayer(1 + self.output_dim, lr_multiplier=self.lr_multiplier,
                                name="net1")(x)
        x = x.reshape(b, m, -1)
        rgb = jax.nn.sigmoid(x[..., 1:]) * (1 + 2 * 0.001) - 0.001
        sigma = x[..., 0:1]
        return {"rgb": rgb, "sigma": sigma}
