"""Pallas kernel: fused tri-plane feature aggregation + OSG decoder MLP.

The volume renderer's inner loop evaluates the tiny OSGDecoder at every
depth sample of every ray — [B, 3, M, C] sampled features -> mean over
planes -> dense(C,64) -> softplus -> dense(64, 1+C_out). Unfused, the
plane-mean and both activations materialize [B, M, *] intermediates in HBM
(M = rays x samples is ~1.5M at production size). This kernel keeps a tile
of M entirely in VMEM: one HBM read of the features, one HBM write of
(rgb, sigma), both matmuls on the MXU.

Used by the renderer when ``use_fused_decoder`` is enabled; numerics match
:class:`real3dportrait_tpu.models.decoder.OSGDecoder` (same equalized-LR
weight scaling, MipNeRF sigmoid clamp).
"""

from __future__ import annotations

import math
from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(feats_ref, w0_ref, b0_ref, w1_ref, b1_ref, rgb_ref, sigma_ref):
    # feats block: [K, 1, TILE_M, C] -> mean over planes -> [TILE_M, C]
    x = jnp.mean(feats_ref[:].astype(jnp.float32), axis=0)[0]
    h = jnp.dot(x, w0_ref[:], preferred_element_type=jnp.float32) + b0_ref[:]
    h = jax.nn.softplus(h)
    y = jnp.dot(h, w1_ref[:], preferred_element_type=jnp.float32) + b1_ref[:]
    rgb_ref[:] = (jax.nn.sigmoid(y[:, 1:]) * (1 + 2 * 0.001) - 0.001)[None]
    sigma_ref[:] = y[:, 0:1][None]


@partial(jax.jit, static_argnames=("tile_m", "interpret"))
def fused_osg_decoder(
    sampled_features: jnp.ndarray,  # [B, 3, M, C]
    w0: jnp.ndarray,                # [C, H] pre-scaled (equalized LR applied)
    b0: jnp.ndarray,                # [H]
    w1: jnp.ndarray,                # [H, 1 + C_out]
    b1: jnp.ndarray,                # [1 + C_out]
    tile_m: int = 2048,
    interpret: bool = False,
) -> dict:
    b, k, m, c = sampled_features.shape
    hidden = w0.shape[1]
    out_dim = w1.shape[1] - 1
    # pad M to the tile size
    pad = (-m) % tile_m
    feats = sampled_features
    if pad:
        feats = jnp.pad(feats, ((0, 0), (0, 0), (0, pad), (0, 0)))
    m_pad = m + pad
    n_tiles = m_pad // tile_m

    feats2 = feats.reshape(b, k, n_tiles, tile_m, c)

    def run_one(fb):  # [3, n_tiles, TILE, C]
        rgb, sigma = pl.pallas_call(
            _kernel,
            grid=(n_tiles,),
            in_specs=[
                pl.BlockSpec((k, 1, tile_m, c), lambda i: (0, i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
                pl.BlockSpec(memory_space=pltpu.VMEM),
            ],
            out_specs=[
                pl.BlockSpec((1, tile_m, out_dim), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, tile_m, 1), lambda i: (i, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_shape=[
                jax.ShapeDtypeStruct((n_tiles, tile_m, out_dim), jnp.float32),
                jax.ShapeDtypeStruct((n_tiles, tile_m, 1), jnp.float32),
            ],
            interpret=interpret,
        )(fb, w0, b0, w1, b1)
        return rgb.reshape(m_pad, out_dim), sigma.reshape(m_pad, 1)

    rgb, sigma = jax.vmap(run_one)(feats2)
    return {"rgb": rgb[:, :m], "sigma": sigma[:, :m]}
