"""HuBERT encoder in Flax — device-resident audio front-end.

Replaces the host-torch HuggingFace ``HubertModel`` call of the reference
(`data_gen/utils/process_audio/extract_hubert.py:19`): the conv feature
extractor + transformer encoder run as one jitted XLA program on TPU, so the
per-utterance front-end no longer round-trips through host torch.

Architecture follows the HF ``HubertModel`` (transformers
``models/hubert/modeling_hubert.py``), configurable to both released
families:

* ``feat_extract_norm='group'`` (base): GroupNorm after conv0 only;
* ``feat_extract_norm='layer'`` (large, the reference's
  ``facebook/hubert-large-ls960-ft``): LayerNorm after every conv, and
  "stable" pre-LN transformer blocks with a final LayerNorm.

Weights come from ``tools/convert_torch_ckpt.convert_hubert`` (HF state
dict -> this tree); parity is tested against a random-weight HF oracle in
``tests/test_ckpt_convert.py``.
"""

from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn


class ConvFeatureExtractor(nn.Module):
    """Raw 16 kHz wav [B, N] -> frame features [B, T, dims[-1]] @ 50 Hz."""

    dims: Sequence[int] = (512,) * 7
    kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    norm: str = "layer"  # "layer" (large) | "group" (base)

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        x = wav[..., None]  # [B, N, 1]
        for i, (d, k, s) in enumerate(zip(self.dims, self.kernels, self.strides)):
            x = nn.Conv(d, (k,), strides=(s,), padding="VALID", use_bias=False,
                        name=f"conv_{i}")(x)
            if self.norm == "layer":
                x = nn.LayerNorm(name=f"ln_{i}")(x)
            elif self.norm == "group" and i == 0:
                # HF GroupNorm(num_groups=dim, num_channels=dim): per-channel
                # instance norm over time
                x = nn.GroupNorm(num_groups=d, name="gn_0")(x)
            x = jax.nn.gelu(x, approximate=False)
        return x


class PositionalConvEmbedding(nn.Module):
    """Grouped conv relative positional embedding (HF ``HubertPositionalConvEmbedding``)."""

    hidden: int = 1024
    kernel: int = 128
    groups: int = 16

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B, T, H]
        pad = self.kernel // 2
        y = nn.Conv(self.hidden, (self.kernel,), padding=pad,
                    feature_group_count=self.groups, name="conv")(x)
        if self.kernel % 2 == 0:  # HubertSamePadLayer trims one step
            y = y[:, :-1]
        return jax.nn.gelu(y, approximate=False)


class TransformerLayer(nn.Module):
    hidden: int
    heads: int
    ffn: int
    stable_layer_norm: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        def attn(h):
            return nn.MultiHeadDotProductAttention(
                num_heads=self.heads, qkv_features=self.hidden,
                out_features=self.hidden, name="attention",
            )(h, h)

        def ffn_fn(h):
            h = nn.Dense(self.ffn, name="ffn_in")(h)
            h = jax.nn.gelu(h, approximate=False)
            return nn.Dense(self.hidden, name="ffn_out")(h)

        if self.stable_layer_norm:  # pre-LN (large)
            x = x + attn(nn.LayerNorm(name="ln_attn")(x))
            x = x + ffn_fn(nn.LayerNorm(name="ln_ffn")(x))
        else:  # post-LN (base)
            x = nn.LayerNorm(name="ln_attn")(x + attn(x))
            x = nn.LayerNorm(name="ln_ffn")(x + ffn_fn(x))
        return x


class HubertEncoder(nn.Module):
    """HF ``HubertModel`` equivalent: wav [B, N] -> hidden states [B, T, H]."""

    hidden: int = 1024
    layers: int = 24
    heads: int = 16
    ffn: int = 4096
    conv_dims: Sequence[int] = (512,) * 7
    conv_kernels: Sequence[int] = (10, 3, 3, 3, 3, 2, 2)
    conv_strides: Sequence[int] = (5, 2, 2, 2, 2, 2, 2)
    feat_extract_norm: str = "layer"
    do_stable_layer_norm: bool = True
    pos_conv_kernel: int = 128
    pos_conv_groups: int = 16
    # large ("layer") variants add a bias to the feature projection input LN
    feat_proj_layer_norm: bool = True

    @nn.compact
    def __call__(self, wav: jnp.ndarray) -> jnp.ndarray:
        feats = ConvFeatureExtractor(
            dims=self.conv_dims, kernels=self.conv_kernels,
            strides=self.conv_strides, norm=self.feat_extract_norm,
            name="feature_extractor",
        )(wav)
        if self.feat_proj_layer_norm:
            feats = nn.LayerNorm(name="feat_ln")(feats)
        x = nn.Dense(self.hidden, name="feat_proj")(feats)

        x = x + PositionalConvEmbedding(
            hidden=self.hidden, kernel=self.pos_conv_kernel,
            groups=self.pos_conv_groups, name="pos_conv",
        )(x)
        if not self.do_stable_layer_norm:
            x = nn.LayerNorm(name="encoder_ln")(x)
        for i in range(self.layers):
            x = TransformerLayer(
                hidden=self.hidden, heads=self.heads, ffn=self.ffn,
                stable_layer_norm=self.do_stable_layer_norm,
                name=f"layer_{i}",
            )(x)
        if self.do_stable_layer_norm:
            x = nn.LayerNorm(name="encoder_ln")(x)
        return x


def hubert_large() -> HubertEncoder:
    """The reference's checkpoint family (hubert-large: 24L/1024H/16A)."""
    return HubertEncoder()


def hubert_base() -> HubertEncoder:
    return HubertEncoder(hidden=768, layers=12, heads=12, ffn=3072,
                         feat_extract_norm="group",
                         do_stable_layer_norm=False,
                         feat_proj_layer_norm=False)


def make_jax_hubert_extractor(variables, model: HubertEncoder | None = None,
                              sample_rate: int = 16000):
    """``fn(wav16k [N]) -> [T, H] @ 50 Hz`` running fully on device.

    Chunks long audio at ~20 s respecting the conv stack's kernel-400/
    stride-320 arithmetic (`extract_hubert.py:48-67`), with normalization
    matching Wav2Vec2Processor (zero-mean unit-var per utterance).
    """
    import numpy as np

    model = model or hubert_large()
    apply = jax.jit(lambda v, w: model.apply(v, w))

    def extract(wav: np.ndarray) -> np.ndarray:
        wav = np.asarray(wav, np.float32)
        wav = (wav - wav.mean()) / (wav.std() + 1e-7)
        chunk = 320 * 32 * 100  # ~20 s, multiple of the conv stride math
        outs = []
        for start in range(0, max(len(wav), 1), chunk):
            seg = wav[start : start + chunk + 80]
            if len(seg) < 400:
                break
            outs.append(np.asarray(apply(variables, jnp.asarray(seg)[None])[0]))
        return np.concatenate(outs, axis=0).astype(np.float32)

    return extract
