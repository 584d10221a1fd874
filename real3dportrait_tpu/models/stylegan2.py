"""StyleGAN2 generator/discriminator building blocks in Flax (channels-last).

TPU-native re-design of `modules/eg3ds/models/networks_stylegan2.py`:

* layout is NHWC and all resampling goes through XLA convolutions
  (`real3dportrait_tpu.ops.upfirdn2d`) instead of CUDA plugins;
* modulated convolution uses the activation-scaling formulation (the
  reference's ``fused_modconv=False`` path, `networks_stylegan2.py:76-84`)
  which avoids per-sample grouped weights — better for the MXU — and
  computes demodulation coefficients without materializing modulated
  weights;
* mixed precision: blocks flagged fp16 in the reference run bf16 here
  (params stay fp32);
* every stochastic input (per-layer noise, style mixing) is keyed through
  flax RNG streams instead of global RNG state.

Equalized learning rate, w-EMA tracking, truncation, skip/resnet
architectures, and minibatch-std match the reference semantics.
"""

from __future__ import annotations

import math
from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from real3dportrait_tpu.ops.bias_act import ACTIVATIONS, bias_act
from real3dportrait_tpu.ops.upfirdn2d import (
    conv2d_resample,
    downsample2d,
    setup_filter,
    upsample2d,
)


def normalize_2nd_moment(x: jnp.ndarray, axis: int = -1, eps: float = 1e-8) -> jnp.ndarray:
    return x * jax.lax.rsqrt(jnp.mean(jnp.square(x), axis=axis, keepdims=True) + eps)


def modulated_conv2d(
    x: jnp.ndarray,             # [B,H,W,Cin]
    weight: jnp.ndarray,        # [kh,kw,Cin,Cout] (HWIO)
    styles: jnp.ndarray,        # [B,Cin]
    noise: jnp.ndarray | None = None,
    up: int = 1,
    down: int = 1,
    padding: int = 0,
    resample_filter: jnp.ndarray | None = None,
    demodulate: bool = True,
) -> jnp.ndarray:
    """Style-modulated conv (`networks_stylegan2.py:37`), activation-scaling form."""
    kh, kw, cin, cout = weight.shape
    dtype = x.dtype

    if dtype in (jnp.float16, jnp.bfloat16) and demodulate:
        # pre-normalize to avoid low-precision overflow (reference :58-61)
        w_norm = jnp.max(jnp.abs(weight), axis=(0, 1, 2), keepdims=True)
        weight = weight * (1.0 / math.sqrt(cin * kh * kw) / (w_norm + 1e-12))
        styles = styles / (jnp.max(jnp.abs(styles), axis=1, keepdims=True) + 1e-12)

    x = x * styles[:, None, None, :].astype(dtype)
    x = conv2d_resample(
        x, weight.astype(dtype), f=resample_filter, up=up, down=down,
        padding=padding, flip_weight=(up == 1),
    )
    if demodulate:
        w_sq = jnp.sum(jnp.square(weight.astype(jnp.float32)), axis=(0, 1))  # [Cin,Cout]
        d = jax.lax.rsqrt(
            jnp.einsum("io,bi->bo", w_sq, jnp.square(styles.astype(jnp.float32))) + 1e-8
        )
        x = x * d[:, None, None, :].astype(dtype)
    if noise is not None:
        x = x + noise.astype(dtype)
    return x


class FullyConnectedLayer(nn.Module):
    """Equalized-LR dense layer (`networks_stylegan2.py:99`)."""

    out_features: int
    use_bias: bool = True
    activation: str = "linear"
    lr_multiplier: float = 1.0
    bias_init: float = 0.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, corners=None) -> jnp.ndarray:
        """Standard: ``x [..., C] @ W [C, out]``.

        ``corners`` mode (x must be None): a list of ``(rows [N, G*C],
        weights [N, G])`` pairs from an unreduced packed sampler
        (`ops/grid_sample.grid_sample_*_corners`); computes
        ``sum_i (rows_i * repeat(w_i, C)) @ tile(W, (G, 1)) + b`` — exactly
        ``(sum_i sum_g w_ig * rows_ig) @ W + b`` with the weighted corner
        reduce folded into the MXU matmul, so the wide gather rows never pay
        a layout copy. Same ``weight`` param either way."""
        if corners is not None:
            in_features = corners[0][0].shape[-1] // corners[0][1].shape[-1]
        else:
            in_features = x.shape[-1]
        w = self.param(
            "weight",
            lambda k, s: jax.random.normal(k, s, jnp.float32) / self.lr_multiplier,
            (in_features, self.out_features),
        )
        if corners is not None:
            acc = None
            for rows, wts in corners:
                g = wts.shape[-1]
                wk = jnp.tile(
                    (w * (self.lr_multiplier / math.sqrt(in_features))
                     ).astype(rows.dtype),
                    (g, 1),
                )
                xw = rows * jnp.repeat(wts.astype(rows.dtype), in_features,
                                       axis=-1)
                y = jax.lax.dot_general(
                    xw, wk,
                    dimension_numbers=(((xw.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                acc = y if acc is None else acc + y
            x = acc
        else:
            w = w.astype(x.dtype) * (self.lr_multiplier / math.sqrt(in_features))
            x = x @ w
        b = None
        if self.use_bias:
            b = self.param(
                "bias",
                lambda k, s: jnp.full(s, self.bias_init, jnp.float32),
                (self.out_features,),
            )
            b = b * self.lr_multiplier
        return bias_act(x, b, act=self.activation)


class Conv2dLayer(nn.Module):
    """Plain (non-modulated) conv with optional resampling (`networks_stylegan2.py:139`)."""

    out_channels: int
    kernel_size: int = 3
    use_bias: bool = True
    activation: str = "linear"
    up: int = 1
    down: int = 1
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: float | None = None
    trainable: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, gain: float = 1.0) -> jnp.ndarray:
        cin = x.shape[-1]
        k = self.kernel_size
        w = self.param(
            "weight", nn.initializers.normal(1.0), (k, k, cin, self.out_channels), jnp.float32
        )
        if not self.trainable:
            w = jax.lax.stop_gradient(w)
        w = w * (1.0 / math.sqrt(cin * k * k))
        f = setup_filter(self.resample_filter) if (self.up > 1 or self.down > 1) else None
        x = conv2d_resample(
            x, w.astype(x.dtype), f=f, up=self.up, down=self.down,
            padding=k // 2, flip_weight=(self.up == 1),
        )
        b = None
        if self.use_bias:
            b = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
            if not self.trainable:
                b = jax.lax.stop_gradient(b)
        act_gain = ACTIVATIONS[self.activation].def_gain * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, b, act=self.activation, gain=act_gain, clamp=clamp)


class MappingNetwork(nn.Module):
    """z (+c) -> broadcast w with EMA tracking (`networks_stylegan2.py:199`)."""

    z_dim: int
    c_dim: int
    w_dim: int
    num_ws: int | None
    num_layers: int = 8
    embed_features: int | None = None
    activation: str = "lrelu"
    lr_multiplier: float = 0.01
    w_avg_beta: float = 0.998

    @nn.compact
    def __call__(
        self,
        z: jnp.ndarray | None,
        c: jnp.ndarray | None = None,
        truncation_psi: float = 1.0,
        truncation_cutoff: int | None = None,
        update_emas: bool = False,
    ) -> jnp.ndarray:
        embed_features = self.embed_features or self.w_dim
        x = None
        if self.z_dim > 0:
            x = normalize_2nd_moment(z.astype(jnp.float32))
        if self.c_dim > 0:
            y = FullyConnectedLayer(embed_features, name="embed")(c.astype(jnp.float32))
            y = normalize_2nd_moment(y)
            x = jnp.concatenate([x, y], axis=1) if x is not None else y

        for idx in range(self.num_layers):
            x = FullyConnectedLayer(
                self.w_dim, activation=self.activation,
                lr_multiplier=self.lr_multiplier, name=f"fc{idx}",
            )(x)

        # track w EMA only when configured (reference registers the buffer
        # only for num_ws+w_avg_beta, `networks_stylegan2.py:243`)
        track_ema = self.num_ws is not None and self.w_avg_beta is not None
        if track_ema:
            w_avg = self.variable(
                "ema", "w_avg", lambda: jnp.zeros((self.w_dim,), jnp.float32)
            )
            if update_emas and not self.is_initializing():
                w_avg.value = (
                    jax.lax.stop_gradient(x.mean(axis=0)) * (1 - self.w_avg_beta)
                    + w_avg.value * self.w_avg_beta
                )

        if self.num_ws is not None:
            x = jnp.repeat(x[:, None, :], self.num_ws, axis=1)

        if truncation_psi != 1.0:
            assert track_ema, "truncation requires w_avg tracking"
            if self.num_ws is None or truncation_cutoff is None:
                x = w_avg.value + truncation_psi * (x - w_avg.value)
            else:
                trunc = w_avg.value + truncation_psi * (
                    x[:, :truncation_cutoff] - w_avg.value
                )
                x = x.at[:, :truncation_cutoff].set(trunc)
        return x


class SynthesisLayer(nn.Module):
    """Modulated conv + noise + bias/act (`networks_stylegan2.py:287`)."""

    out_channels: int
    w_dim: int
    resolution: int
    kernel_size: int = 3
    up: int = 1
    use_noise: bool = True
    activation: str = "lrelu"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: float | None = 256.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, w: jnp.ndarray, noise_mode: str = "random", gain: float = 1.0
    ) -> jnp.ndarray:
        assert noise_mode in ("random", "const", "none")
        cin = x.shape[-1]
        styles = FullyConnectedLayer(cin, bias_init=1.0, name="affine")(w.astype(jnp.float32))
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.kernel_size, self.kernel_size, cin, self.out_channels), jnp.float32,
        )
        noise = None
        if self.use_noise:
            noise_strength = self.param("noise_strength", nn.initializers.zeros, ())
            noise_const = self.variable(
                "noise_const", "noise",
                lambda: jax.random.normal(
                    self.make_rng("params"), (self.resolution, self.resolution)
                ),
            )
            if noise_mode == "random":
                noise = (
                    jax.random.normal(
                        self.make_rng("noise"),
                        (x.shape[0], self.resolution, self.resolution, 1),
                    )
                    * noise_strength
                )
            elif noise_mode == "const":
                noise = noise_const.value[None, :, :, None] * noise_strength

        f = setup_filter(self.resample_filter) if self.up > 1 else None
        x = modulated_conv2d(
            x.astype(self.dtype), weight, styles, noise=noise, up=self.up,
            padding=self.kernel_size // 2, resample_filter=f,
        )
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        act_gain = ACTIVATIONS[self.activation].def_gain * gain
        clamp = self.conv_clamp * gain if self.conv_clamp is not None else None
        return bias_act(x, bias, act=self.activation, gain=act_gain, clamp=clamp)


class ToRGBLayer(nn.Module):
    """Modulated 1x1 projection to image channels (`networks_stylegan2.py:354`)."""

    out_channels: int
    w_dim: int
    kernel_size: int = 1
    conv_clamp: float | None = 256.0
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray, w: jnp.ndarray) -> jnp.ndarray:
        cin = x.shape[-1]
        weight_gain = 1.0 / math.sqrt(cin * self.kernel_size**2)
        styles = (
            FullyConnectedLayer(cin, bias_init=1.0, name="affine")(w.astype(jnp.float32))
            * weight_gain
        )
        weight = self.param(
            "weight", nn.initializers.normal(1.0),
            (self.kernel_size, self.kernel_size, cin, self.out_channels), jnp.float32,
        )
        x = modulated_conv2d(x.astype(self.dtype), weight, styles, demodulate=False)
        bias = self.param("bias", nn.initializers.zeros, (self.out_channels,), jnp.float32)
        return bias_act(x, bias, clamp=self.conv_clamp)


class SynthesisBlock(nn.Module):
    """One resolution level: (up-)conv0 + conv1 + skip toRGB (`networks_stylegan2.py:377`).

    ``ws`` must carry ``num_conv + 1`` latents: convs consume the first
    ``num_conv``; toRGB uses the one after (StyleGAN2 skip convention).
    """

    in_channels: int
    out_channels: int
    w_dim: int
    resolution: int
    img_channels: int
    is_last: bool
    architecture: str = "skip"
    resample_filter: Sequence[int] = (1, 3, 3, 1)
    conv_clamp: float = 256.0
    use_fp16: bool = False
    up: int = 2

    @property
    def num_conv(self) -> int:
        return 1 if self.in_channels == 0 else 2

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray | None,
        img: jnp.ndarray | None,
        ws: jnp.ndarray,
        noise_mode: str = "random",
        force_fp32: bool = False,
    ):
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        w_idx = 0

        if self.in_channels == 0:
            const = self.param(
                "const", nn.initializers.normal(1.0),
                (self.resolution, self.resolution, self.out_channels), jnp.float32,
            )
            x = jnp.broadcast_to(
                const[None], (ws.shape[0],) + const.shape
            ).astype(dtype)
        else:
            x = x.astype(dtype)
            x = SynthesisLayer(
                self.out_channels, self.w_dim, self.resolution, up=self.up,
                resample_filter=self.resample_filter, conv_clamp=self.conv_clamp,
                dtype=dtype, name="conv0",
            )(x, ws[:, w_idx], noise_mode=noise_mode)
            w_idx += 1

        x = SynthesisLayer(
            self.out_channels, self.w_dim, self.resolution,
            conv_clamp=self.conv_clamp, dtype=dtype, name="conv1",
        )(x, ws[:, w_idx], noise_mode=noise_mode)
        w_idx += 1

        if img is not None and self.up > 1:
            img = upsample2d(img, setup_filter(self.resample_filter), up=self.up)
        if self.is_last or self.architecture == "skip":
            y = ToRGBLayer(
                self.img_channels, self.w_dim, conv_clamp=self.conv_clamp,
                dtype=dtype, name="torgb",
            )(x, ws[:, w_idx])
            y = y.astype(jnp.float32)
            img = img + y if img is not None else y
        return x, img


class SynthesisNetwork(nn.Module):
    """Progressive synthesis stack 4x4 -> img_resolution (`networks_stylegan2.py:473`)."""

    w_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0
    conv_clamp: float = 256.0

    @property
    def block_resolutions(self) -> list[int]:
        return [2**i for i in range(2, int(math.log2(self.img_resolution)) + 1)]

    def channels(self, res: int) -> int:
        return min(self.channel_base // res, self.channel_max)

    @property
    def num_ws(self) -> int:
        n = 0
        for res in self.block_resolutions:
            n += 1 if res == 4 else 2
        return n + 1  # final torgb

    @nn.compact
    def __call__(self, ws: jnp.ndarray, noise_mode: str = "random", force_fp32: bool = False):
        fp16_resolution = max(2 ** (int(math.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8)
        x = img = None
        w_idx = 0
        for res in self.block_resolutions:
            in_ch = self.channels(res // 2) if res > 4 else 0
            num_conv = 1 if res == 4 else 2
            block = SynthesisBlock(
                in_channels=in_ch,
                out_channels=self.channels(res),
                w_dim=self.w_dim,
                resolution=res,
                img_channels=self.img_channels,
                is_last=(res == self.img_resolution),
                conv_clamp=self.conv_clamp,
                use_fp16=(self.num_fp16_res > 0 and res >= fp16_resolution),
                name=f"b{res}",
            )
            block_ws = ws[:, w_idx : w_idx + num_conv + 1]
            x, img = block(x, img, block_ws, noise_mode=noise_mode, force_fp32=force_fp32)
            w_idx += num_conv
        return img


class Generator(nn.Module):
    """Mapping + synthesis (`networks_stylegan2.py:541`)."""

    z_dim: int
    c_dim: int
    w_dim: int
    img_resolution: int
    img_channels: int
    mapping_layers: int = 8
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 0

    def setup(self):
        self.synthesis = SynthesisNetwork(
            w_dim=self.w_dim,
            img_resolution=self.img_resolution,
            img_channels=self.img_channels,
            channel_base=self.channel_base,
            channel_max=self.channel_max,
            num_fp16_res=self.num_fp16_res,
        )
        self.mapping = MappingNetwork(
            z_dim=self.z_dim, c_dim=self.c_dim, w_dim=self.w_dim,
            num_ws=self.synthesis.num_ws, num_layers=self.mapping_layers,
        )

    def __call__(
        self, z, c=None, truncation_psi=1.0, truncation_cutoff=None,
        update_emas=False, noise_mode="random",
    ):
        ws = self.mapping(
            z, c, truncation_psi=truncation_psi,
            truncation_cutoff=truncation_cutoff, update_emas=update_emas,
        )
        return self.synthesis(ws, noise_mode=noise_mode)


class MinibatchStdLayer(nn.Module):
    """Cross-sample std feature for the discriminator (`networks_stylegan2.py:664`)."""

    group_size: int = 4
    num_channels: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        n, h, w, c = x.shape
        g = min(self.group_size, n) if self.group_size is not None else n
        f = self.num_channels
        ch = c // f
        y = x.reshape(g, n // g, h, w, f, ch).astype(jnp.float32)
        y = y - y.mean(axis=0, keepdims=True)
        y = jnp.sqrt(jnp.mean(jnp.square(y), axis=0) + 1e-8)  # [n/g,H,W,F,ch]
        y = y.mean(axis=(1, 2, 4))  # [n/g, F]
        # sample k sits at (k // (n/g), k mod (n/g)) in the (g, n/g) reshape,
        # so its group id is k mod (n/g): tile (torch .repeat), don't repeat
        y = jnp.tile(y, (g, 1)).reshape(n, 1, 1, f)
        y = jnp.broadcast_to(y, (n, h, w, f)).astype(x.dtype)
        return jnp.concatenate([x, y], axis=-1)


class DiscriminatorBlock(nn.Module):
    """Resnet-style downsampling block (`networks_stylegan2.py:575`)."""

    in_channels: int  # 0 => expect fromrgb at this resolution
    tmp_channels: int
    out_channels: int
    resolution: int
    img_channels: int
    first_layer_idx: int = 0
    architecture: str = "resnet"
    conv_clamp: float = 256.0
    use_fp16: bool = False
    freeze_layers: int = 0

    @nn.compact
    def __call__(self, x, img, force_fp32: bool = False):
        dtype = jnp.bfloat16 if (self.use_fp16 and not force_fp32) else jnp.float32
        if x is not None:
            x = x.astype(dtype)

        if self.in_channels == 0 or self.architecture == "skip":
            img = img.astype(dtype)
            y = Conv2dLayer(
                self.tmp_channels, kernel_size=1, activation="lrelu",
                conv_clamp=self.conv_clamp, name="fromrgb",
            )(img)
            x = x + y if x is not None else y
            img = (
                downsample2d(img, setup_filter((1, 3, 3, 1)))
                if self.architecture == "skip"
                else None
            )

        if self.architecture == "resnet":
            y = Conv2dLayer(
                self.out_channels, kernel_size=1, use_bias=False, down=2, name="skip"
            )(x, gain=math.sqrt(0.5))
            x = Conv2dLayer(
                self.tmp_channels, activation="lrelu", conv_clamp=self.conv_clamp,
                name="conv0",
            )(x)
            x = Conv2dLayer(
                self.out_channels, activation="lrelu", down=2,
                conv_clamp=self.conv_clamp, name="conv1",
            )(x, gain=math.sqrt(0.5))
            x = y + x
        else:
            x = Conv2dLayer(
                self.tmp_channels, activation="lrelu", conv_clamp=self.conv_clamp,
                name="conv0",
            )(x)
            x = Conv2dLayer(
                self.out_channels, activation="lrelu", down=2,
                conv_clamp=self.conv_clamp, name="conv1",
            )(x)
        return x, img


class DiscriminatorEpilogue(nn.Module):
    """4x4 head: mbstd -> conv -> fc -> logit/cmap dot (`networks_stylegan2.py:690`)."""

    in_channels: int
    cmap_dim: int
    resolution: int = 4
    mbstd_group_size: int = 4
    mbstd_num_channels: int = 1
    conv_clamp: float = 256.0

    @nn.compact
    def __call__(self, x: jnp.ndarray, cmap: jnp.ndarray | None = None) -> jnp.ndarray:
        x = x.astype(jnp.float32)
        if self.mbstd_num_channels > 0:
            x = MinibatchStdLayer(self.mbstd_group_size, self.mbstd_num_channels)(x)
        x = Conv2dLayer(
            self.in_channels, activation="lrelu", conv_clamp=self.conv_clamp, name="conv"
        )(x)
        x = x.reshape(x.shape[0], -1)
        x = FullyConnectedLayer(self.in_channels, activation="lrelu", name="fc")(x)
        out_dim = 1 if self.cmap_dim == 0 else self.cmap_dim
        x = FullyConnectedLayer(out_dim, name="out")(x)
        if self.cmap_dim > 0:
            x = jnp.sum(x * cmap, axis=1, keepdims=True) / math.sqrt(self.cmap_dim)
        return x


class Discriminator(nn.Module):
    """Full conditional StyleGAN2 discriminator (`networks_stylegan2.py:754`)."""

    c_dim: int
    img_resolution: int
    img_channels: int
    channel_base: int = 32768
    channel_max: int = 512
    num_fp16_res: int = 4
    conv_clamp: float = 256.0
    cmap_dim: int | None = None
    mbstd_group_size: int = 4
    mapping_layers: int = 8

    @nn.compact
    def __call__(self, img: jnp.ndarray, c: jnp.ndarray | None = None,
                 force_fp32: bool = False) -> jnp.ndarray:
        resolutions = [2**i for i in range(int(math.log2(self.img_resolution)), 2, -1)]

        def channels(res):
            return min(self.channel_base // res, self.channel_max)

        cmap_dim = self.cmap_dim
        if cmap_dim is None:
            cmap_dim = channels(4)
        if self.c_dim == 0:
            cmap_dim = 0

        fp16_resolution = max(
            2 ** (int(math.log2(self.img_resolution)) + 1 - self.num_fp16_res), 8
        )
        x = None
        for res in resolutions:
            block = DiscriminatorBlock(
                in_channels=channels(res) if res < self.img_resolution else 0,
                tmp_channels=channels(res),
                out_channels=channels(res // 2),
                resolution=res,
                img_channels=self.img_channels,
                use_fp16=(self.num_fp16_res > 0 and res >= fp16_resolution),
                conv_clamp=self.conv_clamp,
                name=f"b{res}",
            )
            x, img = block(x, img, force_fp32=force_fp32)

        cmap = None
        if self.c_dim > 0:
            cmap = MappingNetwork(
                z_dim=0, c_dim=self.c_dim, w_dim=cmap_dim, num_ws=None,
                num_layers=self.mapping_layers, w_avg_beta=None, name="mapping",
            )(None, c)
        return DiscriminatorEpilogue(
            channels(4), cmap_dim=cmap_dim, mbstd_group_size=self.mbstd_group_size,
            conv_clamp=self.conv_clamp, name="b4",
        )(x, cmap)
