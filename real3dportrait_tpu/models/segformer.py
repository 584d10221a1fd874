"""SegFormer / Mix-Vision-Transformer backbones (channels-last Flax).

TPU-native re-design of `modules/real3d/segformer.py` (NVIDIA SegFormer):
MiT b0–b5 encoders with overlap patch embeds, spatial-reduction attention
and mix-FFN (depthwise conv), the all-MLP fuse head, and the two
Real3D-Portrait backbones built on them:

* :class:`SegFormerImg2PlaneBackbone` — one-shot 512² image -> canonical
  tri-plane ``[B, 3, H, W, C*D]`` with the hide-nerf axis flips
  (`segformer.py:554`);
* :class:`SegFormerSECC2PlaneBackbone` — concatenated (cano, src, tgt)
  SECC maps -> residual motion tri-plane (`segformer.py:673`).

Attention here is full dense matmul on the MXU; the spatial-reduction ratio
(`sr_ratio`) bounds sequence length exactly as in the reference — no
distribution machinery needed at these sizes (SURVEY.md §5).
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# MiT variants: (embed_dims, num_heads, depths); all share mlp_ratio 4 and
# sr_ratios (8, 4, 2, 1)  (`segformer.py:407-461`).
MIT_CONFIGS: dict[str, dict] = {
    # "nano" is ours (not in the reference): a minimal-op-count variant for
    # CI / multi-chip dryruns where compile time matters more than capacity.
    "nano": {"embed_dims": (8, 16, 40, 32), "depths": (1, 1, 1, 1)},
    "b0": {"embed_dims": (32, 64, 160, 256), "depths": (2, 2, 2, 2)},
    "b1": {"embed_dims": (64, 128, 320, 512), "depths": (2, 2, 2, 2)},
    "b2": {"embed_dims": (64, 128, 320, 512), "depths": (3, 4, 6, 3)},
    "b3": {"embed_dims": (64, 128, 320, 512), "depths": (3, 4, 18, 3)},
    "b4": {"embed_dims": (64, 128, 320, 512), "depths": (3, 8, 27, 3)},
    "b5": {"embed_dims": (64, 128, 320, 512), "depths": (3, 6, 40, 3)},
}
MIT_NUM_HEADS = (1, 2, 5, 8)
MIT_SR_RATIOS = (8, 4, 2, 1)

_dense_init = nn.initializers.truncated_normal(0.02)


def resize_nhwc(x: jnp.ndarray, hw: tuple[int, int], method: str = "bilinear") -> jnp.ndarray:
    b, _, _, c = x.shape
    return jax.image.resize(x, (b, hw[0], hw[1], c), method=method)


def _align_corners_matrix(n_in: int, n_out: int) -> np.ndarray:
    """Row-stochastic bilinear interpolation matrix with align_corners=True
    (torch ``nn.UpsamplingBilinear2d`` semantics)."""
    a = np.zeros((n_out, n_in), np.float32)
    if n_in == 1:
        a[:, 0] = 1.0
        return a
    coords = np.arange(n_out) * (n_in - 1) / max(n_out - 1, 1)
    lo = np.floor(coords).astype(np.int64)
    hi = np.minimum(lo + 1, n_in - 1)
    frac = (coords - lo).astype(np.float32)
    a[np.arange(n_out), lo] += 1.0 - frac
    a[np.arange(n_out), hi] += frac
    return a


def upsample_align_corners(x: jnp.ndarray, hw: tuple[int, int]) -> jnp.ndarray:
    """NHWC bilinear resize with align_corners=True, expressed as two small
    dense interpolation matmuls (MXU-friendly; exact match to torch's
    ``nn.UpsamplingBilinear2d`` used by the reference ``to_plane_cnn``,
    `segformer.py:577`)."""
    b, h, w, c = x.shape
    ah = jnp.asarray(_align_corners_matrix(h, hw[0]))
    aw = jnp.asarray(_align_corners_matrix(w, hw[1]))
    x = jnp.einsum("oh,bhwc->bowc", ah, x)
    return jnp.einsum("pw,bhwc->bhpc", aw, x)


class DWConv(nn.Module):
    """3x3 depthwise conv inside the mix-FFN (`segformer.py:DWConv`)."""

    dim: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B,H,W,C]
        return nn.Conv(
            self.dim, (3, 3), padding=1, feature_group_count=self.dim,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )(x)


class MixFFN(nn.Module):
    hidden: int
    out: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B,H,W,C]
        x = nn.Dense(self.hidden, kernel_init=_dense_init)(x)
        x = DWConv(self.hidden)(x)
        x = nn.gelu(x, approximate=False)  # torch nn.GELU() is erf-exact
        x = nn.Dense(self.out, kernel_init=_dense_init)(x)
        return x


class SRAttention(nn.Module):
    """Attention with spatial reduction of K/V (`segformer.py:100`)."""

    dim: int
    num_heads: int
    sr_ratio: int = 1
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:  # [B,H,W,C]
        b, h, w, c = x.shape
        head_dim = self.dim // self.num_heads
        scale = head_dim**-0.5

        q = nn.Dense(self.dim, kernel_init=_dense_init, name="q")(x)
        q = q.reshape(b, h * w, self.num_heads, head_dim)

        kv_in = x
        if self.sr_ratio > 1:
            kv_in = nn.Conv(
                self.dim, (self.sr_ratio, self.sr_ratio),
                strides=(self.sr_ratio, self.sr_ratio), name="sr",
            )(x)
            kv_in = nn.LayerNorm(epsilon=self.ln_eps, name="sr_norm")(kv_in)
        n_kv = kv_in.shape[1] * kv_in.shape[2]
        kv = nn.Dense(self.dim * 2, kernel_init=_dense_init, name="kv")(kv_in)
        kv = kv.reshape(b, n_kv, 2, self.num_heads, head_dim)
        k, v = kv[:, :, 0], kv[:, :, 1]

        attn = jnp.einsum("bqhd,bkhd->bhqk", q, k) * scale
        attn = jax.nn.softmax(attn, axis=-1)
        out = jnp.einsum("bhqk,bkhd->bqhd", attn, v).reshape(b, h, w, self.dim)
        return nn.Dense(self.dim, kernel_init=_dense_init, name="proj")(out)


class MiTBlock(nn.Module):
    dim: int
    num_heads: int
    sr_ratio: int
    mlp_ratio: int = 4
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = x + SRAttention(self.dim, self.num_heads, self.sr_ratio, ln_eps=self.ln_eps, name="attn")(
            nn.LayerNorm(epsilon=self.ln_eps, name="norm1")(x)
        )
        x = x + MixFFN(self.dim * self.mlp_ratio, self.dim, name="mlp")(
            nn.LayerNorm(epsilon=self.ln_eps, name="norm2")(x)
        )
        return x


class OverlapPatchEmbed(nn.Module):
    embed_dim: int
    patch_size: int
    stride: int
    ln_eps: float = 1e-6

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        x = nn.Conv(
            self.embed_dim, (self.patch_size, self.patch_size),
            strides=(self.stride, self.stride), padding=self.patch_size // 2,
            kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
        )(x)
        return nn.LayerNorm(epsilon=self.ln_eps)(x)


class MixVisionTransformer(nn.Module):
    """4-stage MiT encoder returning the multi-scale pyramid
    (`segformer.py:244`)."""

    scale: str = "b0"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> list[jnp.ndarray]:
        cfg = MIT_CONFIGS[self.scale]
        embed_dims, depths = cfg["embed_dims"], cfg["depths"]
        patch = [(7, 4), (3, 2), (3, 2), (3, 2)]
        feats = []
        for stage in range(4):
            x = OverlapPatchEmbed(
                embed_dims[stage], patch[stage][0], patch[stage][1],
                name=f"patch_embed{stage + 1}",
            )(x)
            for i in range(depths[stage]):
                x = MiTBlock(
                    embed_dims[stage], MIT_NUM_HEADS[stage], MIT_SR_RATIOS[stage],
                    name=f"block{stage + 1}_{i}",
                )(x)
            x = nn.LayerNorm(epsilon=1e-6, name=f"norm{stage + 1}")(x)
            feats.append(x)
        return feats


class SegFormerHead(nn.Module):
    """All-MLP decode head fusing the 4-scale pyramid (`segformer.py:463`).

    ``norm_mode``:
      * ``"gn"`` (default, fresh training) — GroupNorm after the fuse conv;
        the reference uses (Sync)BatchNorm, GroupNorm is the TPU-native
        choice (no cross-device batch stats; SURVEY.md §5).
      * ``"folded_bn"`` — no norm; used for converted reference checkpoints
        where the inference-time BatchNorm affine is folded into the fuse
        conv's kernel/bias by ``tools/convert_torch_ckpt``.
    """

    embedding_dim: int = 256
    norm_mode: str = "gn"

    @nn.compact
    def __call__(self, feats: Sequence[jnp.ndarray]) -> jnp.ndarray:
        target_hw = feats[0].shape[1:3]
        projected = []
        for i, f in enumerate(feats):
            p = nn.Dense(self.embedding_dim, kernel_init=_dense_init, name=f"linear_c{i + 1}")(f)
            if p.shape[1:3] != target_hw:
                p = resize_nhwc(p, target_hw)
            projected.append(p)
        # reference concatenates c4..c1
        x = jnp.concatenate(projected[::-1], axis=-1)
        x = nn.Conv(
            self.embedding_dim, (1, 1), use_bias=(self.norm_mode == "folded_bn"),
            name="linear_fuse",
        )(x)
        if self.norm_mode == "gn":
            x = nn.GroupNorm(num_groups=32, name="fuse_norm")(x)
        return nn.relu(x)


class PlaneCNN(nn.Module):
    """Fused feature map -> raw planes: 3 convs + 2x upsample + projection
    (`segformer.py:568-578`).

    ``conv_bf16``: bf16 compute for the conv stack (params stay fp32; output
    cast back to fp32) — the plane CNN is ~87 GFLOP/frame at the flagship's
    128^2/256^2 maps, the MXU whale of the per-frame SECC backbone."""

    out_channels: int
    conv_bf16: bool = False

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        dt = jnp.bfloat16 if self.conv_bf16 else None
        for i in range(3):
            x = nn.Conv(256, (3, 3), padding=1, dtype=dt, name=f"conv{i}")(x)
            x = nn.leaky_relu(x, 0.01)
        # reference uses nn.UpsamplingBilinear2d => align_corners=True
        x = upsample_align_corners(x, (x.shape[1] * 2, x.shape[2] * 2))
        out = nn.Conv(self.out_channels, (3, 3), padding=1, dtype=dt,
                      name="to_plane")(x)
        return out.astype(jnp.float32)


def apply_plane_flips(planes: jnp.ndarray) -> jnp.ndarray:
    """hide-nerf axis alignment (`segformer.py:592-599`).

    planes [B, 3, H, W, C]: xy and xz planes flip H; zy plane flips H and W.
    """
    p_xy = jnp.flip(planes[:, 0], axis=1)
    p_xz = jnp.flip(planes[:, 1], axis=1)
    p_zy = jnp.flip(planes[:, 2], axis=(1, 2))
    return jnp.stack([p_xy, p_xz, p_zy], axis=1)


class SegFormerImg2PlaneBackbone(nn.Module):
    """One-shot portrait image -> canonical tri-plane (`segformer.py:554`).

    Returns ``[B, 3, H, W, C*D]`` (channels-last; reshape/transpose to the
    trigrid layout happens in the model wrapper).
    """

    scale: str = "b0"
    plane_channels: int = 96  # 3 * hid_dim * depth / 3 per plane
    head_norm_mode: str = "gn"

    @nn.compact
    def __call__(self, img: jnp.ndarray) -> jnp.ndarray:
        feats = MixVisionTransformer(self.scale, name="mix_vit")(img)
        fused = SegFormerHead(norm_mode=self.head_norm_mode, name="fuse_head")(feats)
        planes = PlaneCNN(self.plane_channels * 3, name="to_plane_cnn")(fused)
        b, h, w, _ = planes.shape
        planes = planes.reshape(b, h, w, 3, self.plane_channels)
        planes = jnp.moveaxis(planes, 3, 1)  # [B,3,H,W,C]
        return apply_plane_flips(planes)


class SegFormerSECC2PlaneBackbone(nn.Module):
    """(cano, src, tgt) SECC maps -> residual motion plane (`segformer.py:673`)."""

    scale: str = "b0"
    plane_channels: int = 96
    pncc_cond_mode: str = "cano_src_tgt"
    head_norm_mode: str = "gn"
    plane_cnn_bf16: bool = False  # bf16 compute in the plane CNN convs

    @nn.compact
    def __call__(self, secc: jnp.ndarray) -> jnp.ndarray:
        """secc [B,H,W,9] (cano_src_tgt) or [B,H,W,6] (cano_tgt)."""
        from real3dportrait_tpu.models.stylegan2 import Conv2dLayer

        x = Conv2dLayer(3, kernel_size=1, name="prenet")(secc)
        feats = MixVisionTransformer(self.scale, name="mix_vit")(x)
        fused = SegFormerHead(norm_mode=self.head_norm_mode, name="fuse_head")(feats)
        planes = PlaneCNN(self.plane_channels * 3,
                          conv_bf16=self.plane_cnn_bf16, name="to_plane_cnn")(fused)
        b, h, w, _ = planes.shape
        planes = planes.reshape(b, h, w, 3, self.plane_channels)
        planes = jnp.moveaxis(planes, 3, 1)
        return apply_plane_flips(planes)
