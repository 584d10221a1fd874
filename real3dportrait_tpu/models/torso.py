"""Keypoint-driven warp-based torso model (face-vid2vid style).

TPU-native Flax redesign of `modules/real3d/facev2v_warp/{network,model,
layers,func_utils}.py`:

* layout is channels-last everywhere ([B,D,H,W,C] for 3D feature volumes);
* SyncBatchNorm/InstanceNorm become GroupNorm (no cross-device batch stats
  on a mesh; SURVEY.md §5);
* the gradient scale 0.1 applied to the motion-field outputs
  (`model.py:241-247`) is expressed with ``stop_gradient`` mixing;
* the warp itself is the shared trilinear `grid_sample_3d` with
  align_corners=True / border padding, matching torch semantics.

Components: AppearanceFeatureExtractor (2D conv pyramid -> 3D feature
volume), MotionFieldEstimator (K keypoint-gaussian volumes -> dense
deformation + 2 occlusion maps), occlusion-aware Generator, patch
Discriminator, and the `WarpBasedTorsoModel` wrapper driven by a subset of
the 68 2D landmarks.
"""

from __future__ import annotations

from typing import Any, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from real3dportrait_tpu.ops.conv3d import Conv3D, conv3d_via_2d, folded_banded_kernel
from real3dportrait_tpu.ops.grid_sample import (
    grid_sample_2d,
    grid_sample_3d_packed,
    grid_sample_3d_prepacked,
    pack_trigrid_cells,
)


def _gn(c: int) -> int:
    """GroupNorm group count: 8 channels/group, at least 1 group."""
    for g in (min(32, c), 16, 8, 4, 2, 1):
        if c % g == 0:
            return g
    return 1


class ChannelAffine(nn.Module):
    """Per-channel ``x*scale + bias`` — the exact eval-time form of the
    reference's (Sync)BatchNorm, populated by ``tools/convert_torch_ckpt``
    from the running stats."""

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (c,))
        bias = self.param("bias", nn.initializers.zeros, (c,))
        # compute in the input dtype: fp32 params would otherwise promote a
        # bf16 conv stack back to fp32 at every norm (dtype ping-pong)
        return x * scale.astype(x.dtype) + bias.astype(x.dtype)


def _norm(x, mode: str, name: str):
    if mode == "affine":
        return ChannelAffine(name=name)(x)
    return nn.GroupNorm(num_groups=_gn(x.shape[-1]), name=name)(x)


class ConvBlock2D(nn.Module):
    """conv -> norm -> activation (pattern 'CNA' of `layers.py:_ConvBlock`).

    norm_mode "gn" (fresh training; the reference uses SyncBatchNorm, which
    has no TPU-mesh analogue) or "affine" (converted checkpoints: eval-time
    BN folded to a per-channel affine).
    """

    out_channels: int
    kernel: int = 3
    stride: int = 1
    pattern: str = "CNA"
    lrelu: bool = False
    norm_mode: str = "gn"
    dtype: Any = None  # compute dtype; bf16 at inference (params stay fp32)

    @nn.compact
    def __call__(self, x):
        for op in self.pattern:
            if op == "C":
                x = nn.Conv(self.out_channels, (self.kernel, self.kernel),
                            strides=self.stride, padding=self.kernel // 2,
                            dtype=self.dtype, name="conv")(x)
            elif op == "N":
                x = _norm(x, self.norm_mode, "norm")
            elif op == "A":
                x = nn.leaky_relu(x, 0.2) if self.lrelu else nn.relu(x)
        return x


class ConvBlock3D(nn.Module):
    out_channels: int
    kernel: int = 3
    stride: int = 1
    pattern: str = "CNA"
    lrelu: bool = False
    norm_mode: str = "gn"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):  # [B,D,H,W,C]
        for op in self.pattern:
            if op == "C":
                # depth-decomposed lowering: XLA's native NDHWC conv runs at
                # a fraction of the MXU on these shallow volumes
                x = Conv3D(self.out_channels, (self.kernel,) * 3,
                           strides=(self.stride,) * 3 if isinstance(
                               self.stride, int) else self.stride,
                           dtype=self.dtype, name="conv")(x)
            elif op == "N":
                x = _norm(x, self.norm_mode, "norm")
            elif op == "A":
                x = nn.leaky_relu(x, 0.2) if self.lrelu else nn.relu(x)
        return x


def avg_pool_2d(x):  # halve H,W of [B,H,W,C]
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def avg_pool_3d_hw(x):  # halve H,W of [B,D,H,W,C], keep D
    return nn.avg_pool(x, (1, 2, 2), strides=(1, 2, 2))


def upsample_2d(x):
    """Nearest 2x upsample as broadcast+reshape (identical values to
    jax.image.resize 'nearest' at exact 2x, but lowers to pure layout ops
    instead of a gather)."""
    b, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, None, :, None, :], (b, h, 2, w, 2, c))
    return x.reshape(b, 2 * h, 2 * w, c)


def upsample_3d_hw(x):
    b, d, h, w, c = x.shape
    x = jnp.broadcast_to(x[:, :, :, None, :, None, :], (b, d, h, 2, w, 2, c))
    return x.reshape(b, d, 2 * h, 2 * w, c)


class ResBlock2D(nn.Module):
    norm_mode: str = "gn"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = ConvBlock2D(c, pattern="NAC", norm_mode=self.norm_mode,
                        dtype=self.dtype, name="block0")(x)
        y = ConvBlock2D(c, pattern="NAC", norm_mode=self.norm_mode,
                        dtype=self.dtype, name="block1")(y)
        return x + y


class ResBlock3D(nn.Module):
    norm_mode: str = "gn"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        c = x.shape[-1]
        y = ConvBlock3D(c, pattern="NAC", norm_mode=self.norm_mode,
                        dtype=self.dtype, name="block0")(x)
        y = ConvBlock3D(c, pattern="NAC", norm_mode=self.norm_mode,
                        dtype=self.dtype, name="block1")(y)
        return x + y


# ---------------------------------------------------------------------------
# keypoint/volume helpers (`func_utils.py`)
# ---------------------------------------------------------------------------


def make_coordinate_grid_3d(d: int, h: int, w: int) -> jnp.ndarray:
    """[-1,1]³ grid, (x, y, z) ordering -> [D,H,W,3] (`func_utils.py:96`)."""
    z = 2 * (jnp.arange(d) / (d - 1)) - 1
    y = 2 * (jnp.arange(h) / (h - 1)) - 1
    x = 2 * (jnp.arange(w) / (w - 1)) - 1
    zz, yy, xx = jnp.meshgrid(z, y, x, indexing="ij")
    return jnp.stack([xx, yy, zz], axis=-1).astype(jnp.float32)


def make_coordinate_grid_2d(h: int, w: int) -> jnp.ndarray:
    y = 2 * (jnp.arange(h) / (h - 1)) - 1
    x = 2 * (jnp.arange(w) / (w - 1)) - 1
    yy, xx = jnp.meshgrid(y, x, indexing="ij")
    return jnp.stack([xx, yy], axis=-1).astype(jnp.float32)


def kp2gaussian_3d(kp: jnp.ndarray, d: int, h: int, w: int,
                   kp_variance: float = 0.01) -> jnp.ndarray:
    """kp [B,K,3] in [-1,1] -> gaussian volumes [B,K,D,H,W].

    Separable form: exp(-(dx²+dy²+dz²)/2v) = exp(-dx²/2v)·exp(-dy²/2v)·
    exp(-dz²/2v) — three 1-D exp tables (D+H+W values per keypoint) and a
    broadcast product instead of a [B,K,D,H,W,3] difference volume; the
    direct form's 12 MB intermediates + full-volume exp cost ~1.4 ms/frame
    on v5e, the separable one is pure broadcast multiplies."""
    zs = 2 * (jnp.arange(d) / (d - 1)) - 1
    ys = 2 * (jnp.arange(h) / (h - 1)) - 1
    xs = 2 * (jnp.arange(w) / (w - 1)) - 1
    gz = jnp.exp(-0.5 * (zs[None, None] - kp[..., 2:3]) ** 2 / kp_variance)
    gy = jnp.exp(-0.5 * (ys[None, None] - kp[..., 1:2]) ** 2 / kp_variance)
    gx = jnp.exp(-0.5 * (xs[None, None] - kp[..., 0:1]) ** 2 / kp_variance)
    return (gz[:, :, :, None, None] * gy[:, :, None, :, None]
            * gx[:, :, None, None, :])


def kp2gaussian_2d(kp: jnp.ndarray, h: int, w: int,
                   kp_variance: float = 0.01) -> jnp.ndarray:
    """kp [B,K,2] -> [B,K,H,W]."""
    grid = make_coordinate_grid_2d(h, w)
    diff = grid[None, None] - kp[:, :, None, None, :]
    return jnp.exp(-0.5 * jnp.sum(diff**2, axis=-1) / kp_variance)


def create_sparse_motions(kp_s: jnp.ndarray, kp_d: jnp.ndarray,
                          d: int, h: int, w: int) -> jnp.ndarray:
    """[B,K,3] src/drv keypoints -> [B,K+1,D,H,W,3] candidate back-warps.

    Identity rotation variant of `func_utils.py:152` (the torso wrapper
    always passes Rs = Rd = I, `model.py:239`).
    """
    b, k, _ = kp_s.shape
    identity = jnp.broadcast_to(make_coordinate_grid_3d(d, h, w)[None, None],
                                (b, 1, d, h, w, 3))
    grid = identity  # [B,1,D,H,W,3]
    driving_to_source = (
        grid - kp_d[:, :, None, None, None, :] + kp_s[:, :, None, None, None, :]
    )
    return jnp.concatenate([identity, driving_to_source], axis=1)


def create_deformed_source_image(fs: jnp.ndarray, sparse_motions: jnp.ndarray):
    """fs [B,D,H,W,C], motions [B,K+1,D,H,W,3] -> [B,K+1,D,H,W,C].

    The K+1 candidate warps sample the SAME compressed volume, whose rows
    are tiny (C=4 -> 32 B bf16): the gather unit is transaction-bound, so
    pack the 2x2x2 cells ONCE (8C = full-cell rows, one gather per sample)
    and share the pack across candidates."""
    b, d, h, w, c = fs.shape
    k1 = sparse_motions.shape[1]
    packed = pack_trigrid_cells(fs)  # [B, D*H*W, 8C]
    packed_rep = jnp.repeat(packed[:, None], k1, axis=1).reshape(
        b * k1, d * h * w, 8 * c)
    coords = sparse_motions.reshape(b * k1, -1, 3)
    warped = grid_sample_3d_prepacked(packed_rep, (d, h, w, c), coords,
                                      align_corners=True, padding_mode="zeros")
    return warped.reshape(b, k1, d, h, w, c)


def dilate_mask(mask: jnp.ndarray, ksize: int = 7) -> jnp.ndarray:
    """Max-pool dilation of [B,H,W,1] masks (`func_utils.py:dilate`)."""
    pad = ksize // 2
    return jax.lax.reduce_window(
        mask, -jnp.inf, jax.lax.max, (1, ksize, ksize, 1), (1, 1, 1, 1),
        [(0, 0), (pad, pad), (pad, pad), (0, 0)],
    )


# ---------------------------------------------------------------------------
# networks (`network.py`)
# ---------------------------------------------------------------------------


class AppearanceFeatureExtractor(nn.Module):
    """Image [B,256,256,3] -> 3D appearance volume [B,D=16,64,64,C=32]
    (`network.py:17`)."""

    feat_channels: int = 32
    depth: int = 16
    down_seq: Sequence[int] = (64, 128, 256)
    n_res: int = 6
    norm_mode: str = "gn"
    dtype: Any = None

    @nn.compact
    def __call__(self, x):
        nm, dt = self.norm_mode, self.dtype
        x = ConvBlock2D(self.down_seq[0], kernel=7, norm_mode=nm, dtype=dt,
                        name="in_conv")(x)
        for i, ch in enumerate(self.down_seq[1:]):
            x = avg_pool_2d(ConvBlock2D(ch, norm_mode=nm, dtype=dt,
                                        name=f"down_{i}")(x))
        x = nn.Conv(self.feat_channels * self.depth, (1, 1), dtype=dt,
                    name="mid_conv")(x)
        b, h, w, _ = x.shape
        # channel-major split (C,D) matching reference view(N, C, D, H, W)
        x = x.reshape(b, h, w, self.feat_channels, self.depth)
        x = jnp.transpose(x, (0, 4, 1, 2, 3))  # [B,D,H,W,C]
        for i in range(self.n_res):
            x = ResBlock3D(norm_mode=nm, dtype=dt, name=f"res_{i}")(x)
        return x


class _Conv2DParams(nn.Module):
    """Declares nn.Conv-compatible kernel/bias params WITHOUT running the
    conv — lets callers fuse several small-output convs into one dispatch
    while keeping each conv's checkpoint param tree unchanged."""

    in_features: int
    features: int
    kernel: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel, self.kernel, self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class _Conv3DParams(nn.Module):
    """Conv3D-compatible kernel/bias params without running the conv (the
    3D analogue of :class:`_Conv2DParams`; same initializers as Conv3D)."""

    in_features: int
    features: int
    kernel: int

    @nn.compact
    def __call__(self):
        k = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (self.kernel,) * 3 + (self.in_features, self.features),
        )
        b = self.param("bias", nn.initializers.zeros, (self.features,))
        return k, b


class MotionFieldEstimator(nn.Module):
    """Keypoint volumes -> dense deformation + occlusion maps
    (`network.py:163`, model_scale='small')."""

    num_keypoints: int = 4
    compress_channels: int = 4
    down_seq: Sequence[int] = (32, 64, 128, 256, 512)
    up_seq: Sequence[int] = (512, 256, 128, 64, 32, 16)
    norm_mode: str = "gn"
    dtype: Any = None
    # v2 (`facev2v_warp/network2.py:162`): condition the field on the rendered
    # target head + its NeRF weights through a dedicated encoder/fuser.
    use_head_cond: bool = False
    head_hid_dim: int = 32
    # bf16 compute for ONLY the fat 7^3 convs (tgt_head_fuser, mask_conv) and
    # the fused occlusion conv — the estimator's MXU whales. Whole-MFE bf16
    # measured SLOWER (r3: 16.3 -> 18.2 ms, cast overhead on the
    # warp/elementwise-dominated stages); this knob leaves those fp32.
    fat_bf16: bool = False
    # "fused": mask + occlusion heads in one depth-folded 82-lane conv
    # (exact same taps, measured ~1.6x faster on v5e); "direct": the
    # reference-shaped separate lowerings, kept as the oracle cross-check.
    tail_mode: str = "fused"

    @nn.compact
    def __call__(self, fs: jnp.ndarray, kp_s: jnp.ndarray, kp_d: jnp.ndarray,
                 tgt_head_img: jnp.ndarray | None = None,
                 tgt_head_weights: jnp.ndarray | None = None):
        """fs [B,D,H,W,C]; kp_* [B,K,3]. Returns (deformation [B,D,H,W,3],
        occlusion [B,H,W,1], occlusion_2 [B,H,W,1])."""
        if self.tail_mode not in ("fused", "direct"):
            raise ValueError(
                f"tail_mode must be 'fused' or 'direct', got {self.tail_mode!r}"
            )
        b, d, h, w, c = fs.shape
        k = self.num_keypoints

        fs_compressed = nn.Conv(self.compress_channels, (1, 1, 1),
                                dtype=self.dtype, name="compress")(fs)

        heat_s = kp2gaussian_3d(kp_s, d, h, w)
        heat_d = kp2gaussian_3d(kp_d, d, h, w)
        heatmap = heat_d - heat_s  # [B,K,D,H,W]
        heatmap = jnp.concatenate([jnp.zeros_like(heatmap[:, :1]), heatmap], axis=1)

        sparse_motion = create_sparse_motions(kp_s, kp_d, d, h, w)  # [B,K+1,D,H,W,3]
        deformed = create_deformed_source_image(fs_compressed, sparse_motion)

        # [B,K+1,D,H,W,1+C2] -> [B,D,H,W,(K+1)*(1+C2)]
        inp = jnp.concatenate([heatmap[..., None], deformed], axis=-1)
        inp = jnp.transpose(inp, (0, 2, 3, 4, 1, 5)).reshape(
            b, d, h, w, (k + 1) * (1 + self.compress_channels)
        )

        x = inp
        for i, ch in enumerate(self.down_seq):
            x = ConvBlock3D(ch, norm_mode=self.norm_mode, dtype=self.dtype,
                            name=f"down_{i}")(x)
            x = avg_pool_3d_hw(x)
        for i, ch in enumerate(self.up_seq[1:]):
            x = upsample_3d_hw(x)
            x = ConvBlock3D(ch, norm_mode=self.norm_mode, dtype=self.dtype,
                            name=f"up_{i}")(x)
        x = jnp.concatenate([inp, x], axis=-1)

        if self.use_head_cond:
            # v2 head conditioning (`network2.py:191-225`): encode the
            # rendered head+weights at 2x resolution, fuse into the volume
            if tgt_head_img is None:
                tgt_head_img = jnp.zeros((b, h, w, 3), fs.dtype)
            if tgt_head_weights is None:
                tgt_head_weights = jnp.zeros((b, h, w, 1), fs.dtype)
            head = jnp.concatenate([tgt_head_img, tgt_head_weights], axis=-1)
            head = jax.image.resize(head, (b, 2 * h, 2 * w, head.shape[-1]),
                                    "bilinear", antialias=False)
            head = ConvBlock2D(self.head_hid_dim, kernel=7,
                               norm_mode=self.norm_mode, dtype=self.dtype,
                               name="tgt_head_in_conv")(head)
            for i in range(3):
                head = ResBlock2D(norm_mode=self.norm_mode, dtype=self.dtype,
                                  name=f"tgt_head_res_{i}")(head)
            head = jax.image.resize(head, (b, h, w, self.head_hid_dim),
                                    "bilinear", antialias=False)
            head_vol = jnp.repeat(head[:, None], d, axis=1)
            x = jnp.concatenate([x, head_vol], axis=-1)
            fat_dt = jnp.bfloat16 if self.fat_bf16 else self.dtype
            x = Conv3D(self.head_hid_dim, (7, 7, 7), dtype=fat_dt,
                       name="tgt_head_fuser")(x)
        else:
            fat_dt = jnp.bfloat16 if self.fat_bf16 else self.dtype

        # ---- fused tail: mask (7^3, Co=K+1) + both occlusion heads (7^2,
        # Co=1 each) in ONE 2D conv dispatch on the depth-folded layout.
        # Tiny-output convs pad the MXU's 128 output lanes 25-128x; folding
        # the mask conv's depth axis into output lanes (block-banded kernel,
        # ops/conv3d.folded_banded_kernel) and concatenating the occlusion
        # kernels gives one (K+1)*D+2 = 82-lane conv. Measured on v5e:
        # 7.4 ms (separate, fp32) -> 5.8 fused fp32 / 4.2 fused bf16; exact
        # same taps as the direct lowering (fp32 sums only reassociate).
        # Param tree stays identical to the Conv3D + two-nn.Conv form (what
        # the checkpoint converter produces from `network.py:186-198`).
        cin3 = x.shape[-1]
        mk_, mb_ = _Conv3DParams(cin3, k + 1, 7, name="mask_conv")()
        # [B,D,H,W,C] -> [B,H,W,C*D] with C-major channel order, matching the
        # reference's view(N,-1,H,W) from NCDHW (`network.py:214`)
        x2d = jnp.transpose(x, (0, 2, 3, 4, 1)).reshape(b, h, w, -1)
        cin = x2d.shape[-1]
        k1, b1 = _Conv2DParams(cin, 1, 7, name="occlusion_conv")()
        k2, b2 = _Conv2DParams(cin, 1, 7, name="occlusion_conv2")()
        if self.tail_mode == "fused":
            kb = folded_banded_kernel(mk_, d)          # [7,7,C*D,(K+1)*D]
            kk = jnp.concatenate([kb, k1, k2], axis=-1)
            xin = x2d
            if fat_dt is not None:
                xin, kk = xin.astype(fat_dt), kk.astype(fat_dt)
            y = jax.lax.conv_general_dilated(
                xin, kk, (1, 1),
                [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32)
            n_m = (k + 1) * d
            mask = jnp.transpose(
                y[..., :n_m].reshape(b, h, w, k + 1, d), (0, 4, 1, 2, 3)
            ) + mb_                                    # [B,D,H,W,K+1]
            fused = y[..., n_m:] + jnp.concatenate([b1, b2])
        else:  # "direct": the reference-shaped lowering (oracle cross-check)
            xm = x if fat_dt is None else x.astype(fat_dt)
            mask = conv3d_via_2d(
                xm, mk_ if fat_dt is None else mk_.astype(fat_dt), mb_
            ).astype(jnp.float32)
            kk = jnp.concatenate([k1, k2], axis=-1)
            xin = x2d
            if fat_dt is not None:
                xin, kk = xin.astype(fat_dt), kk.astype(fat_dt)
            fused = jax.lax.conv_general_dilated(
                xin, kk, (1, 1),
                [(3, 3), (3, 3)], dimension_numbers=("NHWC", "HWIO", "NHWC"),
            ).astype(jnp.float32) + jnp.concatenate([b1, b2])

        mask = jax.nn.softmax(mask.astype(jnp.float32), axis=-1)  # over K+1
        mask = jnp.moveaxis(mask, -1, 1)[..., None]  # [B,K+1,D,H,W,1]
        deformation = jnp.sum(sparse_motion * mask, axis=1)  # [B,D,H,W,3]

        occlusion = jax.nn.sigmoid(fused[..., :1])
        occlusion_2 = jax.nn.sigmoid(fused[..., 1:2])
        return deformation, occlusion, occlusion_2


class WarpGenerator(nn.Module):
    """Deformed appearance volume -> torso RGB + hidden features
    (`network.py:240`)."""

    up_seq: Sequence[int] = (256, 128, 64)
    n_res: int = 6
    norm_mode: str = "gn"
    dtype: Any = None

    @nn.compact
    def __call__(self, fs: jnp.ndarray, deformation: jnp.ndarray):
        """fs [B,D,H,W,C], deformation [B,D,H,W,3] -> (rgb [B,4H,4W,3],
        hid [B,4H,4W,up_seq[-1]])."""
        nm = self.norm_mode
        b, d, h, w, c = fs.shape
        coords = deformation.reshape(b, -1, 3)
        warped = grid_sample_3d_packed(fs, coords, align_corners=True,
                                padding_mode="border").reshape(b, d, h, w, c)
        # collapse depth into channels: [B,H,W,C*D] (reference view(N,-1,H,W)
        # from NCDHW flattens C-major, D-minor)
        x = jnp.transpose(warped, (0, 2, 3, 4, 1)).reshape(b, h, w, c * d)
        dt = self.dtype
        x = ConvBlock2D(self.up_seq[0], lrelu=True, norm_mode=nm, dtype=dt,
                        name="in_conv")(x)
        x = nn.Conv(self.up_seq[0], (1, 1), dtype=dt, name="mid_conv")(x)
        for i in range(self.n_res):
            x = ResBlock2D(norm_mode=nm, dtype=dt, name=f"res_{i}")(x)
        for i, ch in enumerate(self.up_seq[1:]):
            x = upsample_2d(x)
            x = ConvBlock2D(ch, norm_mode=nm, dtype=dt, name=f"up_{i}")(x)
        # final rgb conv in fp32: bf16 output quantization is visible in
        # the composited torso colors
        rgb = nn.Conv(3, (7, 7), padding=3, name="out_conv")(
            x.astype(jnp.float32) if dt is not None else x)
        return rgb, x


class PatchDiscriminator(nn.Module):
    """Patch discriminator over (img, kp heatmap) (`network.py:301`)."""

    down_seq: Sequence[int] = (64, 128, 256, 512)
    num_keypoints: int = 4

    @nn.compact
    def __call__(self, img: jnp.ndarray, kp: jnp.ndarray):
        heat = kp2gaussian_2d(jax.lax.stop_gradient(kp[..., :2]),
                              img.shape[1], img.shape[2])
        x = jnp.concatenate([img, jnp.moveaxis(heat, 1, -1)], axis=-1)
        feats = []
        for i, ch in enumerate(self.down_seq):
            stride = 2 if i < len(self.down_seq) - 1 else 1
            x = ConvBlock2D(ch, stride=stride, lrelu=True)(x)
            feats.append(x)
        out = ConvBlock2D(1, pattern="CN")(x)
        return out, feats


# architecture presets matching the reference model_scale choices
# (`network.py`: 'standard'/'small'), plus a tiny preset for smoke tests.
TORSO_PRESETS: dict[str, dict] = {
    "standard": dict(
        feat_channels=32, depth=16, app_down_seq=(64, 128, 256), app_n_res=6,
        motion_down_seq=(64, 128, 256, 512, 1024),
        motion_up_seq=(1024, 512, 256, 128, 64, 32),
        gen_up_seq=(256, 128, 64), gen_n_res=6,
    ),
    # reference 'small' differs from 'standard' ONLY in the motion-field
    # seqs (`network.py:25-35,174-180`): appearance/generator are fixed.
    "small": dict(
        feat_channels=32, depth=16, app_down_seq=(64, 128, 256), app_n_res=6,
        motion_down_seq=(32, 64, 128, 256, 512),
        motion_up_seq=(512, 256, 128, 64, 32, 16),
        gen_up_seq=(256, 128, 64), gen_n_res=6,
    ),
    "tiny": dict(
        feat_channels=4, depth=2, app_down_seq=(8, 16), app_n_res=1,
        motion_down_seq=(8, 16), motion_up_seq=(16, 16, 8),
        gen_up_seq=(16, 8), gen_n_res=1,
    ),
}


class WarpBasedTorsoModel(nn.Module):
    """Full torso pipeline (`model.py:198`, WarpBasedTorsoModelMediaPipe).

    Drives the torso with ``torso_kp_num`` of the 68 2D landmarks; the
    motion-field branch receives 0.1-scaled gradients.
    """

    torso_kp_num: int = 4
    scale: str = "standard"
    grad_scale: float = 0.1
    norm_mode: str = "gn"
    # "v1" (`model.py:198`): no head conditioning. "v2" (`model2.py:199`, the
    # shipped `torso_model_version`): motion field conditioned on the rendered
    # target head via the estimator's tgt_head encoder/fuser.
    version: str = "v2"
    # "rgb_alpha" (the shipped `torso_inp_mode`): the appearance extractor
    # also sees the 2-channel neck/torso segmap (`model2.py:227-229`)
    inp_mode: str = "rgb_alpha"
    dtype: Any = None  # compute dtype for the conv stacks (bf16 inference)
    mfe_fat_bf16: bool = False  # bf16 for the MFE's fat 7^3/occlusion convs
    mfe_bf16: bool = False      # bf16 for the WHOLE motion-field estimator

    KP_SUBSETS = {4: (0, 8, 16, 27), 9: (0, 3, 6, 8, 10, 13, 16, 27, 33)}

    @nn.compact
    def __call__(
        self,
        torso_src_img: jnp.ndarray,   # [B,256,256,3]
        segmap: jnp.ndarray,          # [B,H,W,6] one-hot segmentation
        kp_s: jnp.ndarray,            # [B,68,3] in [-1,1]
        kp_d: jnp.ndarray,            # [B,68,3]
        tgt_head_img: jnp.ndarray | None = None,      # [B,h,w,3] v2 cond
        tgt_head_weights: jnp.ndarray | None = None,  # [B,h,w,1] v2 cond
        target_torso_mask: jnp.ndarray | None = None,  # [B,H,W] bool
        appearance_volume: jnp.ndarray | None = None,  # cached [B,D,H,W,C]
        appearance_only: bool = False,
    ) -> dict:
        """``appearance_volume``/``appearance_only`` implement the per-video
        appearance cache: the extractor depends only on the SOURCE torso
        image + segmap, so inference computes it once (appearance_only=True)
        and feeds the masked volume back per frame — the same dataflow shape
        as the canonical-plane cache."""
        arch = TORSO_PRESETS[self.scale]
        if appearance_volume is not None:
            feats = appearance_volume
        else:
            if self.inp_mode == "rgb_alpha":
                # append the neck/torso segmap channels at source resolution
                bs, hs, ws = torso_src_img.shape[:3]
                seg_src = jax.image.resize(
                    segmap[..., (2, 4)], (bs, hs, ws, 2), "bilinear",
                    antialias=False,
                )
                torso_src_img = jnp.concatenate([torso_src_img, seg_src], axis=-1)
            feats = AppearanceFeatureExtractor(
                arch["feat_channels"], arch["depth"],
                down_seq=arch["app_down_seq"], n_res=arch["app_n_res"],
                norm_mode=self.norm_mode,
                name="appearance_extractor",
            )(torso_src_img)
        b, d, h, w, c = feats.shape

        # torso mask from segmap channels 2 (neck) and 4 (torso);
        # antialias=False matches the reference F.interpolate (`model.py:240`)
        torso_seg = jax.image.resize(
            segmap[..., (2, 4)], (b, h, w, 2), "bilinear", antialias=False
        )
        if appearance_volume is None:
            torso_mask = dilate_mask(jnp.sum(torso_seg, axis=-1, keepdims=True))
            feats = feats * torso_mask[:, None, :, :, :]
        if appearance_only:
            return {"appearance_volume": feats}

        seg_vol = jnp.repeat(torso_seg[:, None], d, axis=1)  # [B,D,H,W,2]
        motion_inp = jnp.concatenate([feats, seg_vol], axis=-1)

        subset = jnp.array(self.KP_SUBSETS[self.torso_kp_num])
        kps = kp_s[:, subset]
        kpd = kp_d[:, subset]

        head_kwargs = {}
        if self.version == "v2":
            head_kwargs = dict(
                tgt_head_img=jax.lax.stop_gradient(tgt_head_img)
                if tgt_head_img is not None else None,
                tgt_head_weights=jax.lax.stop_gradient(tgt_head_weights)
                if tgt_head_weights is not None else None,
            )
        # bf16 measured SLOWER for the motion-field estimator (its cost is
        # warps/elementwise, not MXU) — the dtype knob drives only the
        # deform generator, where bf16 convs are a measured 2.6x
        deformation, occlusion, occlusion_2 = MotionFieldEstimator(
            num_keypoints=self.torso_kp_num,
            down_seq=arch["motion_down_seq"], up_seq=arch["motion_up_seq"],
            norm_mode=self.norm_mode,
            use_head_cond=(self.version == "v2"),
            fat_bf16=self.mfe_fat_bf16,
            dtype=jnp.bfloat16 if self.mfe_bf16 else None,
            name="motion_field_estimator",
        )(motion_inp, kps, kpd, **head_kwargs)

        def scale_grad(t):
            return t * self.grad_scale + jax.lax.stop_gradient(t) * (1 - self.grad_scale)

        # warp coordinates must be fp32: bf16 has ~3 decimal digits, far too
        # coarse for sub-texel sampling positions
        deformation = scale_grad(deformation).astype(jnp.float32)
        occlusion = scale_grad(occlusion).astype(jnp.float32)
        occlusion_2 = scale_grad(occlusion_2).astype(jnp.float32)

        rgb, hid = WarpGenerator(
            up_seq=arch["gen_up_seq"], n_res=arch["gen_n_res"],
            norm_mode=self.norm_mode, dtype=self.dtype,
            name="deform_based_generator",
        )(feats, deformation)

        occ2_up = jax.image.resize(
            occlusion_2, (b, hid.shape[1], hid.shape[2], 1), "bilinear",
            antialias=False,
        )
        x2 = jnp.concatenate([hid, occ2_up], axis=-1)
        # occlusion_2_predictor (`model.py:206-213`)
        x2 = nn.relu(nn.Conv(32, (3, 3), padding=1, name="occ2_pred_conv0")(x2))
        x2 = nn.relu(nn.Conv(32, (3, 3), padding=1, name="occ2_pred_conv1")(x2))
        occ2 = jax.nn.sigmoid(nn.Conv(1, (3, 3), padding=1, name="occ2_pred_conv2")(x2))

        alphas = jnp.clip(occ2, 1e-5, 1 - 1e-5)
        if target_torso_mask is None:
            occ_reg = jnp.mean(occlusion)
            occ2_reg = jnp.mean(occ2)
        else:
            # penalize occlusion outside the target torso more than inside
            # (`model.py:masked_l1_reg_loss`, unmask factor from config)
            def masked_reg(occ, unmask_w=0.3):
                bm, hm, wm = occ.shape[0], occ.shape[1], occ.shape[2]
                non_tgt = jax.image.resize(
                    1.0 - target_torso_mask.astype(jnp.float32)[..., None],
                    (bm, hm, wm, 1), "nearest",
                )
                weights = non_tgt * 1.0 + (1.0 - non_tgt) * unmask_w
                return jnp.mean(jnp.abs(occ) * weights)

            occ_reg = masked_reg(occlusion)
            occ2_reg = masked_reg(occ2)
        losses = {
            "facev2v/occlusion_reg_l1": occ_reg,
            "facev2v/occlusion_2_reg_l1": occ2_reg,
            "facev2v/occlusion_2_weights_entropy": jnp.mean(
                -alphas * jnp.log2(alphas) - (1 - alphas) * jnp.log2(1 - alphas)
            ),
        }
        return {
            "deformed_torso_img": rgb,
            "deformed_torso_hid": hid,
            "occlusion": occlusion,
            "occlusion_2": occ2,
            "kp_src": kps,
            "kp_drv": kpd,
            "losses": losses,
        }
