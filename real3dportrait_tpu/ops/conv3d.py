"""3D convolution lowered as a sum of batched 2D convolutions.

XLA:TPU lowers NDHWC 3D convolutions poorly for the shallow-depth volumes
of the facev2v torso branch (D=16, 7^3 kernels: measured ~9 TFLOP/s
effective on v5e — a fraction of the MXU). Decomposing over the depth taps
turns each 3D conv into ``kd`` ordinary 2D convs on a [B*D, H, W, C] batch,
which XLA tiles onto the MXU properly. Numerically identical (same taps,
same zero padding in z; fp32 accumulation order differs only by the outer
sum over kd).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def conv3d_via_2d(x: jnp.ndarray, kernel: jnp.ndarray,
                  bias: jnp.ndarray | None = None,
                  stride: tuple[int, int, int] = (1, 1, 1)) -> jnp.ndarray:
    """x [B,D,H,W,Ci], kernel [kd,kh,kw,Ci,Co] (nn.Conv layout), SAME padding.

    Only unit depth-stride is supported (all torso convs use it).
    """
    kd, kh, kw, ci, co = kernel.shape
    sd, sh, sw = stride
    assert sd == 1, "depth stride 1 only"
    b, d, h, w, _ = x.shape
    pad_d = kd // 2
    xp = jnp.pad(x, ((0, 0), (pad_d, pad_d), (0, 0), (0, 0), (0, 0)))
    out = None
    ho, wo = h // sh, w // sw
    for dz in range(kd):
        xs = xp[:, dz : dz + d].reshape(b * d, h, w, ci)
        y = jax.lax.conv_general_dilated(
            xs, kernel[dz], (sh, sw), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        out = y if out is None else out + y
    out = out.reshape(b, d, ho, wo, co)
    if bias is not None:
        out = out + bias
    return out


def folded_banded_kernel(kernel: jnp.ndarray, depth: int) -> jnp.ndarray:
    """[kd,kh,kw,Ci,Co] 3D kernel -> [kh,kw,Ci*D,Co*D] 2D kernel acting on a
    depth-folded [B,H,W,Ci*D] layout (c-major, d-minor — the ``view(N,-1,H,W)``
    flattening the torso branch already uses for its 2D occlusion head).

    The result is block-banded in depth: out channel (c_o, d_o) reads input
    channel (c_i, d_i) through spatial tap ``kernel[d_i-d_o+kd//2]`` when
    ``|d_i-d_o| <= kd//2`` and zero otherwise — numerically identical to the
    zero-padded 3D convolution (same taps; fp32 sums only reassociate).

    Why: a Co=5 (or Co=1) conv wastes 128-lane MXU tiles 25x; folding depth
    into lanes gives Co*D lanes at a (D/kd)-ish dense-FLOP overcount, which
    measured a clear win for the motion-field tail (mask 7^3 32->5 + fused
    occlusion 7^2 512->2: 7.4 ms separate -> 5.8 fused-folded fp32, 4.2 bf16
    on v5e; BASELINE.md round 4).
    """
    kd, kh, kw, ci, co = kernel.shape
    pad = kd // 2
    di = jnp.arange(depth)[:, None]
    do = jnp.arange(depth)[None, :]
    tap = di - do + pad                                   # [D,D]
    valid = (tap >= 0) & (tap < kd)
    kb = kernel[jnp.clip(tap, 0, kd - 1)]                 # [D,D,kh,kw,ci,co]
    kb = jnp.where(valid[:, :, None, None, None, None], kb, 0)
    kb = jnp.transpose(kb, (2, 3, 4, 0, 5, 1))            # [kh,kw,ci,di,co,do]
    return kb.reshape(kh, kw, ci * depth, co * depth)


class Conv3D(nn.Module):
    """Drop-in for ``nn.Conv`` on [B,D,H,W,C] with the decomposed lowering.

    Identical param tree (``kernel`` [kd,kh,kw,ci,co], ``bias`` [co]) so
    converted checkpoints are unaffected.
    """

    features: int
    kernel_size: tuple[int, int, int]
    strides: tuple[int, int, int] = (1, 1, 1)
    use_bias: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kd, kh, kw = self.kernel_size
        ci = x.shape[-1]
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kd, kh, kw, ci, self.features),
        )
        bias = (self.param("bias", nn.initializers.zeros, (self.features,))
                if self.use_bias else None)
        if self.dtype is not None:
            x = x.astype(self.dtype)
            kernel = kernel.astype(self.dtype)
            bias = bias.astype(self.dtype) if bias is not None else None
        return conv3d_via_2d(x, kernel, bias, self.strides)
