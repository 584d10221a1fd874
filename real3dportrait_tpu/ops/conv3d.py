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
