"""Upsample–FIR–downsample resampling and resampling convolutions.

XLA-native replacement for the reference's CUDA plugins
(`modules/eg3ds/torch_utils/ops/upfirdn2d.{cpp,cu}` and
`ops/conv2d_resample.py`): zero-insertion upsampling maps to
``lhs_dilation``, FIR filtering to a depthwise convolution, and
downsampling to ``window_strides`` — one fused `lax.conv_general_dilated`
per call, which XLA:TPU tiles onto the MXU/VPU directly.  Layout is NHWC
(channels-last, TPU-native); kernels are HWIO.

Semantics (padding applied to the *upsampled* image, negative padding
crops) match the reference so StyleGAN outputs are comparable.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp
from jax import lax


def setup_filter(f, normalize: bool = True, gain: float = 1.0) -> jnp.ndarray:
    """Prepare a 2D FIR filter (`upfirdn2d.py:setup_filter` semantics).

    1-D inputs are outer-product expanded. Returns a [fh, fw] float32 array.
    """
    if f is None:
        f = [1.0]
    f = np.asarray(f, dtype=np.float32)
    if f.ndim == 0:
        f = f[None]
    if f.ndim == 1:
        f = np.outer(f, f)
    if normalize:
        f = f / f.sum()
    f = f * (gain ** (f.ndim / 2))
    return jnp.asarray(f)


def _up_conv_mode() -> str:
    """Up-conv lowering: 'phase' (pixel-shuffle dense conv, default) or
    'dilated' (conv on the lhs-dilated input). Read at TRACE time — flip
    R3DP_UP_MODE and re-jit to A/B; see BASELINE.md r5 for the numbers."""
    import os

    return os.environ.get("R3DP_UP_MODE", "phase")


def _parse_padding(padding) -> tuple[int, int, int, int]:
    if isinstance(padding, int):
        padding = [padding, padding]
    if len(padding) == 2:
        px, py = padding
        return px, px, py, py
    px0, px1, py0, py1 = padding
    return px0, px1, py0, py1


def upfirdn2d(
    x: jnp.ndarray,
    f: jnp.ndarray | None,
    up: int = 1,
    down: int = 1,
    padding=0,
    gain: float = 1.0,
) -> jnp.ndarray:
    """x [B,H,W,C] -> upsample(up), pad, FIR(f), downsample(down).

    ``f`` is a [fh,fw] filter (true convolution: applied flipped, which is a
    no-op for the symmetric binomial filters StyleGAN uses).
    """
    b, h, w, c = x.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    if f is None:
        f = jnp.ones((1, 1), jnp.float32)
    fh, fw = f.shape
    # flip for convolution semantics; scale by gain (and up² comes from caller)
    kernel = (jnp.flip(f, (0, 1)) * gain).astype(jnp.float32)
    kernel = jnp.broadcast_to(kernel[:, :, None, None], (fh, fw, 1, c)).astype(x.dtype)

    # padding is relative to the upsampled image. lhs_dilation produces
    # (n-1)*up+1 samples, while upfirdn semantics zero-pad to n*up: add the
    # missing up-1 trailing zeros on each spatial axis.
    pad = ((py0, py1 + up - 1), (px0, px1 + up - 1))
    out = lax.conv_general_dilated(
        x.astype(jnp.float32) if x.dtype == jnp.float16 else x,
        kernel.astype(x.dtype if x.dtype != jnp.float16 else jnp.float32),
        window_strides=(down, down),
        padding=pad,
        lhs_dilation=(up, up),
        rhs_dilation=(1, 1),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
    )
    return out.astype(x.dtype)


def filter2d(x: jnp.ndarray, f: jnp.ndarray, padding=0, gain: float = 1.0) -> jnp.ndarray:
    """FIR-filter only (`upfirdn2d.py:filter2d`): pads so shape is preserved."""
    fh, fw = f.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    return upfirdn2d(
        x, f, padding=(px0 + fw // 2, px1 + (fw - 1) // 2, py0 + fh // 2, py1 + (fh - 1) // 2),
        gain=gain,
    )


def upsample2d(x: jnp.ndarray, f: jnp.ndarray, up: int = 2, padding=0, gain: float = 1.0):
    """2x (or up-x) antialiased upsampling (`upfirdn2d.py:upsample2d`)."""
    fh, fw = f.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    return upfirdn2d(
        x, f, up=up,
        padding=(
            px0 + (fw + up - 1) // 2,
            px1 + (fw - up) // 2,
            py0 + (fh + up - 1) // 2,
            py1 + (fh - up) // 2,
        ),
        gain=gain * up * up,
    )


def downsample2d(x: jnp.ndarray, f: jnp.ndarray, down: int = 2, padding=0, gain: float = 1.0):
    """2x (or down-x) antialiased downsampling (`upfirdn2d.py:downsample2d`)."""
    fh, fw = f.shape
    px0, px1, py0, py1 = _parse_padding(padding)
    return upfirdn2d(
        x, f, down=down,
        padding=(
            px0 + (fw - down + 1) // 2,
            px1 + (fw - down) // 2,
            py0 + (fh - down + 1) // 2,
            py1 + (fh - down) // 2,
        ),
        gain=gain,
    )


def filtered_lrelu(
    x: jnp.ndarray,
    f: jnp.ndarray | None = None,
    b: jnp.ndarray | None = None,
    up: int = 2,
    down: int = 2,
    padding=0,
    gain: float = float(np.sqrt(2.0)),
    slope: float = 0.2,
    clamp: float | None = None,
) -> jnp.ndarray:
    """StyleGAN3's fused upsample -> bias -> leaky-relu -> downsample.

    Composition replacement for the 1.8kLoC CUDA plugin
    (`torch_utils/ops/filtered_lrelu.{cpp,cu}`): each stage is an XLA op and
    the compiler fuses the elementwise middle into the convolutions.
    """
    fh, fw = (f.shape if f is not None else (1, 1))
    px0, px1, py0, py1 = _parse_padding(padding)
    x = upfirdn2d(
        x, f, up=up,
        padding=(px0 + (fw + up - 1) // 2, px1 + (fw - up) // 2,
                 py0 + (fh + up - 1) // 2, py1 + (fh - up) // 2),
        gain=up * up,
    )
    if b is not None:
        x = x + b.reshape(1, 1, 1, -1).astype(x.dtype)
    x = jnp.where(x >= 0, x, x * slope) * gain
    if clamp is not None:
        x = jnp.clip(x, -clamp, clamp)
    return upfirdn2d(
        x, f, down=down,
        padding=((fw - down + 1) // 2, (fw - down) // 2,
                 (fh - down + 1) // 2, (fh - down) // 2),
    )


def _phase_up_conv(x, w, up, py0, py1, px0, px1):
    """Phase-decomposed (pixel-shuffle) equivalent of the lhs-dilated
    up-conv: one DENSE conv at input resolution producing ``up²·Cout``
    channels (one block per output phase), then depth-to-space.

    The lhs-dilated conv spends ``(up²-1)/up²`` of its MAC window on
    inserted zeros; the phase form runs only the non-zero taps, so the MXU
    sees a dense 256²-grid conv instead of a 75%-zero 512²-grid one
    (fusion.215 in the r5 frame trace: 1.69 ms + 0.30 ms layout copy for
    the SR 256ch→128ch up block). Exact: each output pixel (up·s+a,
    up·t+b) reads input taps p with (a+p-py0) ≡ 0 (mod up) at phase-grid
    offset d=(a+p-py0)//up — scattering w[p,q] into per-phase kernel slots
    reproduces the dilated conv bit-for-bit (test_phase_up_conv_*)."""
    kh, kw = w.shape[0], w.shape[1]
    b, h, wdt, cin = x.shape
    cout = w.shape[3]

    def tap_map(k, p0):
        taps, ds = {}, []
        for a in range(up):
            lst = [(p, (a + p - p0) // up) for p in range(k)
                   if (a + p - p0) % up == 0]
            taps[a] = lst
            ds += [d for _, d in lst]
        return taps, min(ds), max(ds)

    taps_y, dly, dhy = tap_map(kh, py0)
    taps_x, dlx, dhx = tap_map(kw, px0)
    out_h = up * h + py0 + py1 - kh + 1
    out_w = up * wdt + px0 + px1 - kw + 1
    sh, sw = -(-out_h // up), -(-out_w // up)  # ceil: phase-grid sizes

    kern = jnp.zeros((dhy - dly + 1, dhx - dlx + 1, cin, up * up * cout),
                     w.dtype)
    for a in range(up):
        for bb in range(up):
            blk = (a * up + bb) * cout
            for p, dy in taps_y[a]:
                for q, dx in taps_x[bb]:
                    kern = kern.at[dy - dly, dx - dlx, :,
                                   blk:blk + cout].set(w[p, q])

    y = lax.conv_general_dilated(
        x, kern.astype(x.dtype),
        window_strides=(1, 1),
        # negative low padding crops when d_lo > 0; high pad covers the
        # furthest tap of the last phase-grid row/col
        padding=((-dly, (sh - 1 + dhy) - (h - 1)),
                 (-dlx, (sw - 1 + dhx) - (wdt - 1))),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    y = y.reshape(b, sh, sw, up, up, cout)
    y = jnp.transpose(y, (0, 1, 3, 2, 4, 5)).reshape(
        b, sh * up, sw * up, cout)
    return y[:, :out_h, :out_w]


def conv2d_resample(
    x: jnp.ndarray,
    w: jnp.ndarray,
    f: jnp.ndarray | None = None,
    up: int = 1,
    down: int = 1,
    padding=0,
    groups: int = 1,
    flip_weight: bool = True,
) -> jnp.ndarray:
    """2D conv with optional up/downsampling (`conv2d_resample.py:conv2d_resample`).

    x: [B,H,W,Cin]; w: [kh,kw,Cin//groups,Cout] (HWIO); padding is w.r.t. the
    upsampled image and applied once.
    """
    kh, kw = w.shape[0], w.shape[1]
    fh, fw = (f.shape if f is not None else (1, 1))
    px0, px1, py0, py1 = _parse_padding(padding)

    if not flip_weight and (kh > 1 or kw > 1):
        w = jnp.flip(w, (0, 1))

    def conv(x_, stride=1, pad=((0, 0), (0, 0))):
        return lax.conv_general_dilated(
            x_, w.astype(x_.dtype),
            window_strides=(stride, stride),
            padding=pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=groups,
        )

    # padding adjustments accumulate for BOTH resample directions before any
    # op runs (`conv2d_resample.py:88-99`)
    if up > 1:
        px0 += (fw + up - 1) // 2
        px1 += (fw - up) // 2
        py0 += (fh + up - 1) // 2
        py1 += (fh - up) // 2
    if down > 1:
        px0 += (fw - down + 1) // 2
        px1 += (fw - down) // 2
        py0 += (fh - down + 1) // 2
        py1 += (fh - down) // 2

    if up > 1:
        if kh > 1 or kw > 1:
            # Fast path (the reference CUDA build's transpose-conv route,
            # `conv2d_resample.py:135`): zero-insertion upsampling commutes
            # with both convolutions, so run the channel-reducing conv
            # FIRST on the lhs-dilated input and the depthwise FIR after on
            # Cout channels. Avoids materializing the FIR-filtered Cin-wide
            # upsampled tensor (measured on v5e at the SR block1 shape,
            # 256ch 256^2 -> 128ch 512^2: 5.9 -> 4.0 ms, bf16-reassociation
            # equal). lhs_dilation omits the (up-1) trailing zeros upfirdn's
            # zero-insert keeps, hence the px1/py1 adjustment.
            if groups == 1 and _up_conv_mode() == "phase":
                y = _phase_up_conv(x, w, up, py0, py1, px0, px1)
            else:
                y = lax.conv_general_dilated(
                    x, w.astype(x.dtype),
                    window_strides=(1, 1),
                    padding=((py0, py1 + up - 1), (px0, px1 + up - 1)),
                    lhs_dilation=(up, up),
                    dimension_numbers=("NHWC", "HWIO", "NHWC"),
                    feature_group_count=groups,
                )
            x = upfirdn2d(y, f, gain=up * up)
        else:
            x = upfirdn2d(x, f, up=up, padding=(px0, px1, py0, py1),
                          gain=up * up)
            x = conv(x)
        if down > 1:
            x = upfirdn2d(x, f, down=down)
        return x

    if down > 1:
        x = upfirdn2d(x, f, padding=(px0, px1, py0, py1))
        return conv(x, stride=down)

    return conv(x, pad=((py0, py1), (px0, px1)))
