"""Fused bias + activation (+gain, +clamp).

Replaces the reference CUDA plugin (`modules/eg3ds/torch_utils/ops/
bias_act.{cpp,cu}`): on TPU, XLA fuses the bias add, activation, gain and
clamp into the producing matmul/conv epilogue automatically, so this is a
plain jnp composition with the same activation registry (names and default
gains) as StyleGAN2.
"""

from __future__ import annotations

import math
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class _Act(NamedTuple):
    fn: Callable
    def_gain: float


ACTIVATIONS: dict[str, _Act] = {
    "linear": _Act(lambda x: x, 1.0),
    "relu": _Act(jax.nn.relu, math.sqrt(2.0)),
    "lrelu": _Act(lambda x: jax.nn.leaky_relu(x, 0.2), math.sqrt(2.0)),
    "tanh": _Act(jnp.tanh, 1.0),
    "sigmoid": _Act(jax.nn.sigmoid, 1.0),
    "elu": _Act(jax.nn.elu, 1.0),
    "selu": _Act(jax.nn.selu, 1.0),
    "softplus": _Act(jax.nn.softplus, 1.0),
    "swish": _Act(jax.nn.silu, math.sqrt(2.0)),
}


def bias_act(
    x: jnp.ndarray,
    b: jnp.ndarray | None = None,
    act: str = "linear",
    gain: float | None = None,
    clamp: float | None = None,
    axis: int = -1,
) -> jnp.ndarray:
    """y = clamp(gain * act(x + b)); b broadcasts along ``axis`` (channels)."""
    spec = ACTIVATIONS[act]
    if b is not None:
        shape = [1] * x.ndim
        shape[axis] = b.shape[0]
        x = x + b.reshape(shape).astype(x.dtype)
    x = spec.fn(x)
    g = spec.def_gain if gain is None else gain
    if g != 1.0:
        x = x * jnp.asarray(g, x.dtype)
    if clamp is not None and clamp >= 0:
        x = jnp.clip(x, -clamp, clamp)
    return x
