"""Step-indexed learning-rate schedules.

Functional equivalents of `utils/nn/schedulers.py` (keyed on num_updates,
not epochs), exposed as optax-compatible ``schedule(step) -> lr`` callables.
"""

from __future__ import annotations

import jax.numpy as jnp


def none_schedule(lr: float):
    return lambda step: jnp.asarray(lr, jnp.float32)


def exponential_schedule(lr: float, decay_rate: float = 0.98,
                         decay_interval: int = 5000, warmup: int = 0):
    """lr * decay^(step/interval), with optional linear warmup
    (`schedulers.py:64`, ExponentialSchedule)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        base = lr * decay_rate ** (step / decay_interval)
        if warmup > 0:
            base = base * jnp.clip(step / warmup, 0.0, 1.0)
        return base

    return fn


def rsqrt_schedule(lr: float, warmup: int = 4000, hidden_size: int = 256):
    """Transformer rsqrt schedule (`schedulers.py:24`)."""

    def fn(step):
        step = jnp.maximum(jnp.asarray(step, jnp.float32), 1.0)
        warm = warmup**-0.5 * jnp.minimum(step * warmup**-1.5, step**-0.5) * warmup**0.5
        return lr * warm * hidden_size**-0.5

    return fn


def cosine_schedule(lr: float, total_steps: int, warmup: int = 0,
                    min_lr: float = 0.0):
    """Cosine decay to min_lr (`schedulers.py:180`)."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        frac = jnp.clip((step - warmup) / jnp.maximum(total_steps - warmup, 1), 0.0, 1.0)
        cos = 0.5 * (1 + jnp.cos(jnp.pi * frac))
        base = min_lr + (lr - min_lr) * cos
        if warmup > 0:
            base = jnp.where(step < warmup, lr * step / warmup, base)
        return base

    return fn


def gan_lr_schedule(lr: float, decay_rate: float = 0.95,
                    decay_interval: int = 5000, warmup: int = 0,
                    floor: float = 5e-6):
    """The GAN stages' base LR: linear warmup, stepped exponential decay,
    floored (`img2plane_task.py:43-58` / `secc_img2plane_task.py:40-66`,
    ``ScheduleForImg2Plane``: ``max(floor, lr * rate**(step//interval))``).
    Per-param-group gates/ramps multiply the resulting *updates* in the
    tasks."""

    def fn(step):
        step = jnp.asarray(step, jnp.float32)
        base = lr
        if warmup > 0:
            base = jnp.maximum(lr * jnp.clip(step / warmup, 0.0, 1.0), 1e-7)
        return jnp.maximum(base * decay_rate ** jnp.floor(step / decay_interval),
                           floor)

    return fn


def with_grad_accumulation(optimizer, cfg):
    """``optax.MultiSteps`` wrapper when ``cfg['accumulate_grad_batches']>1``
    (reference `utils/commons/trainer.py:403,437`): gradients average over k
    micro-batches and the update applies on every k-th; inner-state shapes
    are unchanged so checkpoints stay compatible per k."""
    import optax

    k = int(cfg.get("accumulate_grad_batches", 1))
    return optax.MultiSteps(optimizer, every_k_schedule=k) if k > 1 else optimizer


def build_schedule(cfg, lr_key: str = "lr"):
    """Construct from a config mapping (scheduler/lr/decay keys)."""
    lr = float(cfg.get(lr_key, 1e-4))
    kind = cfg.get("scheduler", "none")
    if kind == "exponential":
        return exponential_schedule(
            lr, float(cfg.get("lr_decay_rate", 0.98)),
            int(cfg.get("lr_decay_interval", 5000)),
            int(cfg.get("warmup_updates", 0)),
        )
    if kind == "rsqrt":
        return rsqrt_schedule(lr, int(cfg.get("warmup_updates", 4000)),
                              int(cfg.get("hidden_size", 256)))
    if kind == "cosine":
        return cosine_schedule(lr, int(cfg.get("max_updates", 100000)),
                               int(cfg.get("warmup_updates", 0)))
    return none_schedule(lr)
