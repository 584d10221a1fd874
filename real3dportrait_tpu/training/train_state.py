"""Training state pytree shared by all tasks."""

from __future__ import annotations

from typing import Any

from flax.struct import dataclass as pytree_dataclass
from flax.struct import field


@pytree_dataclass
class TrainState:
    """One immutable training-state pytree.

    ``params``      {model_name: param tree} for every trainable model
    ``variables``   non-param collections (ema, noise_const, ...) per model
    ``opt_states``  {optimizer_name: optax state}
    ``extra``       scalar state (adaptive loss lambdas, ema rate, ...)
    ``step``        global update counter (drives schedules and gates)
    """

    step: Any
    params: Any
    variables: Any
    opt_states: Any
    extra: Any = field(default_factory=dict)
