"""Task base: owns models/optimizers and exposes pure step functions.

Replaces the reference ``BaseTask`` (`utils/commons/base_task.py:26`): a task
is configuration + model definitions + pure train/val step functions over a
:class:`TrainState`, not a stateful nn.Module. Tasks are resolved from the
config's ``task_cls`` dotted path exactly like the reference
(`tasks/run.py:10`).
"""

from __future__ import annotations

import importlib

import jax
import numpy as np

from real3dportrait_tpu.config import FrozenConfig


def resolve_task(cfg: FrozenConfig):
    """Instantiate the task named by ``cfg.task_cls``."""
    path = cfg["task_cls"]
    module, cls_name = path.rsplit(".", 1)
    cls = getattr(importlib.import_module(module), cls_name)
    return cls(cfg)


class BaseTask:
    def __init__(self, cfg: FrozenConfig):
        self.cfg = cfg

    # subclasses implement:
    def build(self, rng):
        raise NotImplementedError

    def train_step(self, state, batch, rng):
        raise NotImplementedError

    def val_step(self, state, batch, rng):
        raise NotImplementedError

    # data: default synthetic smoke-batches; the binarized-dataset pipeline
    # plugs in here (real3dportrait_tpu.data)
    def train_data(self):
        rng = np.random.RandomState(self.cfg.get("seed", 0))
        while True:
            yield self.synthetic_batch(rng)

    def val_data(self):
        rng = np.random.RandomState(1234)
        while True:
            yield self.synthetic_batch(rng)

    def synthetic_batch(self, rng: np.random.RandomState) -> dict:
        raise NotImplementedError(
            f"{type(self).__name__} has no synthetic batch generator and no "
            "dataset was configured"
        )
