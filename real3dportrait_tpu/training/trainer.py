"""Generic training loop over a device mesh.

TPU-native redesign of the reference `Trainer` (`utils/commons/trainer.py:62`):
instead of per-GPU processes + torch DDP, a single controller jits the
task's functional ``train_step`` over a `jax.sharding.Mesh` — params
replicated, batch sharded along ``data`` — and XLA inserts the gradient
all-reduces. Retained semantics: step-capped infinite epoching, periodic
validation with best-ckpt tracking, step-indexed checkpoint save/prune with
milestones, NaN-loss detection, loss meters, JSONL metric logging.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Iterable, Iterator

import jax
import numpy as np

from real3dportrait_tpu.config import FrozenConfig
from real3dportrait_tpu.parallel import (
    is_main_process,
    make_mesh,
    maybe_initialize_distributed,
    replicate_to_mesh,
    shard_global_batch,
)
from real3dportrait_tpu.training import checkpoint as ckpt
from real3dportrait_tpu.training.train_state import TrainState


class MetricLogger:
    """JSONL metrics + stdout every ``log_interval`` (replaces TB writer)."""

    def __init__(self, work_dir: str, log_interval: int = 100,
                 write_files: bool = True):
        os.makedirs(work_dir, exist_ok=True)
        self.path = os.path.join(work_dir, "metrics.jsonl")
        self.log_interval = log_interval
        # multi-host: only rank 0 writes the JSONL (stdout keeps per-process
        # prints so a wedged worker is still debuggable)
        self._f = open(self.path, "a") if write_files else None

    def log(self, step: int, metrics: dict, prefix: str = "train"):
        rec = {"step": int(step), "prefix": prefix}
        rec.update({k: float(v) for k, v in metrics.items()})
        if self._f is not None:
            self._f.write(json.dumps(rec) + "\n")
            self._f.flush()
        msg = " ".join(f"{k}={float(v):.4g}" for k, v in list(metrics.items())[:8])
        print(f"| {prefix} step {step}: {msg}", flush=True)


class Trainer:
    """Drives a task object.

    A task must provide:
      * ``build(rng) -> TrainState``
      * ``train_step(state, batch, rng) -> (state, metrics)``  (pure)
      * ``val_step(state, batch, rng) -> metrics``             (pure)
      * ``train_data() / val_data() -> iterator of batches``
    """

    def __init__(self, cfg: FrozenConfig, task, work_dir: str | None = None):
        self.cfg = cfg
        self.task = task
        # multi-process bring-up FIRST: after `jax.distributed.initialize`,
        # `jax.devices()` is the global device list and the mesh spans every
        # host (replaces `utils/commons/trainer.py:579-610` DDP init)
        maybe_initialize_distributed(cfg)
        self.is_main = is_main_process()
        self.work_dir = work_dir or cfg.get("work_dir") or "checkpoints/default"
        os.makedirs(self.work_dir, exist_ok=True)
        self.logger = MetricLogger(self.work_dir, cfg.get("tb_log_interval", 100),
                                   write_files=self.is_main)
        self.mesh = make_mesh(dict(cfg.get("mesh_shape", {"data": -1})))
        self.max_updates = int(cfg.get("max_updates", 1000))
        self.val_check_interval = int(cfg.get("val_check_interval", 2000))
        self.num_ckpt_keep = int(cfg.get("num_ckpt_keep", 3))
        self.milestone_interval = int(cfg.get("ckpt_milestone_interval", 100000))
        self.monitor_mode = cfg.get("valid_monitor_mode", "min")
        self.monitor_key = cfg.get("valid_monitor_key", "val_loss")
        self.best_val = np.inf if self.monitor_mode == "min" else -np.inf
        # persist the resolved config next to checkpoints (`hparams.py` flow);
        # all work_dir artifacts are rank-0-only in multi-host runs
        if self.is_main:
            cfg.save(os.path.join(self.work_dir, "config.yaml"))
            if bool(cfg.get("save_codes", True)):
                self._snapshot_codes()
        if bool(cfg.get("tee_terminal_logs", True)) and self.is_main:
            self._tee_stdout()

    def _tee_stdout(self):
        """Mirror stdout/stderr to ``work_dir/terminal_logs/log_<ts>.txt``
        (`utils/commons/trainer.py:44-59`)."""
        import sys

        log_dir = os.path.join(self.work_dir, "terminal_logs")
        os.makedirs(log_dir, exist_ok=True)
        path = os.path.join(log_dir, f"log_{time.strftime('%Y%m%d_%H%M%S')}.txt")
        f = open(path, "a", buffering=1)  # line-buffered: crash logs survive

        class _Tee:
            def __init__(self, stream):
                self._s = stream

            def write(self, data):
                self._s.write(data)
                f.write(data)

            def flush(self):
                self._s.flush()
                f.flush()

            def __getattr__(self, name):
                return getattr(self._s, name)

        sys.stdout = _Tee(sys.stdout)
        sys.stderr = _Tee(sys.stderr)

    def _snapshot_codes(self):
        """Copy the package source to ``work_dir/codes/<ts>`` for run
        provenance (`utils/commons/trainer.py:658-674`)."""
        import shutil

        import real3dportrait_tpu

        src = os.path.dirname(os.path.abspath(real3dportrait_tpu.__file__))
        dst = os.path.join(self.work_dir, "codes",
                           time.strftime("%Y%m%d_%H%M%S"))
        if not os.path.exists(dst):
            shutil.copytree(
                src, os.path.join(dst, "real3dportrait_tpu"),
                ignore=shutil.ignore_patterns("__pycache__", "*.pyc", "*.so"),
            )

    # -- state ----------------------------------------------------------------

    def init_or_restore(self, rng) -> TrainState:
        state = self.task.build(rng)
        restored, path = ckpt.get_last_checkpoint(self.work_dir)
        if restored is not None:
            from flax import serialization

            # lenient merge: keys excluded at save time (not_save_modules,
            # e.g. frozen teachers) keep their freshly built values
            target = serialization.to_state_dict(state)
            merged, stats = ckpt.partial_load(target, restored)
            state = serialization.from_state_dict(state, merged)
            print(f"| restored checkpoint {path} at step {int(state.step)} "
                  f"({stats['loaded']} leaves)")
        init_from = self.cfg.get("init_from_ckpt", "")
        if restored is None and init_from:
            src, path = ckpt.get_last_checkpoint(init_from)
            if src is not None:
                from flax import serialization

                target = serialization.to_state_dict(state)
                merged, stats = ckpt.partial_load(target, src)
                state = serialization.from_state_dict(state, merged)
                print(f"| partial init from {path}: {stats}")
        return replicate_to_mesh(state, self.mesh)

    # -- loop -------------------------------------------------------------------

    def fit(self, rng=None) -> TrainState:
        rng = rng if rng is not None else jax.random.PRNGKey(self.cfg.get("seed", 9999))
        rng, build_rng = jax.random.split(rng)
        state = self.init_or_restore(build_rng)

        with self.mesh:
            train_step = jax.jit(self.task.train_step, donate_argnums=(0,))
            val_step = jax.jit(self.task.val_step)

            # sanity validation (`trainer.py:312-314`)
            n_sanity = int(self.cfg.get("num_sanity_val_steps", 1))
            if n_sanity > 0:
                for i, batch in zip(range(n_sanity), self.task.val_data()):
                    val_step(state, shard_global_batch(batch, self.mesh),
                             jax.random.PRNGKey(i))

            train_iter = iter(self.task.train_data())
            # step is mirrored on the host (one device_get at restore time):
            # fetching state.step every iteration would force a host<->device
            # sync in the hot loop. Metrics likewise stay device-side until
            # the log interval — meters hold DeviceArrays, fetched in ONE
            # device_get per interval.
            step = int(jax.device_get(state.step))
            meters: dict[str, list] = {}
            t0 = time.time()
            while step < self.max_updates:
                batch = next(train_iter)
                rng, step_rng = jax.random.split(rng)
                state, metrics = train_step(
                    state, shard_global_batch(batch, self.mesh), step_rng)
                step += 1
                for k, v in metrics.items():
                    meters.setdefault(k, []).append(v)

                if step % self.logger.log_interval == 0:
                    host = jax.device_get(meters)
                    avg = {k: float(np.mean(v)) for k, v in host.items()}
                    total = host.get("total_loss")
                    if total is not None and not np.all(np.isfinite(total)):
                        print(f"| WARNING: non-finite total_loss near step {step}")
                    avg["steps_per_sec"] = self.logger.log_interval / max(
                        time.time() - t0, 1e-9
                    )
                    self.logger.log(step, avg)
                    meters.clear()
                    t0 = time.time()

                if step % self.val_check_interval == 0:
                    self.run_validation(state, val_step)
                    if self.is_main:
                        self.dump_val_images(state, step)
                        ckpt.save_checkpoint(
                            self.work_dir, step, self._to_state_dict(state),
                            num_keep=self.num_ckpt_keep,
                            milestone_interval=self.milestone_interval,
                            not_save_keys=tuple(
                                self.cfg.get("not_save_modules", []) or ()),
                        )

        final_step = int(jax.device_get(state.step))
        if self.is_main:
            ckpt.save_checkpoint(
                self.work_dir, final_step, self._to_state_dict(state),
                num_keep=self.num_ckpt_keep,
                milestone_interval=self.milestone_interval,
            )
        return state

    def _to_state_dict(self, state):
        from flax import serialization

        return serialization.to_state_dict(jax.device_get(state))

    def dump_val_images(self, state, step: int) -> list[str]:
        """Visual regression dumps (`secc_img2plane_task.py:672-741`): tasks
        exposing ``val_images(state, batch, rng) -> {name: uint8 image}``
        get their grids (incl. any fixed OOD probe) written as PNGs under
        ``work_dir/val_images/iter<step>/`` each validation."""
        if not hasattr(self.task, "val_images") or not bool(
            self.cfg.get("save_val_images", True)
        ):
            return []
        import cv2

        batch = next(iter(self.task.val_data()))
        images = self.task.val_images(state, batch, jax.random.PRNGKey(0))
        out_dir = os.path.join(self.work_dir, "val_images", f"iter{step}")
        os.makedirs(out_dir, exist_ok=True)
        paths = []
        for name, img in images.items():
            p = os.path.join(out_dir, f"{name}.png")
            cv2.imwrite(p, np.asarray(img)[..., ::-1])
            paths.append(p)
        return paths

    def run_validation(self, state, val_step) -> dict:
        metrics: dict[str, list] = {}
        max_batches = int(self.cfg.get("eval_max_batches", 10))
        for i, batch in zip(range(max_batches), self.task.val_data()):
            m = val_step(state, shard_global_batch(batch, self.mesh),
                         jax.random.PRNGKey(i))
            for k, v in m.items():
                metrics.setdefault(k, []).append(float(jax.device_get(v)))
        avg = {k: float(np.mean(v)) for k, v in metrics.items()}
        step = int(jax.device_get(state.step))
        self.logger.log(step, avg, prefix="val")
        val = avg.get(self.monitor_key)
        if val is not None and self.cfg.get("save_best", True):
            better = val < self.best_val if self.monitor_mode == "min" else val > self.best_val
            if better:
                self.best_val = val
                if self.is_main:
                    ckpt.save_best(self.work_dir, self._to_state_dict(state), val)
        return avg
