"""Training CLI.

Equivalent of `tasks/run.py`:
``python -m real3dportrait_tpu.training.run --config configs/<stage>.yaml
--exp_name <name> [--hparams k=v,...]`` resolves ``task_cls`` from the config
and launches the trainer.
"""

from __future__ import annotations

import argparse
import os


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--config", required=True)
    parser.add_argument("--exp_name", default="")
    parser.add_argument("--hparams", default="", help="dot-path overrides a.b=1,c=2")
    parser.add_argument("--work_dir_root", default="checkpoints")
    args = parser.parse_args()

    from real3dportrait_tpu.config import load_config
    from real3dportrait_tpu.parallel import maybe_initialize_distributed
    from real3dportrait_tpu.training.tasks.base_task import resolve_task
    from real3dportrait_tpu.training.trainer import Trainer

    cfg = load_config(args.config, overrides=args.hparams)
    # multi-host launch: JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES /
    # JAX_PROCESS_ID env (or the matching cfg keys) connect this process to
    # the pod before any other jax call (`utils/commons/trainer.py:579-610`)
    maybe_initialize_distributed(cfg)
    work_dir = cfg.get("work_dir") or os.path.join(
        args.work_dir_root, args.exp_name or "default"
    )
    cfg = cfg.replace(work_dir=work_dir)
    task = resolve_task(cfg)
    trainer = Trainer(cfg, task, work_dir=work_dir)
    trainer.fit()


if __name__ == "__main__":
    main()
