"""Run ONE flagship-scale GAN train step on the real chip (VERDICT r4 #3).

The dryrun's stage-3 check compiles the 512^2 step AOT but never executes
it; this tool RUNS it: SeccImg2PlaneTask at the production training config
(`configs/secc_img2plane.yaml` — b0 backbones, 512^2 final, 128^2 render,
48+48 samples; reference match `tasks/os_avatar/secc_img2plane_task.py:537`
at `egs/os_avatar/secc_img2plane.yaml` scale), batch size 1, on whatever
jax.default_backend() provides. Reports compile time, ms/step over a few
steps, and device memory stats. Knobs that already exist in the task
(remat_generator) can be toggled from the command line on OOM.

Usage: python tools/train_step_real.py [k=v ...]   # config overrides
"""

from __future__ import annotations

import json
import os
import sys
import time

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def main(argv=None) -> int:
    overrides = dict(kv.split("=", 1) for kv in (argv or sys.argv[1:]))

    import jax

    cache_dir = os.environ.get("R3DP_XLA_CACHE", "/tmp/r3dp_xla_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import jax.numpy as jnp
    import numpy as np

    from real3dportrait_tpu.config import load_config
    from real3dportrait_tpu.training.tasks.secc_img2plane_task import (
        SeccImg2PlaneTask,
    )

    cfg = load_config(os.path.join(HERE, "configs", "secc_img2plane.yaml"))
    cfg = cfg.replace(
        batch_size=1,
        # measure the full GAN cost (G + D + adv) from step 0, not the
        # pre-adversarial warmup phase
        start_adv_iters=0,
        **{k: type(cfg.get(k, ""))(v) if cfg.get(k) is not None else v
           for k, v in overrides.items()},
    )
    task = SeccImg2PlaneTask(cfg)
    backend = jax.default_backend()
    dev = jax.devices()[0]
    print(f"| backend={backend} device={dev}", flush=True)

    t0 = time.time()
    state = task.build(jax.random.PRNGKey(0))
    n_params = sum(int(np.prod(jnp.shape(x)))
                   for x in jax.tree_util.tree_leaves(state.params))
    print(f"| build: {time.time() - t0:.1f}s, {n_params / 1e6:.1f}M params",
          flush=True)

    batch = jax.tree_util.tree_map(
        jnp.asarray, task.synthetic_batch(np.random.RandomState(0))
    )
    step = jax.jit(task.train_step)
    # fetch-sync through a jitted reducer (block_until_ready is a no-op on
    # the axon tunnel; see BASELINE.md "Measurement discipline")
    reduce = jax.jit(lambda m: m["total_loss"].sum())

    t0 = time.time()
    state, metrics = step(state, batch, jax.random.PRNGKey(1))
    total = float(reduce(metrics))
    print(f"| compile+step1: {time.time() - t0:.1f}s, "
          f"total_loss={total:.4f}", flush=True)
    assert np.isfinite(total), metrics

    n = int(os.environ.get("TRAIN_STEPS", "4"))
    t0 = time.time()
    for i in range(n):
        state, metrics = step(state, batch, jax.random.PRNGKey(2 + i))
    total = float(reduce(metrics))
    ms = (time.time() - t0) / n * 1000
    mem = {}
    try:
        stats = dev.memory_stats() or {}
        mem = {k: round(v / 2**30, 2) for k, v in stats.items()
               if k in ("bytes_in_use", "peak_bytes_in_use", "bytes_limit")}
    except Exception:
        pass
    print(json.dumps({
        "event": "flagship_train_step", "backend": backend,
        "ms_per_step": round(ms, 1), "steps": n,
        "total_loss": round(total, 4), "params_m": round(n_params / 1e6, 1),
        "mem_gib": mem,
        "config": "secc_img2plane.yaml bs=1 512^2/128^2/48+48 b0",
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
