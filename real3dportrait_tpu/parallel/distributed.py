"""Multi-process (multi-host / multi-slice) execution support.

TPU-native replacement for the reference's multi-machine DDP bring-up
(`utils/commons/trainer.py:579-610`: MASTER_ADDR/node_rank env plumbing +
`torch.distributed.init_process_group`): one `jax.distributed.initialize`
call connects every process to the coordinator, after which `jax.devices()`
is the GLOBAL device list and a single `Mesh` + pjit program spans all
hosts — XLA routes collectives over ICI within a slice and DCN across
slices (SURVEY.md §2.8).

Environment / config contract (either works; env wins):

* ``JAX_COORDINATOR_ADDRESS`` / cfg ``coordinator_address`` — "host:port" of
  process 0 (the reference's MASTER_ADDR:MASTER_PORT,
  `utils/commons/trainer.py:586-589`);
* ``JAX_NUM_PROCESSES``      / cfg ``num_processes``;
* ``JAX_PROCESS_ID``         / cfg ``process_id``  (the reference's
  node_rank, `trainer.py:592`).

On real TPU pods these are normally auto-detected by
`jax.distributed.initialize()` from the TPU metadata server, so all three
may be omitted; set them explicitly for CPU dryruns and non-TPU fabrics.
"""

from __future__ import annotations

import os

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

_initialized = False


def maybe_initialize_distributed(cfg=None) -> bool:
    """Initialize `jax.distributed` when a multi-process launch is requested.

    Returns True when running multi-process (after initialize), False for
    plain single-process runs. Idempotent.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1

    get = (lambda k, d=None: cfg.get(k, d)) if cfg is not None else (lambda k, d=None: d)
    coord = os.environ.get("JAX_COORDINATOR_ADDRESS") or get("coordinator_address")
    nproc = os.environ.get("JAX_NUM_PROCESSES") or get("num_processes")
    pid = os.environ.get("JAX_PROCESS_ID")
    if pid is None:
        pid = get("process_id")

    if coord is None and nproc is None:
        # single-process (or TPU-pod auto-detect explicitly requested)
        if os.environ.get("JAX_DISTRIBUTED_AUTODETECT", "0") == "1":
            jax.distributed.initialize()
            _initialized = True
            return jax.process_count() > 1
        return False

    kwargs = {}
    if coord is not None:
        kwargs["coordinator_address"] = str(coord)
    if nproc is not None:
        kwargs["num_processes"] = int(nproc)
    if pid is not None:
        kwargs["process_id"] = int(pid)
    jax.distributed.initialize(**kwargs)
    _initialized = True
    return jax.process_count() > 1


def is_main_process() -> bool:
    """True on the process that owns checkpoint/log writes (rank 0)."""
    return jax.process_index() == 0


def process_local_batch_slice(global_batch_size: int) -> slice:
    """The [start, stop) rows of the global batch this process must feed.

    Data loaders shard by process (the reference's DistributedSampler,
    `utils/commons/trainer.py:604-607`): each process reads only its slice
    and `shard_global_batch` assembles the global array view.
    """
    n = jax.process_count()
    assert global_batch_size % n == 0, (global_batch_size, n)
    per = global_batch_size // n
    i = jax.process_index()
    return slice(i * per, (i + 1) * per)


def shard_global_batch(local_batch, mesh: Mesh, axis: str = "data"):
    """Per-process local batch shards -> one global batch-sharded Array.

    Single-process this is exactly `shard_batch`; multi-process each host
    passes only ITS rows (`process_local_batch_slice` of the global batch)
    and `jax.make_array_from_process_local_data` stitches the global view
    without any cross-host data movement.
    """
    if jax.process_count() == 1:
        from real3dportrait_tpu.parallel.mesh import shard_batch

        return shard_batch(local_batch, mesh, axis=axis)

    def put(x):
        x = np.asarray(x)
        if x.ndim >= 1 and (x.shape[0] * jax.process_count()) % mesh.shape[axis] == 0:
            spec = P(axis, *([None] * (x.ndim - 1)))
            return jax.make_array_from_process_local_data(
                NamedSharding(mesh, spec), x
            )
        # replicated small tensor: every process passes identical data
        return jax.make_array_from_process_local_data(NamedSharding(mesh, P()), x)

    return jax.tree_util.tree_map(put, local_batch)
