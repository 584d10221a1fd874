"""Device-mesh construction and sharding helpers.

The TPU-native replacement for the reference's DDP/NCCL stack
(`utils/commons/trainer.py:571-610`, SURVEY.md §2.8): parallelism is a
`jax.sharding.Mesh` plus NamedShardings — gradients all-reduce implicitly
through pjit-partitioned `jax.grad`, over ICI within a slice and DCN across
slices, with XLA inserting every collective.

Axes:
* ``data`` — batch-parallel (the reference's only strategy);
* ``rays`` — optional context-parallel axis for the renderer: rays are
  embarrassingly parallel until image assembly (SURVEY.md §5), so sharding
  the ray dimension scales resolution/samples beyond one chip's HBM.
"""

from __future__ import annotations

from collections.abc import Mapping

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(mesh_shape: Mapping[str, int] | None = None,
              devices=None) -> Mesh:
    """Build a mesh from an axis->size mapping; -1 absorbs remaining devices.

    ``{'data': -1}`` (default) is pure DP; ``{'data': -1, 'rays': 2}``
    dedicates pairs of chips to splitting the ray dimension.
    """
    devices = list(devices if devices is not None else jax.devices())
    mesh_shape = dict(mesh_shape or {"data": -1})
    sizes = list(mesh_shape.values())
    known = int(np.prod([s for s in sizes if s != -1])) or 1
    n = len(devices)
    if -1 in sizes:
        assert n % known == 0, (n, mesh_shape)
        sizes[sizes.index(-1)] = n // known
    total = int(np.prod(sizes))
    assert total == n, f"mesh {dict(zip(mesh_shape, sizes))} != {n} devices"
    dev_array = np.asarray(devices).reshape(sizes)
    return Mesh(dev_array, tuple(mesh_shape.keys()))


def shard_batch(batch, mesh: Mesh, axis: str = "data"):
    """Place a pytree of host arrays batch-sharded over ``axis``.

    Arrays whose leading dim is not divisible by the axis size (tiny smoke
    batches) are replicated instead — production batches are sized to the
    mesh.
    """
    n = mesh.shape[axis]

    def put(x):
        if x.ndim >= 1 and x.shape[0] % n == 0:
            spec = P(axis, *([None] * (x.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate_to_mesh(tree, mesh: Mesh):
    """Replicate a pytree (params/opt state) across every mesh device."""
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)
