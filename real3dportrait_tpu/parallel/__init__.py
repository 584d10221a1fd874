from real3dportrait_tpu.parallel.mesh import (
    make_mesh,
    replicate_to_mesh,
    shard_batch,
)

__all__ = ["make_mesh", "replicate_to_mesh", "shard_batch"]
