from real3dportrait_tpu.ops.grid_sample import grid_sample_2d, grid_sample_3d

__all__ = ["grid_sample_2d", "grid_sample_3d"]
