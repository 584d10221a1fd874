from real3dportrait_tpu.inference.pipeline import Real3DPortraitPipeline

__all__ = ["Real3DPortraitPipeline"]
