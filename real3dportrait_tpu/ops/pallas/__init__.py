from real3dportrait_tpu.ops.pallas.fused_decoder import fused_osg_decoder

__all__ = ["fused_osg_decoder"]
