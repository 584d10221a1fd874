from real3dportrait_tpu.utils.profiling import Timer, named_scope, trace_to

__all__ = ["Timer", "named_scope", "trace_to"]
