from real3dportrait_tpu.audio.features import (
    extract_f0,
    extract_mel,
    load_hubert_extractor,
)

__all__ = ["extract_f0", "extract_mel", "load_hubert_extractor"]
