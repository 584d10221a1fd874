from real3dportrait_tpu.audio.features import (
    extract_f0,
    extract_mel,
    extract_mfcc,
    griffin_lim,
    load_hubert_extractor,
    vad,
)

__all__ = ["extract_f0", "extract_mel", "extract_mfcc", "griffin_lim",
           "load_hubert_extractor", "vad"]
