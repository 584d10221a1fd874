from real3dportrait_tpu.models.decoder import OSGDecoder
from real3dportrait_tpu.models.dual_discriminator import DualDiscriminator
from real3dportrait_tpu.models.stylegan2 import (
    Conv2dLayer,
    Discriminator,
    FullyConnectedLayer,
    Generator,
    MappingNetwork,
    MinibatchStdLayer,
    SynthesisBlock,
    SynthesisLayer,
    SynthesisNetwork,
    ToRGBLayer,
    modulated_conv2d,
)
from real3dportrait_tpu.models.superresolution import (
    SuperresolutionHybrid4X,
    SuperresolutionHybrid8XDC,
    filtered_resizing,
    resize_bilinear,
)

__all__ = [
    "OSGDecoder",
    "DualDiscriminator",
    "Conv2dLayer",
    "Discriminator",
    "FullyConnectedLayer",
    "Generator",
    "MappingNetwork",
    "MinibatchStdLayer",
    "SynthesisBlock",
    "SynthesisLayer",
    "SynthesisNetwork",
    "ToRGBLayer",
    "modulated_conv2d",
    "SuperresolutionHybrid4X",
    "SuperresolutionHybrid8XDC",
    "filtered_resizing",
    "resize_bilinear",
]
