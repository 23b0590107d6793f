"""StyleGAN2 model family (TPU-native rebuild of models/gan/stylegan2)."""

from contrad_tpu.models.stylegan2.discriminator import (
    DStylegan2,
    ResidualDiscriminator,
    SkipDiscriminator,
    minibatch_stddev,
)
from contrad_tpu.models.stylegan2.generator import (
    GStylegan2,
    ModulatedConv,
    stylegan2_channels,
)

__all__ = [
    "GStylegan2",
    "DStylegan2",
    "ModulatedConv",
    "ResidualDiscriminator",
    "SkipDiscriminator",
    "minibatch_stddev",
    "stylegan2_channels",
]
