"""L3 models: synthesizer, NSF-HiFiGAN vocoder, GAN discriminators."""

from .discriminator import DiscriminatorP, DiscriminatorS, MultiPeriodDiscriminator
from .nsf_hifigan import Generator, SourceModuleHnNSF, sine_source
from .synthesizer import (
    ContentEncoder,
    F0Decoder,
    PosteriorEncoder,
    Synthesizer,
)
