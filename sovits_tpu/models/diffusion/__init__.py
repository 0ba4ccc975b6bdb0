"""Shallow-diffusion stack: Unit2Mel + GaussianDiffusion + vocoder facade."""

from .gaussian import DiffusionSchedule
from .unit2mel import Unit2Mel
from .vocoder import NsfHifiGANVocoder, nv_mel_spectrogram
from .wavenet import DiffusionWaveNet
