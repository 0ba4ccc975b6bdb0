"""L0 DSP primitives: STFT/mel, f0 conversions, volume, sequence ops."""

from .audio import change_rms, repeat_expand, resample, rms_envelope
from .f0 import (
    F0_BIN,
    f0_to_coarse,
    f0_to_lf0,
    interpolate_unvoiced,
    lf0_to_f0,
    normalize_f0,
)
from .mel import hann_window, hz_to_mel, mel_filterbank, mel_to_hz
from .sequence import (
    rand_slice_segments_with_pitch,
    sequence_mask,
    slice_segments,
    subsequent_mask,
)
from .stft import (
    dynamic_range_compression,
    dynamic_range_decompression,
    energy,
    frame_signal,
    mel_spectrogram,
    spec_to_mel,
    spectrogram,
)
