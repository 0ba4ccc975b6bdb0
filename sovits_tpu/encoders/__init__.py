"""L2a speech encoders: wav2vec2/HuBERT family in flax + checkpoint converters."""

from .convert import from_bshall_hubert, from_fairseq_hubert
from .factory import JaxSpeechEncoder, get_speech_encoder, load_torch_state_dict
from .wav2vec2 import Wav2Vec2Config, Wav2Vec2Encoder
