"""Test helper: import the reference's torch modules for parity checks.

The reference repo is mounted read-only at /root/reference. Its ``utils.py``
imports librosa/faiss (not installed here); we stub those so pure-torch
modules (models.py etc.) import. Reference modules are used ONLY as golden
oracles in tests — never shipped.
"""

import sys
import types

REFERENCE_PATH = "/root/reference"


def _stub(name, **attrs):
    if name in sys.modules:
        return sys.modules[name]
    import importlib.machinery

    mod = types.ModuleType(name)
    mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
    for k, v in attrs.items():
        setattr(mod, k, v)
    sys.modules[name] = mod
    return mod


def setup_reference_imports():
    if REFERENCE_PATH not in sys.path:
        sys.path.insert(0, REFERENCE_PATH)
    # utils.py (imported by models.py) pulls librosa + faiss at module level;
    # only mel/rms/index helpers need them, which tests never call.
    _stub("librosa")
    _stub("librosa.filters", mel=None)
    _stub("faiss")
    _stub("soundfile")
    _stub("torchaudio", transforms=None)
    _stub("torchaudio.transforms", Resample=object)
    _stub("ffmpeg")

    class _FakeLocalAttention:
        def __init__(self, *a, **k):
            raise RuntimeError("LocalAttention unused at default FCPE config")

    _stub("local_attention", LocalAttention=_FakeLocalAttention)


def state_dict_numpy(module):
    return {k: v.detach().cpu().numpy() for k, v in module.state_dict().items()}
