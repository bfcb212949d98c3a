"""Import the PyTorch reference (read-only, at /root/reference) for parity tests.

Several of the reference's dependencies (torchaudio, librosa, inflect,
unidecode, rotary-embedding-torch, ...) are not installed in this image.
They are only needed at call time for code paths our parity tests don't
exercise, so this helper installs inert stub modules before putting the
reference on sys.path.

The reference is used strictly as a numerical oracle: we instantiate its
modules with random weights, convert those weights into our JAX models, and
compare outputs.
"""
import importlib
import os
import sys
import types

REFERENCE_ROOT = "/root/reference"

_STUBS = [
    "torchaudio", "torchaudio.transforms", "torchaudio.functional",
    "librosa", "librosa.filters",
    "inflect", "unidecode", "rotary_embedding_torch", "progressbar",
    "sounddevice", "spacy", "deepspeed", "huggingface_hub",
]


def _install_stubs():
    for name in _STUBS:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        if name == "inflect":
            mod.engine = lambda: types.SimpleNamespace(
                number_to_words=lambda *a, **k: (_ for _ in ()).throw(RuntimeError("inflect stub")))
        if name == "unidecode":
            mod.unidecode = lambda s: s
        if name == "rotary_embedding_torch":
            class _Rot:  # referenced by tortoise/models/transformer.py at import
                def __init__(self, *a, **k):
                    pass
            mod.RotaryEmbedding = _Rot
            mod.broadcat = None
        if name == "huggingface_hub":
            mod.hf_hub_download = lambda **k: (_ for _ in ()).throw(RuntimeError("no network"))
        sys.modules[name] = mod
    # wire submodules
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    sys.modules["librosa"].filters = sys.modules["librosa.filters"]


def load_ref_module(name: str):
    """e.g. load_ref_module('tortoise.models.autoregressive')"""
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    return importlib.import_module(name)


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
