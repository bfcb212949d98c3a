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
    "librosa", "librosa.filters", "librosa.util",
    "inflect", "unidecode", "rotary_embedding_torch", "progressbar",
    "sounddevice", "spacy", "deepspeed",
]


def _pad_center(data, size, axis=-1, **kwargs):
    import numpy as np

    n = data.shape[axis]
    lpad = int((size - n) // 2)
    lengths = [(0, 0)] * data.ndim
    lengths[axis] = (lpad, int(size - n - lpad))
    return np.pad(data, lengths, **kwargs)


def _tiny(x):
    import numpy as np

    x = np.asarray(x)
    dtype = x.dtype if np.issubdtype(x.dtype, np.floating) else np.float32
    return np.finfo(dtype).tiny


def _install_stubs():
    for name in _STUBS:
        if name in sys.modules:
            continue
        mod = types.ModuleType(name)
        mod.__spec__ = importlib.machinery.ModuleSpec(name, loader=None)
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
        sys.modules[name] = mod
    # wire submodules
    sys.modules["torchaudio"].transforms = sys.modules["torchaudio.transforms"]
    sys.modules["torchaudio"].functional = sys.modules["torchaudio.functional"]
    sys.modules["librosa"].filters = sys.modules["librosa.filters"]
    sys.modules["librosa"].util = sys.modules["librosa.util"]
    sys.modules["librosa.util"].pad_center = _pad_center
    sys.modules["librosa.util"].tiny = _tiny

    # Compat shim: transformers >= 4.49 removed LogitsWarper (merged into
    # LogitsProcessor). Pre-register the reference's typical_sampling module
    # with the import rewritten; attribute-patching the lazy transformers
    # module is unreliable because it re-swaps itself in sys.modules.
    name = "tortoise.utils.typical_sampling"
    if name not in sys.modules:
        path = os.path.join(REFERENCE_ROOT, "tortoise", "utils", "typical_sampling.py")
        src = open(path).read().replace(
            "from transformers import LogitsWarper",
            "from transformers import LogitsProcessor as LogitsWarper")
        mod = types.ModuleType(name)
        mod.__file__ = path
        exec(compile(src, path, "exec"), mod.__dict__)
        sys.modules[name] = mod


def load_ref_module(name: str):
    """e.g. load_ref_module('tortoise.models.autoregressive')"""
    _install_stubs()
    if REFERENCE_ROOT not in sys.path:
        sys.path.insert(0, REFERENCE_ROOT)
    mod = importlib.import_module(name)
    if name == "tortoise.models.autoregressive":
        # transformers >= 4.50: PreTrainedModel no longer provides generate();
        # re-attach GenerationMixin to the reference's inference model.
        from transformers.generation import GenerationMixin

        if not issubclass(mod.GPT2InferenceModel, GenerationMixin):
            mod.GPT2InferenceModel = type(
                "GPT2InferenceModel", (mod.GPT2InferenceModel, GenerationMixin), {})
    return mod


def has_reference() -> bool:
    return os.path.isdir(REFERENCE_ROOT)
