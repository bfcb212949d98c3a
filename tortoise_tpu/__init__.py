"""tortoise_tpu — a TPU-native (JAX/XLA/Pallas/pjit) re-build of Tortoise-TTS.

Public API mirrors the reference package surface
(reference: neonbjb/tortoise-tts):

    from tortoise_tpu.api import TextToSpeech            # quality path
    from tortoise_tpu.api_fast import TextToSpeechFast   # fast/streaming path
    from tortoise_tpu.utils.audio import load_audio, load_voice, load_voices
"""

__version__ = "0.1.0"

__all__ = ["api", "api_fast", "models", "ops", "diffusion", "parallel",
           "utils", "training", "presets", "weights"]
