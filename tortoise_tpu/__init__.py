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


def enable_compilation_cache(path: str | None = None) -> None:
    """Enable the persistent XLA compilation cache so CLI invocations reuse
    compiled programs across processes (first compile of the 30-layer decode
    scan takes minutes on a remote TPU; cached it loads in seconds)."""
    import os

    import jax

    path = path or os.path.join(os.path.expanduser("~"), ".cache",
                                "tortoise_tpu", "xla_cache")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    # persist EVERYTHING: a tunneled-TPU compile round trip is ~0.5 s even
    # for per-leaf utility programs, and hundreds of those run at model load
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
