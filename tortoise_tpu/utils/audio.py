"""Audio I/O, resampling and the voice registry.

Behavioral equivalent of the reference audio utilities
(reference: tortoise/utils/audio.py). Differences by design:

* resampling uses a polyphase sinc resampler (scipy) instead of torchaudio;
* cached voice latents are stored as ``.npz`` (numpy) rather than torch
  pickles — existing ``.pth`` latent files are still read when torch is
  importable;
* mp3 decoding shells out to ffmpeg when present (librosa is not a
  dependency of this framework).
"""
from __future__ import annotations

import os
import subprocess
import tempfile
from glob import glob

import numpy as np
from scipy.io.wavfile import read as wav_read
from scipy.io.wavfile import write as wav_write
from scipy.signal import resample_poly

BUILTIN_VOICES_DIR = os.path.join(os.path.dirname(os.path.realpath(__file__)), "..", "voices")
# Optional extra voice library (e.g. a checkout of the reference's 30 voice
# folders). Configurable — nothing is hardcoded to this machine's layout;
# the default picks up the reference checkout when it happens to be mounted.
REFERENCE_VOICES_DIR = os.environ.get("TORTOISE_EXTRA_VOICES_DIR",
                                      "/root/reference/tortoise/voices")

from tortoise_tpu.ops.mel import (TACOTRON_MEL_MAX,  # noqa: F401 (re-export)
                                  TACOTRON_MEL_MIN)


def load_wav(path: str) -> tuple[np.ndarray, int]:
    sr, data = wav_read(path)
    if data.dtype == np.int32:
        norm = 2 ** 31
    elif data.dtype == np.int16:
        norm = 2 ** 15
    elif data.dtype in (np.float16, np.float32, np.float64):
        norm = 1.0
    elif data.dtype == np.uint8:
        data = data.astype(np.int16) - 128
        norm = 128
    else:
        raise NotImplementedError(f"unsupported wav dtype: {data.dtype}")
    return data.astype(np.float32) / norm, sr


def _load_mp3(path: str, sampling_rate: int) -> np.ndarray:
    """Decode mp3 via ffmpeg (no librosa dependency)."""
    with tempfile.NamedTemporaryFile(suffix=".wav") as tmp:
        try:
            subprocess.run(
                ["ffmpeg", "-y", "-loglevel", "error", "-i", path,
                 "-ar", str(sampling_rate), "-ac", "1", tmp.name], check=True)
        except FileNotFoundError as e:
            raise RuntimeError(
                f"decoding {path} requires ffmpeg; convert the clip to wav") from e
        audio, _ = load_wav(tmp.name)
        return audio


def resample(audio: np.ndarray, orig_sr: int, target_sr: int) -> np.ndarray:
    if orig_sr == target_sr:
        return audio
    from tortoise_tpu import native

    if audio.ndim == 1 and native.available():
        return native.resample(audio, orig_sr, target_sr)
    if audio.ndim == 2 and audio.shape[0] == 1 and native.available():
        return native.resample(audio[0], orig_sr, target_sr)[None]
    g = np.gcd(int(orig_sr), int(target_sr))
    return resample_poly(audio, target_sr // g, orig_sr // g, axis=-1).astype(np.float32)


def load_audio(audiopath: str, sampling_rate: int) -> np.ndarray:
    """Load a clip -> float32 (1, T) in [-1, 1] at ``sampling_rate``
    (reference audio.py:29-56)."""
    ext = os.path.splitext(audiopath)[1].casefold()
    if ext == ".wav":
        audio, lsr = load_wav(audiopath)
    elif ext == ".mp3":
        audio, lsr = _load_mp3(audiopath, sampling_rate), sampling_rate
    else:
        raise AssertionError(f"unsupported audio format: {audiopath}")

    if audio.ndim > 1:  # drop channel data
        audio = audio[0] if audio.shape[0] < 5 else audio[:, 0]
    audio = resample(audio, lsr, sampling_rate)
    if np.any(audio > 2) or not np.any(audio < 0):
        print(f"Error with {audiopath}. Max={audio.max()} min={audio.min()}")
    return np.clip(audio, -1, 1)[None, :]


def save_wav(path: str, audio: np.ndarray, sample_rate: int = 24000) -> None:
    audio = np.asarray(audio, dtype=np.float32).squeeze()
    wav_write(path, sample_rate, audio)


def pad_or_truncate(t: np.ndarray, length: int) -> np.ndarray:
    """Force last axis to ``length`` (reference api.py:52-61)."""
    if t.shape[-1] == length:
        return t
    if t.shape[-1] < length:
        pad = [(0, 0)] * (t.ndim - 1) + [(0, length - t.shape[-1])]
        return np.pad(t, pad)
    return t[..., :length]


# ---------------------------------------------------------------------------
# Voice registry
# ---------------------------------------------------------------------------

def get_voices(extra_voice_dirs: list[str] = []) -> dict[str, list[str]]:
    dirs = [BUILTIN_VOICES_DIR, REFERENCE_VOICES_DIR] + list(extra_voice_dirs)
    voices: dict[str, list[str]] = {}
    for d in dirs:
        if not os.path.isdir(d):
            continue
        for sub in os.listdir(d):
            subj = os.path.join(d, sub)
            if os.path.isdir(subj):
                voices[sub] = (sorted(glob(f"{subj}/*.wav")) + sorted(glob(f"{subj}/*.mp3"))
                               + sorted(glob(f"{subj}/*.npz")) + sorted(glob(f"{subj}/*.pth")))
    return voices


def _load_latents_file(path: str):
    if path.endswith(".npz"):
        z = np.load(path)
        return np.asarray(z["auto"]), np.asarray(z["diffusion"]) if "diffusion" in z else None
    import torch  # legacy reference latents

    data = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(data, (tuple, list)):
        if len(data) >= 2 and data[1] is not None:
            return np.asarray(data[0]), np.asarray(data[1])
        return np.asarray(data[0]), None
    return np.asarray(data), None


def save_latents(path: str, auto, diffusion=None) -> None:
    if diffusion is None:
        np.savez(path, auto=np.asarray(auto))
    else:
        np.savez(path, auto=np.asarray(auto), diffusion=np.asarray(diffusion))


def load_voice(voice: str, extra_voice_dirs: list[str] = []):
    """-> (clips, latents): clips is a list of (1, T) arrays @22.05 kHz, or
    latents is an (auto, diffusion) tuple (reference audio.py:104-124).

    First load of a clip-only voice caches the decoded/resampled clips as
    ``<voice>.clips.npz`` next to them (the reference writes ``<voice>.pth``,
    audio.py:120-122); later loads skip the decode+resample work. Write
    failures (read-only voice dirs) are ignored.
    """
    if voice == "random":
        return None, None
    paths = get_voices(extra_voice_dirs)[voice]
    clip_caches = [p for p in paths if p.endswith(".clips.npz")]
    latent_files = [p for p in paths
                    if p.endswith((".npz", ".pth")) and not p.endswith(".clips.npz")]
    audio_files = [p for p in paths if p.endswith((".wav", ".mp3"))]
    if latent_files and not audio_files:
        return None, _load_latents_file(latent_files[0])
    if clip_caches:
        z = np.load(clip_caches[0])
        return [z[k] for k in sorted(z.files)], None
    clips = [load_audio(p, 22050) for p in audio_files]
    # never cache into the read-only reference voice library
    if clips and not audio_files[0].startswith(REFERENCE_VOICES_DIR):
        cache = os.path.join(os.path.dirname(audio_files[0]), f"{voice}.clips.npz")
        try:
            np.savez(cache, **{f"clip_{i:03d}": c for i, c in enumerate(clips)})
        except OSError:
            pass
    return clips, None


def load_voices(voices: list[str], extra_voice_dirs: list[str] = []):
    """Combine several voices: raw clips concatenate, latent voices average
    (reference audio.py:127-148)."""
    latents, clips = [], []
    for voice in voices:
        if voice == "random":
            if len(voices) > 1:
                print("Cannot combine a random voice with a non-random voice. "
                      "Just using a random voice.")
            return None, None
        clip, latent = load_voice(voice, extra_voice_dirs)
        if latent is None:
            assert not latents, "Can only combine raw audio voices or latent voices, not both."
            clips.extend(clip)
        else:
            assert not clips, "Can only combine raw audio voices or latent voices, not both."
            latents.append(latent)
    if not latents:
        return clips, None
    auto = np.stack([l[0] for l in latents]).mean(axis=0)
    diff_parts = [l[1] for l in latents if l[1] is not None]
    diffusion = np.stack(diff_parts).mean(axis=0) if diff_parts else None
    return None, (auto, diffusion)
