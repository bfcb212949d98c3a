"""Mel-spectrogram front-end, implemented as pure JAX/numpy functions.

TPU-native equivalents of the reference's two mel pipelines:

* the 22.05 kHz / 80-bin "tacotron" mel used for AR conditioning
  (reference: tortoise/models/arch_util.py:295-331, torchaudio MelSpectrogram
  with power=2, norm="slaney", mel_scale="htk", then log-clamp 1e-5 and a
  per-bin division by the ``mel_norms`` statistics), and
* the 24 kHz / 100-bin "univnet" mel used for the diffusion conditioning and
  vocoder input (reference: tortoise/utils/audio.py:151-204 TacotronSTFT —
  magnitude STFT, librosa slaney-scale/slaney-norm filterbank, log-clamp 1e-5).

All filterbanks are precomputed with numpy at trace time (static shapes) and
the STFT itself is an rFFT over framed windows, which XLA lowers to batched
matmuls/FFTs on the MXU.
"""
from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

# Tacotron mel dynamic range constants (reference: tortoise/utils/audio.py:59-68)
TACOTRON_MEL_MAX = 2.3143386840820312
TACOTRON_MEL_MIN = -11.512925148010254


def normalize_tacotron_mel(mel):
    """[mel_min, mel_max] -> [-1, 1] (reference audio.py:67-68)."""
    return 2.0 * ((mel - TACOTRON_MEL_MIN) / (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN)) - 1.0


def denormalize_tacotron_mel(norm_mel):
    """[-1, 1] -> [mel_min, mel_max] (reference audio.py:63-64)."""
    return ((norm_mel + 1.0) / 2.0) * (TACOTRON_MEL_MAX - TACOTRON_MEL_MIN) + TACOTRON_MEL_MIN


# ---------------------------------------------------------------------------
# Filterbank construction (numpy, done once at trace time)
# ---------------------------------------------------------------------------

def _hz_to_mel(f, htk: bool):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above.
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):
        return np.where(f >= min_log_hz, min_log_mel + np.log(f / min_log_hz) / logstep, mel)


def _mel_to_hz(m, htk: bool):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    freq = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freq)


@functools.lru_cache(maxsize=None)
def mel_filterbank(sample_rate: int, n_fft: int, n_mels: int, fmin: float, fmax: float,
                   htk: bool = False, slaney_norm: bool = True) -> np.ndarray:
    """Triangular mel filterbank, shape (n_mels, n_fft // 2 + 1).

    ``htk=True, slaney_norm=True`` reproduces torchaudio's
    ``MelSpectrogram(norm="slaney")`` default (HTK mel scale, slaney area
    normalization) used by the tacotron mel; ``htk=False, slaney_norm=True``
    reproduces ``librosa.filters.mel`` defaults used by TacotronSTFT.
    """
    n_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0.0, sample_rate / 2.0, n_freqs, dtype=np.float64)
    mel_pts = np.linspace(_hz_to_mel(fmin, htk), _hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = _mel_to_hz(mel_pts, htk)

    # Triangular filters between consecutive center frequencies.
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[:, None] - fft_freqs[None, :]
    lower = -ramps[:-2] / fdiff[:-1, None]
    upper = ramps[2:] / fdiff[1:, None]
    fb = np.maximum(0.0, np.minimum(lower, upper))

    if slaney_norm:
        enorm = 2.0 / (hz_pts[2:n_mels + 2] - hz_pts[:n_mels])
        fb = fb * enorm[:, None]
    return fb.astype(np.float32)


# ---------------------------------------------------------------------------
# STFT
# ---------------------------------------------------------------------------

@functools.lru_cache(maxsize=None)
def _hann_window(win_length: int, n_fft: int) -> np.ndarray:
    # Periodic hann (matches torch.hann_window / scipy get_window("hann")).
    w = 0.5 - 0.5 * np.cos(2.0 * np.pi * np.arange(win_length) / win_length)
    if win_length < n_fft:
        pad = (n_fft - win_length) // 2
        w = np.pad(w, (pad, n_fft - win_length - pad))
    return w.astype(np.float32)


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int, center: bool = True) -> jnp.ndarray:
    """Frame (..., T) signal into (..., n_frames, n_fft) with reflect padding."""
    if center:
        pad = n_fft // 2
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(pad, pad)], mode="reflect")
    n_frames = 1 + (x.shape[-1] - n_fft) // hop
    idx = np.arange(n_fft)[None, :] + hop * np.arange(n_frames)[:, None]
    return x[..., idx]


def stft_magnitude(x: jnp.ndarray, n_fft: int, hop: int, win_length: int,
                   power: float = 1.0, center: bool = True) -> jnp.ndarray:
    """Magnitude (power=1) or power (power=2) spectrogram.

    x: (..., T) -> (..., n_freqs, n_frames). Equivalent to
    torch.stft(center=True, pad_mode="reflect", onesided=True) + abs()**power.
    """
    frames = frame_signal(x, n_fft, hop, center=center)
    frames = frames * jnp.asarray(_hann_window(win_length, n_fft))
    spec = jnp.fft.rfft(frames, n=n_fft, axis=-1)
    mag = jnp.abs(spec)
    if power != 1.0:
        mag = mag ** power
    return jnp.swapaxes(mag, -1, -2)


def dynamic_range_compression(x, clip_val: float = 1e-5):
    return jnp.log(jnp.clip(x, min=clip_val))


def stft(x: jnp.ndarray, n_fft: int, hop: int, win_length: int,
         center: bool = True) -> jnp.ndarray:
    """Complex STFT: (..., T) -> (..., n_freqs, n_frames).

    Matches the conv-based forward transform of the reference's STFT class
    (reference: tortoise/utils/stft.py:94-145) up to its magnitude/phase
    split — we keep the complex spectrum directly.
    """
    frames = frame_signal(x, n_fft, hop, center=center)
    frames = frames * jnp.asarray(_hann_window(win_length, n_fft))
    return jnp.swapaxes(jnp.fft.rfft(frames, n=n_fft, axis=-1), -1, -2)


@functools.lru_cache(maxsize=None)
def _window_sumsquare(win_length: int, n_fft: int, hop: int,
                      n_frames: int) -> np.ndarray:
    """Sum of squared synthesis windows per output sample (reference
    stft.py:42-91 ``window_sumsquare``), used to undo overlap-add gain."""
    w2 = _hann_window(win_length, n_fft).astype(np.float64) ** 2
    out = np.zeros(n_fft + hop * (n_frames - 1), np.float64)
    for f in range(n_frames):
        out[f * hop:f * hop + n_fft] += w2
    return out.astype(np.float32)


def istft(spec: jnp.ndarray, n_fft: int, hop: int, win_length: int,
          length: int | None = None, center: bool = True) -> jnp.ndarray:
    """Inverse STFT with window-sumsquare correction.

    spec: complex (..., n_freqs, n_frames) from :func:`stft`. Equivalent to
    the reference's transposed-conv inverse (reference stft.py:147-178):
    irfft each frame, re-window, overlap-add, divide by the summed squared
    window, trim the center padding. ``istft(stft(x)) == x`` up to fp error.
    """
    frames = jnp.fft.irfft(jnp.swapaxes(spec, -1, -2), n=n_fft, axis=-1)
    win = jnp.asarray(_hann_window(win_length, n_fft))
    frames = frames * win
    n_frames = frames.shape[-2]
    out_len = n_fft + hop * (n_frames - 1)
    idx = (hop * np.arange(n_frames)[:, None] + np.arange(n_fft)).reshape(-1)
    flat = frames.reshape(frames.shape[:-2] + (-1,))
    sig = jnp.zeros(frames.shape[:-2] + (out_len,), frames.dtype)
    sig = sig.at[..., idx].add(flat)
    wss = _window_sumsquare(win_length, n_fft, hop, n_frames)
    sig = sig / jnp.asarray(np.where(wss > 1e-11, wss, 1.0))
    if center:
        sig = sig[..., n_fft // 2: sig.shape[-1] - n_fft // 2]
    if length is not None:
        sig = sig[..., :length]
    return sig


# ---------------------------------------------------------------------------
# The two pipelines
# ---------------------------------------------------------------------------

def tacotron_mel(wav: jnp.ndarray, mel_norms: jnp.ndarray | None = None) -> jnp.ndarray:
    """22.05 kHz 80-bin conditioning mel (reference arch_util.py:295-331).

    wav: (B, T) in [-1, 1] -> (B, 80, frames). power=2 spectrogram, HTK mel
    scale with slaney normalization, log-clamped, then divided per-bin by the
    ``mel_norms`` statistics tensor.
    """
    fb = jnp.asarray(mel_filterbank(22050, 1024, 80, 0.0, 8000.0, htk=True, slaney_norm=True))
    spec = stft_magnitude(wav, n_fft=1024, hop=256, win_length=1024, power=2.0)
    mel = jnp.einsum("mf,...ft->...mt", fb, spec)
    mel = dynamic_range_compression(mel)
    if mel_norms is not None:
        mel = mel / mel_norms[:, None]
    return mel


def univnet_mel(wav: jnp.ndarray, do_normalization: bool = False) -> jnp.ndarray:
    """24 kHz 100-bin mel (reference audio.py:151-204 TacotronSTFT).

    wav: (B, T) in [-1, 1] -> (B, 100, frames). Magnitude STFT (power=1),
    slaney-scale slaney-norm filterbank, log-clamped.
    """
    wav = jnp.clip(wav, -1.0, 1.0)
    fb = jnp.asarray(mel_filterbank(24000, 1024, 100, 0.0, 12000.0, htk=False, slaney_norm=True))
    spec = stft_magnitude(wav, n_fft=1024, hop=256, win_length=1024, power=1.0)
    mel = jnp.einsum("mf,...ft->...mt", fb, spec)
    mel = dynamic_range_compression(mel)
    if do_normalization:
        mel = normalize_tacotron_mel(mel)
    return mel


import os

DEFAULT_MEL_NORMS_FILE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                      "..", "data", "mel_norms.npy")


def load_mel_norms(path: str) -> jnp.ndarray:
    """Load the 80-bin mel normalization statistics (.npy or torch .pth)."""
    if path.endswith(".npy"):
        return jnp.asarray(np.load(path))
    import torch  # torch CPU is only used for one-time asset conversion

    return jnp.asarray(torch.load(path, map_location="cpu", weights_only=False).numpy())
