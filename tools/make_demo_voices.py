#!/usr/bin/env python
"""Generate the bundled demo voices (deterministic, synthetic).

The reference ships 30 recorded voices; this framework bundles two small
synthetic example voices (harmonic vowel-like clips, original data) plus a
latent-only example voice demonstrating the ``.npz`` latent format
(reference equivalent: tortoise/voices/cond_latent_example). Re-run this
script to regenerate them bit-identically.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

SR = 22050


def vowel_clip(f0: float, formants, seconds: float, seed: int) -> np.ndarray:
    """Speech-shaped synthetic clip: harmonic stack under a formant envelope
    with vibrato, slow amplitude modulation, and a breath-noise floor."""
    rng = np.random.default_rng(seed)
    t = np.arange(int(seconds * SR)) / SR
    vibrato = 1.0 + 0.01 * np.sin(2 * np.pi * 5.3 * t)
    phase = np.cumsum(f0 * vibrato) / SR
    wav = np.zeros_like(t)
    for h in range(1, 40):
        fh = f0 * h
        if fh > 8000:
            break
        gain = sum(np.exp(-((fh - fc) ** 2) / (2 * bw ** 2)) for fc, bw in formants)
        wav += gain / h * np.sin(2 * np.pi * h * phase + rng.uniform(0, 2 * np.pi))
    wav += 0.01 * rng.standard_normal(t.shape)
    # syllable-ish amplitude envelope
    env = 0.55 + 0.45 * np.sin(2 * np.pi * 2.1 * t + 1.0)
    edge = np.minimum(t / 0.05, 1.0) * np.minimum((t[-1] - t) / 0.05, 1.0)
    wav = wav * env * edge
    return (0.6 * wav / np.abs(wav).max()).astype(np.float32)


def main():
    from tortoise_tpu.utils.audio import BUILTIN_VOICES_DIR, save_wav

    voices = {
        # (f0, formant (center, bandwidth) pairs) per clip
        "demo_alto": [(220.0, [(800, 80), (1150, 90), (2900, 120)], 1),
                      (196.0, [(400, 60), (800, 80), (2600, 120)], 2)],
        "demo_bass": [(110.0, [(600, 60), (1040, 80), (2250, 110)], 3),
                      (98.0, [(350, 50), (600, 70), (2400, 110)], 4)],
    }
    for name, clips in voices.items():
        d = os.path.join(BUILTIN_VOICES_DIR, name)
        os.makedirs(d, exist_ok=True)
        for i, (f0, formants, seed) in enumerate(clips, 1):
            path = os.path.join(d, f"{i}.wav")
            save_wav(path, vowel_clip(f0, formants, 4.0, seed), SR)
            print("wrote", path)

    # latent-only example voice (.npz format demo; deterministic values)
    from tortoise_tpu.utils.audio import save_latents

    d = os.path.join(BUILTIN_VOICES_DIR, "demo_latents")
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(7)
    save_latents(os.path.join(d, "demo_latents.npz"),
                 auto=(rng.standard_normal((1, 1024)) * 0.02).astype(np.float32),
                 diffusion=(rng.standard_normal((1, 2048)) * 0.02).astype(np.float32))
    print("wrote", os.path.join(d, "demo_latents.npz"))


if __name__ == "__main__":
    main()
