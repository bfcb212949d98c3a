"""Dump (auto_latent, diffusion_latent) for a voice as a reusable .npz
(reference: tortoise/get_conditioning_latents.py)."""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--voice", default="pat")
    parser.add_argument("--output_path", default="../results/conditioning_latents")
    parser.add_argument("--model_dir", default=None)
    parser.add_argument("--extra_voice_dir", action="append", default=[])
    args = parser.parse_args(argv)

    from tortoise_tpu.api import TextToSpeech
    from tortoise_tpu.utils.audio import load_voice, save_latents

    os.makedirs(args.output_path, exist_ok=True)
    tts = TextToSpeech(models_dir=args.model_dir)
    for voice in args.voice.split(","):
        cond_paths, _ = load_voice(voice, args.extra_voice_dir)
        assert cond_paths is not None, f"voice '{voice}' has no audio clips"
        auto, diffusion = tts.get_conditioning_latents(cond_paths)
        save_latents(os.path.join(args.output_path, f"{voice}.npz"), auto, diffusion)
        print(f"wrote {voice}.npz (auto {auto.shape}, diffusion {diffusion.shape})")


if __name__ == "__main__":
    main()
