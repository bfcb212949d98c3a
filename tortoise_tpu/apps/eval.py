"""TSV-driven batch synthesis for evaluation (reference: tortoise/eval.py):
each line is ``text<TAB>path_to_real_clip``; the real clip conditions the
synthesis and outputs land in --output_path."""
from __future__ import annotations

import argparse
import os


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_path", required=True, help="TSV of text<TAB>clip")
    parser.add_argument("--output_path", default="results/eval")
    parser.add_argument("--preset", default="standard")
    parser.add_argument("--model_dir", default=None)
    args = parser.parse_args(argv)

    from tortoise_tpu.api import TextToSpeech
    from tortoise_tpu.utils.audio import load_audio, save_wav

    os.makedirs(args.output_path, exist_ok=True)
    tts = TextToSpeech(models_dir=args.model_dir)

    with open(args.eval_path, encoding="utf-8") as f:
        lines = [l.strip() for l in f if l.strip()]
    for i, line in enumerate(lines):
        text, real = line.split("\t")
        conds = [load_audio(real, 22050)]
        gen = tts.tts_with_preset(text, voice_samples=conds, conditioning_latents=None,
                                  preset=args.preset)
        save_wav(os.path.join(args.output_path, f"{i}.wav"), gen, 24000)


if __name__ == "__main__":
    main()
