"""TSV-driven batch synthesis for evaluation (reference: tortoise/eval.py):
each line is ``text<TAB>path_to_real_clip``; the real clip conditions the
synthesis and outputs land in --output_path.

Beyond the reference (whose eval.py only writes wavs for human listening),
``--cer`` scores every synthesized clip with the in-repo wav2vec2-CTC
acoustic model: greedy transcript -> character error rate vs the prompt —
an automated intelligibility proxy. Results land in
``<output_path>/results.tsv`` as ``index<TAB>cer<TAB>text``.
"""
from __future__ import annotations

import argparse
import os
import warnings


def evaluate_clips(rows, aligner, sample_rate=24000):
    """-> list of (index, cer, text) for ``rows`` of (index, wav, text)."""
    from tortoise_tpu.utils.wav2vec_alignment import character_error_rate

    results = []
    for i, wav, text in rows:
        hyp = aligner.transcribe(wav, audio_sample_rate=sample_rate)
        results.append((i, character_error_rate(text, hyp), text))
    return results


def main(argv=None):
    parser = argparse.ArgumentParser()
    parser.add_argument("--eval_path", required=True, help="TSV of text<TAB>clip")
    parser.add_argument("--output_path", default="results/eval")
    parser.add_argument("--preset", default="standard")
    parser.add_argument("--model_dir", default=None)
    parser.add_argument("--cer", action="store_true",
                        help="score clips with wav2vec2-CTC (char error rate "
                             "vs prompt) into <output_path>/results.tsv")
    args = parser.parse_args(argv)

    from tortoise_tpu.api import TextToSpeech
    from tortoise_tpu.utils.audio import load_audio, save_wav

    os.makedirs(args.output_path, exist_ok=True)
    tts = TextToSpeech(models_dir=args.model_dir)

    with open(args.eval_path, encoding="utf-8") as f:
        lines = [l.strip() for l in f if l.strip()]
    clips = []
    for i, line in enumerate(lines):
        text, real = line.split("\t")
        conds = [load_audio(real, 22050)]
        gen = tts.tts_with_preset(text, voice_samples=conds, conditioning_latents=None,
                                  preset=args.preset)
        save_wav(os.path.join(args.output_path, f"{i}.wav"), gen, 24000)
        if args.cer:  # only the scorer needs the audio kept in memory
            clips.append((i, gen, text))

    if args.cer:
        from tortoise_tpu.utils.wav2vec_alignment import Wav2VecAlignment

        try:
            results = evaluate_clips(clips, Wav2VecAlignment(models_dir=args.model_dir))
        except FileNotFoundError as e:
            warnings.warn(f"--cer skipped: {e}")
            return
        out = os.path.join(args.output_path, "results.tsv")
        with open(out, "w", encoding="utf-8") as f:
            for i, cer, text in results:
                f.write(f"{i}\t{cer:.4f}\t{text}\n")
        mean = sum(c for _, c, _ in results) / max(len(results), 1)
        print(f"mean CER {mean:.4f} over {len(results)} clips -> {out}")


if __name__ == "__main__":
    main()
