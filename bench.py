#!/usr/bin/env python
"""Benchmark: fast-preset single-sentence synthesis RTF on one chip.

Measures the reference's headline number (README.md:34: "0.25-0.3 RTF on a
4 GB GPU" for the fast/HiFi path) on this framework: wall-clock per second
of generated audio for the full fast pipeline (conditioning -> AR decode ->
latent re-extraction -> HiFi-GAN), compiled shapes warmed, median of N runs.

Prints ONE json line: {"metric", "value", "unit", "vs_baseline"}.
``vs_baseline`` = reference_rtf / our_rtf (>1 means faster than the
reference's published number). Runs with converted checkpoints when present,
else random weights — identical compute path either way.

Usage: python bench.py [--smoke] [--runs N] [--tokens N]
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_RTF = 0.25  # reference README.md:34 (best published)
SENTENCE = ("Thanks for reading this article. I hope you found it informative "
            "and that it made you curious about the world of speech synthesis.")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny config on CPU")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--tokens", type=int, default=200,
                    help="AR tokens per run (~46.4 ms of audio each)")
    ap.add_argument("--preset", default=None,
                    choices=["ultra_fast", "fast", "standard", "high_quality"],
                    help="bench the QUALITY pipeline at this preset instead "
                         "of the fast path")
    args = ap.parse_args()

    import warnings

    warnings.filterwarnings("ignore")

    import jax
    import numpy as np

    import tortoise_tpu

    tortoise_tpu.enable_compilation_cache()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tortoise_tpu.api_fast import TextToSpeechFast
    from tortoise_tpu.models.autoregressive import UnifiedVoiceConfig

    if args.preset is not None:
        from tortoise_tpu.api import TextToSpeech

        tokens = args.tokens
        qtts = TextToSpeech(half=not args.smoke)

        def run(seed):
            t0 = time.perf_counter()
            wav = qtts.tts_with_preset(SENTENCE, preset=args.preset,
                                       use_deterministic_seed=seed,
                                       max_mel_tokens=tokens, verbose=False)
            wall = time.perf_counter() - t0
            return wall, wav.shape[-1] / 24000.0

        class _Src:  # report weight provenance like the fast path
            ar_source = qtts.ar_source
        tts = _Src()
    elif args.smoke:
        cfg = UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                                 max_text_tokens=120, max_mel_tokens=80)
        tokens = 32
        tts = TextToSpeechFast(dtype=jnp.float32, ar_config=cfg, latent_bucket=16)
    else:
        tokens = args.tokens
        tts = TextToSpeechFast(dtype=jnp.bfloat16, latent_bucket=64)

    if args.preset is None:
        def run(seed):
            t0 = time.perf_counter()
            wav = tts.tts(SENTENCE, use_deterministic_seed=seed,
                          max_mel_tokens=tokens, verbose=False)
            wall = time.perf_counter() - t0
            audio_sec = wav.shape[-1] / 24000.0
            return wall, audio_sec

    run(0)  # warm all compiles
    results = [run(i + 1) for i in range(args.runs)]
    rtfs = [w / a for w, a in results]
    rtf = statistics.median(rtfs)
    walls = sorted(w for w, _ in results)
    p50_wall = walls[len(walls) // 2]

    metric = "fast_preset_rtf" if args.preset is None else \
        f"quality_{args.preset}_rtf"
    print(json.dumps({
        "metric": metric,
        "value": round(rtf, 4),
        "unit": "wall_sec_per_audio_sec",
        "vs_baseline": round(REFERENCE_RTF / rtf, 3),
        "detail": {
            "p50_latency_s": round(p50_wall, 3),
            "audio_s_per_run": round(results[0][1], 2),
            "runs": args.runs,
            "ar_tokens": tokens,
            "weights": tts.ar_source,
            "device": str(jax.devices()[0]),
        },
    }))


if __name__ == "__main__":
    main()
