"""Measure streaming first-audio latency (tts_stream) on real hardware.

The reference's claim is "< 500 ms to first chunk" on a 4 GB GPU
(reference README.md:34); the repo targets beating it on one TPU chip.
First audio = prefill + ``first_chunk_size`` decode steps + one windowed
HiFi decode, so the knobs are the first segment length and (indirectly)
the GPT weight dtype (B=1 decode is weight-bandwidth-bound; try
``--gpt-weights int8``).

Reports, over --runs runs after a warmup: time to first chunk (median/min),
seconds of audio in the first chunk, and the inter-chunk cadence vs audio
duration (sustained RTF while streaming).

Run: python tools/measure_first_audio.py [--first 16] [--chunk 40]
     [--gpt-weights bf16|int8] [--runs 5]
"""
from __future__ import annotations

import argparse
import time

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--first", type=int, default=16,
                    help="first_chunk_size (AR tokens before first emit)")
    ap.add_argument("--chunk", type=int, default=40)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--gpt-weights", default="bf16", choices=["bf16", "int8"])
    ap.add_argument("--text", default="Thanks for asking, I would love to "
                    "tell you more about that topic.")
    args = ap.parse_args()

    import warnings

    warnings.filterwarnings("ignore")
    import tortoise_tpu

    tortoise_tpu.enable_compilation_cache()
    from tortoise_tpu.api_fast import TextToSpeechFast

    tts = TextToSpeechFast(gpt_weights=args.gpt_weights)

    def one_run(seed):
        t0 = time.perf_counter()
        firsts, chunks, times = None, [], []
        for chunk in tts.tts_stream(args.text, use_deterministic_seed=seed,
                                    first_chunk_size=args.first,
                                    stream_chunk_size=args.chunk,
                                    verbose=False):
            now = time.perf_counter() - t0
            if firsts is None:
                firsts = (now, len(chunk) / 24000.0)
            chunks.append(len(chunk))
            times.append(now)
        total_audio = sum(chunks) / 24000.0
        return firsts, total_audio, times[-1]

    one_run(0)  # warm all compiles
    rows = [one_run(i + 1) for i in range(args.runs)]
    f_lat = sorted(r[0][0] for r in rows)
    f_audio = np.median([r[0][1] for r in rows])
    rtf = np.median([r[2] / r[1] for r in rows])
    print(f"first-audio latency: median {f_lat[len(f_lat) // 2] * 1e3:.0f} ms, "
          f"min {f_lat[0] * 1e3:.0f} ms "
          f"(first={args.first} tokens, gpt_weights={args.gpt_weights})")
    print(f"first chunk audio:   {f_audio:.2f} s")
    print(f"sustained stream:    RTF {rtf:.3f} "
          f"({np.median([r[1] for r in rows]):.1f} s audio/run)")


if __name__ == "__main__":
    main()
