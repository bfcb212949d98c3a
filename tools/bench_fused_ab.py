#!/usr/bin/env python
"""Composed fused-decode-kernel A/B: the measurement round 3 skipped.

Measures END-TO-END pipelines with the fused whole-step decode kernel
(ops/decode_step_pallas) ON vs OFF — not the chained-step microbench — at
the operating points that decide the default:

* fast path B=1 bf16 (the BENCH headline: TextToSpeechFast.tts),
* fast path batched serving B=64 (tts_batch),
* quality ``standard`` preset (the 256-candidate composed run),
* quality ``standard`` with the int8 KV cache (the best serving config —
  round 4's int8-capable kernel finally covers it; VERDICT r3 missing #3).

Prints one JSON object; commit the output into docs/ROOFLINE.md and use it
to set the shipped default (VERDICT r3 next-round task 1: a kernel that
loses composed is not shipped ON).

Run on hardware: python tools/bench_fused_ab.py [--runs 5] [--tokens 200]
                     [--skip-quality] [--skip-batch]
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SENTENCE = ("Thanks for reading this article. I hope you found it informative "
            "and that it made you curious about the world of speech synthesis.")


def _measure(fn, runs):
    fn(0)  # warm compiles
    results = [fn(i + 1) for i in range(runs)]
    walls = sorted(w for w, _ in results)
    p50 = walls[len(walls) // 2]
    rtf = statistics.median(w / a for w, a in results)
    return {"p50_s": round(p50, 4), "rtf": round(rtf, 4),
            "audio_s": round(results[0][1], 2), "runs": runs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--tokens", type=int, default=200)
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--skip-quality", action="store_true")
    ap.add_argument("--skip-batch", action="store_true")
    ap.add_argument("--quality-runs", type=int, default=3)
    ap.add_argument("--interleaved-batch", action="store_true",
                    help="ABBA-ordered tts_batch A/B on one resident "
                         "instance (cancels drift); --runs pairs per config")
    args = ap.parse_args()

    import warnings

    warnings.filterwarnings("ignore")
    import jax
    import jax.numpy as jnp

    import tortoise_tpu

    tortoise_tpu.enable_compilation_cache()
    from tortoise_tpu.api_fast import TextToSpeechFast

    out = {"device": str(jax.devices()[0]), "ar_tokens": args.tokens}

    if args.interleaved_batch:
        # ABBA-ordered A/B on ONE resident instance via the per-call
        # override: block-ordered measurements of tts_batch sample the
        # box's ±10-15% drift, not the kernel (docs/ROOFLINE.md
        # "statistical TIE" revision) — this is the methodology that
        # settles default questions at the batch-serving point.
        tts = TextToSpeechFast(dtype=jnp.bfloat16, latent_bucket=64)
        texts = [f"{SENTENCE} Utterance number {i}." for i in range(args.batch)]

        def serve(fused, seed):
            t0 = time.perf_counter()
            tts.tts_batch(texts, use_deterministic_seed=seed,
                          max_mel_tokens=args.tokens,
                          gpt_fused_step=fused, verbose=False)
            return time.perf_counter() - t0

        serve(False, 0), serve(True, 0)  # warm both programs
        walls = {"fused_off": [], "fused_on": []}
        order = [False, True, True, False] * max(1, args.runs // 2)
        for i, f in enumerate(order):
            w = serve(f, i + 1)
            walls["fused_on" if f else "fused_off"].append(w)
            print(f"run {i} fused={f}: {w:.3f} s", file=sys.stderr)
        out[f"interleaved_batch{args.batch}"] = {
            k: {"p50_s": round(statistics.median(v), 3),
                "all_s": [round(w, 3) for w in v]}
            for k, v in walls.items()}
        print(json.dumps(out))
        return

    for gw in ("bf16", "int8"):
        b1_row = "fast_b1" if gw == "bf16" else "fast_b1_int8w"
        for fused in (False, True):
            key = "fused_on" if fused else "fused_off"
            tts = TextToSpeechFast(dtype=jnp.bfloat16, latent_bucket=64,
                                   gpt_weights=gw, gpt_fused_step=fused)
            assert tts.gpt_fused_step == fused, (tts.gpt_fused_step, fused)

            def run(seed):
                t0 = time.perf_counter()
                wav = tts.tts(SENTENCE, use_deterministic_seed=seed,
                              max_mel_tokens=args.tokens, verbose=False)
                return time.perf_counter() - t0, wav.shape[-1] / 24000.0

            out.setdefault(b1_row, {})[key] = _measure(run, args.runs)
            print(f"{b1_row} {key}: {out[b1_row][key]}", file=sys.stderr)

            if not args.skip_batch and gw == "bf16":
                texts = [f"{SENTENCE} Utterance number {i}."
                         for i in range(args.batch)]

                def serve(seed):
                    t0 = time.perf_counter()
                    wavs = tts.tts_batch(texts, use_deterministic_seed=seed,
                                         max_mel_tokens=args.tokens,
                                         verbose=False)
                    return (time.perf_counter() - t0,
                            sum(w.shape[-1] for w in wavs) / 24000.0)

                row = _measure(serve, max(2, args.runs - 2))
                row["throughput_audio_s_per_s"] = round(1.0 / row["rtf"], 2)
                out.setdefault(f"fast_batch{args.batch}", {})[key] = row
                print(f"fast_batch{args.batch} {key}: {row}", file=sys.stderr)
            del tts

    if not args.skip_quality:
        from tortoise_tpu.api import TextToSpeech

        # (row, kv dtype, AR batch override, fused settings). int8 at the
        # default B=128 exceeds the kernel's VMEM budget (sampler falls back
        # silently), so the real fused-vs-XLA comparison pins B=64; the
        # B=128 XLA row decides whether 2x128-XLA or 4x64-fused wins.
        plans = [
            ("quality_standard", "bf16", None, (False, True)),
            ("quality_standard_int8kv", "int8", 64, (False, True)),
            ("quality_standard_int8kv_b128", "int8", None, (False,)),
        ]
        for row_name, kv_dtype, ar_batch, fused_opts in plans:
            for fused in fused_opts:
                key = "fused_on" if fused else "fused_off"
                qtts = TextToSpeech(half=True, kv_cache_dtype=kv_dtype,
                                    autoregressive_batch_size=ar_batch,
                                    gpt_fused_step=fused)

                def qrun(seed):
                    t0 = time.perf_counter()
                    wav = qtts.tts_with_preset(
                        SENTENCE, preset="standard", use_deterministic_seed=seed,
                        max_mel_tokens=args.tokens, verbose=False)
                    return time.perf_counter() - t0, wav.shape[-1] / 24000.0

                out.setdefault(row_name, {})[key] = _measure(
                    qrun, args.quality_runs)
                print(f"{row_name} {key}: {out[row_name][key]}",
                      file=sys.stderr)
                del qtts

    print(json.dumps(out))


if __name__ == "__main__":
    main()
