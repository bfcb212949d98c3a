#!/usr/bin/env python
"""Benchmark: single-sentence synthesis RTF on one chip.

Headline metric = the reference's published fast-path number (README.md:34:
"0.25-0.3 RTF on a 4 GB GPU" for the fast/HiFi path): wall-clock per second
of generated audio for the full fast pipeline (conditioning -> AR decode ->
latent re-extraction -> HiFi-GAN), compiled shapes warmed, median of N runs.

Prints the json line {"metric", "value", "unit", "vs_baseline", "detail"}
REPEATEDLY: once as soon as the headline measurement exists, then again
after every completed section (the driver takes the LAST parseable line, so
a timeout can only truncate sections, never erase the headline). A
wall-clock budget (``BENCH_BUDGET_S`` env or ``--budget``, default 2200 s)
skips remaining optional sections when exceeded; skips are recorded in
``detail.sections_skipped``.

Sections run in order of importance: headline fast path, quality ladder
(ultra_fast / fast / standard, reference api.py:320-331), the
``fast_int8_decode`` north-star row, long-form high_quality, first-audio
latency, 64-utterance serving, then the optional A/B and continuity rows.
Runs with converted checkpoints when present, else random weights —
identical compute path.

Usage: python bench.py [--smoke] [--runs N] [--tokens N] [--budget S]
                       [--preset P | --fast-only] [--ladder-runs N]
"""
import argparse
import json
import os
import statistics
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE_RTF = 0.25  # reference README.md:34 (best published)
# reference quality path: "a medium sized sentence every 2 minutes" on a K80
# (README.md:31-32); medium sentence ~= 8 s of audio -> RTF ~= 15
REFERENCE_QUALITY_RTF = 15.0
SENTENCE = ("Thanks for reading this article. I hope you found it informative "
            "and that it made you curious about the world of speech synthesis.")
LADDER = ("ultra_fast", "fast", "standard")

# long-form paragraph sized to split into 2 chunks at (200, 300) — enough to
# exercise varying clip lengths and the read.py chunk loop without turning the
# bench into a narration session (VERDICT r4 weak #1: the 6-chunk, 7-pass
# version DNF'd the driver window; the 3-chunk version still cost 677 s warm).
PARAGRAPH = (
    "The field of speech synthesis has advanced remarkably over the past "
    "decade, moving from robotic concatenative systems to neural models that "
    "capture the rhythm and timbre of a human speaker. Autoregressive "
    "transformers first predict a sequence of acoustic tokens from text, "
    "conditioned on short reference clips of the target voice.")


def _measure(fn, runs):
    fn(0)  # warm all compiles
    results = [fn(i + 1) for i in range(runs)]
    rtf = statistics.median(w / a for w, a in results)
    walls = sorted(w for w, _ in results)
    return rtf, walls[len(walls) // 2], results[0][1]


def _long_form(qtts, n_runs=3):
    """BASELINE config 4: read.py-driver long-form synthesis (reference
    read.py:55-85) — split a paragraph into chunks, compute voice latents
    once, synthesize every chunk at high_quality, concatenate. RTF over the
    whole paragraph, latents + compile warm (the serving steady state)."""
    from tortoise_tpu.utils.audio import load_voices
    from tortoise_tpu.utils.text import split_and_recombine_text

    chunks = split_and_recombine_text(PARAGRAPH, 200, 300)
    voice_samples, _ = load_voices(["demo_alto"])
    latents = qtts.get_conditioning_latents(voice_samples)

    def run(seed):
        t0, audio_s = time.perf_counter(), 0.0
        for j, sentence in enumerate(chunks):
            wav = qtts.tts_with_preset(
                sentence, conditioning_latents=latents, preset="high_quality",
                use_deterministic_seed=seed * 131 + j, verbose=False)
            audio_s += wav.shape[-1] / 24000.0
        return time.perf_counter() - t0, audio_s

    # steady-state serving: different seeds produce different clip lengths,
    # and a first-seen length bucket costs a multi-second XLA compile — warm
    # the EXACT timed seeds once so no compile lands inside a timed run.
    # 3 timed runs (>= 3 per VERDICT r3 weak #3; capped at 3 per r4 weak #1).
    for i in range(n_runs):
        run(i + 1)
    results = [run(i + 1) for i in range(n_runs)]
    rtfs = sorted(w / a for w, a in results)
    walls = sorted(w for w, _ in results)
    rtf = rtfs[len(rtfs) // 2]
    return {"rtf": round(rtf, 4), "rtf_min": round(rtfs[0], 4),
            "rtf_max": round(rtfs[-1], 4), "runs": n_runs,
            "p50_wall_s": round(walls[len(walls) // 2], 3),
            "audio_s_per_run": round(results[0][1], 2), "chunks": len(chunks),
            "preset": "high_quality", "kv_cache": "int8",
            "vs_k80_baseline": round(REFERENCE_QUALITY_RTF / rtf, 2)}


def _first_audio(tts, runs=5, first=16, chunk=40):
    """Streaming time-to-first-chunk (reference README.md:34 claims
    "< 500 ms"): prefill + ``first`` decode steps + one windowed HiFi
    decode, median over ``runs`` after a warm pass."""
    text = "Thanks for asking, I would love to tell you more about that topic."

    def one(seed):
        t0 = time.perf_counter()
        stream = tts.tts_stream(text, use_deterministic_seed=seed,
                                first_chunk_size=first, stream_chunk_size=chunk,
                                verbose=False)
        first_chunk = next(stream)
        lat = time.perf_counter() - t0
        for _ in stream:  # drain so the generator finishes cleanly
            pass
        return lat, len(first_chunk) / 24000.0

    one(0)
    rows = [one(i + 1) for i in range(runs)]
    lats = sorted(r[0] for r in rows)
    return {"median_ms": round(lats[len(lats) // 2] * 1e3, 1),
            "min_ms": round(lats[0] * 1e3, 1),
            "first_chunk_audio_s": round(rows[0][1], 3),
            "first_chunk_tokens": first, "runs": runs}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--smoke", action="store_true", help="tiny config on CPU")
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--tokens", type=int, default=200,
                    help="AR tokens per run (~46.4 ms of audio each)")
    ap.add_argument("--preset", default=None,
                    choices=["ultra_fast", "fast", "standard", "high_quality"],
                    help="bench ONLY the quality pipeline at this preset")
    ap.add_argument("--fast-only", action="store_true",
                    help="skip the quality-preset ladder")
    ap.add_argument("--ladder-runs", type=int, default=3,
                    help="timed runs per quality preset in the ladder")
    ap.add_argument("--kv-cache", default="bf16", choices=["bf16", "int8"],
                    help="KV cache dtype for --preset mode")
    ap.add_argument("--budget", type=float,
                    default=float(os.environ.get("BENCH_BUDGET_S", "2200")),
                    help="wall-clock budget in seconds; optional sections are "
                         "skipped once the estimated cost no longer fits")
    args = ap.parse_args()

    t_start = time.perf_counter()

    def remaining():
        return args.budget - (time.perf_counter() - t_start)

    if not args.smoke:
        # Device reachability probe in a SUBPROCESS with a hard timeout: a
        # wedged TPU tunnel blocks inside jax.devices()/the first dispatch
        # with no Python-level recourse (observed: a tunnel outage hung the
        # whole bench with 0 emissions). Probing out-of-process lets us
        # report the outage as a parseable artifact instead of a silent
        # driver timeout.
        import subprocess
        probe_s = float(os.environ.get("BENCH_PROBE_TIMEOUT_S", "300"))
        try:
            r = subprocess.run(
                [sys.executable, "-c",
                 "import warnings; warnings.filterwarnings('ignore');"
                 "import jax, jax.numpy as jnp, numpy as np;"
                 "x = jnp.ones((128, 128));"
                 "assert float(np.asarray(x @ x)[0, 0]) == 128.0;"
                 "print('ok')"],
                timeout=probe_s, capture_output=True, text=True)
            alive = r.stdout.strip().endswith("ok")
        except subprocess.TimeoutExpired:
            alive = False
        if not alive:
            print(json.dumps({
                "metric": "fast_preset_rtf", "value": 0.0,
                "unit": "wall_sec_per_audio_sec", "vs_baseline": 0.0,
                "detail": {"error": f"accelerator unreachable: a 128x128 "
                                    f"matmul probe did not complete within "
                                    f"{probe_s:.0f} s — no measurements "
                                    f"were possible this run"}}))
            return

    # Hard watchdog: the per-section budget only checks BETWEEN sections, so
    # a mid-section device wedge would otherwise ride into the driver's
    # timeout and discard the incrementally-emitted lines with rc=124.
    # Force a clean exit (rc 0, stdout already flushed per emission) once
    # the budget plus a section-scale margin is exhausted.
    import threading

    def _hard_exit():
        sys.stdout.flush()
        os._exit(0)

    watchdog = threading.Timer(args.budget + 300.0, _hard_exit)
    watchdog.daemon = True
    watchdog.start()

    import warnings

    warnings.filterwarnings("ignore")

    import jax

    import tortoise_tpu

    tortoise_tpu.enable_compilation_cache()
    if args.smoke:
        jax.config.update("jax_platforms", "cpu")

    import jax.numpy as jnp

    from tortoise_tpu.api_fast import TextToSpeechFast
    from tortoise_tpu.models.autoregressive import UnifiedVoiceConfig

    def quality_runner(qtts, preset, tokens):
        def run(seed):
            t0 = time.perf_counter()
            wav = qtts.tts_with_preset(SENTENCE, preset=preset,
                                       use_deterministic_seed=seed,
                                       max_mel_tokens=tokens, verbose=False)
            return time.perf_counter() - t0, wav.shape[-1] / 24000.0
        return run

    def effective_candidates(qtts, preset):
        """Candidates actually sampled: the batch loop floors to whole
        micro-batches (reference api.py:407 parity quirk, warned at runtime)
        — e.g. the 96-candidate `fast` preset samples 64 at the B=64 tier.
        Recorded per row so the artifact states the measured work."""
        from tortoise_tpu.presets import QUALITY_PRESETS

        s = QUALITY_PRESETS[preset]["num_autoregressive_samples"]
        b = qtts.autoregressive_batch_size
        return max(1, s // b) * min(s, b)

    if args.preset is not None:
        from tortoise_tpu.api import TextToSpeech

        qtts = TextToSpeech(half=not args.smoke, kv_cache_dtype=args.kv_cache)
        rtf, p50, audio_s = _measure(quality_runner(qtts, args.preset, args.tokens),
                                     args.runs)
        print(json.dumps({
            "metric": f"quality_{args.preset}_rtf",
            "value": round(rtf, 4),
            "unit": "wall_sec_per_audio_sec",
            "vs_baseline": round(REFERENCE_QUALITY_RTF / rtf, 3),
            "detail": {"p50_latency_s": round(p50, 3),
                       "audio_s_per_run": round(audio_s, 2),
                       "runs": args.runs, "ar_tokens": args.tokens,
                       "kv_cache": args.kv_cache,
                       "weights": qtts.ar_source,
                       "device": str(jax.devices()[0])},
        }))
        return

    if args.smoke:
        cfg = UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                                 max_text_tokens=120, max_mel_tokens=80)
        tokens = 32
        tts = TextToSpeechFast(dtype=jnp.float32, ar_config=cfg, latent_bucket=16)
    else:
        tokens = args.tokens
        tts = TextToSpeechFast(dtype=jnp.bfloat16, latent_bucket=64)

    def run(seed):
        t0 = time.perf_counter()
        wav = tts.tts(SENTENCE, use_deterministic_seed=seed,
                      max_mel_tokens=tokens, verbose=False)
        return time.perf_counter() - t0, wav.shape[-1] / 24000.0

    rtf, p50_wall, audio_s = _measure(run, args.runs)

    detail = {
        "p50_latency_s": round(p50_wall, 3),
        "audio_s_per_run": round(audio_s, 2),
        "runs": args.runs,
        "ar_tokens": tokens,
        "weights": tts.ar_source,
        "device": str(jax.devices()[0]),
        "sections_skipped": [],
    }

    def emit():
        # the driver takes the LAST parseable line: re-print after every
        # section so a timeout truncates the artifact instead of erasing it
        detail["elapsed_s"] = round(time.perf_counter() - t_start, 1)
        print(json.dumps({
            "metric": "fast_preset_rtf",
            "value": round(rtf, 4),
            "unit": "wall_sec_per_audio_sec",
            "vs_baseline": round(REFERENCE_RTF / rtf, 3),
            "detail": detail,
        }), flush=True)

    emit()  # the headline exists from here on, no matter what happens below
    if args.smoke or args.fast_only:
        return

    # (name, est_cost_s, fn) — est_cost is a deliberately conservative v5e
    # figure (instantiation + compiles + timed runs) used only for the
    # skip-when-over-budget decision. Ordered by importance (VERDICT r4 task
    # 1: fast p50, ladder incl. fast_int8_decode, long-form, first-audio,
    # 64-utt serving are the must-land rows; A/B + continuity rows last).
    state = {}

    def sec_ladder():
        from tortoise_tpu.api import TextToSpeech

        qtts = TextToSpeech(half=True)
        ladder = {}
        for preset in LADDER:
            q_rtf, q_p50, q_audio = _measure(
                quality_runner(qtts, preset, args.tokens), args.ladder_runs)
            ladder[preset] = {"rtf": round(q_rtf, 4),
                              "p50_latency_s": round(q_p50, 3),
                              "audio_s_per_run": round(q_audio, 2),
                              "candidates": effective_candidates(qtts, preset),
                              "vs_k80_baseline": round(
                                  REFERENCE_QUALITY_RTF / q_rtf, 2)}
        detail["quality_ladder"] = ladder
        detail["quality_ladder_runs"] = args.ladder_runs
        del qtts

    def sec_fast_int8_decode():
        # BASELINE config 2 north star: quality `fast` preset (96 AR
        # candidates / 80 cond-free diffusion steps, reference
        # api.py:324-329) under 2 s p50. gpt_weights="int8_decode" is the
        # measured-best config: exact bf16 prefill/re-extraction, int8
        # stack for the fused decode kernel only.
        from tortoise_tpu.api import TextToSpeech

        qtts = TextToSpeech(half=True, gpt_weights="int8_decode")
        q_rtf, q_p50, q_audio = _measure(
            quality_runner(qtts, "fast", args.tokens), args.ladder_runs)
        detail.setdefault("quality_ladder", {})["fast_int8_decode"] = {
            "rtf": round(q_rtf, 4), "p50_latency_s": round(q_p50, 3),
            "audio_s_per_run": round(q_audio, 2),
            "gpt_weights": "int8_decode",
            "candidates": effective_candidates(qtts, "fast"),
            "vs_k80_baseline": round(REFERENCE_QUALITY_RTF / q_rtf, 2)}
        del qtts

    def sec_long_form():
        # the int8 KV cache serving config at the most expensive preset
        # (256 samples / 400 diffusion steps, reference api.py:328-331),
        # then BASELINE config 4 long-form on the same instance.
        from tortoise_tpu.api import TextToSpeech

        qtts8 = TextToSpeech(half=True, kv_cache_dtype="int8")
        q_rtf, q_p50, q_audio = _measure(
            quality_runner(qtts8, "high_quality", args.tokens),
            args.ladder_runs)
        detail.setdefault("quality_ladder", {})["high_quality_int8kv"] = {
            "rtf": round(q_rtf, 4), "p50_latency_s": round(q_p50, 3),
            "audio_s_per_run": round(q_audio, 2),
            "candidates": effective_candidates(qtts8, "high_quality"),
            "vs_k80_baseline": round(REFERENCE_QUALITY_RTF / q_rtf, 2)}
        emit()
        detail["long_form_high_quality"] = _long_form(qtts8)
        del qtts8

    def sec_first_audio():
        # streaming first-audio (README's "< 500 ms" claim, README.md:34):
        # bf16 on the resident headline instance, int8_decode on a fresh
        # one (the measured-best B=1 config; kept resident for the
        # fast_int8_decode fast-path row below).
        detail["first_audio_ms"] = {"bf16_weights": _first_audio(tts)}
        emit()
        tts8d = TextToSpeechFast(dtype=jnp.bfloat16, latent_bucket=64,
                                 gpt_weights="int8_decode")
        detail["first_audio_ms"]["int8_decode"] = _first_audio(tts8d)

        def run8d(seed):
            t0 = time.perf_counter()
            wav = tts8d.tts(SENTENCE, use_deterministic_seed=seed,
                            max_mel_tokens=tokens, verbose=False)
            return time.perf_counter() - t0, wav.shape[-1] / 24000.0

        q_rtf, q_p50, _ = _measure(run8d, 3)
        detail["fast_int8_decode"] = {"rtf": round(q_rtf, 4),
                                      "p50_latency_s": round(q_p50, 3)}
        del tts8d

    def sec_serving_64():
        # batched fast-path serving (BASELINE config 5): 64 concurrent
        # utterances through one set of compiled programs; throughput =
        # total audio seconds / wall second. Both fused-kernel settings
        # (tts_batch defaults OFF per the composed measurement).
        serve_texts = [f"{SENTENCE} Utterance number {i}." for i in range(64)]

        def serve(fused):
            def f(seed):
                t0 = time.perf_counter()
                wavs = tts.tts_batch(serve_texts, use_deterministic_seed=seed,
                                     max_mel_tokens=tokens,
                                     gpt_fused_step=fused, verbose=False)
                wall = time.perf_counter() - t0
                return wall, sum(w.shape[-1] for w in wavs) / 24000.0
            return f

        s_rtf, s_p50, s_audio = _measure(serve(False), 2)
        detail["batched_serving"] = {
            "utterances": 64,
            "throughput_audio_s_per_s": round(1.0 / s_rtf, 2),
            "p50_wall_s": round(s_p50, 3),
            "audio_s_per_run": round(s_audio, 2)}
        state["serve64_off"] = (s_rtf, s_p50)

    def sec_fused_ab():
        # fused-kernel A/B rows (VERDICT r3 task 1: never ship a default
        # without a composed A/B in the artifact). The headline IS B=1
        # fused-ON (the default); this adds B=1 OFF and B=64 ON. OFF rides
        # the per-call override on the RESIDENT instance — same XLA-scan
        # decode path, without paying a second full stack instantiation.
        def run_off(seed):
            t0 = time.perf_counter()
            wav = tts.tts(SENTENCE, use_deterministic_seed=seed,
                          max_mel_tokens=tokens, gpt_fused_step=False,
                          verbose=False)
            return time.perf_counter() - t0, wav.shape[-1] / 24000.0

        ab_rtf, ab_p50, _ = _measure(run_off, 2)
        detail["fused_ab"] = {
            "fast_b1": {"on": {"rtf": round(rtf, 4),
                               "p50_latency_s": round(p50_wall, 3),
                               "default": True},
                        "off": {"rtf": round(ab_rtf, 4),
                                "p50_latency_s": round(ab_p50, 3)}}}
        if "serve64_off" not in state:
            return
        emit()
        serve_texts = [f"{SENTENCE} Utterance number {i}." for i in range(64)]

        def serve_on(seed):
            t0 = time.perf_counter()
            wavs = tts.tts_batch(serve_texts, use_deterministic_seed=seed,
                                 max_mel_tokens=tokens,
                                 gpt_fused_step=True, verbose=False)
            wall = time.perf_counter() - t0
            return wall, sum(w.shape[-1] for w in wavs) / 24000.0

        o_rtf, o_p50, _ = _measure(serve_on, 2)
        s_rtf, s_p50 = state["serve64_off"]
        detail["fused_ab"]["batch64"] = {
            "off": {"p50_wall_s": round(s_p50, 3),
                    "throughput_audio_s_per_s": round(1.0 / s_rtf, 2),
                    "default": True},
            "on": {"p50_wall_s": round(o_p50, 3),
                   "throughput_audio_s_per_s": round(1.0 / o_rtf, 2)}}

    def sec_serving_8():
        # round-over-round continuity row
        serve_texts = [f"{SENTENCE} Utterance number {i}." for i in range(8)]

        def serve(seed):
            t0 = time.perf_counter()
            wavs = tts.tts_batch(serve_texts, use_deterministic_seed=seed,
                                 max_mel_tokens=tokens, verbose=False)
            wall = time.perf_counter() - t0
            return wall, sum(w.shape[-1] for w in wavs) / 24000.0

        s_rtf, s_p50, s_audio = _measure(serve, 3)
        detail["batched_serving_8"] = {
            "utterances": 8,
            "throughput_audio_s_per_s": round(1.0 / s_rtf, 2),
            "p50_wall_s": round(s_p50, 3),
            "audio_s_per_run": round(s_audio, 2)}

    # est costs = measured warm-cache v5e section times (section_times_s of
    # the committed BENCH_SELF run) + headroom; a cold compilation cache
    # roughly doubles the model-instantiating sections, which the budget
    # check absorbs by skipping the tail sections
    sections = [
        ("quality_ladder", 300, sec_ladder),
        ("fast_int8_decode_preset", 300, sec_fast_int8_decode),
        ("long_form", 520, sec_long_form),
        ("first_audio", 200, sec_first_audio),
        ("serving_64", 80, sec_serving_64),
        ("fused_ab", 60, sec_fused_ab),
        ("serving_8", 30, sec_serving_8),
    ]
    detail["section_times_s"] = {}
    for name, est_cost, fn in sections:
        if remaining() < est_cost:
            detail["sections_skipped"].append(
                {"section": name, "est_cost_s": est_cost,
                 "budget_left_s": round(remaining(), 1)})
            continue
        t_sec = time.perf_counter()
        try:
            fn()
        except Exception as e:  # keep the headline even if a section fails
            detail[f"{name}_error"] = f"{type(e).__name__}: {e}"
        detail["section_times_s"][name] = round(time.perf_counter() - t_sec, 1)
        emit()

    emit()


if __name__ == "__main__":
    main()
