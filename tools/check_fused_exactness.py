#!/usr/bin/env python
"""On-HARDWARE fused-decode-kernel exactness check.

tests/test_fused_decode_step.py proves the kernel in interpret mode on CPU,
but interpret mode has accepted layouts Mosaic later rejected on the real
device (docs/ROOFLINE.md) — interpret != hardware. This tool runs on the
actual TPU and compares the fused whole-step kernel against the XLA layer
scan with a TEACHER-FORCED replay: first the XLA path greedy-decodes a
token stream, then BOTH paths re-process that exact stream step by step, so
every step sees identical history and the comparison isolates per-step
kernel error from sampling cascade (a free-running greedy decode on random
weights has near-uniform logits whose argmax ties flip on ~1% bf16
nondeterminism and then diverge permanently — that measures chaos, not the
kernel; measured free-run agreement 0.59 at full size while the per-step
hidden error is ~1%).

Reported per cache dtype (bf16 and int8):
* forced_agreement — argmax-token agreement between the two paths given
  identical history;
* decisive_agreement — the same restricted to steps whose XLA top1-top2
  logit margin exceeds 0.125 (a few bf16 quanta): random-init logits over
  8194 codes are a dense pack of near-ties with margins at the bf16
  resolution, where two different-but-correct compute paths legitimately
  disagree; real checkpoints produce peaked logits, so the production
  contract is "agrees whenever the choice is not a numerical tie".
  Bar: decisive_agreement == 1.0;
* hidden_rel_drift — max per-step relative drift of the final-norm latent;
* flip_margins — XLA top1-top2 logit gaps at any disagreeing steps (tie
  flips show near-zero margins);
* free_run_agreement — the old free-running number, kept for reference.

The replay uses repetition_penalty=1.0 so the free-running greedy stream
is plain argmax and the forced replay is self-consistent with it
(xla_replay_self_consistency == 1.0 is asserted as a methodology check).

Commit the JSON output to the ROOFLINE appendix so the exactness claim is
backed by hardware (VERDICT r3 weak #4).

Run: python tools/check_fused_exactness.py [--steps 32] [--batch 2] [--tiny]
"""
import argparse
import functools
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--batch", type=int, default=2)
    ap.add_argument("--tiny", action="store_true",
                    help="2-layer/256-dim config (smoke; full-size default)")
    args = ap.parse_args()

    import warnings

    warnings.filterwarnings("ignore")
    import jax
    import jax.numpy as jnp
    import numpy as np

    import tortoise_tpu

    tortoise_tpu.enable_compilation_cache()
    from tortoise_tpu.models import ar_sampler
    from tortoise_tpu.models.ar_sampler import (SamplerSettings, sample_speech,
                                                stack_fused_params)
    from tortoise_tpu.models.autoregressive import (UnifiedVoice,
                                                    UnifiedVoiceConfig,
                                                    init_unified_voice)

    if args.tiny:
        cfg = UnifiedVoiceConfig(layers=2, model_dim=256, heads=4,
                                 max_text_tokens=40, max_mel_tokens=64)
    else:
        cfg = UnifiedVoiceConfig()  # the shipped 30L/1024d/16h config
    model = UnifiedVoice(cfg, dtype=jnp.bfloat16)
    variables = init_unified_voice(model, 0)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    variables = jax.device_put(variables)
    stacked = stack_fused_params(variables)
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.model_dim))
    text = jnp.asarray([[10, 20, 30, 40, 50, 0]], jnp.int32)
    rng = jax.random.PRNGKey(5)
    steps = min(args.steps, cfg.max_mel_tokens - 8)

    @functools.partial(jax.jit, static_argnums=(0, 3, 4))
    def forced_replay(model, variables, stacked_or_none, settings, cache_dtype,
                      prompt, forced, rng):
        """Teacher-forced replay: feed ``forced`` tokens, return each step's
        greedy choice and final-norm hidden."""
        carry, tok0, _ = ar_sampler._prefill.__wrapped__(
            model, variables, prompt, rng, settings, cache_dtype)
        cache = carry[0]
        p_len = prompt.shape[1]

        def step(c, tok_in):
            cache, s, pos = c
            emb = model.apply(variables, tok_in[:, None], s,
                              method=UnifiedVoice.decode_embed)
            h, cache = ar_sampler._gpt_step(model, variables, settings,
                                            stacked_or_none, emb, cache, pos)
            logits = model.apply(variables, h[:, None],
                                 method=UnifiedVoice.hidden_to_mel_logits)[:, 0]
            top2 = jax.lax.top_k(logits, 2)[0]
            return (cache, s + 1, pos + 1), (
                jnp.argmax(logits, -1).astype(jnp.int32),
                top2[:, 0] - top2[:, 1],
                model.apply(variables, h,
                            method=UnifiedVoice.hidden_to_latent))

        (_, _, _), (preds, margins, hs) = jax.lax.scan(
            step, (cache, jnp.zeros((), jnp.int32),
                   jnp.full((), p_len, jnp.int32)), forced.T)
        return tok0, preds, margins, hs

    out = {"device": str(jax.devices()[0]),
           "platform": jax.devices()[0].platform,
           "config": {"layers": cfg.layers, "model_dim": cfg.model_dim,
                      "heads": cfg.heads},
           "steps": steps, "batch": args.batch, "rows": {}}
    for cache_dtype, name in ((jnp.bfloat16, "bf16_cache"),
                              (jnp.int8, "int8_cache")):
        base = SamplerSettings(do_sample=False, max_generate=steps,
                               repetition_penalty=1.0)
        fused = SamplerSettings(do_sample=False, max_generate=steps,
                                repetition_penalty=1.0, fused_step=True)
        # 1. free-running decodes (reference-informational)
        codes_ref, _ = sample_speech(model, variables, cond, text, rng,
                                     args.batch, settings=base,
                                     cache_dtype=cache_dtype)
        codes_fused, _ = sample_speech(model, variables, cond, text, rng,
                                       args.batch, settings=fused,
                                       cache_dtype=cache_dtype)
        free_agree = float((np.asarray(codes_ref)
                            == np.asarray(codes_fused)).mean())

        # 2. teacher-forced replay of the XLA stream through both paths
        prompt = ar_sampler._make_prompt(model, variables, cond, text,
                                         args.batch)
        forced = codes_ref[:, :-1]     # step i consumes token i-1
        want = np.asarray(codes_ref[:, 1:])
        _, p_x, m_x, h_x = forced_replay(model, variables, None, base,
                                         cache_dtype, prompt, forced, rng)
        _, p_f, m_f, h_f = forced_replay(model, variables, stacked, fused,
                                         cache_dtype, prompt, forced, rng)
        p_x, p_f = np.asarray(p_x), np.asarray(p_f)     # (steps, B)
        m_x = np.asarray(m_x)
        # the sampler latches the stop token once emitted (raw argmax in the
        # replay has no latch) — compare pre-stop steps only
        stopped = np.cumsum(want.T == cfg.stop_mel_token, axis=0) > 0
        live = ~stopped
        agree = float((p_x == p_f)[live].mean()) if live.any() else 1.0
        decisive = (m_x > 0.125) & live
        dec_agree = (float((p_x == p_f)[decisive].mean())
                     if decisive.any() else 1.0)
        flips = m_x[(p_x != p_f) & live]
        hx = np.asarray(h_x, np.float32)
        hf = np.asarray(h_f, np.float32)
        drift = float(np.abs(hx - hf).max() / max(np.abs(hx).max(), 1e-9))
        # sanity: the forced XLA replay must reproduce its own decode on
        # every decisive step (replay and decode are different compiled
        # programs, so exact bf16 ties can still break differently)
        replay_ok = (float((p_x == want.T)[decisive].mean())
                     if decisive.any() else 1.0)
        row = {"forced_agreement": agree,
               "decisive_agreement": dec_agree,
               "decisive_steps": int(decisive.sum()),
               "hidden_rel_drift_max": round(drift, 6),
               "flip_margins": [round(float(v), 5) for v in flips[:8]],
               "xla_replay_self_consistency": replay_ok,
               "free_run_agreement": free_agree}
        out["rows"][name] = row
        print(f"{name}: forced={agree:.4f} decisive={dec_agree:.4f} "
              f"drift={drift:.2e} free_run={free_agree:.4f}", file=sys.stderr)

    ok = all(r["decisive_agreement"] >= 0.999
             and r["xla_replay_self_consistency"] == 1.0
             and r["hidden_rel_drift_max"] < 0.05
             for r in out["rows"].values())
    out["ok"] = ok
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
