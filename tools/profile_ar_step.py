"""Attribute per-token AR decode cost on real hardware.

Timing on the tunneled backend is unreliable per-call (d2h syncs and arg
shipping dominate), so every number here is DIFFERENTIAL: the cost of a
segment of 3*n steps minus a segment of n steps, divided by 2*n — fixed
per-call costs cancel. Params are always explicit jit args (closing over
them bakes 842 MB of constants into the HLO; see memory: tpu-env-gotchas).

Run: python tools/profile_ar_step.py [--batch 16] [--tokens 64]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from tortoise_tpu.models.autoregressive import (UnifiedVoice,
                                                UnifiedVoiceConfig,
                                                init_unified_voice)
from tortoise_tpu.models import ar_sampler
from tortoise_tpu.ops.attention import chunked_decode_attention_merged
from tortoise_tpu import weights as weights_lib


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[-1])


def time_once(fn, *args, reps=2):
    sync(fn(*args))  # warmup/compile
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    sync(out)
    return (time.perf_counter() - t0) / reps


def diff_per_step(fn_of_n, n):
    """fn_of_n(k) runs k steps; returns (t(3n) - t(n)) / 2n in ms."""
    t1 = time_once(fn_of_n(n))
    t3 = time_once(fn_of_n(3 * n))
    return 1e3 * (t3 - t1) / (2 * n)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tokens", type=int, default=64)
    ap.add_argument("--cache-dtype", default="bf16", choices=["bf16", "int8"])
    args = ap.parse_args()
    b, n = args.batch, args.tokens
    cache_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8}[args.cache_dtype]

    cfg = UnifiedVoiceConfig()
    model = UnifiedVoice(cfg, dtype=jnp.bfloat16)
    params = init_unified_voice(model, 0)
    params = params.get("params", params)
    params = weights_lib.cast_for_inference(params, jnp.bfloat16)
    variables = jax.device_put({"params": params})
    settings = ar_sampler.SamplerSettings(max_generate=600)

    prompt = jnp.zeros((b, 30, cfg.model_dim), jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    carry, _, _ = ar_sampler._prefill(model, variables, prompt, rng,
                                      settings, cache_dtype)

    # (a) full sampler segment
    def seg(k):
        return lambda: ar_sampler._segment(model, variables, carry, settings, k)
    print(f"[a] full segment      {diff_per_step(seg, n):7.3f} ms/tok  (B={b})")

    # (b) transformer-only: fixed token, no sampling / latent head
    @functools.partial(jax.jit, static_argnums=(2,))
    def transformer_only(variables, carry, k):
        cache, prev_tok, seen, finished, rng, s, pos = carry

        def step(c, _):
            cache, s, pos = c
            emb = model.apply(variables, prev_tok[:, None], s,
                              method=UnifiedVoice.decode_embed)
            hidden, cache = model.apply(variables, emb, cache, pos,
                                        method=UnifiedVoice.gpt_with_cache)
            logits = model.apply(variables, hidden,
                                 method=UnifiedVoice.hidden_to_mel_logits)
            return (cache, s + 1, pos + 1), logits[:, 0, 0]

        _, ys = jax.lax.scan(step, (cache, s, pos), None, length=k)
        return ys

    def tfm(k):
        return lambda: transformer_only(variables, carry, k)
    print(f"[b] transformer-only  {diff_per_step(tfm, n):7.3f} ms/tok")

    # (b2) same, at different cache sizes: growth with t_max at fixed pos
    # means XLA is copying the cache instead of updating in place
    for mg in (200, 1200):
        st = ar_sampler.SamplerSettings(max_generate=mg)
        carry2, _, _ = ar_sampler._prefill(model, variables, prompt, rng,
                                           st, cache_dtype)
        cache2 = carry2[0]
        t_max2 = (cache2["k_tm"].shape[1] if "k_tm" in cache2
                  else cache2["k"].shape[2])

        def tfm2(k, _c=carry2):
            return lambda: transformer_only(variables, _c, k)
        print(f"[b2] transformer t_max={t_max2:5d} "
              f"{diff_per_step(tfm2, n):7.3f} ms/tok")

    # (c) sampling-only on random logits
    @functools.partial(jax.jit, static_argnums=(1,))
    def sampling_only(rng, k):
        seen = jnp.zeros((b, cfg.number_mel_codes), bool)

        def step(c, _):
            seen, rng = c
            rng, r1, r2 = jax.random.split(rng, 3)
            logits = jax.random.normal(r1, (b, cfg.number_mel_codes))
            tok = ar_sampler._warp_and_sample(settings, logits, seen, r2)
            seen = seen.at[jnp.arange(b), tok].set(True)
            return (seen, rng), tok

        _, toks = jax.lax.scan(step, (seen, rng), None, length=k)
        return toks

    def smp(k):
        return lambda: sampling_only(rng, k)
    print(f"[c] sampling-only     {diff_per_step(smp, n):7.3f} ms/tok")

    # (d) attention isolation: L sequential layers per step over the
    # production merged-layout cache (ops/attention.py), several chunk
    # sizes, plus a full-prefix masked read on the per-head layout
    L, H, Dh = cfg.layers, cfg.heads, cfg.model_dim // cfg.heads
    C = cfg.model_dim
    t_max = 1024
    ckm = jnp.zeros((L, b, t_max, C), jnp.bfloat16)
    cvm = jnp.zeros((L, b, t_max, C), jnp.bfloat16)
    ck = jnp.zeros((L, b, H, t_max, Dh), jnp.bfloat16)
    cv = jnp.zeros((L, b, H, t_max, Dh), jnp.bfloat16)
    q0 = jnp.zeros((b, H, 1, Dh), jnp.bfloat16)
    q0m = jnp.zeros((b, C), jnp.bfloat16)

    for pos in (128, 512, 1000):
        row = [f"[d] attn pos={pos:4d}"]
        for chunk in (256, 512, 1024):
            @functools.partial(jax.jit, static_argnums=(3, 4, 5))
            def attn_steps(q, ck, cv, k, _chunk, _pos):
                def step(acc, _):
                    for l in range(L):
                        acc = acc + chunked_decode_attention_merged(
                            q + acc, ck, cv, l, jnp.asarray(_pos), heads=H,
                            chunk=_chunk)
                    return acc, ()
                acc, _ = jax.lax.scan(step, jnp.zeros_like(q), None, length=k)
                return acc

            def att(k, _c=chunk, _p=pos, _f=attn_steps):
                return lambda: _f(q0m, ckm, cvm, k, _c, _p)
            row.append(f"chunk{chunk}={diff_per_step(att, n):6.3f}")

        @functools.partial(jax.jit, static_argnums=(3, 4))
        def attn_full(q, ck, cv, k, _pos):
            mask = (jnp.arange(t_max) <= _pos)[None, None, None, :]

            def step(acc, _):
                for l in range(L):
                    logits = jnp.einsum("bhqd,bhkd->bhqk",
                                        (q + acc).astype(jnp.float32),
                                        ck[l].astype(jnp.float32))
                    logits = jnp.where(mask, logits, -1e9)
                    p = jax.nn.softmax(logits, axis=-1)
                    acc = acc + jnp.einsum("bhqk,bhkd->bhqd", p,
                                           cv[l].astype(jnp.float32)
                                           ).astype(q.dtype)
                return acc, ()
            acc, _ = jax.lax.scan(step, jnp.zeros_like(q), None, length=k)
            return acc

        def attf(k, _p=pos, _f=attn_full):
            return lambda: _f(q0, ck, cv, k, _p)
        row.append(f"full={diff_per_step(attf, n):6.3f}")
        print("  ".join(row) + "  ms/tok")


if __name__ == "__main__":
    main()
