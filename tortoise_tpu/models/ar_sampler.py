"""Autoregressive mel-token sampler: jitted prefill + ``lax.scan`` decode.

TPU-native replacement for the reference's HF ``generate`` call with
DeepSpeed kernel injection (reference: tortoise/models/autoregressive.py:
535-563 + GPT2InferenceModel :35-201 + api.py:407-442). One compiled
program samples a whole candidate batch: prompt prefill populates a
preallocated KV cache, then a scan decodes up to ``max_generate`` tokens with
exact HF sampling semantics (repetition penalty over the full sequence
including the prompt's fake tokens, temperature/top-k/top-p warpers,
stop-token latching and stop-padding).

Reference quirks intentionally kept for checkpoint parity:
* the s-th generated token enters with mel position s+2 — position 1 is
  never used (GPT2InferenceModel.forward, reference :145-149);
* the repetition penalty "seen" set starts with {1, start_mel} because the
  HF prompt is a dummy tensor filled with 1s (reference :546-548).
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Any

import jax
import jax.numpy as jnp

from tortoise_tpu.models.autoregressive import UnifiedVoice
from tortoise_tpu.models.gpt2 import init_kv_cache
from tortoise_tpu.ops import sampling


@dataclasses.dataclass(frozen=True)
class SamplerSettings:
    temperature: float = 0.8
    top_k: int = 50
    top_p: float = 0.8
    repetition_penalty: float = 2.0
    typical_mass: float | None = None
    max_generate: int = 500
    do_sample: bool = True


def sample_speech(model: UnifiedVoice, variables: dict, cond_latent: jnp.ndarray,
                  text_tokens: jnp.ndarray, rng: jax.Array, num_samples: int,
                  settings: SamplerSettings = SamplerSettings(),
                  cache_dtype=jnp.bfloat16, batch_sharding=None):
    """Sample ``num_samples`` candidate mel-code sequences.

    cond_latent: (1, D) or (B, D); text_tokens: (1, T) int32 with the
    api-level stop pad. Returns (codes (B, max_generate) int32,
    latents (B, max_generate, D) float32) — latents are the final_norm'd
    hidden states aligned with each *generated* token, the stream the fast
    path feeds to HiFi-GAN. Positions after the stop token hold the stop
    token / the last valid latent.
    """
    cfg = model.config

    prompt = model.apply(variables, cond_latent, text_tokens,
                         method=UnifiedVoice.compute_prompt)  # (b0, P, D)
    if prompt.shape[0] != num_samples:
        prompt = jnp.broadcast_to(prompt, (num_samples,) + prompt.shape[1:])
    if batch_sharding is not None:
        # Shard the candidate batch (SURVEY §2.5: the workhorse parallelism);
        # GSPMD propagates the sharding through the whole decode scan.
        prompt = jax.device_put(prompt, batch_sharding)
    return _decode(model, variables, prompt, rng, settings, cache_dtype)


@functools.partial(jax.jit, static_argnums=(0, 4, 5))
def _decode(model, variables, prompt, rng, settings: SamplerSettings, cache_dtype):
    cfg = model.config
    b, p_len, d = prompt.shape
    max_gen = settings.max_generate
    # Cache padded to a 256 multiple so the flash-decode chunking divides it.
    cache_len = -(-(p_len + max_gen) // 256) * 256
    cache = init_kv_cache(cfg.gpt_config, b, cache_len, dtype=cache_dtype)

    # --- prefill ---------------------------------------------------------
    hidden, cache = model.apply(variables, prompt, cache, 0,
                                method=UnifiedVoice.gpt_with_cache)
    last_hidden = hidden[:, -1]
    logits0 = model.apply(variables, last_hidden[:, None],
                          method=UnifiedVoice.hidden_to_mel_logits)[:, 0]

    # Repetition-penalty "seen" set: HF builds the prompt from a tensor of 1s
    # with a trailing start_mel token, so both ids are penalized throughout.
    seen0 = jnp.zeros((b, cfg.number_mel_codes), bool)
    seen0 = seen0.at[:, 1].set(True).at[:, cfg.start_mel_token].set(True)

    def warp_and_sample(logits, seen, step_rng):
        warped = sampling.process_logits(
            logits, seen,
            repetition_penalty=settings.repetition_penalty,
            temperature=settings.temperature if settings.do_sample else 1.0,
            top_k=settings.top_k if settings.do_sample else 0,
            top_p=settings.top_p if settings.do_sample else 1.0,
            typical_mass=settings.typical_mass)
        if settings.do_sample:
            return jax.random.categorical(step_rng, warped, axis=-1)
        return jnp.argmax(warped, axis=-1)

    rng, r0 = jax.random.split(rng)
    tok0 = warp_and_sample(logits0, seen0, r0).astype(jnp.int32)
    finished0 = tok0 == cfg.stop_mel_token
    tok0 = jnp.where(finished0, cfg.stop_mel_token, tok0)
    seen0 = seen0.at[jnp.arange(b), tok0].set(True)
    latent0 = model.apply(variables, last_hidden,
                          method=UnifiedVoice.hidden_to_latent)

    # --- decode scan ------------------------------------------------------
    def step(carry, s):
        cache, prev_tok, seen, finished, rng = carry
        emb = model.apply(variables, prev_tok[:, None], s,
                          method=UnifiedVoice.decode_embed)
        hidden, cache = model.apply(variables, emb, cache, p_len + s,
                                    method=UnifiedVoice.gpt_with_cache)
        h = hidden[:, 0]
        logits = model.apply(variables, h[:, None],
                             method=UnifiedVoice.hidden_to_mel_logits)[:, 0]
        rng, r = jax.random.split(rng)
        tok = warp_and_sample(logits, seen, r).astype(jnp.int32)
        tok = jnp.where(finished, cfg.stop_mel_token, tok)
        finished = finished | (tok == cfg.stop_mel_token)
        seen = seen.at[jnp.arange(seen.shape[0]), tok].set(True)
        latent = model.apply(variables, h, method=UnifiedVoice.hidden_to_latent)
        return (cache, tok, seen, finished, rng), (tok, latent)

    carry0 = (cache, tok0, seen0, finished0, rng)
    _, (toks, latents) = jax.lax.scan(step, carry0, jnp.arange(max_gen - 1))

    codes = jnp.concatenate([tok0[:, None], jnp.swapaxes(toks, 0, 1)], axis=1)
    lat = jnp.concatenate([latent0[:, None], jnp.swapaxes(latents, 0, 1)], axis=1)
    return codes, lat
