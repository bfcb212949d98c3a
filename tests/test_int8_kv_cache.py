"""int8 KV cache: quantization error bounds + decode agreement vs bf16.

The quantized cache (models/gpt2.init_kv_cache(dtype=jnp.int8)) stores int8
values with per-(layer, batch, head, position) float32 scales and dequantizes
in the flash-decode chunk reads (ops/attention.py). It is a lossy
speed/memory trade (~0.53x the bytes of bf16), so the contract tested here
is bounded error, not bitwise parity:

* the per-step attention output stays within ~1% relative error of the
  full-precision cache;
* a greedy decode produces (near-)identical token streams on a small model.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tortoise_tpu.models.ar_sampler import SamplerSettings, sample_speech
from tortoise_tpu.models.autoregressive import (UnifiedVoice, UnifiedVoiceConfig,
                                                init_unified_voice)
from tortoise_tpu.models.gpt2 import GPT2Config, GPT2Stack, init_kv_cache


def small_cfg():
    return UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                              max_text_tokens=40, max_mel_tokens=80,
                              number_text_tokens=32, number_mel_codes=64,
                              start_mel_token=60, stop_mel_token=61)


@pytest.mark.slow
def test_int8_cache_attention_error_bound():
    """One cached forward (prefill + a decode step) stays within tolerance of
    the float32 cache on random activations."""
    cfg = GPT2Config(n_layer=2, n_embd=128, n_head=4)
    stack = GPT2Stack(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (2, 7, 128))
    variables = stack.init(jax.random.PRNGKey(1), emb)

    outs = {}
    for name, dt in [("f32", jnp.float32), ("int8", jnp.int8)]:
        cache = init_kv_cache(cfg, 2, 256, dtype=dt)
        y, cache = stack.apply(variables, emb, cache=cache, cache_index=0)
        step = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 128))
        y1, _ = stack.apply(variables, step, cache=cache, cache_index=7)
        outs[name] = (np.asarray(y), np.asarray(y1))

    for a, b in zip(outs["f32"], outs["int8"]):
        denom = np.abs(a).mean() + 1e-9
        rel = np.abs(a - b).mean() / denom
        assert rel < 0.01, f"int8 cache mean relative error {rel:.4f} too high"


def test_int8_cache_structure_and_dtypes():
    cfg = GPT2Config(n_layer=3, n_embd=64, n_head=2)
    cache = init_kv_cache(cfg, 4, 512, dtype=jnp.int8)
    assert cache["k"].dtype == jnp.int8 and cache["v"].dtype == jnp.int8
    assert cache["k"].shape == (3, 4, 512, 64)      # merged (L, B, T, C)
    assert cache["k_scale"].shape == (3, 4, 2, 512)  # (L, B, H, T) T-minor
    assert cache["k_scale"].dtype == jnp.float32
    # bf16 cache keeps the two-buffer layout (no scale overhead)
    assert set(init_kv_cache(cfg, 4, 512).keys()) == {"k", "v"}


@pytest.mark.slow
def test_int8_greedy_decode_matches_bf16():
    """Greedy (do_sample=False) decode: token streams agree between the int8
    and bf16 caches on a small random model. Quantization noise may flip a
    late low-margin argmax, so require agreement over a prefix rather than
    the full stream."""
    cfg = small_cfg()
    model = UnifiedVoice(cfg, dtype=jnp.float32)
    variables = init_unified_voice(model, 0)
    cond = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.model_dim))
    text = jnp.asarray(np.random.RandomState(0).randint(1, 30, (1, 12)), jnp.int32)
    settings = SamplerSettings(do_sample=False, max_generate=24,
                               repetition_penalty=2.0, emit_latents=False)

    toks = {}
    for name, dt in [("bf16", jnp.bfloat16), ("int8", jnp.int8)]:
        codes, _ = sample_speech(model, variables, cond, text,
                                 jax.random.PRNGKey(4), num_samples=2,
                                 settings=settings, cache_dtype=dt)
        toks[name] = np.asarray(codes)

    agree = (toks["bf16"][:, :12] == toks["int8"][:, :12]).mean()
    assert agree >= 0.9, f"greedy decode agreement {agree:.2f} below 0.9"


def test_pick_batch_size_doubles_for_int8():
    from tortoise_tpu.api import pick_best_batch_size_for_device

    class FakeDev:
        device_kind = "TPU v5 lite"

        def memory_stats(self):
            return None

    assert pick_best_batch_size_for_device(FakeDev()) == 64
    assert pick_best_batch_size_for_device(FakeDev(), kv_cache_dtype="int8") == 128


@pytest.mark.slow
def test_t_major_cache_matches_b_major():
    """The T-major candidate-batch cache layout (keys k_tm/v_tm, write as a
    contiguous slab) produces the same decode outputs as the B-major layout
    on the same model/inputs (prefill + cached steps), bf16 and int8."""
    from tortoise_tpu.models.gpt2 import GPT2Stack

    cfg = GPT2Config(n_layer=2, n_embd=128, n_head=4)
    stack = GPT2Stack(cfg, dtype=jnp.float32)
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (2, 7, 128))
    step_in = jax.random.normal(jax.random.PRNGKey(2), (2, 1, 128))
    variables = stack.init(jax.random.PRNGKey(1), emb)

    for dt in (jnp.float32, jnp.int8):
        outs = {}
        for tm in (False, True):
            cache = init_kv_cache(cfg, 2, 256, dtype=dt, t_major=tm)
            y0, cache = stack.apply(variables, emb, cache=cache, cache_index=0)
            y1, cache = stack.apply(variables, step_in, cache=cache, cache_index=7)
            y2, _ = stack.apply(variables, step_in, cache=cache, cache_index=8)
            outs[tm] = (np.asarray(y0), np.asarray(y1), np.asarray(y2))
        for a, b in zip(outs[False], outs[True]):
            np.testing.assert_allclose(a, b, rtol=2e-4, atol=2e-4)


def test_layout_selection():
    cfg = GPT2Config(n_layer=2, n_embd=64, n_head=2)
    default = init_kv_cache(cfg, 32, 256)
    tm = init_kv_cache(cfg, 32, 256, t_major=True)
    # B-major is the production default (T-major measured no composed win)
    assert set(default) == {"k", "v"} and default["k"].shape == (2, 32, 256, 64)
    assert set(tm) == {"k_tm", "v_tm"} and tm["k_tm"].shape == (2, 256, 32, 64)
