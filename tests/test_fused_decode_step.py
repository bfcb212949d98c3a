"""Fused whole-step decode kernel (ops/decode_step_pallas) vs the XLA stack."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.models.gpt2 import GPT2Config, GPT2Stack, init_kv_cache
from tortoise_tpu.ops.decode_step_pallas import (fused_decode_step,
                                                 prepare_stacked_params)

CFG = GPT2Config(n_layer=3, n_embd=256, n_head=4)
B, T_MAX, POS = 4, 128, 70


def _setup(cache_dtype):
    model = GPT2Stack(CFG, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (B, 1, CFG.n_embd), jnp.bfloat16)
    variables = model.init(rng, emb)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    cache = init_kv_cache(CFG, B, T_MAX, dtype=cache_dtype)
    # fill the prefix through the XLA path so both read identical history
    hist = jax.random.normal(jax.random.PRNGKey(1), (B, POS, CFG.n_embd),
                             jnp.bfloat16)
    _, cache = model.apply(variables, hist, cache=cache, cache_index=0)
    return model, variables, emb, cache


@pytest.mark.parametrize("cache_dtype", [jnp.bfloat16, jnp.int8])
def test_fused_step_matches_xla_stack(cache_dtype):
    model, variables, emb, cache = _setup(cache_dtype)
    hidden_ref, cache_ref = model.apply(variables, emb, cache=cache,
                                        cache_index=POS)

    stacked = prepare_stacked_params(variables["params"])
    y, k_rows, v_rows = fused_decode_step(stacked, emb[:, 0], cache, POS,
                                          heads=CFG.n_head, ck=32,
                                          interpret=True)
    # apply ln_f (the kernel returns the pre-ln_f residual stream)
    lnf = variables["params"]["ln_f"]
    x32 = y.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    hidden = ((x32 - mu) * jax.lax.rsqrt(var + CFG.ln_eps)
              * lnf["scale"].astype(jnp.float32)
              + lnf["bias"].astype(jnp.float32)).astype(jnp.bfloat16)

    ref = np.asarray(hidden_ref[:, 0], np.float32)
    got = np.asarray(hidden, np.float32)
    scale = np.abs(ref).max()
    # int8 mode: the kernel attends to the UNQUANTIZED current row (the XLA
    # path re-reads its own quantized row), so tolerance covers that delta
    tol = 0.08 * scale if cache_dtype == jnp.int8 else 0.03 * scale
    np.testing.assert_allclose(got, ref, atol=tol)

    # new k/v rows must match what the XLA path wrote (pre-quantization)
    if cache_dtype == jnp.bfloat16:
        for rows, name in ((k_rows, "k"), (v_rows, "v")):
            written = np.asarray(cache_ref[name][:, :, POS, :], np.float32)
            np.testing.assert_allclose(np.asarray(rows, np.float32), written,
                                       atol=2e-2 * max(np.abs(written).max(), 1))


def test_fused_step_empty_prefix():
    """pos=0: no cache chunks — only the current row attends to itself."""
    model, variables, emb, cache = _setup(jnp.bfloat16)
    cache0 = init_kv_cache(CFG, B, T_MAX, dtype=jnp.bfloat16)
    hidden_ref, _ = model.apply(variables, emb, cache=cache0, cache_index=0)
    stacked = prepare_stacked_params(variables["params"])
    y, _, _ = fused_decode_step(stacked, emb[:, 0], cache0, 0,
                                heads=CFG.n_head, ck=32, interpret=True)
    lnf = variables["params"]["ln_f"]
    x32 = y.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    hidden = ((x32 - mu) * jax.lax.rsqrt(var + CFG.ln_eps)
              * lnf["scale"].astype(jnp.float32) + lnf["bias"].astype(jnp.float32))
    ref = np.asarray(hidden_ref[:, 0], np.float32)
    np.testing.assert_allclose(np.asarray(hidden), ref,
                               atol=0.03 * np.abs(ref).max())


def test_sampler_fused_step_greedy_matches_xla():
    """End-to-end sampler with settings.fused_step: the greedy token stream
    matches the XLA layer-scan path (bf16 cache), mirroring the int8 tests'
    greedy-agreement contract."""
    from tortoise_tpu.models.ar_sampler import SamplerSettings, sample_speech
    from tortoise_tpu.models.autoregressive import (UnifiedVoice,
                                                    UnifiedVoiceConfig,
                                                    init_unified_voice)

    cfg = UnifiedVoiceConfig(layers=2, model_dim=256, heads=4,
                             max_text_tokens=40, max_mel_tokens=48)
    model = UnifiedVoice(cfg, dtype=jnp.bfloat16)
    variables = init_unified_voice(model, 0)
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32 else a,
        variables)
    cond = jax.random.normal(jax.random.PRNGKey(2), (1, cfg.model_dim))
    text = jnp.asarray([[10, 20, 30, 0]], jnp.int32)
    rng = jax.random.PRNGKey(5)

    base = SamplerSettings(do_sample=False, max_generate=24)
    codes_ref, _ = sample_speech(model, variables, cond, text, rng, 2,
                                 settings=base)
    codes_fused, _ = sample_speech(
        model, variables, cond, text, rng, 2,
        settings=SamplerSettings(do_sample=False, max_generate=24,
                                 fused_step=True))
    agree = (np.asarray(codes_ref) == np.asarray(codes_fused)).mean()
    assert agree >= 0.9, f"greedy agreement {agree}"


def test_fused_step_int8_weights_matches_quantdense():
    """int8-WEIGHT variant: the kernel streams the QuantDense int8 kernels
    directly (half the weight bytes) and applies qscale to the f32
    accumulator + f32 bias, matching gpt2.QuantDense exactly."""
    cfg = GPT2Config(n_layer=3, n_embd=256, n_head=4, quant_weights=True)
    model = GPT2Stack(cfg, dtype=jnp.bfloat16)
    rng = jax.random.PRNGKey(0)
    emb = jax.random.normal(rng, (B, 1, cfg.n_embd), jnp.bfloat16)
    variables = model.init(rng, emb)
    # keep int8 kernels/f32 qscales; cast only the float leaves the XLA
    # path would also run in bf16
    variables = jax.tree_util.tree_map(
        lambda a: a.astype(jnp.bfloat16) if a.dtype == jnp.float32
        and a.ndim <= 1 else a, variables)
    cache = init_kv_cache(cfg, B, T_MAX, dtype=jnp.bfloat16)
    hist = jax.random.normal(jax.random.PRNGKey(1), (B, POS, cfg.n_embd),
                             jnp.bfloat16)
    _, cache = model.apply(variables, hist, cache=cache, cache_index=0)
    hidden_ref, cache_ref = model.apply(variables, emb, cache=cache,
                                        cache_index=POS)

    stacked = prepare_stacked_params(variables["params"])
    assert stacked["wqkv"].dtype == jnp.int8 and "sqkv" in stacked
    y, k_rows, v_rows = fused_decode_step(stacked, emb[:, 0], cache, POS,
                                          heads=cfg.n_head, ck=32,
                                          interpret=True)
    lnf = variables["params"]["ln_f"]
    x32 = y.astype(jnp.float32)
    mu = x32.mean(-1, keepdims=True)
    var = ((x32 - mu) ** 2).mean(-1, keepdims=True)
    hidden = ((x32 - mu) * jax.lax.rsqrt(var + cfg.ln_eps)
              * lnf["scale"].astype(jnp.float32)
              + lnf["bias"].astype(jnp.float32))
    ref = np.asarray(hidden_ref[:, 0], np.float32)
    got = np.asarray(hidden, np.float32)
    np.testing.assert_allclose(got, ref, atol=0.03 * np.abs(ref).max())
    for rows, name in ((k_rows, "k"), (v_rows, "v")):
        written = np.asarray(cache_ref[name][:, :, POS, :], np.float32)
        np.testing.assert_allclose(np.asarray(rows, np.float32), written,
                                   atol=2e-2 * max(np.abs(written).max(), 1))
