"""Weight-only int8 GPT kernels (gpt2.QuantDense + weights.quantize_gpt_weights).

Small-batch AR decode is weight-bandwidth-bound, so the framework offers
per-output-channel symmetric int8 kernels for the GPT block denses (the
weight-side twin of the int8 KV cache; reference counterpart: DeepSpeed's
quantized kernel injection, autoregressive.py:379-392). Lossy by design —
the contract is bounded error plus greedy-decode agreement, mirroring
tests/test_int8_kv_cache.py.
"""
import dataclasses

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from tortoise_tpu import weights as weights_lib
from tortoise_tpu.models.ar_sampler import SamplerSettings, sample_speech
from tortoise_tpu.models.autoregressive import (UnifiedVoice, UnifiedVoiceConfig,
                                                init_unified_voice)
from tortoise_tpu.models.gpt2 import GPT2Config, GPT2Stack


def small_cfg(**kw):
    return UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                              max_text_tokens=40, max_mel_tokens=80,
                              number_text_tokens=32, number_mel_codes=64,
                              start_mel_token=60, stop_mel_token=61, **kw)


def test_quantize_gpt_weights_structure_and_roundtrip():
    """Converted params drop into the quant_weights=True module tree; the
    dequantized product reconstructs the original kernel within one step."""
    cfg = GPT2Config(n_layer=2, n_embd=64, n_head=2)
    stack = GPT2Stack(cfg, dtype=jnp.float32)
    emb = jnp.zeros((1, 3, 64))
    params = stack.init(jax.random.PRNGKey(0), emb)["params"]

    qparams = weights_lib.quantize_gpt_weights({"gpt": params})["gpt"]
    sub = qparams["h_scan"]["block"]["attn"]["c_attn"]
    assert sub["kernel"].dtype == np.int8
    assert sub["qscale"].shape == (2, 3 * 64)      # (L, out)
    orig = np.asarray(params["h_scan"]["block"]["attn"]["c_attn"]["kernel"])
    recon = sub["kernel"].astype(np.float32) * sub["qscale"][:, None, :]
    step = np.abs(orig).max(axis=1, keepdims=True) / 127.0
    assert np.abs(recon - orig).max() <= (step + 1e-9).max() * 0.51

    # idempotent: already-int8 kernels pass through untouched
    again = weights_lib.quantize_gpt_weights({"gpt": qparams})["gpt"]
    assert again["h_scan"]["block"]["attn"]["c_attn"]["kernel"].dtype == np.int8


def test_quant_stack_matches_full_precision():
    """Same underlying weights: the quantized stack's output stays within a
    small relative error of the f32 stack (prefill + one cached step)."""
    cfg = GPT2Config(n_layer=2, n_embd=128, n_head=4)
    qcfg = dataclasses.replace(cfg, quant_weights=True)
    stack = GPT2Stack(cfg, dtype=jnp.float32)
    qstack = GPT2Stack(qcfg, dtype=jnp.float32)
    emb = jax.random.normal(jax.random.PRNGKey(0), (2, 7, 128))
    params = stack.init(jax.random.PRNGKey(1), emb)["params"]
    qparams = weights_lib.quantize_gpt_weights({"gpt": params})["gpt"]

    y, _ = stack.apply({"params": params}, emb)
    yq, _ = qstack.apply({"params": qparams}, emb)
    rel = np.abs(np.asarray(y) - np.asarray(yq)).mean() / (
        np.abs(np.asarray(y)).mean() + 1e-9)
    assert rel < 0.02, f"int8 weights mean relative error {rel:.4f} too high"


@pytest.mark.slow
def test_quant_greedy_decode_matches_full():
    """Greedy decode: token streams agree over a prefix between int8 and
    full-precision weights on a small random model."""
    cfg = small_cfg()
    qcfg = small_cfg(quant_weights=True)
    model = UnifiedVoice(cfg, dtype=jnp.float32)
    variables = init_unified_voice(model, 0)
    qmodel = UnifiedVoice(qcfg, dtype=jnp.float32)
    qvars = {"params": weights_lib.quantize_gpt_weights(
        variables["params"] if "params" in variables else variables)}

    cond = jax.random.normal(jax.random.PRNGKey(3), (1, cfg.model_dim))
    text = jnp.asarray(np.random.RandomState(0).randint(1, 30, (1, 12)), jnp.int32)
    settings = SamplerSettings(do_sample=False, max_generate=24,
                               repetition_penalty=2.0, emit_latents=False)

    toks = {}
    for name, m, v in [("full", model, variables), ("int8", qmodel, qvars)]:
        codes, _ = sample_speech(m, v, cond, text, jax.random.PRNGKey(4),
                                 num_samples=2, settings=settings)
        toks[name] = np.asarray(codes)
    agree = (toks["full"][:, :12] == toks["int8"][:, :12]).mean()
    assert agree >= 0.9, f"greedy decode agreement {agree:.2f} below 0.9"


def test_quant_random_init_is_sane():
    """quant_weights=True models initialize directly to int8 kernels with
    lecun-magnitude scales — random-weight runs produce finite, unit-scale
    activations (this covers the host-side init fill path)."""
    cfg = small_cfg(quant_weights=True)
    model = UnifiedVoice(cfg, dtype=jnp.float32)
    variables = init_unified_voice(model, 0, host_side=True)
    p = variables["params"] if "params" in variables else variables
    sub = p["gpt"]["h_scan"]["block"]["attn"]["c_attn"]
    assert np.asarray(sub["kernel"]).dtype == np.int8
    assert np.abs(np.asarray(sub["kernel"])).max() > 50   # not all zeros
    cond = jax.random.normal(jax.random.PRNGKey(0), (1, cfg.model_dim))
    text = jnp.asarray([[1, 2, 3, 4]], jnp.int32)
    codes, _ = sample_speech(model, {"params": p}, cond, text,
                             jax.random.PRNGKey(1), num_samples=1,
                             settings=SamplerSettings(max_generate=8,
                                                      emit_latents=False))
    assert np.asarray(codes).shape == (1, 8)


def test_quantized_params_checkpoint_roundtrip(tmp_path):
    """int8 QuantDense params survive the npz and safetensors checkpoint
    formats bit-for-bit (dtype preserved, no float round-trip)."""
    cfg = GPT2Config(n_layer=2, n_embd=64, n_head=2)
    stack = GPT2Stack(cfg, dtype=jnp.float32)
    params = stack.init(jax.random.PRNGKey(0), jnp.zeros((1, 3, 64)))["params"]
    qparams = weights_lib.quantize_gpt_weights({"gpt": params})

    p1 = str(tmp_path / "q.npz")
    weights_lib.save_params(p1, qparams)
    back = weights_lib.load_params(p1)
    sub = back["gpt"]["h_scan"]["block"]["attn"]["c_attn"]
    assert np.asarray(sub["kernel"]).dtype == np.int8
    np.testing.assert_array_equal(
        np.asarray(sub["kernel"]),
        np.asarray(qparams["gpt"]["h_scan"]["block"]["attn"]["c_attn"]["kernel"]))

    p2 = str(tmp_path / "q.safetensors")
    weights_lib.save_params_safetensors(p2, qparams)
    back2 = weights_lib.load_params_safetensors(p2)
    sub2 = back2["gpt"]["h_scan"]["block"]["attn"]["c_attn"]
    assert np.asarray(sub2["kernel"]).dtype == np.int8
    np.testing.assert_array_equal(np.asarray(sub2["kernel"]),
                                  np.asarray(sub["kernel"]))
