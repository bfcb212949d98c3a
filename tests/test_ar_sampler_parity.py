"""Decode-loop parity: jitted scan sampler vs the reference model.

The oracle is a manual torch greedy loop over the reference's modules that
implements the reference's documented incremental-decode semantics (full
prompt prefill; the s-th generated token carries mel position s+2 — see
GPT2InferenceModel.forward, reference autoregressive.py:125-149; repetition
penalty over the whole sequence including the dummy prompt ids {1, 8192}).
Modern transformers' ``generate`` changed its cache/prefill internals since
the reference was written, so it is not used as the oracle; instead the
oracle re-runs the full embedding sequence (causality makes that equivalent
to incremental decode with a KV cache).
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import has_reference, load_ref_module

from tortoise_tpu.convert.torch_import import unified_voice_params
from tortoise_tpu.models.ar_sampler import SamplerSettings, sample_speech
from tortoise_tpu.models.autoregressive import UnifiedVoice, UnifiedVoiceConfig

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")

LAYERS, DIM, HEADS = 2, 128, 4


@pytest.fixture(scope="module")
def models():
    import torch

    ref_ar = load_ref_module("tortoise.models.autoregressive")
    torch.manual_seed(0)
    ref = ref_ar.UnifiedVoice(
        layers=LAYERS, model_dim=DIM, heads=HEADS, max_text_tokens=30,
        max_mel_tokens=60, max_conditioning_inputs=2, number_text_tokens=255,
        start_text_token=255, checkpointing=False).eval()
    cfg = UnifiedVoiceConfig(layers=LAYERS, model_dim=DIM, heads=HEADS,
                             max_text_tokens=30, max_mel_tokens=60,
                             max_conditioning_inputs=2)
    ours = UnifiedVoice(cfg)
    params = unified_voice_params(ref.state_dict(), layers=LAYERS)
    return ref, ours, {"params": params}


def _oracle_greedy(ref, cond, text_padded, max_gen, repetition_penalty=2.0):
    """Reference-semantics greedy decode in torch, returning (codes, logits)."""
    import torch
    import torch.nn.functional as F

    with torch.no_grad():
        ti = F.pad(torch.from_numpy(text_padded), (0, 1), value=0)
        ti = F.pad(ti, (1, 0), value=ref.start_text_token)
        text_emb = ref.text_embedding(ti) + ref.text_pos_embedding(ti)
        conds = torch.from_numpy(cond).unsqueeze(1)
        start = torch.full((1, 1), ref.start_mel_token, dtype=torch.long)
        start_emb = ref.mel_embedding(start) + ref.mel_pos_embedding.emb(
            torch.tensor([[0]]))
        embs = [conds, text_emb, start_emb]

        seen = torch.zeros(8194, dtype=torch.bool)
        seen[1] = True
        seen[ref.start_mel_token] = True
        codes, step_logits = [], []
        for s in range(max_gen):
            emb = torch.cat(embs, dim=1)
            hidden = ref.gpt(inputs_embeds=emb, return_dict=True).last_hidden_state
            logits = ref.mel_head(ref.final_norm(hidden[:, -1]))[0]
            logits = torch.where(seen, torch.where(logits < 0,
                                                   logits * repetition_penalty,
                                                   logits / repetition_penalty), logits)
            tok = int(logits.argmax())
            step_logits.append(logits.numpy().copy())
            codes.append(tok)
            seen[tok] = True
            if tok == ref.stop_mel_token:
                break
            tok_t = torch.full((1, 1), tok, dtype=torch.long)
            emb_next = ref.mel_embedding(tok_t) + ref.mel_pos_embedding.emb(
                torch.tensor([[s + 2]]))
            embs.append(emb_next)
    return np.array(codes), np.stack(step_logits)


def test_greedy_decode_matches_oracle(models):
    ref, ours, variables = models
    rng = np.random.default_rng(7)
    cond = rng.standard_normal((1, DIM)).astype(np.float32)
    text = rng.integers(3, 250, (1, 10)).astype(np.int64)
    text_padded = np.pad(text, ((0, 0), (0, 1)))  # api-level pad (api.py:391)

    max_gen = 24
    ref_codes, _ = _oracle_greedy(ref, cond, text_padded, max_gen)

    settings = SamplerSettings(do_sample=False, repetition_penalty=2.0,
                               max_generate=max_gen)
    codes, latents = sample_speech(
        ours, variables, jnp.asarray(cond), jnp.asarray(text_padded.astype(np.int32)),
        jax.random.PRNGKey(0), num_samples=1, settings=settings,
        cache_dtype=jnp.float32)
    codes = np.asarray(codes)[0]

    n = len(ref_codes)
    np.testing.assert_array_equal(codes[:n], ref_codes)
    if n < max_gen and ref_codes[-1] == 8193:
        assert (codes[n:] == 8193).all()
    assert latents.shape == (1, max_gen, DIM)


def test_greedy_batch_consistent(models):
    _, ours, variables = models
    rng = np.random.default_rng(8)
    cond = rng.standard_normal((1, DIM)).astype(np.float32)
    text = np.pad(rng.integers(3, 250, (1, 8)).astype(np.int32), ((0, 0), (0, 1)))
    settings = SamplerSettings(do_sample=False, max_generate=12)
    codes, _ = sample_speech(ours, variables, jnp.asarray(cond), jnp.asarray(text),
                             jax.random.PRNGKey(0), num_samples=4, settings=settings,
                             cache_dtype=jnp.float32)
    codes = np.asarray(codes)
    # greedy decoding is deterministic: all batch rows identical
    assert (codes == codes[0]).all()


def test_emit_latents_flag_leaves_codes_bitwise_identical(models):
    _, ours, variables = models
    rng = np.random.default_rng(12)
    cond = rng.standard_normal((1, DIM)).astype(np.float32)
    text = np.pad(rng.integers(3, 250, (1, 8)).astype(np.int32), ((0, 0), (0, 1)))
    base = dict(do_sample=True, max_generate=24, temperature=1.2)
    out = {}
    for emit in (True, False):
        settings = SamplerSettings(emit_latents=emit, **base)
        codes, lats = sample_speech(ours, variables, jnp.asarray(cond),
                                    jnp.asarray(text), jax.random.PRNGKey(5),
                                    num_samples=2, settings=settings,
                                    cache_dtype=jnp.float32)
        out[emit] = np.asarray(codes)
        assert (lats is None) == (not emit)
    np.testing.assert_array_equal(out[True], out[False])


def test_sampling_respects_stop_latching(models):
    _, ours, variables = models
    rng = np.random.default_rng(9)
    cond = rng.standard_normal((1, DIM)).astype(np.float32)
    text = np.pad(rng.integers(3, 250, (1, 8)).astype(np.int32), ((0, 0), (0, 1)))
    settings = SamplerSettings(do_sample=True, max_generate=40, temperature=1.5)
    codes, _ = sample_speech(ours, variables, jnp.asarray(cond), jnp.asarray(text),
                             jax.random.PRNGKey(3), num_samples=8, settings=settings,
                             cache_dtype=jnp.float32)
    codes = np.asarray(codes)
    for row in codes:
        stops = np.where(row == 8193)[0]
        if len(stops):
            assert (row[stops[0]:] == 8193).all()


def test_fused_sampler_distribution_matches_chain():
    """sample_topk_topp must match the process_logits+categorical chain in
    distribution (not bitwise — RNG consumption differs)."""
    import jax
    import jax.numpy as jnp

    from tortoise_tpu.ops import sampling

    rng = np.random.default_rng(0)
    vocab = 16
    logits = jnp.asarray(rng.standard_normal((1, vocab)) * 2, jnp.float32)
    seen = jnp.zeros((1, vocab), bool).at[0, 3].set(True)
    kw = dict(repetition_penalty=2.0, temperature=0.8, top_k=4, top_p=0.7)

    n = 20000
    keys = jax.random.split(jax.random.PRNGKey(1), n)
    fused = jax.vmap(lambda k: sampling.sample_topk_topp(k, logits, seen, **kw)[0])(keys)
    warped = sampling.process_logits(logits, seen, typical_mass=None, **kw)
    ref = jax.vmap(lambda k: jax.random.categorical(k, warped, axis=-1)[0])(
        jax.random.split(jax.random.PRNGKey(2), n))

    f_counts = np.bincount(np.asarray(fused), minlength=vocab) / n
    r_counts = np.bincount(np.asarray(ref), minlength=vocab) / n
    # same support
    np.testing.assert_array_equal(f_counts > 0, r_counts > 0)
    np.testing.assert_allclose(f_counts, r_counts, atol=0.015)
