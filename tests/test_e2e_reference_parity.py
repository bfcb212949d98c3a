"""Composed end-to-end parity: reference ``TextToSpeech.tts()`` vs ours.

Runs the reference's FULL quality pipeline (reference tortoise/api.py:334-597
— conditioning latents -> AR sampling -> fix_autoregressive_output -> CLVP
-> latent re-extraction -> calm-token trim -> timestep_independent ->
p-sample loop -> UnivNet vocode) next to this repo's ``TextToSpeech.tts()``
with the SAME converted tiny-config weights, and asserts the AR codes agree
exactly and the mel/wav outputs agree within fp tolerance. Per-module parity
tests cannot see composition bugs (sign/orientation/off-by-one between
stages); this one can.

Determinism choices (both sides run the same public API):
* ``top_p=1e-8`` makes nucleus sampling keep only the argmax token, so the
  "sampled" decode is greedy irrespective of either side's RNG (the
  reference's ``tts`` hard-codes ``do_sample=True``);
* ``diffusion_iterations=2`` + ``diffusion_temperature=0`` + zeroed
  per-step noise: x_T = 0 (the initial noise is scaled by the temperature),
  the reference's t=1 noise draw is zeroed by monkeypatching
  ``torch.randn_like`` for the duration of the call, and our p-sample loop
  runs with ``SamplerConfig(noise_scale=0)`` — both sides then follow the
  deterministic mean trajectory while still exercising
  timestep_independent, the cond-free CFG blend, p_mean_variance over two
  real steps, and the denormalization. (1 step is not an option: the
  reference's ``GaussianDiffusion.__init__`` indexes
  ``posterior_variance[1]``, reference diffusion.py:240.)
* the UnivNet z-noise is drawn once host-side and injected into BOTH
  pipelines (the reference's ``vocoder.inference`` draws it internally).

The reference's ``inference_speech`` is replaced with a torch decode loop
implementing the reference's own documented semantics (prompt prefill, mel
position s+2 for the s-th generated token — reference autoregressive.py:
125-149 — penalty "seen" set seeded with the dummy-prompt ids {1, 8192}):
the installed modern ``transformers``' ``generate`` has drifted from the
cache/position internals the vendored GPT2InferenceModel was written
against and no longer reproduces the reference's decode (verified: its
tokens disagree with a manual forward pass of the reference's own modules),
so it cannot serve as an oracle. Everything else in ``tts()`` runs the
genuine reference code.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ref_loader import has_reference, load_ref_module

pytestmark = [pytest.mark.slow,
              pytest.mark.skipif(not has_reference(),
                                 reason="reference not mounted")]

DIM, LAYERS, HEADS = 128, 2, 4
MAX_TEXT, MAX_MEL_POS = 80, 80
MAX_MEL = 40  # tts(max_mel_tokens=...)
TEXT = "The quick brown fox jumps over the lazy dog."
VOC_SCALE = 0.15  # contractive vocoder weights (random LVC gating is chaotic)


def _reference_greedy_inference_speech(ref_ar, top_p_guard):
    """Reference-semantics decode loop standing in for HF ``generate``."""
    import torch
    import torch.nn.functional as F

    def inference_speech(speech_conditioning_latent, text_inputs, **kwargs):
        assert kwargs.get("top_p", 1.0) <= top_p_guard, (
            "this oracle is argmax-only; call tts with top_p~=0")
        rep = kwargs.get("repetition_penalty", 2.0)
        max_gen = kwargs.get("max_generate_length") or MAX_MEL
        assert kwargs.get("num_return_sequences", 1) == 1
        with torch.no_grad():
            ti = F.pad(text_inputs, (0, 1), value=0)
            ti = F.pad(ti, (1, 0), value=ref_ar.start_text_token)
            text_emb = ref_ar.text_embedding(ti) + ref_ar.text_pos_embedding(ti)
            conds = speech_conditioning_latent.unsqueeze(1)
            start = torch.full((1, 1), ref_ar.start_mel_token, dtype=torch.long)
            embs = [conds, text_emb,
                    ref_ar.mel_embedding(start)
                    + ref_ar.mel_pos_embedding.emb(torch.tensor([[0]]))]
            seen = torch.zeros(ref_ar.number_mel_codes, dtype=torch.bool)
            seen[1] = True
            seen[ref_ar.start_mel_token] = True
            codes = []
            for s in range(max_gen):
                emb = torch.cat(embs, dim=1)
                hidden = ref_ar.gpt(inputs_embeds=emb,
                                    return_dict=True).last_hidden_state
                logits = ref_ar.mel_head(ref_ar.final_norm(hidden[:, -1]))[0]
                logits = torch.where(
                    seen, torch.where(logits < 0, logits * rep, logits / rep),
                    logits)
                tok = int(logits.argmax())
                codes.append(tok)
                seen[tok] = True
                if tok == ref_ar.stop_mel_token:
                    break
                tok_t = torch.full((1, 1), tok, dtype=torch.long)
                embs.append(ref_ar.mel_embedding(tok_t)
                            + ref_ar.mel_pos_embedding.emb(
                                torch.tensor([[s + 2]])))
        return torch.tensor(codes, dtype=torch.long).unsqueeze(0)

    return inference_speech


@pytest.fixture(scope="module")
def composed(tmp_path_factory):
    import torch

    ref_api = load_ref_module("tortoise.api")
    ref_ar_mod = load_ref_module("tortoise.models.autoregressive")
    ref_diff_mod = load_ref_module("tortoise.models.diffusion_decoder")
    ref_clvp_mod = load_ref_module("tortoise.models.clvp")
    ref_voc_mod = load_ref_module("tortoise.models.vocoder")
    ref_tok_mod = load_ref_module("tortoise.utils.tokenizer")

    torch.manual_seed(0)
    ar = ref_ar_mod.UnifiedVoice(
        layers=LAYERS, model_dim=DIM, heads=HEADS, max_text_tokens=MAX_TEXT,
        max_mel_tokens=MAX_MEL_POS, max_conditioning_inputs=2,
        number_text_tokens=255, start_text_token=255,
        checkpointing=False).eval()
    ar.post_init_gpt2_config(use_deepspeed=False, kv_cache=True, half=False)
    diff = ref_diff_mod.DiffusionTts(
        model_channels=DIM, num_layers=LAYERS, in_channels=100,
        out_channels=200, in_latent_channels=DIM, in_tokens=8193, dropout=0,
        use_fp16=False, num_heads=HEADS, layer_drop=0,
        unconditioned_percentage=0).eval()
    clvp = ref_clvp_mod.CLVP(
        dim_text=DIM, dim_speech=DIM, dim_latent=DIM, num_text_tokens=256,
        text_enc_depth=2, text_seq_len=350, text_heads=HEADS,
        num_speech_tokens=8192, speech_enc_depth=2, speech_heads=HEADS,
        speech_seq_len=430, use_xformers=True).eval()
    voc = ref_voc_mod.UnivNetGenerator()
    with torch.no_grad():  # contractive weights, applied before conversion
        for p in voc.parameters():
            p.mul_(VOC_SCALE)

    # ---- convert the SAME weights for our pipeline (weight-normed dicts) --
    from tortoise_tpu.convert.torch_import import (clvp_params,
                                                   diffusion_tts_params,
                                                   unified_voice_params,
                                                   univnet_params)
    from tortoise_tpu.weights import save_params

    models_dir = str(tmp_path_factory.mktemp("models"))
    save_params(f"{models_dir}/autoregressive.npz",
                unified_voice_params(ar.state_dict(), layers=LAYERS))
    save_params(f"{models_dir}/diffusion_decoder.npz",
                diffusion_tts_params(diff.state_dict(), num_layers=LAYERS))
    save_params(f"{models_dir}/clvp.npz", clvp_params(clvp.state_dict()))
    save_params(f"{models_dir}/vocoder.npz", univnet_params(voc.state_dict()))

    voc.eval(inference=True)  # ref runs with weight norm folded, like ours

    # ---- assemble the reference orchestrator around the tiny models -------
    # (TextToSpeech.__init__ hard-codes the full-size configs and mandatory
    # checkpoint downloads, reference api.py:217-238; the ORACLE is the tts()
    # method, reference api.py:334-597, which runs unmodified)
    ref_tts = ref_api.TextToSpeech.__new__(ref_api.TextToSpeech)
    ref_tts.models_dir = models_dir
    ref_tts.autoregressive_batch_size = 1
    ref_tts.enable_redaction = False
    ref_tts.device = torch.device("cpu")
    ref_tts.tokenizer = ref_tok_mod.VoiceBpeTokenizer()
    ref_tts.half = False
    ref_tts.autoregressive = ar
    ref_tts.diffusion = diff
    ref_tts.clvp = clvp
    ref_tts.cvvp = None
    ref_tts.vocoder = voc
    ref_tts.stft = None
    ref_tts.rlg_auto = None
    ref_tts.rlg_diffusion = None
    ar.inference_speech = _reference_greedy_inference_speech(ar, 1e-6)

    # ---- our pipeline on the converted checkpoints ------------------------
    from tortoise_tpu.api import TextToSpeech
    from tortoise_tpu.models.autoregressive import UnifiedVoiceConfig
    from tortoise_tpu.models.clvp import CLVPConfig
    from tortoise_tpu.models.diffusion_decoder import DiffusionTtsConfig

    ours = TextToSpeech(
        autoregressive_batch_size=1, models_dir=models_dir, half=False,
        enable_redaction=False, text_bucket=0, allow_random_weights=False,
        ar_config=UnifiedVoiceConfig(layers=LAYERS, model_dim=DIM,
                                     heads=HEADS, max_text_tokens=MAX_TEXT,
                                     max_mel_tokens=MAX_MEL_POS,
                                     max_conditioning_inputs=2),
        diffusion_config=DiffusionTtsConfig(model_channels=DIM,
                                            num_layers=LAYERS,
                                            in_latent_channels=DIM,
                                            num_heads=HEADS),
        clvp_config=CLVPConfig(dim_text=DIM, dim_speech=DIM, dim_latent=DIM,
                               text_enc_depth=2, text_heads=HEADS,
                               speech_enc_depth=2, speech_heads=HEADS))
    assert ours.ar_source == "native", ours.ar_source  # converted, not random
    return ref_api, ref_tts, ours


def test_composed_pipeline_matches_reference(composed, monkeypatch):
    import torch

    ref_api, ref_tts, ours = composed
    rng = np.random.default_rng(41)
    auto_lat = rng.standard_normal((1, DIM)).astype(np.float32)
    diff_lat = rng.standard_normal((1, 2 * DIM)).astype(np.float32)

    rec = {}

    # shared vocoder z-noise, injected into the reference's internal draw
    orig_voc_inference = ref_tts.vocoder.inference

    def voc_inference(c, z=None):
        z_np = np.random.default_rng(777).standard_normal(
            (c.shape[0], ref_tts.vocoder.noise_dim,
             c.shape[2] + 10)).astype(np.float32)
        rec["z"] = z_np
        return orig_voc_inference(c, torch.from_numpy(z_np))

    monkeypatch.setattr(ref_tts.vocoder, "inference", voc_inference)

    # capture each side's post-fix codes and pre-vocoder mel
    orig_ref_fix = ref_api.fix_autoregressive_output

    def ref_fix(codes, stop_token, complain=True):
        out = orig_ref_fix(codes, stop_token, complain)
        rec["ref_codes"] = out.numpy().copy()
        return out

    monkeypatch.setattr(ref_api, "fix_autoregressive_output", ref_fix)

    import tortoise_tpu.api as our_api
    orig_our_fix = our_api.fix_autoregressive_output

    def our_fix(codes, stop_token, complain=True):
        out = orig_our_fix(codes, stop_token, complain)
        rec["our_codes"] = out.copy()
        return out

    monkeypatch.setattr(our_api, "fix_autoregressive_output", our_fix)

    orig_ref_dsd = ref_api.do_spectrogram_diffusion

    def ref_dsd(*a, **k):
        mel = orig_ref_dsd(*a, **k)
        rec["ref_mel"] = mel.numpy().copy()
        return mel

    monkeypatch.setattr(ref_api, "do_spectrogram_diffusion", ref_dsd)

    orig_our_dsd = ours.do_spectrogram_diffusion

    def our_dsd(*a, **k):
        mel = orig_our_dsd(*a, **k)
        rec["our_mel"] = np.asarray(mel)
        return mel

    monkeypatch.setattr(ours, "do_spectrogram_diffusion", our_dsd)

    # zero per-step diffusion noise on both sides (see module docstring)
    steps = 2
    orig_randn_like = torch.randn_like
    monkeypatch.setattr(torch, "randn_like",
                        lambda x, **k: torch.zeros_like(x))
    from tortoise_tpu.diffusion.sampler import (SamplerConfig,
                                                make_p_sample_loop)
    from tortoise_tpu.diffusion.schedule import spaced_schedule

    model = ours.diffusion

    def model_fn(v, x, t, pre_pack, doubled, valid_len=None):
        pre_cond, rel_biases = pre_pack
        return model.apply(v, x, t, precomputed_aligned_embeddings=pre_cond,
                           rel_biases=rel_biases, valid_len=valid_len)

    ours._diffusion_loops[(steps, True, 2.0, "p")] = make_p_sample_loop(
        model_fn, spaced_schedule("linear", 4000, steps),
        SamplerConfig(cond_free=True, cond_free_k=2.0, noise_scale=0.0))

    kwargs = dict(k=1, verbose=False, use_deterministic_seed=11,
                  num_autoregressive_samples=1, temperature=1.0, top_p=1e-8,
                  repetition_penalty=2.0, max_mel_tokens=MAX_MEL,
                  cvvp_amount=0.0, diffusion_iterations=steps, cond_free=True,
                  cond_free_k=2.0, diffusion_temperature=0.0)
    wav_ref = ref_tts.tts(TEXT, conditioning_latents=(
        torch.from_numpy(auto_lat), torch.from_numpy(diff_lat)),
        **kwargs).numpy()
    del orig_randn_like

    # our vocode path consumes the identical z (transposed to NWC)
    def vocode_with_ref_z(mel_btc, _rng):
        z = jnp.asarray(rec["z"].transpose(0, 2, 1))
        assert z.shape[1] == mel_btc.shape[1] + 10, (z.shape, mel_btc.shape)
        return np.asarray(ours._vocode(jnp.asarray(mel_btc), z))

    ours._vocode_clip = vocode_with_ref_z
    try:
        wav_ours = ours.tts(TEXT, conditioning_latents=(auto_lat, diff_lat),
                            **kwargs)
    finally:
        del ours._vocode_clip

    # 1) the AR decode + stop-token repair composed identically
    np.testing.assert_array_equal(rec["our_codes"][:len(rec["ref_codes"])],
                                  rec["ref_codes"])
    # 2) the diffusion mel composed identically (latent re-extraction,
    #    calm trim, timestep_independent, CFG blend, p_sample, denorm)
    assert rec["our_mel"].shape == rec["ref_mel"].shape
    np.testing.assert_allclose(rec["our_mel"], rec["ref_mel"],
                               atol=2e-2, rtol=0)
    # 3) the full waveforms agree
    assert wav_ours.shape == wav_ref.shape, (wav_ours.shape, wav_ref.shape)
    np.testing.assert_allclose(wav_ours[0, 0], wav_ref[0, 0],
                               atol=2e-3, rtol=0)
