"""Fast / streaming TTS pipeline: AR prior + HiFi-GAN decoder.

TPU-native equivalent of the reference fast path
(reference: tortoise/api_fast.py:173-515): tokenize -> conditioning latent ->
single-candidate AR decode -> latent re-extraction -> HiFi-GAN -> 24 kHz wav,
plus a chunked streaming generator with crossfade.

Design differences from the reference (all TPU-motivated):
* models are resident and jit-compiled once — no CPU<->GPU shuttling;
* the AR decode is one compiled scan (models/ar_sampler.py) instead of a
  per-token HF generate loop;
* fixed-shape compute: codes/latents come back padded to ``max_mel_tokens``
  and are sliced host-side, so every sentence reuses the same compiled
  programs (the decoder buckets latent lengths to avoid recompiles);
* streaming interleaves segmented AR decode with audio emission — the first
  chunk plays while the model is still generating (the reference runs its
  python generate loop to the first 60 tokens the same way but single-token
  at a time, api_fast.py:400-411).
"""
from __future__ import annotations

import functools
import random as _random
import time
from typing import Iterator

import jax
import jax.numpy as jnp
import numpy as np

from tortoise_tpu import weights as weights_lib
from tortoise_tpu.models.ar_sampler import SamplerSettings, sample_speech
from tortoise_tpu.models.autoregressive import (UnifiedVoice, UnifiedVoiceConfig,
                                                init_unified_voice)
from tortoise_tpu.models.hifigan import HifiganConfig, HifiganGenerator
from tortoise_tpu.models.random_latent import RandomLatentConverter, sample_random_latent
from tortoise_tpu.ops import mel as mel_ops
from tortoise_tpu.presets import FAST_PRESETS, resolve_preset
from tortoise_tpu.utils.tokenizer import VoiceBpeTokenizer

MEL_NORMS_FILE = mel_ops.DEFAULT_MEL_NORMS_FILE

# Streaming window geometry (one compiled decoder shape for the whole stream).
# A "u-frame" is one frame of the post-interpolation grid fed to the HiFi-GAN
# conv stack = 256 output samples (~10.7 ms at 24 kHz).
_U_LEN = 256   # u-frames decoded per window
_W_LAT = 64    # latent frames fed per window (covers U_LEN*147/640 + edges)
_HALO_U = 32   # left context kept, not emitted: conv receptive field (~15) + margin
_TAIL_U = 32   # right stability margin: samples within RF of the decode
               # frontier change when more tokens arrive, so emit them later


def _u_frames(n_latents: int) -> int:
    """u-frames produced by n latent frames: floor(floor(n*4) * 24000/22050).
    Integer form of the two-stage interpolation length chain;
    _expected_samples(n) == _u_frames(n) * 256."""
    return (4 * n_latents * 24000) // 22050


def deterministic_state(seed=None) -> int:
    """Seed host-side randomness; returns the seed for reproduction
    (reference api.py:598-609)."""
    seed = int(time.time()) if seed is None else seed
    _random.seed(seed)
    np.random.seed(seed & 0x7FFFFFFF)
    return seed


def format_conditioning(clip: np.ndarray, cond_length: int = 132300,
                        mel_norms=None) -> np.ndarray:
    """22.05 kHz clip (1, T) -> (1, T_mel, 80) conditioning mel
    (reference api.py:73-84): crop/pad to 6 s then tacotron mel."""
    gap = clip.shape[-1] - cond_length
    if gap < 0:
        clip = np.pad(clip, ((0, 0), (0, -gap)))
    elif gap > 0:
        start = _random.randint(0, gap)
        clip = clip[:, start:start + cond_length]
    m = mel_ops.tacotron_mel(jnp.asarray(clip), mel_norms)
    return np.asarray(jnp.swapaxes(m, 1, 2))


class TextToSpeechFast:
    """Fast-path orchestrator (reference api_fast.TextToSpeech)."""

    def __init__(self, models_dir=None, tokenizer_vocab_file=None,
                 tokenizer_basic=False, dtype=jnp.bfloat16, allow_random_weights=True,
                 ar_config: UnifiedVoiceConfig | None = None,
                 latent_bucket: int = 64, text_bucket: int = 32,
                 gpt_weights="bf16", gpt_fused_step: bool | None = None,
                 mesh=None):
        self.dtype = dtype
        # Optional jax.sharding.Mesh: ``tts_batch``'s utterance batch shards
        # over the mesh's dp axis (BASELINE config 5 is the natural dp
        # workload — N independent utterances through one compiled program;
        # SURVEY §2.5 batch parallelism). ``tts``/``tts_stream`` stay
        # single-candidate and ignore the mesh.
        self.mesh = mesh
        self._batch_sharding = None
        if mesh is not None:
            from tortoise_tpu.parallel.mesh import batch_sharding as _bs

            self._batch_sharding = _bs(mesh)
        # whole-step fused Pallas decode kernel (ops/decode_step_pallas.py);
        # bf16 or int8 GPT weights (the int8 stack streams half the bytes).
        # Default ON on TPU only (a Mosaic kernel would crash other
        # accelerator backends; CPU would run it interpreted) — measured
        # composed win with load-time weight stacking, see docs/ROOFLINE.md.
        # Sharded tts_batch falls back in the sampler.
        if gpt_fused_step is None:
            gpt_fused_step = (jax.devices()[0].platform == "tpu"
                              and dtype == jnp.bfloat16)
        self.gpt_fused_step = gpt_fused_step
        self.latent_bucket = latent_bucket
        # Pad text to bucket multiples with the stop token so each sentence
        # length reuses one compiled prefill/decode program. Stop-token text
        # padding is in-distribution (training batches padded the same way,
        # reference autoregressive.py:485); set 0 for reference-exact prompts.
        self.text_bucket = text_bucket
        self.tokenizer = VoiceBpeTokenizer(vocab_file=tokenizer_vocab_file,
                                           use_basic_cleaners=tokenizer_basic)
        self.mel_norms = mel_ops.load_mel_norms(MEL_NORMS_FILE)

        # gpt_weights="int8": weight-only int8 GPT kernels (gpt2.QuantDense)
        cfg = weights_lib.resolve_gpt_quant(ar_config or UnifiedVoiceConfig(),
                                            gpt_weights)
        self.autoregressive = UnifiedVoice(cfg, dtype=dtype)
        p, self.ar_source = weights_lib.get_params(
            "autoregressive",
            lambda: init_unified_voice(self.autoregressive, 0),
            models_dir, allow_random=allow_random_weights)
        p = p.get("params", p)
        if cfg.quant_weights:
            p = weights_lib.quantize_gpt_weights(p)
        if dtype == jnp.bfloat16:
            p = weights_lib.cast_for_inference(p, jnp.bfloat16)
        # resident on device: host-numpy jit args would re-transfer per call
        self.ar_vars = jax.device_put({"params": p})
        # fused-kernel weight stack, prepared ONCE here and passed to every
        # sampler call — stacking inside the decode loop is NOT hoisted by
        # XLA on hardware (the round-3 regression, VERDICT r3 weak #1)
        self._ar_stacked = None
        if self.gpt_fused_step:
            from tortoise_tpu.models.ar_sampler import stack_fused_params

            if gpt_weights == "int8_decode":
                # decode-only weight quantization (see api.py): exact bf16
                # prefill/streaming-head embeds, int8 stack for the fused
                # decode steps (half the per-step weight stream)
                qp = weights_lib.quantize_gpt_weights(jax.device_get(p))
                self._ar_stacked = stack_fused_params(
                    jax.device_put({"params": qp}))
            else:
                self._ar_stacked = stack_fused_params(self.ar_vars)

        hifi_cfg = HifiganConfig(in_channels=cfg.model_dim, cond_channels=cfg.model_dim)
        self.hifi_decoder = HifiganGenerator(hifi_cfg, dtype=jnp.float32)
        self.hifi_vars, self.hifi_source = weights_lib.get_params(
            "hifidecoder",
            lambda: weights_lib.host_init(
                lambda: self.hifi_decoder.init(
                    jax.random.PRNGKey(1), jnp.zeros((1, 8, cfg.model_dim)),
                    jnp.zeros((1, cfg.model_dim))),
                seed=1)["params"],
            models_dir, allow_random=allow_random_weights)
        self.hifi_vars = jax.device_put({"params": self.hifi_vars})

        self.rlg_auto = None
        self._rlg_vars = None
        self._models_dir = models_dir
        self._allow_random = allow_random_weights

        cfgd = self.autoregressive.config

        # param trees are explicit jit arguments (closure constants would be
        # baked into the HLO, making full-size compiles pathologically slow)
        @jax.jit
        def _conditioning(v, mels):
            return self.autoregressive.apply(v, mels,
                                             method=UnifiedVoice.get_conditioning)

        @jax.jit
        def _relatent(v, cond, text, codes):
            return self.autoregressive.apply(
                v, cond, text, codes,
                jnp.full((codes.shape[0],), codes.shape[1] * cfgd.mel_length_compression),
                return_latent=True)

        @jax.jit
        def _decode_wav(v, latents, cond, valid_frames):
            return self.hifi_decoder.apply(v, latents, cond, valid_frames,
                                           method=HifiganGenerator.inference)

        @jax.jit
        def _decode_window(v, lat_win, cond, lat_off, n_valid, u_start, valid_u):
            """Streaming window decode: u-frames [u_start, u_start+_U_LEN) of
            the conceptual full decode of the first ``n_valid`` latent frames,
            computed from the ``_W_LAT``-frame latent window at ``lat_off``.
            All offsets are traced scalars, so one compiled program serves the
            entire stream regardless of clip length."""
            return self.hifi_decoder.apply(
                v, lat_win, cond, lat_off, n_valid, u_start, _U_LEN, valid_u,
                method=HifiganGenerator.inference_window)

        @functools.partial(jax.jit, static_argnames=("settings", "first_len"))
        def _first_stream(v_ar, v_hifi, stacked, cond, text, rng, *, settings,
                          first_len):
            """Fused streaming head: prompt + prefill + ``first_len`` decode
            steps + the first HiFi window decode, ONE dispatch. First-audio
            latency at B=1 is dominated by host<->device round-trips (prefill
            sync, segment sync, window-decode sync), not compute — int8
            weights moved it by only ~2%; collapsing the syncs is the lever.
            Returns (carry, toks, latents, wav window [u 0.._U_LEN), natural
            length n, emission target target_u)."""
            from tortoise_tpu.models import ar_sampler

            carry, toks, latents = ar_sampler.prefill_segment.__wrapped__(
                self.autoregressive, v_ar, stacked, cond, text, rng, settings,
                first_len, jnp.bfloat16)
            m = toks.shape[1]
            hit = toks[0] == cfgd.stop_mel_token
            n = jnp.where(hit.any(), jnp.argmax(hit) + 1, m).astype(jnp.int32)
            u_valid = (4 * n * 24000) // 22050
            # not stopped: hold back the tail frames still inside the decode
            # frontier's receptive field (same rule as emit_windows)
            target_u = jnp.where(hit.any(), u_valid,
                                 jnp.maximum(u_valid - _TAIL_U, 0))
            lat_win = jnp.pad(latents.astype(jnp.float32),
                              ((0, 0), (0, _W_LAT - m), (0, 0)))
            wav = self.hifi_decoder.apply(
                v_hifi, lat_win, cond, 0, n, 0, _U_LEN,
                jnp.minimum(_U_LEN, u_valid),
                method=HifiganGenerator.inference_window)
            return carry, toks, latents, wav, n, target_u

        @jax.jit
        def _finish_wav(v_ar, v_hifi, cond, text, codes):
            """Sampled codes -> (wav, n, out_samples) entirely on device:
            teacher-forced latent re-extraction, stop-token trim, edge-pad to
            a static bucket (clamped gather == np.pad mode="edge"), masked
            HiFi decode. One dispatch chain and a single wav d2h — on a
            tunneled/remote device the host round-trips between these stages
            otherwise dominate the fast path (~40% of wall at 200 tokens)."""
            lat = self.autoregressive.apply(
                v_ar, cond, text, codes,
                jnp.full((codes.shape[0],), codes.shape[1] * cfgd.mel_length_compression),
                return_latent=True)
            m = codes.shape[1]
            hit = codes[0] == cfgd.stop_mel_token
            n = jnp.where(hit.any(), jnp.argmax(hit) + 1, m).astype(jnp.int32)
            lbk = self.latent_bucket
            l_static = -(-m // lbk) * lbk if lbk else m
            idx = jnp.minimum(jnp.arange(l_static), n - 1)
            lat_e = jnp.take(lat.astype(jnp.float32), idx, axis=1)
            # == _expected_samples(n): floor(floor(n*1024/256) * 24000/22050) * 256
            out_samples = (4 * n * 24000) // 22050 * 256
            wav = self.hifi_decoder.apply(v_hifi, lat_e, cond, out_samples // 256,
                                          method=HifiganGenerator.inference)
            return wav, n, out_samples

        self._first_stream = functools.partial(_first_stream, self.ar_vars,
                                               self.hifi_vars, self._ar_stacked)
        self._conditioning = functools.partial(_conditioning, self.ar_vars)
        self._relatent = functools.partial(_relatent, self.ar_vars)
        self._decode_wav = functools.partial(_decode_wav, self.hifi_vars)
        self._decode_window = functools.partial(_decode_window, self.hifi_vars)
        self._finish_wav = functools.partial(_finish_wav, self.ar_vars,
                                             self.hifi_vars)

    # ------------------------------------------------------------------
    def get_conditioning_latents(self, voice_samples) -> np.ndarray:
        """List of 22.05 kHz clips -> (1, D) AR conditioning latent
        (reference api_fast.py:229-251)."""
        conds = np.stack([format_conditioning(np.asarray(vs), mel_norms=self.mel_norms)
                          for vs in voice_samples], axis=1)  # (1, n, T, 80)
        return np.asarray(self._conditioning(jnp.asarray(conds)))

    def get_random_conditioning_latents(self, seed: int = 0) -> np.ndarray:
        return np.asarray(self._random_cond_device(seed))

    def _random_cond_device(self, seed: int):
        """Random-voice latent, left on device (no host round-trip)."""
        if self.rlg_auto is None:
            self.rlg_auto = RandomLatentConverter(self.autoregressive.config.model_dim)
            params, _ = weights_lib.get_params(
                "rlg_auto",
                lambda: self.rlg_auto.init(jax.random.PRNGKey(2),
                                           jnp.zeros((1, self.autoregressive.config.model_dim)))["params"],
                self._models_dir, allow_random=self._allow_random)
            self._rlg_vars = {"params": params}
        return sample_random_latent(self.rlg_auto, self._rlg_vars,
                                    jax.random.PRNGKey(seed))

    # ------------------------------------------------------------------
    def _prepare(self, text, voice_samples, conditioning_latents, seed):
        det_seed = deterministic_state(seed)
        ids = self.tokenizer.encode(text)
        text_tokens = np.asarray(ids, np.int32)[None, :]
        text_tokens = np.pad(text_tokens, ((0, 0), (0, 1)))  # api-level pad
        # 400 for the shipped config (reference api_fast.py:448); smaller text
        # position tables lower the limit — OOB gathers would NaN silently.
        limit = min(400, self.autoregressive.config.max_text_tokens - 2)
        assert text_tokens.shape[-1] < limit, (
            f"Too much text provided ({text_tokens.shape[-1]} tokens >= {limit}). "
            "Break the text up into separate segments and re-try inference.")
        if self.text_bucket:
            tb = -(-text_tokens.shape[1] // self.text_bucket) * self.text_bucket
            # never pad past the text position table
            tb = min(tb, self.autoregressive.config.max_text_tokens)
            if tb > text_tokens.shape[1]:
                text_tokens = np.pad(text_tokens,
                                     ((0, 0), (0, tb - text_tokens.shape[1])))
        if voice_samples is not None:
            cond = self.get_conditioning_latents(voice_samples)
        elif conditioning_latents is not None:
            cond = np.asarray(conditioning_latents)
            if cond.ndim == 1:
                cond = cond[None]
        else:
            cond = self._random_cond_device(det_seed)  # stays on device
        return det_seed, text_tokens, cond

    def _clamp_mel_tokens(self, max_mel_tokens: int) -> int:
        """Cap generation to the model's mel position table (the decode quirk
        uses positions up to step+2); out-of-range embedding lookups would
        gather NaN fill values."""
        return min(max_mel_tokens, self.autoregressive.config.mel_pos_len - 3)

    def _decode_bucketed(self, lat: np.ndarray, n: int, cond) -> np.ndarray:
        """HiFi decode with latent-length bucketing. Latents are EDGE-padded
        (so the interpolation boundary matches clamp semantics) and the
        decoder masks activations past the valid frame count — the kept
        region is exactly equal to an unpadded decode."""
        nb = -(-n // self.latent_bucket) * self.latent_bucket \
            if self.latent_bucket else n
        lat_padded = np.pad(lat, ((0, 0), (0, nb - n), (0, 0)), mode="edge")
        out_samples = _expected_samples(n)
        wav = np.asarray(self._decode_wav(jnp.asarray(lat_padded),
                                          jnp.asarray(cond),
                                          jnp.asarray(out_samples // 256)))
        return wav[:, :out_samples, 0][:, None, :]

    def _trim_codes(self, codes: np.ndarray) -> int:
        """Natural length incl. the stop token (mirrors HF generate output)."""
        stop = self.autoregressive.config.stop_mel_token
        idx = np.where(codes == stop)[0]
        return int(idx[0]) + 1 if len(idx) else len(codes)

    def tts_with_preset(self, text, preset="fast", **kwargs):
        settings = resolve_preset(preset, FAST_PRESETS, **kwargs)
        for k in ("num_autoregressive_samples", "diffusion_iterations", "cond_free",
                  "cond_free_k", "diffusion_temperature", "length_penalty"):
            settings.pop(k, None)
        return self.tts(text, **settings)

    def tts(self, text, voice_samples=None, conditioning_latents=None, k=1,
            verbose=True, use_deterministic_seed=None, return_deterministic_state=False,
            temperature=0.8, repetition_penalty=2.0, top_p=0.8, top_k=50,
            max_mel_tokens=500, gpt_fused_step: bool | None = None,
            **unused_kwargs) -> np.ndarray:
        """Synthesize one clip; returns float32 (1, 1, S) at 24 kHz
        (reference api_fast.py:421-503). ``gpt_fused_step`` overrides the
        constructor default per call (same contract as ``tts_batch``), so
        one resident instance can A/B both decode paths."""
        det_seed, text_tokens, cond = self._prepare(
            text, voice_samples, conditioning_latents, use_deterministic_seed)

        max_mel_tokens = self._clamp_mel_tokens(max_mel_tokens)
        fused = (bool(gpt_fused_step) if gpt_fused_step is not None
                 else self.gpt_fused_step) and self._ar_stacked is not None
        settings = SamplerSettings(temperature=temperature, top_k=top_k, top_p=top_p,
                                   repetition_penalty=repetition_penalty,
                                   max_generate=max_mel_tokens,
                                   fused_step=fused,
                                   emit_latents=False)  # _finish_wav re-extracts
        rng = jax.random.PRNGKey(det_seed)
        codes, _ = sample_speech(self.autoregressive, self.ar_vars,
                                 jnp.asarray(cond), jnp.asarray(text_tokens),
                                 rng, num_samples=1, settings=settings,
                                 stacked=self._ar_stacked)
        # Teacher-forced latent re-extraction (reference api_fast.py:500-503)
        # + trim + decode fused on device; the valid region is bitwise equal
        # to the staged host-side path (_relatent/_trim_codes/_decode_bucketed).
        wav_d, _, out_d = self._finish_wav(jnp.asarray(cond),
                                           jnp.asarray(text_tokens), codes)
        out_samples = int(out_d)
        wav = np.asarray(wav_d)[:, :out_samples, 0][:, None, :]

        if return_deterministic_state:
            return wav, (det_seed, text, voice_samples, conditioning_latents)
        return wav

    # ------------------------------------------------------------------
    def tts_batch(self, texts, conditioning_latents=None, verbose=True,
                  use_deterministic_seed=None, temperature=0.8,
                  repetition_penalty=2.0, top_p=0.8, top_k=50,
                  max_mel_tokens=500, text_bucket: int = 64,
                  batch_sharding=None, gpt_fused_step: bool | None = None,
                  **unused_kwargs) -> list[np.ndarray]:
        """Batched serving: synthesize N utterances in ONE set of compiled
        programs (BASELINE config 5 — concurrent utterances; shard the batch
        over a mesh's dp axis with ``batch_sharding``).

        texts: list of N strings. conditioning_latents: (N, D) / (1, D) / None
        (random voice). Texts pad to ``text_bucket`` multiples with the stop
        token (in-distribution — training used stop-token padding too).
        Returns a list of N float32 (1, 1, S_i) wavs.
        """
        det_seed = deterministic_state(use_deterministic_seed)
        n = len(texts)
        ids = [self.tokenizer.encode(t) for t in texts]
        max_len = max(len(i) for i in ids) + 1  # api-level pad
        limit = min(400, self.autoregressive.config.max_text_tokens - 2)
        assert max_len < limit, (
            f"Too much text provided in at least one utterance "
            f"(longest is {max_len} tokens >= {limit}).")
        tb = -(-max_len // text_bucket) * text_bucket if text_bucket else max_len
        tb = min(tb, self.autoregressive.config.max_text_tokens)
        tb = max(tb, max_len)
        toks = np.zeros((n, tb), np.int32)
        for r, seq in enumerate(ids):
            toks[r, :len(seq)] = seq

        if conditioning_latents is None:
            cond = np.repeat(self.get_random_conditioning_latents(det_seed), n, 0)
        else:
            cond = np.asarray(conditioning_latents)
            if cond.ndim == 1:
                cond = cond[None]
            if cond.shape[0] == 1:
                cond = np.repeat(cond, n, 0)

        max_mel_tokens = self._clamp_mel_tokens(max_mel_tokens)
        if batch_sharding is None and self._batch_sharding is not None \
                and n % self.mesh.shape.get("dp", 1) == 0:
            # constructor mesh: shard the utterance batch over dp (the
            # sampler falls back to the XLA stack for sharded decode)
            batch_sharding = self._batch_sharding
        # Default OFF here, unlike tts/tts_stream: the interleaved composed
        # B=64 A/B (docs/ROOFLINE.md "statistical TIE" revision, v5e) puts
        # the fused kernel within noise of the XLA stack at batch-serving
        # scale — the weight stream it optimizes is ~19% of HBM traffic at
        # B=64 — so the simpler path stays default. Explicit True opts in.
        fused = (bool(gpt_fused_step) if gpt_fused_step is not None
                 else False) and self._ar_stacked is not None
        settings = SamplerSettings(temperature=temperature, top_k=top_k,
                                   top_p=top_p,
                                   repetition_penalty=repetition_penalty,
                                   max_generate=max_mel_tokens,
                                   fused_step=fused,
                                   emit_latents=False)  # batch re-extracts
        codes, _ = sample_speech(self.autoregressive, self.ar_vars,
                                 jnp.asarray(cond), jnp.asarray(toks),
                                 jax.random.PRNGKey(det_seed), num_samples=n,
                                 settings=settings, batch_sharding=batch_sharding,
                                 stacked=self._ar_stacked)
        latents = np.asarray(self._relatent(jnp.asarray(cond), jnp.asarray(toks),
                                            codes)).astype(np.float32)
        codes = np.asarray(codes)

        wavs = []
        for r in range(n):
            nat = self._trim_codes(codes[r])
            wavs.append(self._decode_bucketed(latents[r:r + 1, :nat], nat,
                                              cond[r:r + 1]))
        return wavs

    # ------------------------------------------------------------------
    def tts_stream(self, text, voice_samples=None, conditioning_latents=None,
                   verbose=True, use_deterministic_seed=None, stream_chunk_size=40,
                   first_chunk_size=16, overlap_wav_len=1024, temperature=0.8,
                   repetition_penalty=2.0, top_p=0.8, top_k=50, max_mel_tokens=500,
                   **unused_kwargs) -> Iterator[np.ndarray]:
        """Chunked streaming synthesis (reference api_fast.py:311-420).

        Truly incremental: the AR decode runs ahead in compiled segments
        (``first_chunk_size`` tokens, then ``stream_chunk_size``-token
        segments), and each audio chunk is decoded from a FIXED-size latent
        window (``inference_window``), so per-chunk cost is O(chunk) — unlike
        the reference, which re-decodes the entire accumulated latent prefix
        every chunk (O(n^2) in clip length, reference api_fast.py:400-420).

        Because the windowed decode computes global interpolation indices and
        keeps a halo larger than the conv stack's receptive field, emitted
        chunks are exact adjacent slices of the full decode — concatenating
        them reproduces ``tts()``'s waveform (up to f32 rounding), and no
        crossfade is needed (``overlap_wav_len`` is accepted for reference
        API compatibility but unused).
        """
        del overlap_wav_len  # exact-slice emission needs no crossfade
        from tortoise_tpu.models import ar_sampler

        det_seed, text_tokens, cond = self._prepare(
            text, voice_samples, conditioning_latents, use_deterministic_seed)
        max_mel_tokens = self._clamp_mel_tokens(max_mel_tokens)
        settings = SamplerSettings(temperature=temperature, top_k=top_k, top_p=top_p,
                                   repetition_penalty=repetition_penalty,
                                   max_generate=max_mel_tokens,
                                   fused_step=self.gpt_fused_step)
        cond_j = jnp.asarray(cond)

        u_emit = 0  # emission frontier, in u-frames

        def emit_windows(latents, n, target_u):
            """Advance the emission frontier to ``target_u`` using fixed-shape
            window decodes; yields exact waveform slices [u_emit, target_u)."""
            nonlocal u_emit
            u_valid = _u_frames(n)  # decode frontier: frames past it masked
            while u_emit < target_u:
                emit_to = min(target_u, u_emit + (_U_LEN - _HALO_U))
                u_start = max(0, emit_to - _U_LEN)
                # latent frames the window's interpolation gathers reach
                lat_hi = min(n, (u_start + _U_LEN) * 147 // 640 + 3)
                lat_off = max(0, lat_hi - _W_LAT)
                lat_win = latents[:, lat_off:lat_off + _W_LAT]
                if lat_win.shape[1] < _W_LAT:  # early clip: pad (never gathered)
                    lat_win = np.pad(lat_win,
                                     ((0, 0), (0, _W_LAT - lat_win.shape[1]), (0, 0)))
                wav = np.asarray(self._decode_window(
                    jnp.asarray(lat_win), cond_j, jnp.asarray(lat_off),
                    jnp.asarray(n), jnp.asarray(u_start),
                    jnp.asarray(min(_U_LEN, max(0, u_valid - u_start)))))
                chunk = wav[0, (u_emit - u_start) * 256:(emit_to - u_start) * 256, 0]
                u_emit = emit_to
                yield chunk

        first_len = min(first_chunk_size, stream_chunk_size,
                        max(max_mel_tokens - 1, 0))
        if first_len + 1 <= _W_LAT:
            # fused head: ONE dispatch + one d2h to the first audio chunk
            carry, toks, latents, wav, n_dev, tgt_dev = self._first_stream(
                cond_j, jnp.asarray(text_tokens), jax.random.PRNGKey(det_seed),
                settings=settings, first_len=first_len)
            wav_np, codes, last_n, target_u = jax.device_get(
                (wav, toks, n_dev, tgt_dev))
            emit_to = min(int(target_u), _U_LEN - _HALO_U)
            if emit_to > 0:
                u_emit = emit_to
                yield wav_np[0, :emit_to * 256, 0]
            latents_f32 = np.asarray(latents, np.float32)
            stopped = last_n < codes.shape[1]
            if not stopped:
                stream = ar_sampler.stream_continue(
                    self.autoregressive, self.ar_vars, carry, codes,
                    latents_f32, settings, stream_chunk_size,
                    stacked=self._ar_stacked)
                if target_u > emit_to:
                    # first_len so large the fused window couldn't cover it
                    yield from emit_windows(latents_f32, last_n, int(target_u))
        else:
            latents_f32, last_n, stopped = None, 0, False
            stream = ar_sampler.stream_speech(
                self.autoregressive, self.ar_vars, cond_j,
                jnp.asarray(text_tokens), jax.random.PRNGKey(det_seed),
                settings=settings, seg_len=stream_chunk_size,
                first_seg_len=first_len, stacked=self._ar_stacked)
        if not stopped:
            for codes, latents in stream:
                last_n = self._trim_codes(codes[0])
                latents_f32 = latents.astype(np.float32)
                stopped = last_n < codes.shape[1]
                if stopped:
                    break
                # hold back the tail: those samples change as tokens arrive
                yield from emit_windows(latents_f32, last_n,
                                        max(0, _u_frames(last_n) - _TAIL_U))
        # final flush: stop token latched or max_generate reached
        if latents_f32 is not None:
            yield from emit_windows(latents_f32, last_n, _u_frames(last_n))

    def deterministic_state(self, seed=None):
        return deterministic_state(seed)


def _expected_samples(n_latents: int) -> int:
    """Output sample count for n latent frames after the two interpolations
    and the 256x upsampling stack."""
    import math

    up1 = int(math.floor(n_latents * (1024.0 / 256.0)))
    up2 = int(math.floor(up1 * (24000.0 / 22050.0)))
    return up2 * 256


def handle_chunks(wav_gen: np.ndarray, wav_gen_prev, wav_overlap, overlap_len: int):
    """Streaming chunk crossfade (reference api_fast.py:285-308)."""
    wav_chunk = wav_gen[:-overlap_len]
    if wav_gen_prev is not None:
        wav_chunk = wav_gen[(wav_gen_prev.shape[0] - overlap_len):-overlap_len]
    if wav_overlap is not None:
        if overlap_len > len(wav_chunk):
            if wav_gen_prev is not None:
                wav_chunk = wav_gen[(wav_gen_prev.shape[0] - overlap_len):]
            else:
                wav_chunk = wav_gen[-overlap_len:]
            return wav_chunk, wav_gen, None
        crossfade = wav_chunk[:overlap_len].copy()
        crossfade *= np.linspace(0.0, 1.0, overlap_len, dtype=np.float32)
        wav_chunk = wav_chunk.copy()
        wav_chunk[:overlap_len] = wav_overlap * np.linspace(1.0, 0.0, overlap_len,
                                                            dtype=np.float32)
        wav_chunk[:overlap_len] += crossfade
    wav_overlap = wav_gen[-overlap_len:]
    wav_gen_prev = wav_gen
    return wav_chunk, wav_gen_prev, wav_overlap


# Drop-in name parity: the reference's fast API also calls its class
# TextToSpeech (reference api_fast.py:173), so
# ``from tortoise_tpu.api_fast import TextToSpeech`` works unchanged.
TextToSpeech = TextToSpeechFast
