"""UnifiedVoice: the GPT-2 autoregressive mel-token prior, flax.linen.

TPU-native re-design of the reference model
(reference: tortoise/models/autoregressive.py:293-574). The transformer runs
over [cond_latent ‖ text tokens ‖ mel tokens] with learned per-modality
position embeddings; inference decodes mel tokens with a preallocated KV
cache inside a jitted ``lax.scan`` (see ``tortoise_tpu/models/ar_sampler.py``)
instead of the reference's HF ``generate`` + DeepSpeed kernel injection.

Inference shipping config (reference api.py:217-220): 30 layers, d=1024,
16 heads, 402 text positions, 604 mel positions, 255 text tokens (start=255,
stop=0), 8194 mel codes (start=8192, stop=8193), mel_length_compression=1024.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from tortoise_tpu.models.blocks import ConditioningEncoder
from tortoise_tpu.models.gpt2 import GPT2Config, GPT2Stack


@dataclasses.dataclass(frozen=True)
class UnifiedVoiceConfig:
    layers: int = 30
    model_dim: int = 1024
    heads: int = 16
    max_text_tokens: int = 402
    max_mel_tokens: int = 604
    max_conditioning_inputs: int = 2
    mel_length_compression: int = 1024
    number_text_tokens: int = 255
    start_text_token: int = 255
    stop_text_token: int = 0
    number_mel_codes: int = 8194
    start_mel_token: int = 8192
    stop_mel_token: int = 8193
    types: int = 1
    # weight-only int8 GPT kernels (gpt2.QuantDense); convert full-precision
    # params with weights.quantize_gpt_weights
    quant_weights: bool = False

    @property
    def gpt_config(self) -> GPT2Config:
        return GPT2Config(n_layer=self.layers, n_embd=self.model_dim,
                          n_head=self.heads, quant_weights=self.quant_weights)

    @property
    def text_vocab(self) -> int:
        return self.number_text_tokens * self.types + 1

    @property
    def mel_pos_len(self) -> int:
        # reference autoregressive.py:340: max_mel_tokens + 2 + max_conditioning_inputs
        return self.max_mel_tokens + 2 + self.max_conditioning_inputs

    @property
    def text_pos_len(self) -> int:
        return self.max_text_tokens + 2


class UnifiedVoice(nn.Module):
    config: UnifiedVoiceConfig = UnifiedVoiceConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.conditioning_encoder = ConditioningEncoder(
            spec_dim=80, embedding_dim=cfg.model_dim, attn_blocks=6,
            num_attn_heads=cfg.heads, dtype=self.dtype)
        self.text_embedding = nn.Embed(cfg.text_vocab, cfg.model_dim, param_dtype=jnp.float32)
        self.mel_embedding = nn.Embed(cfg.number_mel_codes, cfg.model_dim, param_dtype=jnp.float32)
        self.text_pos_embedding = nn.Embed(cfg.text_pos_len, cfg.model_dim, param_dtype=jnp.float32)
        self.mel_pos_embedding = nn.Embed(cfg.mel_pos_len, cfg.model_dim, param_dtype=jnp.float32)
        self.gpt = GPT2Stack(cfg.gpt_config, dtype=self.dtype)
        self.final_norm = nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32)
        self.text_head = nn.Dense(cfg.text_vocab, dtype=self.dtype, param_dtype=jnp.float32)
        self.mel_head = nn.Dense(cfg.number_mel_codes, dtype=self.dtype, param_dtype=jnp.float32)

    # ------------------------------------------------------------------
    # Conditioning
    # ------------------------------------------------------------------
    def get_conditioning(self, cond_mels: jnp.ndarray) -> jnp.ndarray:
        """cond_mels: (B, n_clips, T, 80) -> (B, model_dim). Per-clip encoder
        output at t=0, averaged over clips (reference autoregressive.py:444-452)."""
        b, n, t, c = cond_mels.shape
        flat = cond_mels.reshape(b * n, t, c)
        enc = self.conditioning_encoder(flat)
        return enc.reshape(b, n, -1).mean(axis=1)

    # ------------------------------------------------------------------
    # Teacher-forced forward (training losses / latent extraction)
    # ------------------------------------------------------------------
    def __call__(self, cond_latent, text_inputs, mel_codes, wav_lengths=None,
                 return_latent: bool = False, return_logits: bool = False):
        """Full-sequence forward (reference autoregressive.py:454-512).

        cond_latent: (B, D); text_inputs: (B, Tt) int; mel_codes: (B, Tm) int;
        wav_lengths: (B,) — positions past wav_length//mel_length_compression+1
        are replaced with the stop token (set_mel_padding, reference :403-415).

        Returns (loss_text, loss_mel, mel_logits) by default, the mel latents
        (B, Tm, D) if ``return_latent`` (two trailing positions stripped), or
        (text_logits, mel_logits) if ``return_logits``.
        """
        cfg = self.config
        if wav_lengths is not None:
            mel_lengths = wav_lengths // cfg.mel_length_compression
            pos = jnp.arange(mel_codes.shape[1])[None, :]
            mel_codes = jnp.where(pos >= (mel_lengths[:, None] + 1), cfg.stop_mel_token, mel_codes)

        # Pad each modality with its stop token, then wrap with start/stop.
        text_inputs = jnp.pad(text_inputs, ((0, 0), (0, 1)), constant_values=cfg.stop_text_token)
        mel_codes = jnp.pad(mel_codes, ((0, 0), (0, 1)), constant_values=cfg.stop_mel_token)
        text_inp = jnp.pad(text_inputs, ((0, 0), (1, 0)), constant_values=cfg.start_text_token)
        text_tar = jnp.pad(text_inputs, ((0, 0), (0, 1)), constant_values=cfg.stop_text_token)
        mel_inp = jnp.pad(mel_codes, ((0, 0), (1, 0)), constant_values=cfg.start_mel_token)
        mel_tar = jnp.pad(mel_codes, ((0, 0), (0, 1)), constant_values=cfg.stop_mel_token)

        text_emb = self.text_embedding(text_inp) + self.text_pos_embedding(
            jnp.arange(text_inp.shape[1]))
        mel_emb = self.mel_embedding(mel_inp) + self.mel_pos_embedding(
            jnp.arange(mel_inp.shape[1]))
        conds = cond_latent[:, None, :]
        emb = jnp.concatenate([conds.astype(text_emb.dtype), text_emb, mel_emb], axis=1)

        hidden, _ = self.gpt(emb)
        # First position is tied to the conditioning input (reference :427).
        enc = self.final_norm(hidden[:, 1:].astype(jnp.float32)).astype(hidden.dtype)

        t_text, t_mel = text_inp.shape[1], mel_inp.shape[1]
        if return_latent:
            mel_latents = enc[:, t_text:t_text + t_mel]
            return mel_latents[:, :-2]

        text_logits = self.text_head(enc[:, :t_text])
        mel_logits = self.mel_head(enc[:, -t_mel:])
        if return_logits:
            return text_logits, mel_logits

        loss_text = _xent(text_logits, text_tar)
        loss_mel = _xent(mel_logits, mel_tar)
        return loss_text, loss_mel, mel_logits

    # ------------------------------------------------------------------
    # Inference prompt (used by the sampler)
    # ------------------------------------------------------------------
    def compute_prompt(self, cond_latent, text_tokens):
        """Build the decode prompt embeddings
        [cond ‖ start,text…,stop,stop ‖ start_mel] (B, P, D).

        Mirrors inference_speech's input prep (reference :535-548): the text
        is padded with one extra stop token then wrapped with start/stop, and
        the trailing start_mel token carries mel position 0. ``text_tokens``
        is expected to already carry the api-level single stop pad
        (reference api.py:391), same as the teacher-forced ``__call__``.
        """
        cfg = self.config
        text_tokens = jnp.pad(text_tokens, ((0, 0), (0, 1)), constant_values=cfg.stop_text_token)
        text_tokens = jnp.pad(text_tokens, ((0, 0), (1, 0)), constant_values=cfg.start_text_token)
        text_emb = self.text_embedding(text_tokens) + self.text_pos_embedding(
            jnp.arange(text_tokens.shape[1]))
        conds = cond_latent[:, None, :].astype(text_emb.dtype)
        start = jnp.full((text_tokens.shape[0], 1), cfg.start_mel_token)
        start_emb = self.mel_embedding(start) + self.mel_pos_embedding(jnp.zeros((1,), jnp.int32))
        return jnp.concatenate([conds, text_emb, start_emb], axis=1)

    def decode_embed(self, tokens, step):
        """Embedding for generated mel token(s) at decode step ``step``.

        Replicates the reference's position bookkeeping
        (GPT2InferenceModel.forward, reference :145-149): the s-th sampled
        token enters with mel position s+2 (position 1 is never used).
        """
        return self.mel_embedding(tokens) + self.mel_pos_embedding(step + 2)

    def gpt_with_cache(self, emb, cache, cache_index):
        return self.gpt(emb, cache=cache, cache_index=cache_index)

    def hidden_to_mel_logits(self, hidden):
        enc = self.final_norm(hidden.astype(jnp.float32)).astype(hidden.dtype)
        return self.mel_head(enc)

    def hidden_to_latent(self, hidden):
        """final_norm'd hidden state — the stream the HiFi-GAN decoder consumes
        (reference stream_generator.py:982)."""
        return self.final_norm(hidden.astype(jnp.float32))


def init_unified_voice(model: UnifiedVoice, rng, host_side: bool | None = None) -> dict:
    """Initialize ALL parameter collections (linen creates submodule params
    lazily per method, so a plain ``init`` through ``__call__`` would miss the
    conditioning encoder).

    ``host_side`` (default: on for the full-size config) derives shapes via
    ``jax.eval_shape`` and fills them with host numpy randoms instead of
    compiling the (very large) on-device init program — the 30-layer init
    otherwise takes minutes to compile on a remote TPU.
    """
    cfg = model.config

    def touch_all(mdl):
        mdl.get_conditioning(jnp.zeros((1, 1, 16, 80)))
        mdl(jnp.zeros((1, cfg.model_dim)), jnp.zeros((1, 4), jnp.int32),
            jnp.zeros((1, 4), jnp.int32), jnp.full((1,), 4 * cfg.mel_length_compression))

    if host_side is None:
        host_side = cfg.layers * cfg.model_dim >= 8 * 1024
    if not host_side:
        if isinstance(rng, int):
            rng = jax.random.PRNGKey(rng)
        return model.init(rng, method=touch_all)

    import numpy as np

    # Host-side numpy fill (shared sibling-aware rules — qscale/int8/norms —
    # live in weights.host_init); params transfer lazily on first apply
    # (a 1.7 GB eager transfer through a tunneled TPU takes minutes).
    from tortoise_tpu import weights as weights_lib

    if isinstance(rng, int):
        seed = rng
    else:
        seed = int(np.asarray(jax.random.key_data(rng))[-1])
    return weights_lib.host_init(
        lambda: model.init(jax.random.PRNGKey(0), method=touch_all), seed=seed)


def _xent(logits, targets):
    logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
    nll = -jnp.take_along_axis(logp, targets[..., None], axis=-1)[..., 0]
    return nll.mean()
