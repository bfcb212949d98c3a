"""CLVP: contrastive text<->speech re-ranker (reference: tortoise/models/clvp.py).

Shipping config (reference api.py:229-232): 768-d text/speech/latent, 20+20
encoder layers, 12 heads, xformers variant (RMSNorm + GEGLU + rotary).
Scoring over a whole candidate batch is one batched matmul; the candidate
axis is shardable (see tortoise_tpu/parallel)."""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from tortoise_tpu.models.xtransformer import XTransformerEncoder


@dataclasses.dataclass(frozen=True)
class CLVPConfig:
    dim_text: int = 768
    dim_speech: int = 768
    dim_latent: int = 768
    num_text_tokens: int = 256
    text_enc_depth: int = 20
    text_heads: int = 12
    num_speech_tokens: int = 8192
    speech_enc_depth: int = 20
    speech_heads: int = 12
    # Non-xformers fallback (reference clvp.py:84-97): plain transformer
    # (models/simple_transformer.py) + learned absolute position tables.
    # The shipped checkpoint is xformers-trained, so True is the default;
    # text_seq_len sizes the fallback's text position table only
    # (reference api.py:230 passes 350).
    use_xformers: bool = True
    text_seq_len: int = 350


def masked_mean(t: jnp.ndarray, mask: jnp.ndarray | None) -> jnp.ndarray:
    """(B, T, D) -> (B, D) (reference clvp.py:15-17)."""
    if mask is None:
        return t.mean(axis=1)
    m = mask[..., None].astype(t.dtype)
    return (t * m).sum(axis=1) / mask.sum(axis=1)[..., None]


class CLVP(nn.Module):
    config: CLVPConfig = CLVPConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        self.text_emb = nn.Embed(cfg.num_text_tokens, cfg.dim_text, param_dtype=jnp.float32)
        self.speech_emb = nn.Embed(cfg.num_speech_tokens, cfg.dim_speech,
                                   param_dtype=jnp.float32)
        if cfg.use_xformers:
            self.text_transformer = XTransformerEncoder(cfg.dim_text, cfg.text_enc_depth,
                                                        cfg.text_heads, ff_mult=2.0,
                                                        dtype=self.dtype)
            self.speech_transformer = XTransformerEncoder(cfg.dim_speech, cfg.speech_enc_depth,
                                                          cfg.speech_heads, ff_mult=2.0,
                                                          dtype=self.dtype)
        else:
            from tortoise_tpu.models.simple_transformer import SimpleTransformer

            self.text_transformer = SimpleTransformer(cfg.dim_text, cfg.text_enc_depth,
                                                      cfg.text_heads, dtype=self.dtype)
            self.speech_transformer = SimpleTransformer(cfg.dim_speech, cfg.speech_enc_depth,
                                                        cfg.speech_heads, dtype=self.dtype)
            # learned absolute positions; the speech table is sized by the
            # token VOCAB — a reference quirk preserved for checkpoint
            # compatibility (reference clvp.py:96-97)
            self.text_pos_emb = nn.Embed(cfg.text_seq_len, cfg.dim_text,
                                         param_dtype=jnp.float32)
            self.speech_pos_emb = nn.Embed(cfg.num_speech_tokens, cfg.dim_speech,
                                           param_dtype=jnp.float32)
        self.to_text_latent = nn.Dense(cfg.dim_latent, use_bias=False, dtype=self.dtype,
                                       param_dtype=jnp.float32)
        self.to_speech_latent = nn.Dense(cfg.dim_latent, use_bias=False, dtype=self.dtype,
                                         param_dtype=jnp.float32)
        self.temperature = self.param("temperature", nn.initializers.ones, (), jnp.float32)

    def text_latents(self, text, mask=None):
        emb = self.text_emb(text)
        if not self.config.use_xformers:  # reference clvp.py:116-117
            emb = emb + self.text_pos_emb(jnp.arange(text.shape[1]))
        enc = self.text_transformer(emb, mask=mask)
        lat = self.to_text_latent(masked_mean(enc, mask))
        return lat / jnp.linalg.norm(lat.astype(jnp.float32), axis=-1, keepdims=True)

    def speech_latents(self, speech_tokens, mask=None):
        emb = self.speech_emb(speech_tokens)
        if not self.config.use_xformers:  # reference clvp.py:118
            emb = emb + self.speech_pos_emb(jnp.arange(speech_tokens.shape[1]))
        enc = self.speech_transformer(emb, mask=mask)
        lat = self.to_speech_latent(masked_mean(enc, mask))
        return lat / jnp.linalg.norm(lat.astype(jnp.float32), axis=-1, keepdims=True)

    def __call__(self, text, speech_tokens, return_loss: bool = False,
                 text_mask=None, voice_mask=None):
        """text: (B, Tt) int; speech_tokens: (B, Ts) int.
        Inference: per-pair cosine similarity x exp(temperature) (B,)
        (reference clvp.py:99-140). Training passes random token-dropout
        masks (the reference's text/voice_mask_percentage, clvp.py:106-108)."""
        tl = self.text_latents(text, mask=text_mask)
        sl = self.speech_latents(speech_tokens, mask=voice_mask)
        temp = jnp.exp(self.temperature)
        if not return_loss:
            return jnp.einsum("nd,nd->n", tl, sl) * temp
        sim = jnp.einsum("id,jd->ij", tl, sl) * temp
        labels = jnp.arange(sim.shape[0])
        loss_i = _xent_rows(sim, labels)
        loss_j = _xent_rows(sim.T, labels)
        return (loss_i + loss_j) / 2

    def score_candidates(self, text, candidate_tokens):
        """One text (1, Tt) vs B candidates (B, Ts) -> (B,) similarities.
        Equivalent to the reference's text.repeat(B) loop (api.py:463) but as
        a single text encode + batched speech encode."""
        tl = self.text_latents(text)          # (1, D)
        sl = self.speech_latents(candidate_tokens)  # (B, D)
        return (sl @ tl[0]) * jnp.exp(self.temperature)


def _xent_rows(sim, labels):
    logp = nn.log_softmax(sim.astype(jnp.float32), axis=-1)
    return -jnp.take_along_axis(logp, labels[:, None], axis=-1).mean()
