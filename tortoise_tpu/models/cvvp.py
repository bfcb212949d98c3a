"""CVVP: contrastive voice<->voice re-ranker (reference: tortoise/models/cvvp.py).

Shipping config (reference api.py:254-255): 512-d, 8 heads, depth 8 both
sides, mel_codes=8192 (speech side consumes discrete mel codes)."""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from tortoise_tpu.models.blocks import AttentionBlock
from tortoise_tpu.models.xtransformer import XTransformerEncoder


@dataclasses.dataclass(frozen=True)
class CVVPConfig:
    model_dim: int = 512
    transformer_heads: int = 8
    conditioning_enc_depth: int = 8
    speech_enc_depth: int = 8
    mel_channels: int = 80
    mel_codes: int | None = 8192
    latent_multiplier: int = 1


class CollapsingTransformer(nn.Module):
    """Encoder -> 1x1 convs + AttentionBlock -> mean over time
    (reference cvvp.py:19-51)."""
    model_dim: int
    output_dims: int
    heads: int
    depth: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        h = XTransformerEncoder(self.model_dim, self.depth, self.heads, ff_mult=1.0,
                                dtype=self.dtype, name="transformer")(x)
        h = nn.Dense(self.output_dims, dtype=self.dtype, param_dtype=jnp.float32,
                     name="pre_conv")(h)
        h = AttentionBlock(self.output_dims, self.heads, dtype=self.dtype,
                           name="pre_attn")(h)
        h = nn.Dense(self.output_dims, dtype=self.dtype, param_dtype=jnp.float32,
                     name="post_conv")(h)
        return h.mean(axis=1)


class CVVP(nn.Module):
    config: CVVPConfig = CVVPConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        latent_dim = cfg.latent_multiplier * cfg.model_dim
        self.cond_conv1 = nn.Conv(cfg.model_dim // 2, (5,), strides=(2,), padding=2,
                                  dtype=self.dtype, param_dtype=jnp.float32)
        self.cond_conv2 = nn.Conv(cfg.model_dim, (3,), strides=(2,), padding=1,
                                  dtype=self.dtype, param_dtype=jnp.float32)
        self.conditioning_transformer = CollapsingTransformer(
            cfg.model_dim, cfg.model_dim, cfg.transformer_heads,
            cfg.conditioning_enc_depth, dtype=self.dtype)
        self.to_conditioning_latent = nn.Dense(latent_dim, use_bias=False,
                                               dtype=self.dtype, param_dtype=jnp.float32)
        if cfg.mel_codes is None:
            self.speech_emb = nn.Conv(cfg.model_dim, (5,), padding=2, dtype=self.dtype,
                                      param_dtype=jnp.float32)
        else:
            self.speech_emb = nn.Embed(cfg.mel_codes, cfg.model_dim,
                                       param_dtype=jnp.float32)
        self.speech_transformer = CollapsingTransformer(
            cfg.model_dim, latent_dim, cfg.transformer_heads, cfg.speech_enc_depth,
            dtype=self.dtype)
        self.to_speech_latent = nn.Dense(latent_dim, use_bias=False, dtype=self.dtype,
                                         param_dtype=jnp.float32)
        self.temperature = self.param("temperature", nn.initializers.ones, (), jnp.float32)

    def cond_latents(self, mel_cond):
        """mel_cond: (B, T, mel_channels)."""
        h = self.cond_conv2(self.cond_conv1(mel_cond))
        lat = self.to_conditioning_latent(self.conditioning_transformer(h))
        return lat / jnp.linalg.norm(lat.astype(jnp.float32), axis=-1, keepdims=True)

    def speech_latents(self, mel_input):
        """mel_input: (B, Ts) int codes (or (B, T, mel) if mel_codes is None)."""
        h = self.speech_emb(mel_input)
        lat = self.to_speech_latent(self.speech_transformer(h))
        return lat / jnp.linalg.norm(lat.astype(jnp.float32), axis=-1, keepdims=True)

    def __call__(self, mel_cond, mel_input, return_loss: bool = False):
        cl = self.cond_latents(mel_cond)
        sl = self.speech_latents(mel_input)
        temp = jnp.exp(self.temperature)
        if not return_loss:
            return jnp.einsum("nd,nd->n", cl, sl) * temp
        sim = jnp.einsum("id,jd->ij", cl, sl) * temp
        labels = jnp.arange(sim.shape[0])
        logp_i = nn.log_softmax(sim.astype(jnp.float32), axis=-1)
        logp_j = nn.log_softmax(sim.T.astype(jnp.float32), axis=-1)
        li = -jnp.take_along_axis(logp_i, labels[:, None], axis=-1).mean()
        lj = -jnp.take_along_axis(logp_j, labels[:, None], axis=-1).mean()
        return (li + lj) / 2
