"""DiffusionTts: latent/code-conditioned mel diffusion decoder.

TPU-native re-implementation of the reference model
(reference: tortoise/models/diffusion_decoder.py:134-322): a flat 1-D stack
of 10 DiffusionLayers (scale-shift ResBlock + relative-position attention)
plus 3 timestep ResBlocks at d=1024, fed by either discrete mel codes or
1024-d AR latents, FiLM'd by a 2048-d voice latent, with a learned
unconditioned embedding for conditioning-free guidance.

Shipping config (reference api.py:224-226): model_channels=1024,
num_layers=10, in_channels=100, out_channels=200 (mean + learned-range
variance), num_heads=16.

The timestep-independent conditioning stack is computed once per sample and
reused across all diffusion steps (the reference's key perf trick,
api.py:124); the sampler batches the cond/uncond CFG pair in one forward.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp
import numpy as np

from tortoise_tpu.models.blocks import (AttentionBlock, GroupNorm32,
                                        MatmulConv1D)
from tortoise_tpu.ops.interpolate import nearest_interpolate


def timestep_embedding(timesteps: jnp.ndarray, dim: int, max_period: int = 10000):
    """Sinusoidal embeddings, cos-first (reference diffusion_decoder.py:21-39)."""
    half = dim // 2
    # float64 frequency table (static), more accurate than the reference's
    # all-f32 chain; differences are < 1e-2 at t=4000 and inaudible.
    freqs = jnp.asarray(np.exp(-np.log(max_period) * np.arange(half, dtype=np.float64)
                               / half).astype(np.float32))
    args = timesteps[:, None].astype(jnp.float32) * freqs[None]
    emb = jnp.concatenate([jnp.cos(args), jnp.sin(args)], axis=-1)
    if dim % 2:
        emb = jnp.concatenate([emb, jnp.zeros_like(emb[:, :1])], axis=-1)
    return emb


class TimestepResBlock(nn.Module):
    """Scale-shift-norm ResBlock (reference diffusion_decoder.py:60-120,
    efficient_config=True: 1x1 in/skip convs, k3 out conv)."""
    channels: int
    emb_channels: int
    out_channels: int | None = None
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, valid_mask=None):
        out_ch = self.out_channels or self.channels
        pad = {1: 0, 3: 1, 5: 2}[self.kernel_size]
        h = GroupNorm32(self.channels)(x, mask=valid_mask)
        h = nn.silu(h)
        h = nn.Dense(out_ch, dtype=self.dtype, param_dtype=jnp.float32,
                     name="in_conv")(h)  # efficient 1x1 conv
        e = nn.Dense(2 * out_ch, dtype=self.dtype, param_dtype=jnp.float32,
                     name="emb_proj")(nn.silu(emb))
        scale, shift = jnp.split(e[:, None, :], 2, axis=-1)
        h = GroupNorm32(out_ch)(h, mask=valid_mask) * (1 + scale) + shift
        h = nn.silu(h)
        if valid_mask is not None:
            # zero pads so the k3 conv at the boundary sees the same zeros an
            # unpadded (zero-padded) run would
            h = h * valid_mask[:, :, None].astype(h.dtype)
        # shifted-matmul conv: same params as nn.Conv, avoids the
        # batch-as-sublanes conv layout (blocks.MatmulConv1D)
        h = MatmulConv1D(out_ch, self.kernel_size, dtype=self.dtype,
                         name="out_conv")(h)
        if out_ch == self.channels:
            skip = x
        else:
            skip = nn.Dense(out_ch, dtype=self.dtype, param_dtype=jnp.float32,
                            name="skip_conv")(x)
        out = skip + h
        if valid_mask is not None:
            out = out * valid_mask[:, :, None].astype(out.dtype)
        return out


class DiffusionLayer(nn.Module):
    """TimestepResBlock + relative-position AttentionBlock
    (reference diffusion_decoder.py:123-131)."""
    channels: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, emb, valid_mask=None, precomputed_bias=None):
        h = TimestepResBlock(self.channels, self.channels, dtype=self.dtype,
                             name="resblk")(x, emb, valid_mask=valid_mask)
        return AttentionBlock(self.channels, self.num_heads,
                              relative_pos_embeddings=True, dtype=self.dtype,
                              name="attn")(h, valid_mask=valid_mask,
                                           precomputed_bias=precomputed_bias)


class _DiffLayerScanBody(nn.Module):
    """Scan body for the identical DiffusionLayer stack (weight-stacked)."""
    channels: int
    num_heads: int
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, time_emb, valid_mask, precomputed_bias):
        h = DiffusionLayer(self.channels, self.num_heads, dtype=self.dtype,
                           name="layer")(h, time_emb, valid_mask=valid_mask,
                                         precomputed_bias=precomputed_bias)
        return h, None


def _scanned_diff_layers(channels, num_heads, dtype, length, name):
    # xs axes: time_emb/valid_mask broadcast; per-layer precomputed bias scanned
    return nn.scan(_DiffLayerScanBody,
                   variable_axes={"params": 0},
                   split_rngs={"params": True},
                   in_axes=(nn.broadcast, nn.broadcast, 0), out_axes=0,
                   length=length)(channels, num_heads, dtype=dtype, name=name)


@dataclasses.dataclass(frozen=True)
class DiffusionTtsConfig:
    model_channels: int = 1024
    num_layers: int = 10
    in_channels: int = 100
    in_latent_channels: int = 1024
    in_tokens: int = 8193
    out_channels: int = 200
    num_heads: int = 16


class DiffusionTts(nn.Module):
    config: DiffusionTtsConfig = DiffusionTtsConfig()
    dtype: jnp.dtype = jnp.float32

    def setup(self):
        cfg = self.config
        ch = cfg.model_channels
        self.inp_block = nn.Conv(ch, (3,), padding=1, dtype=self.dtype,
                                 param_dtype=jnp.float32)
        self.time_embed_1 = nn.Dense(ch, dtype=self.dtype, param_dtype=jnp.float32)
        self.time_embed_2 = nn.Dense(ch, dtype=self.dtype, param_dtype=jnp.float32)

        self.code_embedding = nn.Embed(cfg.in_tokens, ch, param_dtype=jnp.float32)
        self.code_converter = [
            AttentionBlock(ch, cfg.num_heads, relative_pos_embeddings=True,
                           dtype=self.dtype) for _ in range(3)]
        self.code_norm = GroupNorm32(ch)
        self.latent_conv = nn.Conv(ch, (3,), padding=1, dtype=self.dtype,
                                   param_dtype=jnp.float32)
        self.latent_attn = [
            AttentionBlock(ch, cfg.num_heads, relative_pos_embeddings=True,
                           dtype=self.dtype) for _ in range(4)]

        self.ctx_conv1 = nn.Conv(ch, (3,), strides=(2,), padding=1, dtype=self.dtype,
                                 param_dtype=jnp.float32)
        self.ctx_conv2 = nn.Conv(ch * 2, (3,), strides=(2,), padding=1,
                                 dtype=self.dtype, param_dtype=jnp.float32)
        self.ctx_attn = [
            AttentionBlock(ch * 2, cfg.num_heads, relative_pos_embeddings=True,
                           dtype=self.dtype) for _ in range(5)]

        self.unconditioned_embedding = self.param(
            "unconditioned_embedding", nn.initializers.normal(1.0), (1, 1, ch),
            jnp.float32)
        self.cond_scan = _scanned_diff_layers(ch, cfg.num_heads, self.dtype, 3,
                                              "cond_scan")
        self.integrating_conv = nn.Dense(ch, dtype=self.dtype, param_dtype=jnp.float32)
        self.mel_head = nn.Conv(cfg.in_channels, (3,), padding=1, dtype=self.dtype,
                                param_dtype=jnp.float32)

        self.layers_scan = _scanned_diff_layers(ch, cfg.num_heads, self.dtype,
                                                cfg.num_layers, "layers_scan")
        self.tail = [TimestepResBlock(ch, ch, dtype=self.dtype) for _ in range(3)]

        self.out_norm = GroupNorm32(ch)
        self.out_conv = nn.Conv(cfg.out_channels, (3,), padding=1,
                                dtype=jnp.float32, param_dtype=jnp.float32)

    # ------------------------------------------------------------------
    def get_conditioning(self, cond_mels: jnp.ndarray) -> jnp.ndarray:
        """cond_mels: (B, n_clips, T, 100) univnet mels -> (B, 2048) voice
        latent: per-clip contextual embedder, mean over clips x time
        (reference diffusion_decoder.py:222-230)."""
        b, n, t, c = cond_mels.shape
        h = cond_mels.reshape(b * n, t, c)
        h = self.ctx_conv1(h)
        h = self.ctx_conv2(h)
        for blk in self.ctx_attn:
            h = blk(h)
        h = h.reshape(b, n * h.shape[1], -1)  # concat clips along time
        return h.mean(axis=1)

    # ------------------------------------------------------------------
    def timestep_independent(self, aligned_conditioning, conditioning_latent,
                             expected_seq_len: int, return_code_pred: bool = False):
        """Code/latent conditioning path, FiLM'd and nearest-resized to the
        output length (reference diffusion_decoder.py:232-260).

        aligned_conditioning: int codes (B, S) or float latents (B, S, 1024).
        conditioning_latent: (B, 2048).
        """
        if jnp.issubdtype(aligned_conditioning.dtype, jnp.floating):
            code_emb = self.latent_conv(aligned_conditioning)
            for blk in self.latent_attn:
                code_emb = blk(code_emb)
        else:
            code_emb = self.code_embedding(aligned_conditioning)
            for blk in self.code_converter:
                code_emb = blk(code_emb)
        cond_scale, cond_shift = jnp.split(conditioning_latent, 2, axis=-1)
        code_emb = self.code_norm(code_emb) * (1 + cond_scale[:, None]) \
            + cond_shift[:, None]
        expanded = nearest_interpolate(code_emb, expected_seq_len)
        if not return_code_pred:
            return expanded
        return expanded, self.mel_head(expanded)

    def timestep_independent_bucketed(self, latents, n_latents,
                                      conditioning_latent, out_len,
                                      out_bucket: int):
        """Bucketed/masked variant of ``timestep_independent`` (latent path).

        latents: (B, S_bucket, D) zero-padded; n_latents: true count (scalar
        or (B,) — per-element lengths batch k re-ranked winners through ONE
        call/program, SURVEY §2.5 diffusion fan-out); out_len: true output
        frames (scalar or (B,)); out_bucket: static padded output length.
        The first ``out_len[b]`` frames of row b equal an exact-length run;
        the rest are zero.
        """
        b, s_bucket, _ = latents.shape
        n_latents = jnp.broadcast_to(jnp.reshape(n_latents, (-1,)), (b,))
        out_len = jnp.broadcast_to(jnp.reshape(out_len, (-1,)), (b,))
        lat_mask = jnp.arange(s_bucket)[None, :] < n_latents[:, None]
        latents = latents * lat_mask[:, :, None].astype(latents.dtype)
        code_emb = self.latent_conv(latents)
        for blk in self.latent_attn:
            code_emb = blk(code_emb, valid_mask=lat_mask)
        cond_scale, cond_shift = jnp.split(conditioning_latent, 2, axis=-1)
        code_emb = self.code_norm(code_emb, mask=lat_mask) \
            * (1 + cond_scale[:, None]) + cond_shift[:, None]
        code_emb = code_emb * lat_mask[:, :, None].astype(code_emb.dtype)
        # dynamic nearest interpolation: frame i < out_len[b] reads latent
        # floor(i * n[b] / out_len[b]) — identical to
        # F.interpolate(..., 'nearest') at the exact length
        i = jnp.arange(out_bucket)
        idx = jnp.clip((i[None, :] * n_latents[:, None])
                       // jnp.maximum(out_len[:, None], 1), 0, s_bucket - 1)
        expanded = jnp.take_along_axis(code_emb, idx[:, :, None], axis=1)
        out_mask = (i[None, :] < out_len[:, None])[:, :, None]
        return expanded * out_mask.astype(expanded.dtype)

    # ------------------------------------------------------------------
    def __call__(self, x, timesteps, precomputed_aligned_embeddings=None,
                 aligned_conditioning=None, conditioning_latent=None,
                 conditioning_free: bool = False, valid_len=None,
                 rel_biases=None):
        """x: (B, T, 100) noisy mel; timesteps: (B,) original-scale ints.
        Returns (B, T, 200): mean and learned-range variance channels
        (reference diffusion_decoder.py:262-322).

        ``valid_len`` (scalar or (B,)): treat positions >= valid_len as
        right-padding. Masked norms/attention make the valid region exactly
        equal to an unpadded run, so one compiled program serves a whole
        bucket of output lengths."""
        cfg = self.config
        valid_mask = None
        if valid_len is not None:
            pos = jnp.arange(x.shape[1])[None, :]
            valid_mask = pos < jnp.reshape(jnp.asarray(valid_len), (-1, 1))
            valid_mask = jnp.broadcast_to(valid_mask, (x.shape[0], x.shape[1]))
            x = x * valid_mask[:, :, None].astype(x.dtype)
        if conditioning_free:
            code_emb = jnp.broadcast_to(
                self.unconditioned_embedding.astype(self.dtype),
                (x.shape[0], x.shape[1], cfg.model_channels))
            if valid_mask is not None:
                code_emb = code_emb * valid_mask[:, :, None].astype(code_emb.dtype)
        elif precomputed_aligned_embeddings is not None:
            code_emb = precomputed_aligned_embeddings
        else:
            code_emb = self.timestep_independent(
                aligned_conditioning, conditioning_latent, x.shape[1])

        time_emb = self.time_embed_2(nn.silu(self.time_embed_1(
            timestep_embedding(timesteps, cfg.model_channels))))
        if rel_biases is None:
            rel_biases = (None, None)
        code_emb, _ = self.cond_scan(code_emb, time_emb, valid_mask, rel_biases[1])
        h = self.inp_block(x)
        h = jnp.concatenate([h, code_emb], axis=-1)
        h = self.integrating_conv(h)
        h, _ = self.layers_scan(h, time_emb, valid_mask, rel_biases[0])
        for lyr in self.tail:
            h = lyr(h, time_emb, valid_mask=valid_mask)
        h = h.astype(jnp.float32)
        h = self.out_norm(h, mask=valid_mask)
        h = nn.silu(h)
        if valid_mask is not None:
            h = h * valid_mask[:, :, None].astype(h.dtype)
        return self.out_conv(h)


def init_diffusion_tts(model: DiffusionTts, rng) -> dict:
    """Initialize all param collections (all methods touched)."""
    cfg = model.config

    def touch_all(mdl):
        cond = mdl.get_conditioning(jnp.zeros((1, 1, 16, cfg.in_channels)))
        pre = mdl.timestep_independent(jnp.zeros((1, 4), jnp.int32), cond, 8,
                                       return_code_pred=True)[0]
        lat_pre = mdl.timestep_independent(
            jnp.zeros((1, 4, cfg.in_latent_channels)), cond, 8)
        mdl(jnp.zeros((1, 8, cfg.in_channels)), jnp.zeros((1,), jnp.int32),
            precomputed_aligned_embeddings=pre)
        mdl(jnp.zeros((1, 8, cfg.in_channels)), jnp.zeros((1,), jnp.int32),
            conditioning_free=True)

    return model.init(rng, method=touch_all)


def compute_rel_biases(params: dict, config: DiffusionTtsConfig, t: int,
                       dtype=jnp.bfloat16):
    """Precompute the per-layer relative-position bias stacks for a T-frame
    run: (L, H, T, T) for the main layer scan and (3, H, T, T) for the
    conditioning integrator. Done once per sampling call and threaded through
    the timestep loop — recomputing the (T, T) table gather inside every
    diffusion step measured ~68 ms/step (77%% of the step)."""
    from tortoise_tpu.models.blocks import _np_relative_position_bucket

    buckets = _np_relative_position_bucket(
        np.arange(t)[None, :] - np.arange(t)[:, None], 32, 64, False)
    scale = (config.model_channels // config.num_heads) ** 0.5
    idx = jnp.asarray(buckets.reshape(-1))

    def expand(table_stack):
        # Keep the gather output's minor dim merged (L*H=160 -> 256-lane pad,
        # 1.6x) — separate (…,10,16) minor dims tile-pad 16->128 lanes (8x)
        # and the allocation OOMs at T~2k.
        l, nb, h2 = table_stack.shape
        tab2 = jnp.asarray(table_stack).transpose(1, 0, 2).reshape(nb, l * h2)
        flat = jnp.take(tab2, idx, axis=0)                     # (T*T, L*H)
        bias = flat.T.reshape(l, h2, t, t)
        return (bias * scale).astype(dtype)

    b_layers = expand(params["layers_scan"]["layer"]["attn"]["rel_pos"]["embedding"])
    b_cond = expand(params["cond_scan"]["layer"]["attn"]["rel_pos"]["embedding"])
    return b_layers, b_cond


def compute_rel_bias_blocks(params: dict, config: DiffusionTtsConfig, t: int,
                            dtype=jnp.bfloat16):
    """Toeplitz bias TILE stacks for the Pallas flash-attention path:
    ((L, H, 2*nq-1, bq, bq), (3, H, ...)). ~60x smaller than the dense
    (L, H, T, T) tables of ``compute_rel_biases`` at T~1100 — block pairs on
    the same block diagonal share one tile (see ops/attn_pallas.py)."""
    from tortoise_tpu.ops.attn_pallas import rel_bias_blocks

    scale = (config.model_channels // config.num_heads) ** 0.5
    b_layers = rel_bias_blocks(
        params["layers_scan"]["layer"]["attn"]["rel_pos"]["embedding"],
        t, scale, dtype=dtype)
    b_cond = rel_bias_blocks(
        params["cond_scan"]["layer"]["attn"]["rel_pos"]["embedding"],
        t, scale, dtype=dtype)
    return b_layers, b_cond
