"""wav2vec2-CTC acoustic model (flax) for alignment/redaction.

JAX-native equivalent of the HF ``Wav2Vec2ForCTC`` checkpoint the reference
aligner loads (``jbetker/wav2vec2-large-robust-ft-libritts-voxpopuli``,
reference: tortoise/utils/wav2vec_alignment.py:48-57) — the "large-robust"
architecture: layer-norm feature extractor, stable-layer-norm (pre-LN)
encoder, grouped conv positional embeddings, CTC head over the tacotron
symbol set.

TPU-first engineering:
* encoder layers are weight-stacked under ``nn.scan`` (compile time scales
  with one layer, not 24);
* fused qkv projection, f32 softmax;
* variable-length audio runs through ONE compiled shape per bucket: the
  caller pads the waveform, passes the true sample count, and the model
  masks extracted features past the true frame count before the positional
  conv and masks pad keys in attention — the valid logits are exactly equal
  to an unpadded run (conv feature extraction uses VALID padding, so frames
  never straddle the pad boundary; everything else is per-position).
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class Wav2Vec2Config:
    """Defaults = wav2vec2-large-robust (the shipped aligner checkpoint)."""
    vocab_size: int = 64  # tacotron symbol set ('jbetker/tacotron-symbols')
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    conv_dim: tuple = (512, 512, 512, 512, 512, 512, 512)
    conv_kernel: tuple = (10, 3, 3, 3, 3, 2, 2)
    conv_stride: tuple = (5, 2, 2, 2, 2, 2, 2)
    num_conv_pos_embeddings: int = 128
    num_conv_pos_embedding_groups: int = 16
    layer_norm_eps: float = 1e-5

    def frame_count(self, n_samples: int):
        """Output frames for n input samples (HF _get_feat_extract_output_lengths:
        repeated floor((L - k) / s) + 1 — VALID convolutions)."""
        n = n_samples
        for k, s in zip(self.conv_kernel, self.conv_stride):
            n = (n - k) // s + 1
        return n


def _gelu(x):
    return nn.gelu(x, approximate=False)  # HF "gelu" is the exact erf form


class _FeatureExtractor(nn.Module):
    """Conv waveform front-end, layer-norm variant (feat_extract_norm="layer")."""
    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        # x: (B, T) -> (B, frames, conv_dim[-1])
        h = x[:, :, None].astype(self.dtype)
        cfg = self.config
        for i, (c, k, s) in enumerate(zip(cfg.conv_dim, cfg.conv_kernel,
                                          cfg.conv_stride)):
            h = nn.Conv(c, (k,), strides=(s,), padding="VALID", dtype=self.dtype,
                        param_dtype=jnp.float32, name=f"conv_{i}")(h)
            h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                             param_dtype=jnp.float32, name=f"ln_{i}")(
                h.astype(jnp.float32)).astype(self.dtype)
            h = _gelu(h)
        return h


class _EncoderLayer(nn.Module):
    """Stable-layer-norm (pre-LN) transformer layer."""
    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, key_mask):
        cfg = self.config
        c = cfg.hidden_size
        nh, dh = cfg.num_heads, c // cfg.num_heads
        b, t, _ = h.shape

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln_attn")(
            h.astype(jnp.float32)).astype(self.dtype)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32,
                       name="qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)
        k = k.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, t, nh, dh).transpose(0, 2, 1, 3)
        logits = jnp.einsum("bhtd,bhsd->bhts", q, k,
                            preferred_element_type=jnp.float32) / np.sqrt(dh)
        if key_mask is not None:
            logits = jnp.where(key_mask[:, None, None, :], logits, NEG_INF)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        attn = jnp.einsum("bhts,bhsd->bhtd", w, v)
        attn = attn.transpose(0, 2, 1, 3).reshape(b, t, c)
        h = h + nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                         name="attn_out")(attn)

        x = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="ln_ff")(
            h.astype(jnp.float32)).astype(self.dtype)
        x = _gelu(nn.Dense(cfg.intermediate_size, dtype=self.dtype,
                           param_dtype=jnp.float32, name="ff_in")(x))
        x = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                     name="ff_out")(x)
        return h + x


class Wav2Vec2ForCTC(nn.Module):
    config: Wav2Vec2Config = Wav2Vec2Config()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, audio, n_samples=None):
        """audio: (B, T) raw 16 kHz waveform, already zero-mean/unit-var
        normalized by the caller (reference wav2vec_alignment.py:65).
        ``n_samples``: true (unpadded) sample count; frames past its frame
        count are masked so the valid logits equal an unpadded run.

        Returns (logits (B, frames, vocab), n_frames scalar)."""
        cfg = self.config
        feats = _FeatureExtractor(cfg, dtype=self.dtype, name="feature_extractor")(audio)

        total_frames = feats.shape[1]
        if n_samples is None:
            n_frames = total_frames
            frame_mask = None
        else:
            n_frames = cfg.frame_count(n_samples)
            frame_mask = jnp.arange(total_frames)[None, :] < n_frames

        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="proj_ln")(
            feats.astype(jnp.float32)).astype(self.dtype)
        h = nn.Dense(cfg.hidden_size, dtype=self.dtype, param_dtype=jnp.float32,
                     name="proj")(h)
        if frame_mask is not None:
            # pad frames must be ZERO entering the positional conv: its
            # receptive field crosses the boundary, and zeros reproduce the
            # conv's own zero padding at the true sequence end
            h = h * frame_mask[:, :, None].astype(h.dtype)

        # grouped positional conv (weight norm folded at conversion); even
        # kernel -> one trailing frame dropped (HF num_pad_remove)
        k = cfg.num_conv_pos_embeddings
        pos = nn.Conv(cfg.hidden_size, (k,), padding=k // 2,
                      feature_group_count=cfg.num_conv_pos_embedding_groups,
                      dtype=self.dtype, param_dtype=jnp.float32, name="pos_conv")(h)
        if k % 2 == 0:
            pos = pos[:, :-1]
        h = h + _gelu(pos)

        h = _ScanBody(cfg, dtype=self.dtype, name="layers")(h, frame_mask)
        h = nn.LayerNorm(epsilon=cfg.layer_norm_eps, dtype=jnp.float32,
                         param_dtype=jnp.float32, name="encoder_ln")(
            h.astype(jnp.float32))
        logits = nn.Dense(cfg.vocab_size, dtype=jnp.float32,
                          param_dtype=jnp.float32, name="lm_head")(h)
        return logits, n_frames


class _ScanBody(nn.Module):
    config: Wav2Vec2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, h, key_mask):
        def body(layer, carry, _):
            return layer(carry, key_mask), None

        scanned = nn.scan(body, variable_axes={"params": 0},
                          split_rngs={"params": True},
                          length=self.config.num_layers,
                          metadata_params={"partition_name": None})
        h, _ = scanned(_EncoderLayer(self.config, dtype=self.dtype,
                                     name="layer"), h,
                       jnp.zeros((self.config.num_layers,)))
        return h
