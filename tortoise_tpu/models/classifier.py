"""Tortoise-detect classifier (reference: tortoise/models/classifier.py).

AudioMiniEncoder pyramid over the raw waveform + linear head; shipping
config (reference api.py:139-141): 2 classes, spec_dim=1, embedding 512,
depth 5, downsample 4, base 32, kernel 5."""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax.numpy as jnp

from tortoise_tpu.models.blocks import AudioMiniEncoder


@dataclasses.dataclass(frozen=True)
class ClassifierConfig:
    classes: int = 2
    spec_dim: int = 1
    embedding_dim: int = 512
    base_channels: int = 32
    depth: int = 5
    resnet_blocks: int = 2
    attn_blocks: int = 4
    num_attn_heads: int = 4
    downsample_factor: int = 4
    kernel_size: int = 5


class AudioMiniEncoderWithClassifierHead(nn.Module):
    config: ClassifierConfig = ClassifierConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_btc):
        """x_btc: (B, T, spec_dim) waveform -> (B, classes) logits."""
        cfg = self.config
        h = AudioMiniEncoder(
            spec_dim=cfg.spec_dim, embedding_dim=cfg.embedding_dim,
            base_channels=cfg.base_channels, depth=cfg.depth,
            resnet_blocks=cfg.resnet_blocks, attn_blocks=cfg.attn_blocks,
            num_attn_heads=cfg.num_attn_heads,
            downsample_factor=cfg.downsample_factor, kernel_size=cfg.kernel_size,
            dtype=self.dtype, name="enc")(x_btc)
        return nn.Dense(cfg.classes, dtype=self.dtype, param_dtype=jnp.float32,
                        name="head")(h)


def classify_audio_clip(clip, variables, config: ClassifierConfig = ClassifierConfig()):
    """Probability the clip came from Tortoise (reference api.py:133-145).
    clip: (T,) or (1, T) waveform."""
    import jax

    clip = jnp.asarray(clip)
    if clip.ndim == 1:
        clip = clip[None]
    model = AudioMiniEncoderWithClassifierHead(config)
    logits = model.apply(variables, clip[:, :, None])
    return float(jax.nn.softmax(logits, axis=-1)[0, 0])
