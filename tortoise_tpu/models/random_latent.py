"""Random-voice latent generators (reference:
tortoise/models/random_latent_generator.py). Maps N(0,1) noise to a
plausible conditioning latent via 5 EqualLinear layers (StyleGAN-style
equalized lr, fused-bias leaky-relu with sqrt(2) gain) + a final Linear."""
from __future__ import annotations

import math

import flax.linen as nn
import jax
import jax.numpy as jnp


class EqualLinear(nn.Module):
    features: int
    lr_mul: float = 0.1

    @nn.compact
    def __call__(self, x):
        in_dim = x.shape[-1]
        weight = self.param("weight", nn.initializers.normal(1.0 / self.lr_mul),
                            (self.features, in_dim), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        scale = (1.0 / math.sqrt(in_dim)) * self.lr_mul
        y = x @ (weight * scale).T
        y = nn.leaky_relu(y + bias * self.lr_mul, 0.2) * math.sqrt(2.0)
        return y


class RandomLatentConverter(nn.Module):
    channels: int

    @nn.compact
    def __call__(self, noise):
        """noise: (B, channels) standard normal -> (B, channels) latent."""
        h = noise
        for i in range(5):
            h = EqualLinear(self.channels, lr_mul=0.1, name=f"eq_{i}")(h)
        return nn.Dense(self.channels, name="final")(h)


def sample_random_latent(model: RandomLatentConverter, variables, rng, batch: int = 1):
    noise = jax.random.normal(rng, (batch, model.channels))
    return model.apply(variables, noise)
