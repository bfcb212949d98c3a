"""Minimal x-transformers Encoder — exactly the subset CLVP/CVVP use.

The reference vendors the full lucidrains x-transformers library
(reference: tortoise/models/xtransformers.py, 1248 LoC of mostly dead
optionality); the shipped CLVP/CVVP configs only exercise: pre-norm RMSNorm,
GEGLU feed-forward, rotary position embeddings applied to the first
``rot_dim`` channels of q, k *and* v (a quirk of the vendored version,
xtransformers.py:628-632), plain residuals, and a final LayerNorm
(ContinuousTransformerWrapper, xtransformers.py:1187-1247).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -jnp.inf


class RMSNorm(nn.Module):
    """lucidrains RMSNorm: x / max(||x||·d^-1/2, eps) · g (xtransformers.py:334-343)."""
    dim: int
    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        g = self.param("g", nn.initializers.ones, (self.dim,), jnp.float32)
        norm = jnp.linalg.norm(x.astype(jnp.float32), axis=-1, keepdims=True) * self.dim ** -0.5
        return (x / jnp.clip(norm, min=self.eps) * g).astype(x.dtype)


def rotary_freqs(seq_len: int, rot_dim: int) -> np.ndarray:
    """(seq_len, rot_dim) rotary angle table (xtransformers.py:264-276)."""
    inv_freq = 1.0 / (10000 ** (np.arange(0, rot_dim, 2, dtype=np.float32) / rot_dim))
    t = np.arange(seq_len, dtype=np.float32)
    freqs = np.einsum("i,j->ij", t, inv_freq)
    return np.concatenate([freqs, freqs], axis=-1)


def apply_rotary(t: jnp.ndarray, freqs: jnp.ndarray) -> jnp.ndarray:
    """t: (..., T, rot_dim). Halves convention (xtransformers.py:279-289)."""
    d = t.shape[-1]
    x1, x2 = t[..., : d // 2], t[..., d // 2:]
    rotated = jnp.concatenate([-x2, x1], axis=-1)
    return t * jnp.cos(freqs) + rotated * jnp.sin(freqs)


class EncoderAttention(nn.Module):
    dim: int
    heads: int
    dim_head: int = 64
    rot_dim: int = 32
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        q = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                     name="to_q")(x)
        k = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                     name="to_k")(x)
        v = nn.Dense(inner, use_bias=False, dtype=self.dtype, param_dtype=jnp.float32,
                     name="to_v")(x)
        q, k, v = (t.reshape(b, n, h, dh).transpose(0, 2, 1, 3) for t in (q, k, v))

        freqs = jnp.asarray(rotary_freqs(n, self.rot_dim))
        rot = lambda t: jnp.concatenate(
            [apply_rotary(t[..., : self.rot_dim], freqs), t[..., self.rot_dim:]], axis=-1)
        q, k, v = rot(q), rot(k), rot(v)  # v too — vendored-version quirk

        logits = jnp.einsum("bhid,bhjd->bhij", q, k,
                            preferred_element_type=jnp.float32) * dh ** -0.5
        if mask is not None:
            pair = mask[:, None, :, None] & mask[:, None, None, :]
            logits = jnp.where(pair, logits, jnp.finfo(logits.dtype).min)
        attn = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v.astype(self.dtype))
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="to_out")(out)


class GEGLUFeedForward(nn.Module):
    """GLU-with-GELU feed-forward (xtransformers.py:425-478, glu=True).
    Uses exact (erf) GELU like torch nn.GELU."""
    dim: int
    mult: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        inner = int(self.dim * self.mult)
        proj = nn.Dense(inner * 2, dtype=self.dtype, param_dtype=jnp.float32,
                        name="proj")(x)
        val, gate = jnp.split(proj, 2, axis=-1)
        h = val * nn.gelu(gate, approximate=False)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="out")(h)


class _EncoderLayerScanBody(nn.Module):
    """One pre-norm attn+ff layer as a scan body (weight-stacked depth)."""
    dim: int
    heads: int
    ff_mult: float
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        h = RMSNorm(self.dim, name="attn_norm")(x)
        x = x + EncoderAttention(self.dim, self.heads, dtype=self.dtype,
                                 name="attn")(h, mask=mask)
        h = RMSNorm(self.dim, name="ff_norm")(x)
        x = x + GEGLUFeedForward(self.dim, self.ff_mult, dtype=self.dtype,
                                 name="ff")(h)
        return x, None


class XTransformerEncoder(nn.Module):
    """Pre-norm encoder + final LayerNorm, matching
    CheckpointedXTransformerEncoder(ContinuousTransformerWrapper(Encoder(...)))
    with use_rmsnorm, ff_glu, rotary_pos_emb (reference clvp.py:54-88).

    Depth is weight-stacked and driven by nn.scan, shrinking the HLO
    depth-fold (CLVP is 20+20 layers; compiles matter on a remote TPU).
    Param layout: {"layers_scan": {attn_norm, attn, ff_norm, ff}} stacked."""
    dim: int
    depth: int
    heads: int
    ff_mult: float = 2.0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        scan = nn.scan(_EncoderLayerScanBody,
                       variable_axes={"params": 0},
                       split_rngs={"params": True},
                       in_axes=(nn.broadcast,), out_axes=0,
                       length=self.depth)
        x, _ = scan(self.dim, self.heads, self.ff_mult, dtype=self.dtype,
                    name="layers_scan")(x, mask)
        return nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, param_dtype=jnp.float32,
                            name="final_norm")(x.astype(jnp.float32)).astype(x.dtype)
