"""Non-xformers CLVP fallback transformer (reference: tortoise/models/transformer.py).

The shipped CLVP checkpoint uses the x-transformers variant, so this stack
never loads released weights — the reference constructs it only when
``use_xformers=False`` (reference clvp.py:84-97) — but it completes the
model inventory and supports CLVP configs trained without x-formers.

Semantics per layer (reference transformer.py:182-219): two residual
branches, ``x += LayerScale(PreNorm(Attention)); x += LayerScale(PreNorm(GEGLU FF))``,
where LayerScale (reference transformer.py:79-94, CaiT arXiv:2103.17239)
initializes a per-channel gain from the 1-based layer index (0.1 up to
layer 18, 1e-5 through 24, 1e-6 beyond). Unlike the x-formers variant there
is no rotary embedding — position information comes from learned absolute
tables added by the caller (reference clvp.py:95-97,116-118).

TPU notes: layers are plain Python-unrolled modules (the per-layer
LayerScale init breaks scan homogeneity, and this path is not a hot loop);
attention is a single jnp.einsum chain XLA fuses per layer; masking uses
``jnp.where`` with the dtype's lowest value, matching the reference's
``masked_fill(~mask, -finfo.max)`` (transformer.py:163-166).
"""
from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def layerscale_init(layer_index_1based: int) -> float:
    """CaiT init epsilon by depth (reference transformer.py:81-87)."""
    if layer_index_1based <= 18:
        return 0.1
    if layer_index_1based <= 24:
        return 1e-5
    return 1e-6


class SimpleAttention(nn.Module):
    """Plain multi-head attention (reference transformer.py:135-178):
    bias-free fused qkv, scaled dot-product, optional key-padding mask,
    optional causal mask, biased output projection."""
    dim: int
    heads: int
    dim_head: int = 64
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        b, n, _ = x.shape
        h, dh = self.heads, self.dim_head
        inner = h * dh
        qkv = nn.Dense(3 * inner, use_bias=False, dtype=self.dtype,
                       param_dtype=jnp.float32, name="to_qkv")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        q = q.reshape(b, n, h, dh).transpose(0, 2, 1, 3) * dh ** -0.5
        k = k.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        v = v.reshape(b, n, h, dh).transpose(0, 2, 1, 3)
        dots = jnp.einsum("bhid,bhjd->bhij", q, k)
        neg = jnp.finfo(dots.dtype).min
        if mask is not None:  # key-padding mask (B, T), True = keep
            dots = jnp.where(mask[:, None, None, :], dots, neg)
        if self.causal:
            keep = jnp.tril(jnp.ones((n, n), bool))
            dots = jnp.where(keep[None, None], dots, neg)
        attn = nn.softmax(dots.astype(jnp.float32), axis=-1).astype(self.dtype)
        out = jnp.einsum("bhij,bhjd->bhid", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="to_out")(out)


class SimpleFeedForward(nn.Module):
    """GEGLU feed-forward (reference transformer.py:112-130): one widening
    Dense to 2*mult*dim, value half gated by exact (erf) gelu of the gate
    half, projection back to dim."""
    dim: int
    mult: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        y = nn.Dense(self.dim * self.mult * 2, dtype=self.dtype,
                     param_dtype=jnp.float32, name="ff_in")(x)
        val, gate = jnp.split(y, 2, axis=-1)
        y = val * nn.gelu(gate, approximate=False)  # torch F.gelu = exact erf
        return nn.Dense(self.dim, dtype=self.dtype, param_dtype=jnp.float32,
                        name="ff_out")(y)


class SimpleTransformerBlock(nn.Module):
    dim: int
    heads: int
    layer_index: int  # 1-based, selects the LayerScale init epsilon
    dim_head: int = 64
    ff_mult: int = 4
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        eps = layerscale_init(self.layer_index)
        attn_scale = self.param("attn_scale",
                                nn.initializers.constant(eps),
                                (self.dim,), jnp.float32)
        ff_scale = self.param("ff_scale",
                              nn.initializers.constant(eps),
                              (self.dim,), jnp.float32)
        ln = dict(epsilon=1e-5, dtype=self.dtype, param_dtype=jnp.float32)
        a = SimpleAttention(self.dim, self.heads, self.dim_head,
                            causal=self.causal, dtype=self.dtype,
                            name="attn")(
            nn.LayerNorm(**ln, name="attn_norm")(x), mask=mask)
        x = x + a * attn_scale
        f = SimpleFeedForward(self.dim, self.ff_mult, dtype=self.dtype,
                              name="ff")(
            nn.LayerNorm(**ln, name="ff_norm")(x))
        return x + f * ff_scale


class SimpleTransformer(nn.Module):
    """The reference's fallback ``Transformer`` (transformer.py:182-219):
    a stack of SimpleTransformerBlocks, mask routed to attention only.
    No input/output norm — callers add position embeddings themselves."""
    dim: int
    depth: int
    heads: int
    dim_head: int = 64
    ff_mult: int = 4
    causal: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None):
        for i in range(self.depth):
            x = SimpleTransformerBlock(self.dim, self.heads, i + 1,
                                       dim_head=self.dim_head,
                                       ff_mult=self.ff_mult,
                                       causal=self.causal, dtype=self.dtype,
                                       name=f"block_{i}")(x, mask=mask)
        return x
