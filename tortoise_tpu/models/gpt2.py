"""GPT-2 decoder stack with a preallocated KV cache, flax.linen.

Semantically equivalent to the HF ``GPT2Model`` the reference builds its
UnifiedVoice on (reference: tortoise/models/autoregressive.py:246-266 with
``wpe``/``wte`` deleted — position information comes entirely from the learned
per-modality embeddings added to the input), but engineered for TPU decode:

* one fused qkv projection feeding an f32-softmax attention,
* a functional KV cache — {"k","v"} buffers of shape (L, B, T_max, C) in
  the MERGED-channel layout (C = H*Dh is lane-tile-exact; a per-head Dh=64
  minor dim physically pads every tile 2x), carried through the layer scan
  and the decode loop, updated with tiny ``dynamic_update_slice`` writes at
  (layer, position) so XLA keeps the buffer in place (returning per-layer
  caches as scan outputs forces a full multi-GB buffer copy every decode
  step),
* flash-decode attention reads only the valid cache prefix
  (ops/attention.py),
* layers are weight-stacked under ``nn.scan`` — the HLO shrinks ~n_layer-fold
  and full-model compiles drop from minutes to seconds,
* bfloat16 compute / float32 params by default.

The HF details that matter for checkpoint parity are kept: LayerNorm eps
1e-5, gelu_new (tanh) MLP, pre-LN blocks, and a final ``ln_f``.
"""
from __future__ import annotations

import dataclasses
from typing import Any

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


@dataclasses.dataclass(frozen=True)
class GPT2Config:
    n_layer: int = 30
    n_embd: int = 1024
    n_head: int = 16
    ln_eps: float = 1e-5
    # weight-only int8 for the block dense kernels (QuantDense). Params carry
    # {kernel int8, qscale f32, bias f32}; convert full-precision checkpoints
    # with weights.quantize_gpt_weights.
    quant_weights: bool = False


def gelu_new(x):
    # HF "gelu_new": tanh approximation used by GPT-2.
    return 0.5 * x * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def _int8_kernel_init(key, shape):
    return jax.random.randint(key, shape, -127, 128, jnp.int32).astype(jnp.int8)


class QuantDense(nn.Module):
    """Weight-only int8 dense with per-output-channel symmetric scales.

    Small-batch decode is weight-bandwidth-bound (the 30-layer stack reads
    ~755 MB of bf16 kernels per token at any batch size), so halving the
    kernel bytes directly buys streaming / low-batch throughput. The int8
    kernel feeds the matmul through a fused convert-on-read; ``qscale``
    applies to the f32 accumulator after the contraction, so there is no
    dequantized copy in HBM. This is the weight-side twin of the int8 KV
    cache (ops/attention.py) and the TPU counterpart of DeepSpeed's
    quantized kernel injection (reference autoregressive.py:379-392).
    """
    features: int
    dtype: jnp.dtype = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_f = x.shape[-1]
        kernel = self.param("kernel", _int8_kernel_init, (in_f, self.features))
        # default qscale mimics lecun-normal magnitude (random-weight runs)
        qscale = self.param(
            "qscale",
            lambda _, s: jnp.full(s, 1.0 / (127.0 * np.sqrt(in_f)), jnp.float32),
            (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        y = jax.lax.dot_general(x.astype(self.dtype), kernel.astype(self.dtype),
                                (((x.ndim - 1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        return (y * qscale + bias).astype(self.dtype)


def _dense(cfg: GPT2Config, features: int, dtype, name: str):
    if cfg.quant_weights:
        return QuantDense(features, dtype=dtype, name=name)
    return nn.Dense(features, dtype=dtype, param_dtype=jnp.float32, name=name)


class GPT2Attention(nn.Module):
    config: GPT2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, cache=None, layer_idx=None, cache_index=None):
        """x: (B, T, C). With ``cache`` ({"k","v"} of (L, B, T_max, C),
        merged-channel layout — see ``init_kv_cache``) the new keys/values
        are written in place at (layer_idx, cache_index) and attention runs
        over the valid prefix; otherwise plain causal attention. Returns
        (out, cache)."""
        cfg = self.config
        b, t, c = x.shape
        h, dh = cfg.n_head, c // cfg.n_head
        qkv = _dense(cfg, 3 * c, self.dtype, "c_attn")(x)
        q, k, v = jnp.split(qkv, 3, axis=-1)                  # each (B, T, C)

        if cache is not None:
            # layout by key: "k"/"v" = B-major (L, B, T, C) — tile-exact
            # reads at any B, the small-batch/streaming choice; "k_tm"/"v_tm"
            # = T-major (L, T, B, C) — the decode row write is a contiguous
            # (B, C) slab instead of a 32x-amplified read-modify-write
            # (measured 4.99 -> 0.018 ms/step standalone for the 30 writes at
            # B=64/int8 on v5e, but no composed win: XLA hides the writes
            # behind the matmuls, so B-major stays the default).
            tm = "k_tm" in cache
            kname, vname = ("k_tm", "v_tm") if tm else ("k", "v")
            kc = cache[kname]
            quantized = f"{kname}_scale" in cache
            at = (layer_idx, cache_index, 0, 0) if tm else (layer_idx, 0, cache_index, 0)

            def to_cache_axes(x_):  # (B, t, ...) -> write-shaped block
                return jnp.swapaxes(x_, 0, 1)[None] if tm else x_[None]

            if quantized:
                # int8 KV cache: per-(batch, position, head) symmetric scales.
                # Halves decode HBM traffic vs bf16 — the AR decode is
                # bandwidth-bound on cache reads, so this directly buys
                # throughput and doubles the candidate batch that fits.
                def quant(x_):
                    xs = x_.reshape(b, t, h, dh).astype(jnp.float32)
                    s = jnp.maximum(jnp.abs(xs).max(-1) / 127.0, 1e-8)  # (B,T,H)
                    w = jnp.round(xs / s[..., None]).astype(jnp.int8)
                    return w.reshape(b, t, c), s

                k_w, k_s = quant(k)
                v_w, v_s = quant(v)
                sdt = cache[f"{kname}_scale"].dtype
                if tm:       # (L, T, B, H) scales: same axes as the buffers
                    s_at = at
                    to_scale_axes = to_cache_axes
                else:        # (L, B, H, T) scales: T-minor (see init_kv_cache)
                    s_at = (layer_idx, 0, 0, cache_index)
                    to_scale_axes = lambda s_: jnp.swapaxes(s_, 1, 2)[None]
                cache = dict(cache)
                cache[kname] = jax.lax.dynamic_update_slice(
                    cache[kname], to_cache_axes(k_w), at)
                cache[vname] = jax.lax.dynamic_update_slice(
                    cache[vname], to_cache_axes(v_w), at)
                cache[f"{kname}_scale"] = jax.lax.dynamic_update_slice(
                    cache[f"{kname}_scale"], to_scale_axes(k_s).astype(sdt), s_at)
                cache[f"{vname}_scale"] = jax.lax.dynamic_update_slice(
                    cache[f"{vname}_scale"], to_scale_axes(v_s).astype(sdt), s_at)
            else:
                cache = dict(cache)
                cache[kname] = jax.lax.dynamic_update_slice(
                    cache[kname], to_cache_axes(k).astype(kc.dtype), at)
                cache[vname] = jax.lax.dynamic_update_slice(
                    cache[vname], to_cache_axes(v).astype(kc.dtype), at)
            t_axis = 1 if tm else 2
            if t == 1 and kc.shape[t_axis] % 256 == 0:
                # flash-decode: dynamic-trip-count chunked online softmax —
                # only the valid cache prefix is read, straight off the
                # tile-exact merged layout (ops/attention.py)
                from tortoise_tpu.ops.attention import (
                    chunked_decode_attention_merged,
                    chunked_decode_attention_tmajor)

                decode = (chunked_decode_attention_tmajor if tm
                          else chunked_decode_attention_merged)
                out = decode(
                    q[:, 0], cache[kname], cache[vname], layer_idx, cache_index,
                    heads=h, k_scale=cache.get(f"{kname}_scale"),
                    v_scale=cache.get(f"{vname}_scale"))[:, None, :]  # (B, 1, C)
            else:
                # prefill / teacher-forced: read the cache prefix back and run
                # plain masked attention (one-time relayout to per-head form)
                def _layer(name):
                    x_ = jax.lax.dynamic_index_in_dim(cache[name], layer_idx, 0,
                                                      keepdims=False)
                    if tm:
                        x_ = jnp.swapaxes(x_, 0, 1)            # -> (B, T, C/H)
                    t_max = x_.shape[1]
                    x_ = x_.reshape(b, t_max, h, dh)
                    if quantized:
                        s = jax.lax.dynamic_index_in_dim(
                            cache[f"{name}_scale"], layer_idx, 0, keepdims=False)
                        # -> (B, T, H): T-major stores (T, B, H), B-major
                        # stores T-minor (B, H, T)
                        s = jnp.swapaxes(s, 0, 1) if tm else jnp.swapaxes(s, 1, 2)
                        x_ = x_.astype(jnp.float32) * s[..., None]
                    return x_.transpose(0, 2, 1, 3)            # (B, H, T_max, Dh)

                ck = _layer(kname)
                cv = _layer(vname)
                t_max = ck.shape[2]
                qh = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
                key_pos = jnp.arange(t_max)[None, :]                 # (1, T_max)
                query_pos = cache_index + jnp.arange(t)[:, None]     # (T, 1)
                mask = key_pos <= query_pos                          # causal within cache
                logits = jnp.einsum("bhtd,bhsd->bhts", qh, ck.astype(self.dtype),
                                    preferred_element_type=jnp.float32) / np.sqrt(dh)
                logits = jnp.where(mask[None, None], logits, NEG_INF)
                w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
                out = jnp.einsum("bhts,bhsd->bhtd", w, cv.astype(self.dtype))
                out = out.transpose(0, 2, 1, 3).reshape(b, t, c)
        else:
            qh = q.reshape(b, t, h, dh).transpose(0, 2, 1, 3)  # (B,H,T,Dh)
            kh = k.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
            vh = v.reshape(b, t, h, dh).transpose(0, 2, 1, 3)
            mask = jnp.tril(jnp.ones((t, t), dtype=bool))
            logits = jnp.einsum("bhtd,bhsd->bhts", qh, kh,
                                preferred_element_type=jnp.float32) / np.sqrt(dh)
            logits = jnp.where(mask[None, None], logits, NEG_INF)
            w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
            out = jnp.einsum("bhts,bhsd->bhtd", w, vh)
            out = out.transpose(0, 2, 1, 3).reshape(b, t, c)

        out = _dense(cfg, c, self.dtype, "c_proj")(out)
        return out, cache


class GPT2Block(nn.Module):
    config: GPT2Config
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, *, cache=None, layer_idx=None, cache_index=None):
        cfg = self.config
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="ln_1")(x.astype(jnp.float32)).astype(self.dtype)
        attn_out, cache = GPT2Attention(cfg, dtype=self.dtype, name="attn")(
            h, cache=cache, layer_idx=layer_idx, cache_index=cache_index)
        x = x + attn_out
        h = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="ln_2")(x.astype(jnp.float32)).astype(self.dtype)
        h = _dense(cfg, 4 * cfg.n_embd, self.dtype, "mlp_fc")(h)
        h = gelu_new(h)
        h = _dense(cfg, cfg.n_embd, self.dtype, "mlp_proj")(h)
        return x + h, cache


class _BlockScanBody(nn.Module):
    """Scan body wrapping GPT2Block: carry = (x, cache, cache_index),
    xs = layer index."""
    config: GPT2Config
    dtype: jnp.dtype = jnp.float32
    remat: bool = False

    @nn.compact
    def __call__(self, carry, layer_idx):
        x, cache, cache_index = carry
        block = nn.remat(GPT2Block) if (self.remat and cache is None) else GPT2Block
        x, cache = block(self.config, dtype=self.dtype, name="block")(
            x, cache=cache, layer_idx=layer_idx, cache_index=cache_index)
        return (x, cache, cache_index), None


class GPT2Stack(nn.Module):
    """N transformer blocks + final ln_f. Call with embeddings (positions are
    the caller's responsibility, mirroring the reference's nulled wpe).

    ``remat=True`` rematerializes each block in the backward pass — the
    training-time equivalent of the reference's gradient checkpointing
    (build_hf_gpt_transformer's ``checkpointing`` flag,
    reference autoregressive.py:246-258)."""
    config: GPT2Config
    dtype: jnp.dtype = jnp.float32
    remat: bool = False
    unroll: int = 1  # partial unroll raises compile time more than it saves per-step

    @nn.compact
    def __call__(self, emb, *, cache=None, cache_index=None):
        cfg = self.config
        x = emb.astype(self.dtype)
        unroll = self.unroll if cfg.n_layer % max(self.unroll, 1) == 0 else 1
        scan = nn.scan(_BlockScanBody,
                       variable_axes={"params": 0},
                       split_rngs={"params": True},
                       in_axes=0, out_axes=0,
                       unroll=unroll,
                       length=cfg.n_layer)
        layer_ids = jnp.arange(cfg.n_layer)
        (x, cache, _), _ = scan(cfg, dtype=self.dtype, remat=self.remat,
                                name="h_scan")((x, cache, cache_index), layer_ids)
        x = nn.LayerNorm(epsilon=cfg.ln_eps, dtype=jnp.float32, param_dtype=jnp.float32,
                         name="ln_f")(x.astype(jnp.float32)).astype(self.dtype)
        return x, cache


def init_kv_cache(config: GPT2Config, batch: int, max_len: int,
                  dtype=jnp.bfloat16,
                  t_major: bool = False) -> dict[str, jnp.ndarray]:
    """Preallocated layered cache, merged-channel layout.

    The C = n_embd minor dim is lane-tile-exact (1024 = 8 x 128), so reads
    move exactly the logical bytes; a per-head (..., T, Dh=64) layout
    physically pads every tile 2x (ops/attention.py header for the
    measurement). ``dtype=jnp.int8`` selects the quantized cache: int8
    buffers plus float32 per-(layer, batch, position, head) symmetric scales
    (~0.53x the bytes of bf16).

    Two layouts (GPT2Attention dispatches on the key names):
    * B-major (L, B, T_max, C), keys "k"/"v" — tile-exact reads at any
      batch; the production default;
    * T-major (L, T_max, B, C), keys "k_tm"/"v_tm" — the per-step row write
      is a contiguous (B, C) slab instead of a 32x-amplified
      read-modify-write (4.99 -> 0.018 ms/step standalone for 30 writes at
      B=64/int8 on v5e). MEASURED COMPOSED: no win — XLA hides the
      amplified writes behind the step's matmuls (4.27 vs 4.25 ms/tok), and
      reads pad 16x below B=16 — so it stays an option, not the default.
    """
    if t_major:
        shape = (config.n_layer, max_len, batch, config.n_embd)
        sshape = shape[:-1] + (config.n_head,)         # (L, T, B, H)
        keys = ("k_tm", "v_tm")
    else:
        shape = (config.n_layer, batch, max_len, config.n_embd)
        # scales are T-minor (L, B, H, T): the fused decode kernel DMAs a
        # whole per-layer slab and lane-slices (B, H, ck) chunk windows —
        # a (L, B, T, H) layout's 16-wide minor dim would need an in-kernel
        # reshape Mosaic rejects on hardware (ops/decode_step_pallas.py)
        sshape = (config.n_layer, batch, config.n_head, max_len)
        keys = ("k", "v")
    cache = {keys[0]: jnp.zeros(shape, dtype), keys[1]: jnp.zeros(shape, dtype)}
    if dtype == jnp.int8:
        cache[f"{keys[0]}_scale"] = jnp.zeros(sshape, jnp.float32)
        cache[f"{keys[1]}_scale"] = jnp.zeros(sshape, jnp.float32)
    return cache
