"""Decode attention kernels.

The AR decode is bandwidth-bound on KV-cache reads: a naive implementation
attends over the full preallocated T_max buffer every step (reading
~2 GB/step for the 30-layer model at B=16). ``chunked_decode_attention``
performs an online-softmax flash-decode over cache chunks with a *dynamic*
trip count — XLA lowers the ``fori_loop`` to a while loop that only reads
chunks below the current sequence length, halving average read volume and
making early decode steps much cheaper.

``chunked_decode_attention_merged`` additionally fixes the cache *layout*:
a (..., T, Dh=64) buffer fills only half of each (16, 128)-lane physical
tile, so every read (bf16 and int8 alike) moves 2x the logical bytes. The
merged (L, B, T, C=H*Dh) cache is tile-exact; head-blocked attention math
is recovered with block-diagonal matmuls whose 16x logical-FLOP overhead is
free against the HBM read. Measured on v5e (L=30, B=16, T=768, n=600):
4.64 -> 2.36 ms/step bf16 and 3.79 -> 1.67 ms/step int8 vs the per-head
layout (tools/bench_decode_attn_merged.py).

This is the TPU counterpart of the reference's DeepSpeed fused decode
kernels (reference: tortoise/models/autoregressive.py:379-392).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

NEG_INF = -1e9


def chunked_decode_attention_layered(q: jnp.ndarray, ck: jnp.ndarray,
                                     cv: jnp.ndarray, layer_idx, cache_index,
                                     chunk: int = 256, k_scale=None,
                                     v_scale=None) -> jnp.ndarray:
    """Flash-decode reading directly from the full layered cache.

    q: (B, H, 1, D); ck/cv: (L, B, H, T_max, D); slices (layer, chunk)
    windows so only the valid prefix of the current layer is ever read —
    materializing a per-layer copy first would move the whole buffer every
    step. With ``k_scale``/``v_scale`` ((L, B, H, T_max, 1), int8 cache) the
    chunks are dequantized in-register after the sliced read, so the HBM
    traffic is the int8 bytes.
    """
    b, h, _, d = q.shape
    t_max = ck.shape[3]
    n = cache_index + 1
    n_chunks = (n + chunk - 1) // chunk
    scale = 1.0 / np.sqrt(d)
    qf = q.astype(jnp.float32)

    def body(c, carry):
        m, l, acc = carry
        start = c * chunk

        def blk(buf, width):
            return jax.lax.dynamic_slice(buf, (layer_idx, 0, 0, start, 0),
                                         (1, b, h, chunk, width))[0]

        k_blk, v_blk = blk(ck, d), blk(cv, d)
        # int8 cache: the per-position scales FACTOR OUT of both matmuls —
        # logits pick up k_scale after the QK product, v_scale folds into the
        # softmax weights before the PV product. The int8 values feed the
        # einsums directly (one fused convert on the operand read); a
        # pre-multiply dequant materializes (B,H,chunk,D) f32 blocks in HBM
        # and measures 2x SLOWER than the bf16 cache on v5e.
        logits = jnp.einsum("bhqd,bhkd->bhqk", qf, k_blk.astype(jnp.float32),
                            preferred_element_type=jnp.float32) * scale
        if k_scale is not None:
            ks_blk = blk(k_scale, 1)                       # (B,H,chunk,1)
            logits = logits * jnp.swapaxes(ks_blk, 2, 3)   # (B,H,1,chunk)
        pos = start + jnp.arange(chunk)
        logits = jnp.where(pos[None, None, None, :] < n, logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(axis=-1))
        p = jnp.exp(logits - m_new[..., None])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=-1)
        pv = p if v_scale is None else p * jnp.swapaxes(blk(v_scale, 1), 2, 3)
        acc_new = acc * alpha[..., None] + jnp.einsum(
            "bhqk,bhkd->bhqd", pv, v_blk.astype(jnp.float32),
            preferred_element_type=jnp.float32)
        return m_new, l_new, acc_new

    init = (jnp.full((b, h, 1), NEG_INF, jnp.float32),
            jnp.zeros((b, h, 1), jnp.float32),
            jnp.zeros((b, h, 1, d), jnp.float32))
    if t_max <= chunk:
        # the whole cache is one chunk: run the body once statically — the
        # while-loop trip costs ~30µs/layer/step on v5e, pure overhead here
        m, l, acc = body(0, init)
    else:
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    return (acc / l[..., None]).astype(q.dtype)


def chunked_decode_attention_merged(q, ck, cv, layer_idx, cache_index, *,
                                    heads: int, chunk: int = 128,
                                    k_scale=None, v_scale=None):
    """Flash-decode over the merged-channel (L, B, T_max, C) cache.

    q: (B, C); ck/cv: (L, B, T_max, C) bf16/f32 or int8; with ``k_scale``/
    ``v_scale`` ((L, B, H, T_max) f32 T-minor slabs — the layout the fused
    decode kernel DMAs, models/gpt2.init_kv_cache) chunks are dequantized
    in-register via scale factoring (see chunked_decode_attention_layered).
    Head blocking never touches memory: QK is one (t, C) @ (C, H)
    block-diagonal matmul per chunk, PV accumulates the full (H, C) product
    and extracts its (h, h*dh) block diagonal once at the end. Returns
    (B, C) attention output in q.dtype.

    Always a dynamic-trip ``fori_loop``, even when the cache is a single
    chunk: running the body once statically lets XLA fuse the read with the
    same step's cache write, which measured 6.18 vs 4.23 ms/tok composed in
    the 30-layer decode (B=64, T=256, int8, v5e). chunk=128 is the composed
    optimum across fill levels (128 vs 256 indifferent at T_max=1280).
    """
    lcount, b, t_max, c = ck.shape
    dh = c // heads
    chunk = min(chunk, t_max)
    n = cache_index + 1
    n_chunks = (n + chunk - 1) // chunk
    scale = 1.0 / np.sqrt(dh)

    # block-diagonal q operand: qbd[b, c, h] = q[b, c] iff c // dh == h
    lane = jnp.arange(c)[:, None]
    head = jnp.arange(heads)[None, :]
    qbd = jnp.where(lane // dh == head, q.astype(jnp.float32)[:, :, None], 0.0)

    def body(ci, carry):
        m, l, acc = carry
        start = ci * chunk

        def blk(buf, width):
            return jax.lax.dynamic_slice(buf, (layer_idx, 0, start, 0),
                                         (1, b, chunk, width))[0]

        def sblk(buf):  # (L, B, H, T) -> (B, t, H) chunk window
            s = jax.lax.dynamic_slice(buf, (layer_idx, 0, 0, start),
                                      (1, b, heads, chunk))[0]
            return jnp.swapaxes(s, 1, 2)

        k_blk = blk(ck, c)
        v_blk = blk(cv, c)
        logits = jax.lax.dot_general(
            k_blk.astype(jnp.float32), qbd,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale        # (B, t, H)
        if k_scale is not None:
            logits = logits * sblk(k_scale)
        pos = start + jnp.arange(chunk)
        logits = jnp.where(pos[None, :, None] < n, logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(axis=1))             # (B, H)
        p = jnp.exp(logits - m_new[:, None, :])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=1)
        if v_scale is not None:
            p = p * sblk(v_scale)
        pv = jax.lax.dot_general(
            jnp.swapaxes(p, 1, 2), v_blk.astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)                # (B, H, C)
        acc_new = acc * alpha[..., None] + pv
        return m_new, l_new, acc_new

    init = (jnp.full((b, heads), NEG_INF, jnp.float32),
            jnp.zeros((b, heads), jnp.float32),
            jnp.zeros((b, heads, c), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    diag = acc.reshape(b, heads, heads, dh)
    out = jnp.einsum("bhhd->bhd", diag) / l[..., None]
    return out.reshape(b, c).astype(q.dtype)


def chunked_decode_attention_tmajor(q, ck, cv, layer_idx, cache_index, *,
                                    heads: int, chunk: int = 128,
                                    k_scale=None, v_scale=None):
    """Flash-decode over the T-major (L, T_max, B, C) cache.

    Same math as ``chunked_decode_attention_merged`` but for the layout
    whose decode row WRITE is a contiguous, tile-exact (B, C) slab: in the
    B-major layout a row write at fixed T touches one sublane of every
    (32, 128) tile, a 32x read-modify-write amplification that measured
    4.99 ms/step for the 30 writes at B=64/int8 on v5e vs 0.018 in this
    layout. MEASURED COMPOSED: no end-to-end win (4.27 vs 4.25 ms/tok in
    the 30-layer step) — XLA overlaps the amplified writes with the step's
    matmuls — and reads pad 16x below B=16, so B-major stays the
    production default (models/gpt2.init_kv_cache).

    q: (B, C); ck/cv: (L, T_max, B, C); k_scale/v_scale: (L, T_max, B, H)
    f32 for the int8 cache. Returns (B, C) in q.dtype.
    """
    lcount, t_max, b, c = ck.shape
    dh = c // heads
    chunk = min(chunk, t_max)
    n = cache_index + 1
    n_chunks = (n + chunk - 1) // chunk
    scale = 1.0 / np.sqrt(dh)

    lane = jnp.arange(c)[:, None]
    head = jnp.arange(heads)[None, :]
    qbd = jnp.where(lane // dh == head, q.astype(jnp.float32)[:, :, None], 0.0)

    def body(ci, carry):
        m, l, acc = carry
        start = ci * chunk

        def blk(buf, width):
            return jax.lax.dynamic_slice(buf, (layer_idx, start, 0, 0),
                                         (1, chunk, b, width))[0]

        k_blk = blk(ck, c)                                     # (t, B, C)
        v_blk = blk(cv, c)
        # (t, B, C) x (B, C, H), batch B, contract C -> (B, t, H)
        logits = jax.lax.dot_general(
            k_blk.astype(jnp.float32), qbd,
            (((2,), (1,)), ((1,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if k_scale is not None:
            logits = logits * jnp.swapaxes(blk(k_scale, heads), 0, 1)
        pos = start + jnp.arange(chunk)
        logits = jnp.where(pos[None, :, None] < n, logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(axis=1))             # (B, H)
        p = jnp.exp(logits - m_new[:, None, :])
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=1)
        if v_scale is not None:
            p = p * jnp.swapaxes(blk(v_scale, heads), 0, 1)
        # (B, H, t) x (t, B, C), batch B, contract t -> (B, H, C)
        pv = jax.lax.dot_general(
            jnp.swapaxes(p, 1, 2), v_blk.astype(jnp.float32),
            (((2,), (0,)), ((0,), (1,))),
            preferred_element_type=jnp.float32)
        acc_new = acc * alpha[..., None] + pv
        return m_new, l_new, acc_new

    init = (jnp.full((b, heads), NEG_INF, jnp.float32),
            jnp.zeros((b, heads), jnp.float32),
            jnp.zeros((b, heads, c), jnp.float32))
    m, l, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    diag = acc.reshape(b, heads, heads, dh)
    out = jnp.einsum("bhhd->bhd", diag) / l[..., None]
    return out.reshape(b, c).astype(q.dtype)
