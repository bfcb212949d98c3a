"""Pallas TPU flash attention for the diffusion-stack AttentionBlocks.

The diffusion sampling loop is dominated by its 13 relative-position
self-attention blocks (10 main layers + 3 conditioning integrators,
reference diffusion_decoder.py:123-131). The XLA formulation materializes
the (B, H, T, T) float32 score tensor in HBM per block per step (~160 MB at
T=1114) plus a precomputed (L, H, T, T) bias resident (~0.5 GB); at 200
diffusion steps that traffic dominates the whole quality pipeline.

This kernel keeps everything on-chip:

* grid (B, H, T/bq): per program, the full K/V rows for one (batch, head)
  sit in VMEM (T<=2304 -> <=600 KB each) and are fetched once per (b, h) —
  the q-block axis is innermost, so Pallas re-uses the K/V/bias blocks
  across q iterations without re-fetching;
* scores for one q block are a (bq, T) f32 VMEM value — softmax runs
  in-register, nothing round-trips HBM;
* the T5-style relative-position bias is Toeplitz (a function of j - i
  only), so all (iq, ik) block pairs on the same block-diagonal share ONE
  (bq, bk) bias tile: the kernel indexes a tiny (H, 2*nq-1, bq, bk) tile
  stack (a few MB) instead of a (H, T, T) table (hundreds of MB).

The tile stack is built once per sampling call by ``rel_bias_blocks`` from
the 32-entry bucket tables (the static bucket math mirrors
blocks._np_relative_position_bucket exactly, reference arch_util.py:
RelativePositionBias).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e9
# 256 measured 2x faster per call than 128 at the diffusion shapes
# (B=2, H=16, T=896): fewer grid programs amortize the per-call overhead;
# the bigger shared bias tiles cost ~15 MB extra DMA per call, a ~19 us
# price against an ~85 us win (scan-chained differential, v5e).
BLOCK_Q = 256


def _kernel(len_ref, q_ref, k_ref, v_ref, bias_ref, o_ref, *, dh: int,
            block_q: int):
    """One q-block of full-row attention for one (batch, head).

    q_ref: (1, 1, bq, Dp); k_ref/v_ref: (1, 1, T, Dp);
    bias_ref: (1, M, bq, bk) with M = 2*nq - 1, entry m = ik - iq + nq - 1;
    len_ref: (B, 1) SMEM — keys >= len[b] are masked out.
    """
    ib = pl.program_id(0)
    iq = pl.program_id(2)
    nq = pl.num_programs(2)
    q = q_ref[0, 0]                      # (bq, Dp)
    k = k_ref[0, 0]                      # (T, Dp)
    v = v_ref[0, 0]
    t = k.shape[0]
    bk = bias_ref.shape[3]
    nk = t // bk

    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)  # (bq, T)
    s = s * (1.0 / np.sqrt(dh))

    # Toeplitz bias: block column ik uses diagonal tile (ik - iq + nq - 1)
    bias_rows = []
    for ik in range(nk):
        m = ik - iq + nq - 1
        m = jnp.clip(m, 0, bias_ref.shape[1] - 1)  # q-pad blocks: any tile
        bias_rows.append(bias_ref[0, m])
    s = s + jnp.concatenate(bias_rows, axis=1).astype(jnp.float32)

    col = jax.lax.broadcasted_iota(jnp.int32, (block_q, t), 1)
    s = jnp.where(col < len_ref[ib, 0], s, NEG)

    m_ = jnp.max(s, axis=-1, keepdims=True)
    p = jnp.exp(s - m_)
    l_ = jnp.sum(p, axis=-1, keepdims=True)
    w = (p / l_).astype(v.dtype)
    o = jax.lax.dot_general(w, v, (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    o_ref[0, 0] = o.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("block_q", "interpret"))
def flash_rel_attention(q, k, v, bias_blocks, valid_len, *,
                        block_q: int = BLOCK_Q, interpret: bool = False):
    """softmax(q @ k^T / sqrt(D) + rel_bias) @ v with key masking.

    q, k, v: (B, H, T, D); bias_blocks: (H, 2*ceil(T/bq)-1, bq, bq) — from
    ``rel_bias_blocks``; valid_len: scalar or (B,) int32. Returns
    (B, H, T, D) in q.dtype. T is padded to a block multiple and D to the
    128-lane tile internally; padded keys are masked, padded q rows are
    garbage (callers mask outputs past valid_len anyway, matching
    AttentionBlock).
    """
    b, h, t, d = q.shape
    dtype = q.dtype
    t_pad = -(-t // block_q) * block_q
    d_pad = max(128, -(-d // 128) * 128)
    nq = t_pad // block_q
    assert bias_blocks.shape[1] == 2 * nq - 1 and bias_blocks.shape[2:] == \
        (block_q, block_q), (bias_blocks.shape, nq, block_q)

    pad = [(0, 0), (0, 0), (0, t_pad - t), (0, d_pad - d)]
    qp = jnp.pad(q, pad)
    kp = jnp.pad(k, pad)
    vp = jnp.pad(v, pad)
    vl = jnp.broadcast_to(jnp.minimum(jnp.asarray(valid_len, jnp.int32), t),
                          (b,)).reshape(b, 1)

    grid = (b, h, nq)
    out = pl.pallas_call(
        functools.partial(_kernel, dh=d, block_q=block_q),
        grid=grid,
        in_specs=[
            pl.BlockSpec((b, 1), lambda b_, h_, i: (0, 0),
                         memory_space=pltpu.SMEM),
            pl.BlockSpec((1, 1, block_q, d_pad),
                         lambda b_, h_, i: (b_, h_, i, 0)),
            pl.BlockSpec((1, 1, t_pad, d_pad),
                         lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, 1, t_pad, d_pad),
                         lambda b_, h_, i: (b_, h_, 0, 0)),
            pl.BlockSpec((1, bias_blocks.shape[1], block_q, block_q),
                         lambda b_, h_, i: (h_, 0, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, block_q, d_pad),
                               lambda b_, h_, i: (b_, h_, i, 0)),
        out_shape=jax.ShapeDtypeStruct((b, h, t_pad, d_pad), dtype),
        interpret=interpret,
    )(vl, qp, kp, vp, bias_blocks.astype(dtype))
    return out[:, :, :t, :d]


# ---------------------------------------------------------------------------
# Decode attention over the merged-channel KV cache
# ---------------------------------------------------------------------------
#
# The AR decode cache stores K/V as (L, B, T, C=H*Dh): with C=1024 the lane
# dimension is tile-exact, where a (..., T, Dh=64) buffer pads every 128-lane
# tile half-empty — XLA buffers with a 64-wide minor dim physically occupy
# (and stream) 2x their logical bytes, which measured as the single biggest
# AR decode cost at B=64. The cache row write stays an XLA
# dynamic_update_slice outside the kernel (in-place and layout-clean on the
# merged shape); the kernel reads the full rows straight from HBM.
#
# MEASURED CONCLUSION (v5e, L=30, B=16, T=768, n=600,
# tools/bench_decode_attn_merged.py): 3.67 ms/step vs 2.36 for the SAME
# block-diagonal math as a pure-XLA chunked flash-decode
# (ops/attention.chunked_decode_attention_merged) — per-layer pallas_call
# launch overhead again outweighs the on-chip wins, and the full-T DMA
# cannot early-exit at low fill the way the XLA fori_loop does. The layout
# insight (merged C, block-diagonal matmuls) is what mattered, and it
# shipped in the XLA formulation; this kernel stays as measured groundwork
# for a future whole-step fused decode kernel.


def _decode_kernel(scalars_ref, q_ref, ks_hbm, vs_hbm, o_ref, k_s, v_s,
                   sems, *, heads: int, dh: int):
    """Grid (B,). scalars_ref: SMEM (2,) = [layer, pos]; q: (1, 1, C) VMEM
    block; ks/vs: the FULL (L, B, T, C) caches in HBM (read-only — the row
    write stays an XLA dynamic_update_slice, which is in-place and
    layout-clean on the merged shape); o_ref: (1, 1, C) attention output;
    k_s/v_s: (T, C) VMEM scratch; sems: DMA semaphores.
    """
    layer = scalars_ref[0]
    pos = scalars_ref[1]
    ib = pl.program_id(0)
    c = q_ref.shape[2]
    t = k_s.shape[0]

    rd_k = pltpu.make_async_copy(ks_hbm.at[layer, ib], k_s, sems.at[0])
    rd_v = pltpu.make_async_copy(vs_hbm.at[layer, ib], v_s, sems.at[1])
    rd_k.start()
    rd_v.start()
    rd_k.wait()
    rd_v.wait()
    k2 = k_s[...]
    v2 = v_s[...]
    # Block-diagonal Q: qbd[c2, h] = q[c2] iff c2 // dh == h. The QK matvec
    # becomes one (T, C) @ (C, H) MXU matmul instead of H vector reductions.
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    # cast BEFORE the minor-dim insert: Mosaic only reshapes 32-bit vectors
    # this way
    qf = q_ref[0, 0].astype(jnp.float32)
    qbd = jnp.where(lane // dh == head, qf[:, None], 0.0)
    s = jax.lax.dot_general(k2.astype(jnp.float32), qbd,
                            (((1,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)   # (T, H)
    s = s * (1.0 / np.sqrt(dh))
    row = jax.lax.broadcasted_iota(jnp.int32, (t, heads), 0)
    s = jnp.where(row <= pos, s, NEG)

    m_ = jnp.max(s, axis=0, keepdims=True)
    p = jnp.exp(s - m_)
    l_ = jnp.sum(p, axis=0, keepdims=True)
    w = p / l_                                        # (T, H) f32
    # out[c2] = sum_t v2[t, c2] * w[t, c2 // dh] — expand w across each
    # head's dh lanes with a one-hot (H, C) matmul (Mosaic supports neither
    # interleaving repeat nor a (T,H,dh)->(T,C) minor merge) and reduce over
    # T on the VPU.
    expand = (head == lane // dh).astype(jnp.float32)  # (C, H)
    wexp = jax.lax.dot_general(w, expand, (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)  # (T, C)
    o_ref[0, 0] = jnp.sum(v2.astype(jnp.float32) * wexp,
                          axis=0).astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("heads", "interpret"))
def decode_attention_merged(q, k_new, v_new, k_cache, v_cache, layer_idx,
                            pos, *, heads: int, interpret: bool = False):
    """One decode step of self-attention over the merged-channel cache.

    q, k_new, v_new: (B, C); k_cache/v_cache: (L, B, T, C); layer_idx, pos:
    scalars. Writes the k/v rows at (layer_idx, :, pos) IN PLACE (the caller
    must treat the passed caches as consumed) and returns
    (out (B, C), k_cache, v_cache).
    """
    lcount, b, t, c = k_cache.shape
    dh = c // heads
    li = jnp.asarray(layer_idx, jnp.int32)
    pos = jnp.asarray(pos, jnp.int32)
    scalars = jnp.stack([li, pos])

    # the row write: an in-place XLA dus — the merged (L, B, T, C) shape is
    # tile-exact (C = 8*128 lanes), so no layout padding and no copies
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new[None, :, None, :],
                                           (li, 0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new[None, :, None, :],
                                           (li, 0, pos, 0))

    def idx_vec(b_, sref):
        return (b_, 0, 0)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, 1, c), idx_vec),
            pl.BlockSpec(memory_space=pltpu.ANY),   # k cache stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # v cache stays in HBM
        ],
        out_specs=pl.BlockSpec((1, 1, c), idx_vec),
        scratch_shapes=[
            pltpu.VMEM((t, c), k_cache.dtype),
            pltpu.VMEM((t, c), v_cache.dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    out = pl.pallas_call(
        functools.partial(_decode_kernel, heads=heads, dh=dh),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((b, 1, c), q.dtype),
        interpret=interpret,
    )(scalars, q[:, None, :], k_cache, v_cache)
    return out[:, 0], k_cache, v_cache


def decode_attention_merged_xla(q, k_new, v_new, k_cache, v_cache, layer_idx,
                                pos, *, heads: int):
    """Pure-XLA twin of ``decode_attention_merged`` (CPU / parity tests).
    Same math and cache contract, no Pallas."""
    lcount, b, t, c = k_cache.shape
    dh = c // heads
    li = jnp.asarray(layer_idx, jnp.int32)
    k_cache = jax.lax.dynamic_update_slice(k_cache, k_new[None, :, None, :],
                                           (li, 0, pos, 0))
    v_cache = jax.lax.dynamic_update_slice(v_cache, v_new[None, :, None, :],
                                           (li, 0, pos, 0))
    k2 = jax.lax.dynamic_index_in_dim(k_cache, li, 0, keepdims=False)
    v2 = jax.lax.dynamic_index_in_dim(v_cache, li, 0, keepdims=False)
    kr = k2.reshape(b, t, heads, dh).astype(jnp.float32)
    vr = v2.reshape(b, t, heads, dh).astype(jnp.float32)
    qr = q.reshape(b, heads, dh).astype(jnp.float32)
    s = jnp.einsum("bhd,bthd->bht", qr, kr,
                   precision=jax.lax.Precision.HIGHEST) / np.sqrt(dh)
    row = jnp.arange(t)[None, None, :]
    s = jnp.where(row <= pos, s, NEG)
    w = jax.nn.softmax(s, axis=-1)
    o = jnp.einsum("bht,bthd->bhd", w, vr,
                   precision=jax.lax.Precision.HIGHEST)
    return o.reshape(b, c).astype(q.dtype), k_cache, v_cache


def _bucket_static(rel: np.ndarray, num_buckets: int = 32,
                   max_distance: int = 64) -> np.ndarray:
    """Static twin of blocks._np_relative_position_bucket (non-causal)."""
    from tortoise_tpu.models.blocks import _np_relative_position_bucket

    return _np_relative_position_bucket(rel, num_buckets, max_distance, False)


def rel_bias_blocks(table, t: int, scale: float, block_q: int = BLOCK_Q,
                    dtype=jnp.bfloat16):
    """Bias tile stack for ``flash_rel_attention``.

    table: (..., num_buckets, H) bucket embeddings (leading axes = stacked
    scan layers). Returns (..., H, 2*nq-1, bq, bq) where tile m holds the
    bias for block pairs with ik - iq = m - (nq - 1):
    bias[i, j] = scale * table[bucket((ik*bq + j) - (iq*bq + i))].
    """
    t_pad = -(-t // block_q) * block_q
    nq = t_pad // block_q
    row = np.arange(block_q)
    # relative position within a tile on diagonal offset o = (m - (nq-1))*bq
    idx = np.stack([
        _bucket_static((m - (nq - 1)) * block_q + row[None, :] - row[:, None])
        for m in range(2 * nq - 1)
    ])  # (M, bq, bq) int32, static
    flat = jnp.asarray(idx.reshape(-1))
    tab = jnp.asarray(table)                     # (..., nb, H)
    picked = jnp.take(tab, flat, axis=-2)        # (..., M*bq*bq, H)
    picked = jnp.moveaxis(picked, -1, -2)        # (..., H, M*bq*bq)
    out_shape = picked.shape[:-1] + (2 * nq - 1, block_q, block_q)
    return (picked.reshape(out_shape) * scale).astype(dtype)
