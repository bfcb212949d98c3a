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
BLOCK_Q = 128


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
