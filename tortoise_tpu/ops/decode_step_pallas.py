"""Whole-step fused GPT-2 decode kernel (Pallas, TPU).

ONE ``pallas_call`` per decode step covers all ``n_layer`` transformer
blocks: grid over layers, per-layer weights streamed as auto-pipelined
grid-blocked inputs (next layer's 25 MB prefetches while the current layer
computes), KV-cache chunks manually double-buffered from HBM, the carried
activation resident in VMEM scratch. This is the TPU analog of the
reference's DeepSpeed kernel injection (reference
tortoise/models/autoregressive.py:379-392) and the "kill-or-ship" kernel
from docs/ROOFLINE.md: the XLA step is op-fragmentation bound (~450 device
ops/step at a fixed few-us each), which one fused kernel amortizes to a
single launch.

Design notes (measured on v5e, see docs/ROOFLINE.md):
* VMEM is ~128 MB with ``CompilerParams(vmem_limit_bytes=...)`` (the 16 MB
  number is only the default scoped limit); per-layer weights double-buffer
  at ~51 MB and cache chunks at <= 34 MB.
* Per-head (B, H, ck) logits from the merged-channel (B, ck, C) cache
  layout use block-diagonal mask operands (a (C, H) 0/1 matrix) — the
  segmented dh=64 reduction does not MXU-map directly.
* Chunk-sized (B, ck, C) transients stay bf16; f32 appears only in MXU
  accumulators, (B, H, ck) logits, and the (B, H, C) acc scratch — f32
  chunk transients register-spill by tens of MB.
* The cache is READ-ONLY here. New k/v rows return as (L, B, C) outputs and
  the caller writes them with two whole-stack ``dynamic_update_slice``s
  (the XLA path's 4 per-layer DUS ops cost 33 us/layer-step of pure op
  overhead). The current token attends from VMEM, unquantized — with the
  int8 cache this differs from the XLA path (which re-reads its own
  quantized row) by at most the row's quantization error.

The decode semantics mirror models/gpt2.py exactly: pre-LN blocks
(eps 1e-5, f32), fused qkv, flash-decode softmax in f32 over the valid
prefix, gelu_new MLP, bf16 residual stream.

Attention inner-loop orientation (round 4): logits live as (B, H, ck) —
qbdT (B, H, C) is built by broadcast (no transpose), logits =
dot(qbdT, k_blk) contracting the LAST dims of both (the most standard
batched-matmul form, measured 35 vs 79 us/call against the old (B, ck, H)
orientation at B=64/ck=128 — tools/probe_mosaic_ops.py), the int8 scales
are stored as (L, B, H, T) slabs (lane dim = T) whose (B, H, ck) chunk
windows DMA double-buffered alongside the k/v chunks, applied
elementwise in (B, H, ck) with zero relayouts, and PV accumulates the full
(B, H, C) product whose (h, h*dh) block diagonal is extracted ONCE after
the loop with a mask-weighted reduce. The earlier (B, ck, H) orientation
needed a (B, ck*H) -> (B, ck, H) scale reshape that Mosaic rejects on
hardware ("tpu.reshape" INTERNAL error) while interpret mode accepted it —
which is why this file's exactness tests are backed by
tools/check_fused_exactness.py runs on the real device.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _layer_norm(x32, scale, bias, eps=1e-5):
    mu = jnp.mean(x32, axis=-1, keepdims=True)
    var = jnp.mean((x32 - mu) ** 2, axis=-1, keepdims=True)
    return (x32 - mu) * jax.lax.rsqrt(var + eps) * scale + bias


def _gelu_new(x):
    return 0.5 * x * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (x + 0.044715 * x ** 3)))


def _kernel(pos_ref,                                  # SMEM (1,)
            x_ref, ln1_ref, wqkv_ref, bqkv_ref, wproj_ref, bproj_ref,
            ln2_ref, wfc_ref, bfc_ref, wfc2_ref, bfc2_ref,
            sqkv_ref, sproj_ref, sfc_ref, sfc2_ref,   # int8-weight qscales
            k_hbm, v_hbm, ks_hbm, vs_hbm,             # ANY (HBM)
            y_ref, krow_ref, vrow_ref,                # outputs
            x_s, kbuf, vbuf, ksbuf, vsbuf, m_s, l_s, acc_s,
            sem_k, sem_v, sem_ks, sem_vs,
            *, heads: int, ck: int, quantized: bool, quant_w: bool):
    l = pl.program_id(0)
    n_layers = pl.num_programs(0)
    b, c = x_ref.shape
    dh = c // heads
    pos = pos_ref[0]

    @pl.when(l == 0)
    def _():
        x_s[:, :] = x_ref[:, :]

    x = x_s[:, :]                                     # (B, C) bf16
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    mask32 = (lane // dh == head).astype(jnp.float32)   # (C, H)
    maskT32 = jnp.transpose(mask32, (1, 0))             # (H, C)

    def lane_expand(s32):                             # (B, H) f32 -> (B, C)
        return jax.lax.dot_general(s32, maskT32,
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    def dense(h_, w_ref, b_ref, s_ref):
        """Block dense matching the XLA layer exactly: nn.Dense adds the
        bias in bf16; QuantDense (int8 weights) applies the per-output
        qscale to the f32 accumulator, adds the bias in f32, then casts."""
        y = jax.lax.dot_general(h_, w_ref[0].astype(jnp.bfloat16),
                                (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        if quant_w:
            return (y * s_ref[0, 0]
                    + b_ref[0, 0].astype(jnp.float32)).astype(jnp.bfloat16)
        return y.astype(jnp.bfloat16) + b_ref[0, 0]

    # ---- ln_1 + fused qkv ------------------------------------------------
    h = _layer_norm(x.astype(jnp.float32), ln1_ref[0, 0].astype(jnp.float32),
                    ln1_ref[0, 1].astype(jnp.float32)).astype(jnp.bfloat16)
    qkv = dense(h, wqkv_ref, bqkv_ref, sqkv_ref)
    q = qkv[:, :c]
    k_cur = qkv[:, c:2 * c]
    v_cur = qkv[:, 2 * c:]
    krow_ref[0] = k_cur
    vrow_ref[0] = v_cur

    # block-diagonal q operand, head-major: qbdT[b, h, c] = q[b, c] iff
    # c // dh == h — feeds the (B, H, ck) logits matmul with no transposes
    qf = q.astype(jnp.float32)
    qbdT = (qf[:, None, :] * maskT32[None]).astype(jnp.bfloat16)  # (B, H, C)

    # ---- flash-decode over the valid cache prefix + the current row ------
    # current row first: logits_cur[b,h] = sum_{c in head h} q*k / sqrt(dh)
    logit_cur = jax.lax.dot_general(
        (qf * k_cur.astype(jnp.float32)), mask32,
        (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32) * (1.0 / np.sqrt(dh))  # (B, H)
    m_s[:, :] = logit_cur
    l_s[:, :] = jnp.ones((b, heads), jnp.float32)
    # acc is (B, H, C): every head carries the full channel row; the
    # (h, h*dh) block diagonal is extracted once after the loop. The
    # current (unquantized, in-VMEM) row contributes with weight 1.
    acc_s[:, :, :] = jnp.broadcast_to(
        v_cur.astype(jnp.float32)[:, None, :], (b, heads, c))

    n_chunks = pl.cdiv(pos, ck)                       # prefix rows: [0, pos)

    def dma(slot, ci):
        start = ci * ck
        pltpu.make_async_copy(k_hbm.at[l, :, pl.ds(start, ck), :],
                              kbuf.at[slot], sem_k.at[slot]).start()
        pltpu.make_async_copy(v_hbm.at[l, :, pl.ds(start, ck), :],
                              vbuf.at[slot], sem_v.at[slot]).start()
        if quantized:
            # (B, H, ck) scale windows DMA'd straight from the T-minor
            # (L, B, H, T) slabs — an in-VMEM lane slice at a *dynamic*
            # ck-granular offset does not lower (Mosaic rejects the
            # runtime-offset lane slice; tools/probe_mosaic_ops.py probe 4
            # only passed because its offset constant-folded)
            pltpu.make_async_copy(ks_hbm.at[l, :, :, pl.ds(start, ck)],
                                  ksbuf.at[slot], sem_ks.at[slot]).start()
            pltpu.make_async_copy(vs_hbm.at[l, :, :, pl.ds(start, ck)],
                                  vsbuf.at[slot], sem_vs.at[slot]).start()

    def wait(slot):
        pltpu.make_async_copy(kbuf.at[slot], kbuf.at[slot], sem_k.at[slot]).wait()
        pltpu.make_async_copy(vbuf.at[slot], vbuf.at[slot], sem_v.at[slot]).wait()
        if quantized:
            pltpu.make_async_copy(ksbuf.at[slot], ksbuf.at[slot],
                                  sem_ks.at[slot]).wait()
            pltpu.make_async_copy(vsbuf.at[slot], vsbuf.at[slot],
                                  sem_vs.at[slot]).wait()

    @pl.when(n_chunks > 0)
    def _():
        dma(0, 0)

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(jax.lax.rem(ci + 1, 2), ci + 1)

        wait(slot)
        k_blk = kbuf[slot].astype(jnp.bfloat16)       # (B, ck, C)
        v_blk = vbuf[slot].astype(jnp.bfloat16)
        start = ci * ck
        logits = jax.lax.dot_general(
            qbdT, k_blk, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * (1.0 / np.sqrt(dh))
        if quantized:                                 # (B, H, ck) windows
            logits = logits * ksbuf[slot]
        posv = start + jax.lax.broadcasted_iota(jnp.int32, (b, heads, ck), 2)
        logits = jnp.where(posv < pos, logits, NEG)
        m_new = jnp.maximum(m_s[:, :], logits.max(axis=2))
        p = jnp.exp(logits - m_new[:, :, None])       # (B, H, ck) f32
        alpha = jnp.exp(m_s[:, :] - m_new)
        l_s[:, :] = l_s[:, :] * alpha + p.sum(axis=2)
        m_s[:, :] = m_new
        if quantized:
            p = p * vsbuf[slot]
        pv = jax.lax.dot_general(                     # (B, H, C) f32
            p.astype(jnp.bfloat16), v_blk, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc_s[:, :, :] = acc_s[:, :, :] * alpha[:, :, None] + pv
        return 0

    jax.lax.fori_loop(0, n_chunks, body, 0)
    # block-diagonal extraction: out[b, c] = acc[b, c//dh, c] / l[b, c//dh]
    num = jnp.sum(acc_s[:, :, :] * maskT32[None], axis=1)         # (B, C)
    attn = (num / lane_expand(l_s[:, :])).astype(jnp.bfloat16)

    # ---- attn proj + residual --------------------------------------------
    x = x + dense(attn, wproj_ref, bproj_ref, sproj_ref)

    # ---- ln_2 + MLP + residual -------------------------------------------
    h2 = _layer_norm(x.astype(jnp.float32), ln2_ref[0, 0].astype(jnp.float32),
                     ln2_ref[0, 1].astype(jnp.float32)).astype(jnp.bfloat16)
    f = _gelu_new(dense(h2, wfc_ref, bfc_ref, sfc_ref))
    x = x + dense(f, wfc2_ref, bfc2_ref, sfc2_ref)

    x_s[:, :] = x
    y_ref[:, :] = x                                   # final layer's persists


def prepare_stacked_params(gpt_params: dict) -> dict:
    """Scan-stacked gpt params ({'h_scan': {'block': ...}}) -> the kernel's
    input arrays. Call once at load; pass the result to every step.

    Full-precision trees stack bf16 kernels; QuantDense trees (int8 weights,
    models/gpt2.py) keep the int8 kernels — HALVING the per-step weight
    stream, the dominant cost of small-batch decode — and add per-output
    "sqkv"/"sproj"/"sfc"/"sfc2" qscale rows applied to the f32 accumulator
    in-kernel, plus f32 biases (QuantDense adds its bias in f32)."""
    blk = gpt_params["h_scan"]["block"]
    quant = "qscale" in blk["attn"]["c_attn"]
    f = lambda a: jnp.asarray(a, jnp.bfloat16)

    def ln(p):  # (L, 2, C): [scale, bias]
        return jnp.stack([f(p["scale"]), f(p["bias"])], axis=1)

    def kern(p):
        a = jnp.asarray(p["kernel"])
        return a if a.dtype == jnp.int8 else f(a)

    def bias(p):  # (L, X) -> (L, 1, X): trailing block dims must equal the
        a = jnp.asarray(p["bias"])  # full array dims (Pallas tiling rule)
        return (a.astype(jnp.float32) if quant else f(a))[:, None, :]

    out = {
        "ln1": ln(blk["ln_1"]), "ln2": ln(blk["ln_2"]),
        "wqkv": kern(blk["attn"]["c_attn"]),
        "bqkv": bias(blk["attn"]["c_attn"]),
        "wproj": kern(blk["attn"]["c_proj"]),
        "bproj": bias(blk["attn"]["c_proj"]),
        "wfc": kern(blk["mlp_fc"]), "bfc": bias(blk["mlp_fc"]),
        "wfc2": kern(blk["mlp_proj"]),
        "bfc2": bias(blk["mlp_proj"]),
    }
    if quant:
        qs = lambda p: jnp.asarray(p["qscale"], jnp.float32)[:, None, :]
        out.update(sqkv=qs(blk["attn"]["c_attn"]),
                   sproj=qs(blk["attn"]["c_proj"]),
                   sfc=qs(blk["mlp_fc"]), sfc2=qs(blk["mlp_proj"]))
    return out


def fused_decode_step(stacked: dict, x, cache: dict, cache_index, *,
                      heads: int, ck: int = 32, interpret: bool = False):
    """Thin ck-normalizing wrapper around the jitted step.

    The int8 cache pins the chunk size to 128 (tile-aligned scale DMA) —
    normalizing BEFORE the jit boundary means a ck sweep against an int8
    cache hits one trace instead of tracing N programs that compile to the
    identical kernel (and silently measuring the same configuration N
    times)."""
    if "k_scale" in cache:
        ck = 128
    return _fused_decode_step(stacked, x, cache, cache_index, heads=heads,
                              ck=ck, interpret=interpret)


@functools.partial(jax.jit, static_argnames=("heads", "ck", "interpret"))
def _fused_decode_step(stacked: dict, x, cache: dict, cache_index, *,
                       heads: int, ck: int = 32, interpret: bool = False):
    """One full decode step over all layers.

    x: (B, C) bf16 token embedding (post decode_embed). cache: the
    models/gpt2.init_kv_cache dict, B-major merged layout (READ-ONLY) —
    bf16 buffers, or int8 buffers plus (L, B, H, T) f32 scale slabs.
    Returns (hidden (B, C) bf16 pre-ln_f, k_rows (L, B, C) bf16,
    v_rows (L, B, C) bf16) — the caller quantizes (if int8) and writes the
    rows at ``cache_index`` with stack-wide dynamic_update_slices.
    """
    ck_cache, cv_cache = cache["k"], cache["v"]
    quantized = "k_scale" in cache
    lcount, b, t_max, c = ck_cache.shape
    if quantized:
        # (L, B, H, T) scale slabs are (8, 128)-tiled in HBM, so the chunk
        # window DMA must be 128-aligned on the lane (T) dim — the chunk
        # size is pinned to 128 for the int8 cache (a 32-wide slice fails
        # to lower: "tpu.memref_slice" on the tiled hbm memref)
        ck = 128
        ks, vs = cache["k_scale"], cache["v_scale"]
        assert ks.shape == (lcount, b, heads, t_max), ks.shape
    else:  # placeholder operands keep the signature static
        ks = jnp.zeros((lcount, b, heads, 8), jnp.float32)
        vs = ks
    assert t_max % ck == 0, (t_max, ck)
    quant_w = stacked["wqkv"].dtype == jnp.int8
    if quant_w:
        wscales = (stacked["sqkv"], stacked["sproj"],
                   stacked["sfc"], stacked["sfc2"])
    else:  # tiny placeholders keep the operand list static
        z = jnp.zeros((lcount, 1, 8), jnp.float32)
        wscales = (z, z, z, z)

    grid = (lcount,)
    w = lambda blockshape: pl.BlockSpec(blockshape,
                                        lambda l: (l,) + (0,) * (len(blockshape) - 1))
    out = pl.pallas_call(
        functools.partial(_kernel, heads=heads, ck=ck, quantized=quantized,  # noqa
                          quant_w=quant_w),
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),          # pos
            pl.BlockSpec((b, c), lambda l: (0, 0)),          # x
            w((1, 2, c)),                                    # ln1
            w((1, c, 3 * c)), w((1, 1, 3 * c)),              # wqkv, bqkv
            w((1, c, c)), w((1, 1, c)),                      # wproj, bproj
            w((1, 2, c)),                                    # ln2
            w((1, c, 4 * c)), w((1, 1, 4 * c)),              # wfc, bfc
            w((1, 4 * c, c)), w((1, 1, c)),                  # wfc2, bfc2
            w((1, 1, 3 * c if quant_w else 8)),              # sqkv
            w((1, 1, c if quant_w else 8)),                  # sproj
            w((1, 1, 4 * c if quant_w else 8)),              # sfc
            w((1, 1, c if quant_w else 8)),                  # sfc2
            pl.BlockSpec(memory_space=pltpu.ANY),            # k cache
            pl.BlockSpec(memory_space=pltpu.ANY),            # v cache
            pl.BlockSpec(memory_space=pltpu.ANY),            # k scales
            pl.BlockSpec(memory_space=pltpu.ANY),            # v scales
        ],
        out_specs=[
            pl.BlockSpec((b, c), lambda l: (0, 0)),          # y
            pl.BlockSpec((1, b, c), lambda l: (l, 0, 0)),    # k rows
            pl.BlockSpec((1, b, c), lambda l: (l, 0, 0)),    # v rows
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((lcount, b, c), jnp.bfloat16),
            jax.ShapeDtypeStruct((lcount, b, c), jnp.bfloat16),
        ],
        scratch_shapes=[
            pltpu.VMEM((b, c), jnp.bfloat16),                # x carry
            pltpu.VMEM((2, b, ck, c), ck_cache.dtype),       # k chunks
            pltpu.VMEM((2, b, ck, c), cv_cache.dtype),       # v chunks
            pltpu.VMEM((2, b, heads, ck if quantized else 8),
                       jnp.float32),                         # k scale windows
            pltpu.VMEM((2, b, heads, ck if quantized else 8),
                       jnp.float32),                         # v scale windows
            pltpu.VMEM((b, heads), jnp.float32),             # m
            pltpu.VMEM((b, heads), jnp.float32),             # l
            pltpu.VMEM((b, heads, c), jnp.float32),          # acc (head-major)
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024),
        interpret=interpret,
    )(jnp.asarray([cache_index], jnp.int32).reshape(1), x.astype(jnp.bfloat16),
      stacked["ln1"], stacked["wqkv"], stacked["bqkv"], stacked["wproj"],
      stacked["bproj"], stacked["ln2"], stacked["wfc"], stacked["bfc"],
      stacked["wfc2"], stacked["bfc2"], *wscales, ck_cache, cv_cache, ks, vs)
    return out[0], out[1], out[2]
