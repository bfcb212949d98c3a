"""Measure decode-attention variants over merged-channel vs per-head caches.

The AR decode is bandwidth-bound on KV-cache reads. The production cache is
(L, B, H, T, Dh=64): its 64-wide minor dim fills only half of each
(16, 128)/(32, 128) physical tile, so every read (bf16 AND int8) moves 2x
the logical bytes. A merged (L, B, T, C=1024) layout is tile-exact; the
head-blocked attention math is recovered with block-diagonal matmuls
(q -> (C, H) block-diagonal operand for QK; PV as a (H, t) @ (t, C) matmul
whose (H, H, dh) block-diagonal is extracted at the end) — 16x the logical
MXU FLOPs, but these are free against the HBM read on v5e.

Variants timed (differential ms/step over 30 layers):
  chunked-bf16      current production path, (L,B,H,T,64) bf16
  chunked-int8      current production path, int8 + per-position scales
  merged-bf16       pure-XLA merged layout, chunked online softmax
  merged-int8       same, int8 cache + (T, H) scales
  pallas-merged     ops/attn_pallas.decode_attention_merged (full-T read)

Run: python tools/bench_decode_attn_merged.py [--batch 16] [--tmax 768]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from tortoise_tpu.ops.attention import chunked_decode_attention_layered
from tortoise_tpu.ops.attn_pallas import decode_attention_merged


NEG_INF = -1e9


def merged_chunked(q, ck, cv, layer_idx, cache_index, *, heads: int,
                   chunk: int = 256, k_scale=None, v_scale=None):
    """Flash-decode over the merged (L, B, T, C) cache.

    q: (B, C); ck/cv: (L, B, T, C) bf16 or int8; k_scale/v_scale:
    (L, B, T, H) f32 when the cache is int8. Returns (B, C) in q.dtype.
    """
    lcount, b, t_max, c = ck.shape
    dh = c // heads
    n = cache_index + 1
    n_chunks = (n + chunk - 1) // chunk
    scale = 1.0 / np.sqrt(dh)

    # block-diagonal q: (B, C, H), qbd[b, c, h] = q[b, c] iff c // dh == h
    lane = jnp.arange(c)[:, None]
    head = jnp.arange(heads)[None, :]
    qbd = jnp.where(lane // dh == head, q.astype(jnp.float32)[:, :, None], 0.0)

    def body(ci, carry):
        m, l, acc = carry
        start = ci * chunk

        def blk(buf, width):
            return jax.lax.dynamic_slice(buf, (layer_idx, 0, start, 0),
                                         (1, b, chunk, width))[0]

        k_blk = blk(ck, c)
        v_blk = blk(cv, c)
        # (B, t, C) @ (B, C, H) -> (B, t, H); scales factor out of the matmul
        logits = jax.lax.dot_general(
            k_blk.astype(jnp.float32), qbd,
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32) * scale
        if k_scale is not None:
            logits = logits * blk(k_scale, heads)
        pos = start + jnp.arange(chunk)
        logits = jnp.where(pos[None, :, None] < n, logits, NEG_INF)
        m_new = jnp.maximum(m, logits.max(axis=1))            # (B, H)
        p = jnp.exp(logits - m_new[:, None, :])               # (B, t, H)
        alpha = jnp.exp(m - m_new)
        l_new = l * alpha + p.sum(axis=1)
        if v_scale is not None:
            p = p * blk(v_scale, heads)
        # (B, H, t) @ (B, t, C) -> (B, H, C); only the block-diagonal
        # (h, h*dh:(h+1)*dh) strips are meaningful — extracted once at the end
        pv = jax.lax.dot_general(
            jnp.swapaxes(p, 1, 2), v_blk.astype(jnp.float32),
            (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)
        acc_new = acc * alpha[..., None] + pv
        return m_new, l_new, acc_new

    init = (jnp.full((b, heads), NEG_INF, jnp.float32),
            jnp.zeros((b, heads), jnp.float32),
            jnp.zeros((b, heads, c), jnp.float32))
    if t_max <= chunk:
        m, l, acc = body(0, init)
    else:
        m, l, acc = jax.lax.fori_loop(0, n_chunks, body, init)
    # block diagonal of (B, H, H, dh) along the two head axes
    diag = acc.reshape(b, heads, heads, dh)
    out = jnp.einsum("bhhd->bhd", diag) / l[..., None]
    return out.reshape(b, c).astype(q.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--tmax", type=int, default=768)
    ap.add_argument("--layers", type=int, default=30)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--nvalid", type=int, default=600)
    args = ap.parse_args()
    B, H, T, L, N, DH = args.batch, 16, args.tmax, args.layers, args.steps, 64
    C = H * DH
    nv = min(args.nvalid, T - 1)

    rng = np.random.default_rng(0)
    ckm = jnp.asarray(rng.standard_normal((L, B, T, C)), jnp.bfloat16)
    cvm = jnp.asarray(rng.standard_normal((L, B, T, C)), jnp.bfloat16)
    q = jnp.asarray(rng.standard_normal((B, C)), jnp.bfloat16)

    # per-head layout views of the same data
    ckh = jnp.transpose(ckm.reshape(L, B, T, H, DH), (0, 1, 3, 2, 4))
    cvh = jnp.transpose(cvm.reshape(L, B, T, H, DH), (0, 1, 3, 2, 4))
    qh = q.reshape(B, H, 1, DH)

    # int8 versions
    def quant_h(x):  # (L,B,H,T,D) -> int8 + (L,B,H,T,1) scales
        s = jnp.maximum(jnp.abs(x).max(-1, keepdims=True).astype(jnp.float32)
                        / 127.0, 1e-8)
        return jnp.round(x.astype(jnp.float32) / s).astype(jnp.int8), s

    def quant_m(x):  # (L,B,T,C) -> int8 + (L,B,T,H) scales
        xs = x.reshape(L, B, T, H, DH)
        s = jnp.maximum(jnp.abs(xs).max(-1).astype(jnp.float32) / 127.0, 1e-8)
        xq = jnp.round(xs.astype(jnp.float32) / s[..., None]).astype(jnp.int8)
        return xq.reshape(L, B, T, C), s

    ckh8, ksh = quant_h(ckh)
    cvh8, vsh = quant_h(cvh)
    ckm8, ksm = quant_m(ckm)
    cvm8, vsm = quant_m(cvm)

    # --- numerics: merged vs per-head on the same data ---
    ref = chunked_decode_attention_layered(qh.astype(jnp.float32), ckh, cvh,
                                           2, nv)
    got = merged_chunked(q.astype(jnp.float32), ckm, cvm, 2, nv, heads=H)
    err = np.abs(np.asarray(ref.reshape(B, C), np.float32)
                 - np.asarray(got, np.float32)).max()
    print(f"numerics merged vs per-head: {err:.3e}")
    assert err < 3e-2, err
    gotp, _, _ = decode_attention_merged(q, q, q, ckm, cvm, 2, nv, heads=H)
    errp = np.abs(np.asarray(got, np.float32)
                  - np.asarray(gotp, np.float32)).max()
    print(f"numerics pallas vs merged-xla: {errp:.3e}")

    # --- timing ---
    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[-1])

    def time_once(fn, reps=2):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / reps

    def diff_per_step(fn_of_n, n=N):
        return 1e3 * (time_once(fn_of_n(3 * n)) - time_once(fn_of_n(n))) / (2 * n)

    def run(name, steps_fn):
        print(f"{name:14s}: {diff_per_step(steps_fn):7.3f} ms/step "
              f"({L} layers, T={T}, B={B}, nvalid={nv})")

    @functools.partial(jax.jit, static_argnums=(0,))
    def steps_headed(k, ck, cv, ks, vs):
        def step(acc, _):
            qq = (qh + acc).astype(jnp.float32)
            for l in range(L):
                acc2 = chunked_decode_attention_layered(
                    qq, ck, cv, l, nv, k_scale=ks, v_scale=vs)
                qq = qq + acc2.astype(jnp.float32) * 1e-3
            return qq - qh.astype(jnp.float32), ()
        acc, _ = jax.lax.scan(step, jnp.zeros_like(qh, jnp.float32), None,
                              length=k)
        return acc

    @functools.partial(jax.jit, static_argnums=(0,))
    def steps_merged(k, ck, cv, ks, vs):
        def step(acc, _):
            qq = (q + acc).astype(jnp.float32)
            for l in range(L):
                acc2 = merged_chunked(qq, ck, cv, l, nv, heads=H,
                                      k_scale=ks, v_scale=vs)
                qq = qq + acc2.astype(jnp.float32) * 1e-3
            return qq - q.astype(jnp.float32), ()
        acc, _ = jax.lax.scan(step, jnp.zeros_like(q, jnp.float32), None,
                              length=k)
        return acc

    @functools.partial(jax.jit, static_argnums=(0,))
    def steps_pallas(k, ck, cv):
        def step(carry, _):
            acc, ck_, cv_ = carry
            qq = (q + acc).astype(q.dtype)
            for l in range(L):
                o, ck_, cv_ = decode_attention_merged(qq, qq, qq, ck_, cv_,
                                                      l, nv, heads=H)
                qq = (qq + o.astype(q.dtype) * 1e-3).astype(q.dtype)
            return ((qq - q).astype(jnp.float32), ck_, cv_), ()
        (acc, _, _), _ = jax.lax.scan(
            step, (jnp.zeros_like(q, jnp.float32), ck, cv), None, length=k)
        return acc

    run("chunked-bf16", lambda k: lambda: steps_headed(k, ckh, cvh, None, None))
    run("chunked-int8", lambda k: lambda: steps_headed(k, ckh8, cvh8, ksh, vsh))
    run("merged-bf16", lambda k: lambda: steps_merged(k, ckm, cvm, None, None))
    run("merged-int8", lambda k: lambda: steps_merged(k, ckm8, cvm8, ksm, vsm))
    run("pallas-merged", lambda k: lambda: steps_pallas(k, ckm, cvm))


if __name__ == "__main__":
    main()
