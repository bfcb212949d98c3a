"""Pick the Pallas decode-attention inner-loop formulation empirically.

The fused decode-step kernel (ops/decode_step_pallas.py) needs per-head
logits (B, ck, H) from a merged-channel chunk (B, ck, C) and q (B, C) with
dh = C/H = 64 — a segmented reduction that does not MXU-map directly.
Candidates:
  a) batched dot_general against a block-diagonal q (B, C, H) — the XLA
     twin's formulation (ops/attention.py);
  b) elementwise km = k * q then an UNBATCHED ((B*ck), C) @ (C, H)
     0/1-mask matmul (8x N-padding waste, but one big MXU op);
Each variant runs the full online-softmax chunk loop over a (B, T, C)
cache slab in HBM (manual double-buffered DMA), timed with the
scan-chained differential harness. Floor at B=128, T=768, int8: ~96 us.

Run: python tools/bench_attn_body_pallas.py [--batch 128] [--t 768]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30


def _attn_kernel(pos_ref, q_ref, k_hbm, v_hbm, o_ref, kbuf, vbuf, acc_ref,
                 m_ref, l_ref, sem_k, sem_v, *, heads: int, ck: int,
                 variant: str):
    b, c = q_ref.shape
    dh = c // heads
    t_max = k_hbm.shape[1]
    n = pos_ref[0] + 1
    n_chunks = pl.cdiv(n, ck)

    qf = q_ref[:, :].astype(jnp.float32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 0)
    head = jax.lax.broadcasted_iota(jnp.int32, (c, heads), 1)
    mask = (lane // dh == head).astype(jnp.bfloat16)       # (C, H) 0/1
    maskT = jnp.transpose(mask, (1, 0))                    # (H, C)
    if variant == "a":
        qbd = (qf[:, :, None] * mask[None].astype(jnp.float32)).astype(jnp.bfloat16)

    def dma(slot, ci):
        start = ci * ck
        ks = pltpu.make_async_copy(k_hbm.at[:, pl.ds(start, ck), :],
                                   kbuf.at[slot], sem_k.at[slot])
        vs = pltpu.make_async_copy(v_hbm.at[:, pl.ds(start, ck), :],
                                   vbuf.at[slot], sem_v.at[slot])
        ks.start()
        vs.start()

    def wait(slot):
        pltpu.make_async_copy(kbuf.at[slot], kbuf.at[slot], sem_k.at[slot]).wait()
        pltpu.make_async_copy(vbuf.at[slot], vbuf.at[slot], sem_v.at[slot]).wait()

    m_ref[:, :] = jnp.full((b, heads), NEG, jnp.float32)
    l_ref[:, :] = jnp.zeros((b, heads), jnp.float32)
    acc_ref[:, :] = jnp.zeros((b, c), jnp.float32)

    dma(0, 0)

    def body(ci, _):
        slot = jax.lax.rem(ci, 2)

        @pl.when(ci + 1 < n_chunks)
        def _():
            dma(jax.lax.rem(ci + 1, 2), ci + 1)

        wait(slot)
        k_blk = kbuf[slot]                               # (B, ck, C) bf16
        v_blk = vbuf[slot]
        # VMEM discipline: chunk-sized (B, ck, C) values stay bf16; f32
        # exists only in MXU accumulators and (B, ck, H)/(B, C) tensors —
        # f32 chunk transients register-spill by tens of MB
        if variant == "a":
            logits = jax.lax.dot_general(
                k_blk, qbd,
                (((2,), (1,)), ((0,), (0,))),
                preferred_element_type=jnp.float32)      # (B, ck, H)
        else:
            km = k_blk * qf.astype(jnp.bfloat16)[:, None, :]
            logits = jax.lax.dot_general(
                km.reshape(b * ck, c), mask,
                (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32).reshape(b, ck, heads)
        logits = logits * (1.0 / np.sqrt(dh))
        posv = ci * ck + jax.lax.broadcasted_iota(jnp.int32, (b, ck, heads), 1)
        logits = jnp.where(posv < n, logits, NEG)
        m_new = jnp.maximum(m_ref[:, :], logits.max(axis=1))
        p = jnp.exp(logits - m_new[:, None, :])          # (B, ck, H) f32
        alpha = jnp.exp(m_ref[:, :] - m_new)
        l_ref[:, :] = l_ref[:, :] * alpha + p.sum(axis=1)
        m_ref[:, :] = m_new
        # p_exp: broadcast each head's prob across its dh lanes (one
        # (B*ck, H) @ (H, C) mask matmul), then a pure elementwise
        # multiply-accumulate against v; f32 precision returns in the
        # ck-axis reduction
        p_exp = jax.lax.dot_general(
            p.astype(jnp.bfloat16).reshape(b * ck, heads), maskT,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32).astype(
                jnp.bfloat16).reshape(b, ck, c)
        pv = jnp.sum(p_exp * v_blk, axis=1, dtype=jnp.float32)  # (B, C)
        acc_ref[:, :] = acc_ref[:, :] * lane_expand(alpha) + pv
        return 0

    def lane_expand(x):
        # (B, H) -> (B, C): each head's value repeated across its dh lanes;
        # f32 mask matmul — the softmax rescale factors need full precision
        return jax.lax.dot_general(x, maskT.astype(jnp.float32),
                                   (((1,), (0,)), ((), ())),
                                   preferred_element_type=jnp.float32)

    jax.lax.fori_loop(0, n_chunks, body, 0)
    o_ref[:, :] = (acc_ref[:, :] / lane_expand(l_ref[:, :])).astype(o_ref.dtype)


def attn_pallas(q, k, v, pos, *, heads=16, ck=64, variant="a"):
    b, c = q.shape
    t_max = k.shape[1]
    return pl.pallas_call(
        functools.partial(_attn_kernel, heads=heads, ck=ck, variant=variant),
        out_shape=jax.ShapeDtypeStruct((b, c), q.dtype),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, b, ck, c), k.dtype),
            pltpu.VMEM((2, b, ck, c), v.dtype),
            pltpu.VMEM((b, c), jnp.float32),
            pltpu.VMEM((b, heads), jnp.float32),
            pltpu.VMEM((b, heads), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=124 * 1024 * 1024),
    )(jnp.asarray([pos], jnp.int32), q, k, v)


def reference(q, k, v, pos, heads=16):
    b, c = q.shape
    dh = c // heads
    n = pos + 1
    kh = np.asarray(k[:, :n]).reshape(b, n, heads, dh).astype(np.float32)
    vh = np.asarray(v[:, :n]).reshape(b, n, heads, dh).astype(np.float32)
    qh = np.asarray(q).reshape(b, heads, dh).astype(np.float32)
    logits = np.einsum("bhd,bthd->bht", qh, kh) / np.sqrt(dh)
    w = np.exp(logits - logits.max(2, keepdims=True))
    w /= w.sum(2, keepdims=True)
    return np.einsum("bht,bthd->bhd", w, vh).reshape(b, c)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t", type=int, default=768)
    ap.add_argument("--fill", type=int, default=300)
    ap.add_argument("--ck", type=int, default=64)
    ap.add_argument("--reps", type=int, default=64)
    ap.add_argument("--dtype", default="bf16", choices=["bf16", "int8"])
    args = ap.parse_args()
    b, c, t = args.batch, 1024, args.t
    rng = np.random.default_rng(0)
    q = jnp.asarray(rng.standard_normal((b, c)), jnp.bfloat16)
    k = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)
    v = jnp.asarray(rng.standard_normal((b, t, c)), jnp.bfloat16)

    for variant in ("a", "b"):
        fn = jax.jit(functools.partial(attn_pallas, heads=16, ck=args.ck,
                                       variant=variant))
        out = np.asarray(fn(q, k, v, args.fill))
        ref = reference(q, k, v, args.fill)
        err = np.abs(out - ref).max()
        # differential timing: chain N vs 3N applications
        # k/v are explicit jit args: closed-over device arrays bake
        # multi-100MB constants into the HLO (remote compile rejects it)
        @functools.partial(jax.jit, static_argnums=(3,))
        def chain(q_, k_, v_, n_):
            def body(qc, _):
                o = attn_pallas(qc.astype(jnp.bfloat16), k_, v_, args.fill,
                                heads=16, ck=args.ck, variant=variant)
                return (qc + 0.001 * o.astype(jnp.float32)), ()
            out_, _ = jax.lax.scan(body, q_.astype(jnp.float32), None, length=n_)
            return out_
        n = args.reps
        np.asarray(chain(q, k, v, n)); np.asarray(chain(q, k, v, 3 * n))
        t0 = time.perf_counter(); np.asarray(chain(q, k, v, n))
        t1 = time.perf_counter(); np.asarray(chain(q, k, v, 3 * n))
        t2 = time.perf_counter()
        us = ((t2 - t1) - (t1 - t0)) / (2 * n) * 1e6
        print(f"variant {variant}: {us:8.1f} us/call  max_err {err:.4f} "
              f"(B={b}, fill={args.fill}, ck={args.ck})")


if __name__ == "__main__":
    main()
