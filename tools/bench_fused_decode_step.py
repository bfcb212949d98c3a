"""Composed verdict for the fused whole-step decode kernel.

Chains N decode steps (kernel vs the XLA stack) inside one jitted scan —
including the cache-row writes, which the fused path does with two
stack-wide dynamic_update_slices — and reports differential ms/step.

Run: python tools/bench_fused_decode_step.py [--batch 128] [--cache int8]
"""
from __future__ import annotations

import argparse
import functools
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np

from tortoise_tpu.models.gpt2 import GPT2Config, GPT2Stack, init_kv_cache
from tortoise_tpu.ops.decode_step_pallas import (fused_decode_step,
                                                 prepare_stacked_params)
from tortoise_tpu import weights as weights_lib


def sync(x):
    np.asarray(jax.tree_util.tree_leaves(x)[0])


def quantize_rows(rows, heads):
    """(L, B, C) f32/bf16 -> int8 rows + (L, B, H) f32 scales (the
    models/gpt2.py per-(batch, position, head) symmetric scheme)."""
    l, b, c = rows.shape
    r = rows.astype(jnp.float32).reshape(l, b, heads, c // heads)
    s = jnp.maximum(jnp.abs(r).max(-1) / 127.0, 1e-8)
    w = jnp.round(r / s[..., None]).astype(jnp.int8)
    return w.reshape(l, b, c), s


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--t", type=int, default=768)
    ap.add_argument("--fill", type=int, default=256)
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--ck", type=int, default=32)
    ap.add_argument("--cache", default="int8", choices=["bf16", "int8"])
    ap.add_argument("--weights", default="bf16", choices=["bf16", "int8"],
                    help="int8 = QuantDense weight-only quant (half the "
                         "per-step weight stream)")
    args = ap.parse_args()
    b, n = args.batch, args.steps
    cache_dtype = {"bf16": jnp.bfloat16, "int8": jnp.int8}[args.cache]

    cfg = GPT2Config(quant_weights=args.weights == "int8")
    model = GPT2Stack(cfg, dtype=jnp.bfloat16)
    emb0 = jnp.zeros((b, 1, cfg.n_embd), jnp.bfloat16)
    params = weights_lib.host_init(
        lambda: model.init(jax.random.PRNGKey(0), emb0))
    # cast float leaves to bf16, but keep QuantDense qscale f32 (it applies
    # to the f32 accumulator; timing is unaffected either way)
    params = jax.device_put(jax.tree_util.tree_map_with_path(
        lambda path, a: a if a.dtype != jnp.float32
        or jax.tree_util.keystr(path).endswith("['qscale']")
        else a.astype(jnp.bfloat16), params))
    cache = init_kv_cache(cfg, b, args.t, dtype=cache_dtype)
    # pretend `fill` positions are already decoded
    cache = jax.tree_util.tree_map(lambda a: a, cache)
    x0 = jax.random.normal(jax.random.PRNGKey(1), (b, cfg.n_embd), jnp.bfloat16)
    stacked = prepare_stacked_params(params["params"])

    # ---- fused kernel chain (params are explicit jit args: closed-over
    # device arrays bake multi-100MB constants into the HLO) ----------------
    @functools.partial(jax.jit, static_argnums=(4,))
    def chain_fused(stacked_, x, cache, pos0, k):
        def step(carry, _):
            x, cache, pos = carry
            y, k_rows, v_rows = fused_decode_step(stacked_, x, cache, pos,
                                                  heads=cfg.n_head, ck=args.ck)
            if cache_dtype == jnp.int8:
                kq, ks = quantize_rows(k_rows, cfg.n_head)
                vq, vs = quantize_rows(v_rows, cfg.n_head)
                cache = dict(
                    k=jax.lax.dynamic_update_slice(cache["k"], kq[:, :, None, :],
                                                   (0, 0, pos, 0)),
                    v=jax.lax.dynamic_update_slice(cache["v"], vq[:, :, None, :],
                                                   (0, 0, pos, 0)),
                    k_scale=jax.lax.dynamic_update_slice(
                        cache["k_scale"], ks[..., None], (0, 0, 0, pos)),
                    v_scale=jax.lax.dynamic_update_slice(
                        cache["v_scale"], vs[..., None], (0, 0, 0, pos)))
            else:
                cache = dict(
                    k=jax.lax.dynamic_update_slice(
                        cache["k"], k_rows[:, :, None, :].astype(cache_dtype),
                        (0, 0, pos, 0)),
                    v=jax.lax.dynamic_update_slice(
                        cache["v"], v_rows[:, :, None, :].astype(cache_dtype),
                        (0, 0, pos, 0)))
            return (y * 0.01, cache, pos + 1), ()
        (x, cache, _), _ = jax.lax.scan(step, (x, cache, pos0), None, length=k)
        return x

    # ---- XLA stack chain ----------------------------------------------------
    @functools.partial(jax.jit, static_argnums=(4,))
    def chain_xla(params_, x, cache, pos0, k):
        def step(carry, _):
            x, cache, pos = carry
            hidden, cache = model.apply(params_, x[:, None], cache=cache,
                                        cache_index=pos)
            return (hidden[:, 0] * 0.01, cache, pos + 1), ()
        (x, cache, _), _ = jax.lax.scan(step, (x, cache, pos0), None, length=k)
        return x

    for label, chain, pa in (("fused", chain_fused, stacked),
                             ("xla  ", chain_xla, params)):
        sync(chain(pa, x0, cache, args.fill, n))
        sync(chain(pa, x0, cache, args.fill, 3 * n))
        t0 = time.perf_counter(); sync(chain(pa, x0, cache, args.fill, n))
        t1 = time.perf_counter(); sync(chain(pa, x0, cache, args.fill, 3 * n))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (2 * n) * 1e3
        print(f"{label} step: {ms:7.3f} ms/tok  (B={b}, cache={args.cache}, "
              f"fill={args.fill}, ck={args.ck})", flush=True)


if __name__ == "__main__":
    main()
