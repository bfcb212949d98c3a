"""Attribute per-step diffusion cost on real hardware.

The quality pipeline's diffusion stage runs N p-sample steps, each a
batched-CFG (B=2) DiffusionTts forward at the bucketed output length. This
isolates the pieces — full forward, the 10-layer main stack, the attention
blocks alone (flash vs dense), the conv/resblock path — with scan-chained
differential timing (per-call timing through the tunnel is unreliable).

Run: python tools/profile_diffusion_step.py [--tout 896] [--steps 16]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from tortoise_tpu.models.diffusion_decoder import (DiffusionTts,
                                                   DiffusionTtsConfig,
                                                   compute_rel_bias_blocks,
                                                   compute_rel_biases,
                                                   init_diffusion_tts)
from tortoise_tpu import weights as weights_lib


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--tout", type=int, default=896)
    ap.add_argument("--steps", type=int, default=16)
    ap.add_argument("--batch", type=int, default=2, help="2 = batched CFG")
    args = ap.parse_args()
    B, T, N = args.batch, args.tout, args.steps

    cfg = DiffusionTtsConfig()
    m = DiffusionTts(cfg, dtype=jnp.bfloat16)
    p = jax.device_put(weights_lib.host_init(
        lambda: init_diffusion_tts(m, jax.random.PRNGKey(0))))
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.standard_normal((B, T, 100)), jnp.float32)
    pre = jnp.asarray(rng.standard_normal((B, T, cfg.model_channels)),
                      jnp.float32)
    ts = jnp.asarray(np.full((B,), 1200), jnp.int32)
    vl = jnp.asarray(T - 40)

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[-1])

    def time_chain(step_fn, label, biases):
        # params/biases are explicit jit args — closed-over device arrays
        # bake multi-100MB constants into the HLO (remote compile rejects it)
        @functools.partial(jax.jit, static_argnums=(0,))
        def chain(n, x, p_, pre_, biases_):
            def body(xc, _):
                y = step_fn(p_, xc, pre_, biases_)
                return (xc + 1e-3 * y[..., :x.shape[-1]]).astype(x.dtype), ()
            xc, _ = jax.lax.scan(body, x, None, length=n)
            return xc

        sync(chain(N, x0, p, pre, biases))       # compile N
        sync(chain(3 * N, x0, p, pre, biases))   # compile 3N
        t0 = time.perf_counter(); sync(chain(N, x0, p, pre, biases))
        t1 = time.perf_counter(); sync(chain(3 * N, x0, p, pre, biases))
        t2 = time.perf_counter()
        ms = ((t2 - t1) - (t1 - t0)) / (2 * N) * 1e3
        print(f"{label:34s} {ms:7.2f} ms/step")

    def step(p_, x, pre_, biases_):
        return m.apply(p_, x, ts, precomputed_aligned_embeddings=pre_,
                       rel_biases=biases_, valid_len=vl)

    # (a) full forward, flash bias tiles (production TPU path)
    tiles = compute_rel_bias_blocks(p["params"], cfg, T, dtype=jnp.bfloat16)
    time_chain(step, "full fwd (flash bias tiles)", tiles)

    # (b) full forward, dense precomputed biases
    dense = compute_rel_biases(p["params"], cfg, T, dtype=jnp.bfloat16)
    time_chain(step, "full fwd (dense biases)", dense)


if __name__ == "__main__":
    main()
