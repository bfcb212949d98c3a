"""Measure the location-variable convolution: XLA forms vs Pallas.

Realistic UnivNet-c32 shapes for a ~10 s clip (F = 937 mel frames): the
three LVC blocks run at hop 8 / 64 / 256 with Ci=32, Co=64, K=3.

Per-call timing through the tunneled TPU is unreliable (dispatch queuing
dwarfs ms-scale ops), so each variant is applied ``n`` times inside ONE
jitted ``lax.scan`` (output fed back as the next input) and the cost is the
slope between n and 3n — fixed costs cancel.

Variants: ``gather`` (unfold-style patch gather — the original
formulation), ``shifted`` (K shifted reshapes + frame-batched matmuls —
the production op in models/vocoder.py), ``pallas``
(ops/lvc_pallas.py VMEM streaming).

Run: python tools/bench_lvc.py [--frames 937] [--steps 8]
"""
from __future__ import annotations

import argparse
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np

from tortoise_tpu.models.vocoder import location_variable_convolution
from tortoise_tpu.ops.lvc_pallas import location_variable_convolution_pallas


def lvc_gather(x, kernels, bias, hop):
    """The original unfold-style formulation (kept for measurement)."""
    b, t, ci = x.shape
    _, f, _, co, k = kernels.shape
    p = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    idx = (np.arange(f)[:, None, None] * hop + np.arange(hop)[None, :, None]
           + np.arange(k)[None, None, :])
    patches = xp[:, idx]                            # (B, F, hop, K, Ci)
    y = jnp.einsum("bfski,bfiok->bfso", patches, kernels,
                   preferred_element_type=jnp.float32)
    y = y + bias[:, :, None, :]
    return y.reshape(b, f * hop, co).astype(x.dtype)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=937)
    ap.add_argument("--steps", type=int, default=8)
    args = ap.parse_args()
    F, N = args.frames, args.steps
    CI, CO, K = 32, 64, 3

    variants = {
        "gather": lvc_gather,
        "shifted": location_variable_convolution,
        "pallas": location_variable_convolution_pallas,
    }

    def sync(x):
        np.asarray(jax.tree_util.tree_leaves(x)[-1])

    def time_once(fn, reps=2):
        sync(fn())
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn()
        sync(out)
        return (time.perf_counter() - t0) / reps

    rng = np.random.default_rng(0)
    for hop in (8, 64, 256):
        x0 = jnp.asarray(rng.standard_normal((1, F * hop, CI)), jnp.float32)
        kern = jnp.asarray(rng.standard_normal((1, F, CI, CO, K)) * 0.1,
                           jnp.float32)
        bias = jnp.asarray(rng.standard_normal((1, F, CO)) * 0.1, jnp.float32)

        row = [f"hop={hop:4d} (T={F * hop:7d}):"]
        ref = None
        for name, op in variants.items():
            @functools.partial(jax.jit, static_argnums=(3,))
            def chain(x, kern, bias, n, _op=op):
                def step(xc, _):
                    y = _op(xc, kern, bias, hop)     # (B, T, CO)
                    return y[..., :CI] * 0.5, ()
                xc, _ = jax.lax.scan(step, x, None, length=n)
                return xc

            got = np.asarray(jax.jit(lambda x, k, b, _op=op: _op(x, k, b, hop)
                                     )(x0, kern, bias))
            if ref is None:
                ref = got
            err = np.abs(got - ref).max()
            t1 = time_once(lambda: chain(x0, kern, bias, N))
            t3 = time_once(lambda: chain(x0, kern, bias, 3 * N))
            ms = (t3 - t1) / (2 * N) * 1e3
            row.append(f"{name} {ms:8.2f} ms (err {err:.1e})")
        print("  ".join(row))


if __name__ == "__main__":
    main()
