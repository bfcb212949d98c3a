"""Pallas TPU kernel for the location-variable convolution.

The LVC op is the reference's hardest op (reference vocoder.py:182-216:
unfold + einsum at 414 us/loop on V100). The XLA formulation in
models/vocoder.py materializes (B, F, hop, K, Ci) patch tensors in HBM
(K-fold blowup); this kernel streams one frame at a time through VMEM: the
hop-length segment (plus its K-1 halo — only a (K-1)/hop fractional copy)
and that frame's predicted kernel are loaded, the (hop, K*Ci) patch matrix
is built in-register and hits the MXU against the (K*Ci, Co) kernel matrix.

Grid: (B, F). Tests run the kernel in interpreter mode on CPU; the vocoder
can force it on TPU via ``use_pallas=True``.

MEASURED CONCLUSION (v5e, composed UnivNet forward at F=937, resident
params): 46.9 ms with this kernel at the hop-256 block vs 13.0 ms with the
XLA shifted-reshape formulation (models/vocoder.py) — the (hop+K-1, Ci=32)
blocks fill only a quarter of each 128-lane tile and the 937-step grid
cannot amortize that, so the XLA form is the production default and this
kernel stays as measured groundwork. Standalone per-op timings through the
tunneled TPU are unreliable (dispatch queuing); trust only composed
whole-model numbers (tools/bench_lvc.py documents both).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _lvc_kernel(x_ref, k_ref, o_ref, *, hop: int, ksize: int, ci: int,
                co: int):
    # x_ref: (1, 1, hop + ksize - 1, ci) frame segment with halo
    # k_ref: (1, 1, ci, co, ksize); o_ref: (1, hop, co)
    x = x_ref[0, 0]                                 # (hop+K-1, Ci)
    kern = k_ref[0, 0]                              # (Ci, Co, K)
    # sum over taps of a shifted (hop, Ci) @ (Ci, Co) matmul — Mosaic cannot
    # concatenate sublane-shifted slices into one (hop, K*Ci) patch matrix
    # ("offset mismatch on non-concat dimension"), but shifted loads feeding
    # separate MXU ops lower fine
    acc = jnp.zeros((hop, co), jnp.float32)
    for k in range(ksize):
        acc = acc + jnp.dot(x[k:k + hop, :], kern[:, :, k],
                            preferred_element_type=jnp.float32)
    o_ref[0] = acc.astype(o_ref.dtype)


@functools.partial(jax.jit, static_argnames=("hop", "interpret"))
def location_variable_convolution_pallas(x: jnp.ndarray, kernels: jnp.ndarray,
                                         bias: jnp.ndarray, hop: int,
                                         interpret: bool = False) -> jnp.ndarray:
    """Same contract as models.vocoder.location_variable_convolution:
    x (B, F*hop, Ci), kernels (B, F, Ci, Co, K), bias (B, F, Co) ->
    (B, F*hop, Co)."""
    b, t, ci = x.shape
    _, f, _, co, k = kernels.shape
    assert t == f * hop
    p = (k - 1) // 2
    xp = jnp.pad(x, ((0, 0), (p, p), (0, 0)))
    # per-frame windows with halo: (B, F, hop + K - 1, Ci); only a
    # (K-1)/hop fractional duplication (vs K-fold for unfold patches)
    idx = np.arange(f)[:, None] * hop + np.arange(hop + k - 1)[None, :]
    xw = xp[:, idx]

    out = pl.pallas_call(
        functools.partial(_lvc_kernel, hop=hop, ksize=k, ci=ci, co=co),
        out_shape=jax.ShapeDtypeStruct((b, f * hop, co), x.dtype),
        grid=(b, f),
        in_specs=[
            pl.BlockSpec((1, 1, hop + k - 1, ci), lambda bi, fi: (bi, fi, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ci, co, k), lambda bi, fi: (bi, fi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, hop, co), lambda bi, fi: (bi, fi, 0),
                               memory_space=pltpu.VMEM),
        interpret=interpret,
    )(xw, kernels)
    # the per-frame bias stays an XLA elementwise add (a (1, 1, Co) VMEM
    # block is not a legal Mosaic tile; XLA fuses this into the output write)
    out = out.reshape(b, f, hop, co) + bias[:, :, None, :].astype(out.dtype)
    return out.reshape(b, f * hop, co)
