"""Interpolation helpers matching torch.nn.functional.interpolate semantics."""
from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np


def linear_interpolate(x: jnp.ndarray, scale: float, out_len: int | None = None) -> jnp.ndarray:
    """1-D linear interpolation over axis 1 of (B, T, C), align_corners=False.

    Matches ``F.interpolate(mode="linear", scale_factor=scale)`` with
    torch's default ``recompute_scale_factor=False``: output length is
    floor(T*scale) and source coordinates are (i + 0.5)/scale - 0.5.
    """
    t = x.shape[1]
    if out_len is None:
        out_len = int(math.floor(t * scale))
    src = (np.arange(out_len) + 0.5) / scale - 0.5
    src = np.clip(src, 0.0, t - 1)
    lo = np.floor(src).astype(np.int32)
    hi = np.minimum(lo + 1, t - 1)
    w = jnp.asarray((src - lo).astype(np.float32))[None, :, None]
    return x[:, lo] * (1.0 - w) + x[:, hi] * w


def nearest_interpolate(x: jnp.ndarray, out_len: int) -> jnp.ndarray:
    """Nearest-neighbor resize over axis 1 of (B, T, C), matching
    ``F.interpolate(mode="nearest", size=out_len)`` (floor indexing)."""
    t = x.shape[1]
    # exact integer floor((i*t)/out_len): float multiplication can differ by
    # one index at exact multiples, which would break the bucketed path's
    # exact-equality guarantee (it uses the same integer form)
    idx = (np.arange(out_len) * t) // out_len
    idx = np.minimum(idx, t - 1).astype(np.int32)
    return x[:, idx]
