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


def windowed_linear_gather(x_win: jnp.ndarray, win_offset, n_valid,
                           out_start, out_len: int,
                           scale_num: int, scale_den: int) -> jnp.ndarray:
    """Window of a *global* linear interpolation, gathered from a window of
    the input.

    Returns the values that ``linear_interpolate(x_full[:, :n_valid],
    scale_num/scale_den)`` would produce at output indices
    [out_start, out_start + out_len), reading only ``x_win`` — the slice of
    the full input whose first frame is global index ``win_offset``.

    Index math is exact rational arithmetic (source position of output j is
    ((2j+1)*scale_den - scale_num) / (2*scale_num)), so the result matches
    the full interpolation to f32 rounding of the weights — this is what
    makes incremental streaming decode emit exact slices of the full decode.

    ``win_offset``, ``n_valid`` and ``out_start`` may be traced scalars;
    ``out_len`` must be static. The caller must ensure ``x_win`` actually
    covers the source range (indices are clamped to the window only as an
    OOB guard, not as edge handling).
    """
    j = out_start + jnp.arange(out_len)
    b = 2 * scale_num
    num = (2 * j + 1) * scale_den - scale_num  # b * source_position
    num = jnp.clip(num, 0, (n_valid - 1) * b)  # align_corners=False edge clamp
    lo = num // b
    w = ((num - lo * b).astype(jnp.float32) / b)[None, :, None]
    hi = jnp.minimum(lo + 1, n_valid - 1)
    lo_local = jnp.clip(lo - win_offset, 0, x_win.shape[1] - 1)
    hi_local = jnp.clip(hi - win_offset, 0, x_win.shape[1] - 1)
    a = jnp.take(x_win, lo_local, axis=1)
    c = jnp.take(x_win, hi_local, axis=1)
    w = w.astype(x_win.dtype)
    return a * (1.0 - w) + c * w


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
