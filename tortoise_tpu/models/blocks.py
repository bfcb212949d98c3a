"""Shared neural building blocks (flax.linen).

TPU-native re-implementations of the reference's shared modules
(reference: tortoise/models/arch_util.py). Everything operates in
(batch, time, channels) layout — the native layout for both XLA convolutions
(NWC) and the MXU — whereas the reference uses (batch, channels, time).
Weight converters in ``tortoise_tpu/convert`` handle the transposes.

Compute dtype is configurable (bfloat16 for production); normalizations run
in float32 like the reference's GroupNorm32 (arch_util.py:21-23).
"""
from __future__ import annotations

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np


def norm_num_groups(channels: int) -> int:
    """Group count heuristic (reference arch_util.py:26-41)."""
    groups = 32
    if channels <= 16:
        groups = 8
    elif channels <= 64:
        groups = 16
    while channels % groups != 0:
        groups = int(groups / 2)
    assert groups > 2
    return groups


class MatmulConv1D(nn.Module):
    """'same'-padded 1-D conv as K shifted matmuls (drop-in for ``nn.Conv``).

    Param names/shapes match ``nn.Conv`` (kernel (K, Cin, Cout), bias
    (Cout,)), so converted checkpoints load unchanged. Rationale: for the
    diffusion decoder's (B=2, T, C=1024) activations XLA lowers
    ``conv_general_dilated`` with batch-as-sublanes (a (2, 128)-tiled
    layout, 4x sublane waste) plus a relayout of the input — 208 us per
    layer-step on v5e, the single hottest op in the sampling loop. The
    shifted-matmul form keeps the natural (8, 128) layout and feeds the
    MXU directly (trace: tools/profile_diffusion_step.py).
    """
    features: int
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        b, t, ci = x.shape
        k = self.kernel_size
        kernel = self.param("kernel", nn.initializers.lecun_normal(
            in_axis=(0, 1), out_axis=2), (k, ci, self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,),
                          jnp.float32)
        pad = (k - 1) // 2
        xp = jnp.pad(x, ((0, 0), (pad, pad), (0, 0)))
        y = jnp.broadcast_to(bias.astype(jnp.float32),
                             (b, t, self.features))
        kern = kernel.astype(self.dtype)
        for tap in range(k):
            xk = jax.lax.dynamic_slice_in_dim(xp, tap, t, 1)
            y = y + jax.lax.dot_general(xk.astype(self.dtype), kern[tap],
                                        (((2,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32)
        return y.astype(self.dtype)


class GroupNorm32(nn.Module):
    """GroupNorm evaluated in float32 regardless of activation dtype.

    With ``mask`` ((B, T) bool / float), statistics are computed over valid
    positions only and the output is zeroed on padded positions — this makes
    a right-padded run bitwise-equivalent to an unpadded run (used by the
    bucketed diffusion decoder to amortize compilation over lengths).
    """
    channels: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x, mask=None):
        orig_dtype = x.dtype
        if mask is None:
            y = nn.GroupNorm(num_groups=norm_num_groups(self.channels),
                             epsilon=self.eps, dtype=jnp.float32,
                             param_dtype=jnp.float32)(x.astype(jnp.float32))
            return y.astype(orig_dtype)
        groups = norm_num_groups(self.channels)
        b, t, c = x.shape
        m = mask.astype(jnp.float32)[:, :, None]              # (B, T, 1)
        xf = x.astype(jnp.float32) * m
        xg = xf.reshape(b, t, groups, c // groups)
        count = m.sum(axis=1, keepdims=True) * (c // groups)   # (B, 1, 1)
        mean = xg.sum(axis=(1, 3)) / count[:, 0]               # (B, G)
        var = ((xg - mean[:, None, :, None]) ** 2 *
               m[..., None]).sum(axis=(1, 3)) / count[:, 0]
        xn = (xg - mean[:, None, :, None]) * jax.lax.rsqrt(var[:, None, :, None]
                                                           + self.eps)
        xn = xn.reshape(b, t, c)
        scale, bias = _GNParams(self.channels, name="GroupNorm_0")()
        return ((xn * scale + bias) * m).astype(orig_dtype)


class _GNParams(nn.Module):
    """Scale/bias param holder sharing the nn.GroupNorm param layout, so the
    masked path reuses the exact same checkpoint entries."""
    channels: int

    @nn.compact
    def __call__(self):
        s = self.param("scale", nn.initializers.ones, (self.channels,), jnp.float32)
        b = self.param("bias", nn.initializers.zeros, (self.channels,), jnp.float32)
        return s, b


def relative_position_bucket(relative_position: jnp.ndarray, num_buckets: int = 32,
                             max_distance: int = 128, causal: bool = False) -> jnp.ndarray:
    """T5-style log-bucketed relative positions (reference xtransformers.py:155-175)."""
    ret = jnp.zeros_like(relative_position)
    n = -relative_position
    if not causal:
        num_buckets //= 2
        ret = ret + (n < 0).astype(jnp.int32) * num_buckets
        n = jnp.abs(n)
    else:
        n = jnp.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    val_if_large = max_exact + (
        jnp.log(n.astype(jnp.float32) / max_exact + 1e-20)
        / np.log(max_distance / max_exact) * (num_buckets - max_exact)
    ).astype(jnp.int32)
    val_if_large = jnp.minimum(val_if_large, num_buckets - 1)
    return ret + jnp.where(is_small, n, val_if_large)


def _np_relative_position_bucket(relative_position: np.ndarray, num_buckets: int,
                                 max_distance: int, causal: bool) -> np.ndarray:
    """Static (numpy) twin of relative_position_bucket for trace-time use."""
    ret = np.zeros_like(relative_position)
    n = -relative_position
    if not causal:
        num_buckets //= 2
        ret = ret + (n < 0).astype(np.int32) * num_buckets
        n = np.abs(n)
    else:
        n = np.maximum(n, 0)
    max_exact = num_buckets // 2
    is_small = n < max_exact
    with np.errstate(divide="ignore"):
        # float32 math to match the traced/torch versions bit-for-bit
        val_if_large = max_exact + (
            np.log(n.astype(np.float32) / max_exact + np.float32(1e-20))
            / np.float32(np.log(max_distance / max_exact))
            * (num_buckets - max_exact)
        ).astype(np.int32)
    val_if_large = np.minimum(val_if_large, num_buckets - 1)
    return (ret + np.where(is_small, n, val_if_large)).astype(np.int32)


def _toeplitz_expand(v: jnp.ndarray, t: int) -> jnp.ndarray:
    """v: (..., 2T-1) diagonal values indexed by (j - i + T - 1) ->
    (..., T, T) with out[..., i, j] = v[..., j - i + T - 1].

    Pure broadcast/pad/reshape/slice (the Transformer-XL relative-shift
    trick) — a naive (T, T) gather of the bias table measured ~68 ms/step in
    the diffusion loop (77% of the whole step)."""
    lead = v.shape[:-1]
    two_t_m1 = v.shape[-1]
    assert two_t_m1 == 2 * t - 1
    x = jnp.broadcast_to(v[..., None, :], lead + (t, two_t_m1))
    x = jnp.pad(x, [(0, 0)] * len(lead) + [(0, 0), (0, 1)])   # (..., T, 2T)
    x = x.reshape(lead + (t * 2 * t,))[..., : t * two_t_m1]
    x = x.reshape(lead + (t, two_t_m1))
    return x[..., t - 1:]


class RelativePositionBias(nn.Module):
    """Learned bucketed relative position bias added to attention logits
    (reference xtransformers.py:146-187). Returns (heads, T, T) * scale.

    The bucket map depends only on the diagonal offset, so the table lookup
    happens on a static (2T-1,) index vector and the (T, T) matrix is built
    with the Toeplitz reshape trick instead of a 16-head T^2 gather."""
    scale: float
    heads: int
    num_buckets: int = 32
    max_distance: int = 128
    causal: bool = False

    @nn.compact
    def __call__(self, qlen: int, klen: int) -> jnp.ndarray:
        table = self.param("embedding", nn.initializers.normal(1.0),
                           (self.num_buckets, self.heads), jnp.float32)
        buckets = jnp.asarray(_np_relative_position_bucket(
            np.arange(klen)[None, :] - np.arange(qlen)[:, None],
            self.num_buckets, self.max_distance, self.causal))
        return jnp.transpose(table[buckets], (2, 0, 1)) * self.scale


class AttentionBlock(nn.Module):
    """Self-attention over time with the diffusion-codebase head layout
    (reference arch_util.py:80-123 + QKVAttentionLegacy :44-77).

    Input/output: (B, T, C). The fused qkv projection keeps the reference's
    per-head [q|k|v] channel interleave so converted weights line up.
    Scaling is 1/sqrt(sqrt(head_dim)) applied to q and k separately; softmax
    runs in float32; an optional mask multiplies the *post-softmax* weights
    (a quirk of the reference kept for parity, arch_util.py:71-74).
    """
    channels: int
    num_heads: int = 1
    relative_pos_embeddings: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask=None, valid_mask=None, precomputed_bias=None):
        """mask: reference-style post-softmax multiplier (kept for parity,
        arch_util.py:71-74; never used by shipped configs). ``valid_mask``
        ((B, T) bool) is this framework's right-padding mask: keys beyond it
        are excluded pre-softmax and outputs are zeroed, making padded runs
        equal to unpadded ones. ``precomputed_bias`` ((H, T, T)) replaces the
        in-place relative-position bias computation."""
        b, t, c = x.shape
        h = self.num_heads
        ch = c // h
        y = GroupNorm32(self.channels)(x, mask=valid_mask)
        qkv = nn.Dense(3 * c, dtype=self.dtype, param_dtype=jnp.float32, name="qkv")(y)
        qkv = qkv.reshape(b, t, h, 3, ch)  # per-head [q|k|v] interleave
        q, k, v = qkv[..., 0, :], qkv[..., 1, :], qkv[..., 2, :]
        if precomputed_bias is not None and precomputed_bias.ndim == 4:
            # (H, M, bq, bq) Toeplitz bias tiles -> Pallas flash attention:
            # scores never round-trip HBM and bias tiles are shared along
            # block diagonals (ops/attn_pallas.py). `mask` (the post-softmax
            # reference quirk) is dead in shipped configs and unsupported here.
            assert mask is None, "flash attention path has no post-softmax mask"
            from tortoise_tpu.ops.attn_pallas import flash_rel_attention

            lens = (jnp.full((b,), t, jnp.int32) if valid_mask is None
                    else valid_mask.astype(jnp.int32).sum(axis=-1))
            interpret = jax.devices()[0].platform == "cpu"
            o = flash_rel_attention(jnp.swapaxes(q, 1, 2), jnp.swapaxes(k, 1, 2),
                                    jnp.swapaxes(v, 1, 2), precomputed_bias,
                                    lens, interpret=interpret)
            out = jnp.swapaxes(o, 1, 2).reshape(b, t, c)
            out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                           kernel_init=nn.initializers.zeros, name="proj_out")(out)
            out = x + out
            if valid_mask is not None:
                out = out * valid_mask[:, :, None].astype(out.dtype)
            return out
        scale = 1.0 / np.sqrt(np.sqrt(ch))
        logits = jnp.einsum("bthd,bshd->bhts", q * scale, k * scale,
                            preferred_element_type=jnp.float32)
        if self.relative_pos_embeddings:
            if precomputed_bias is not None:
                # bias hoisted out of the sampling loop by the caller — the
                # per-step (T, T) table gather measured ~68 ms/step ("rel_pos"
                # params exist in the tree; they are read by the hoisted
                # computation instead)
                logits = logits + precomputed_bias[None].astype(logits.dtype)
            else:
                bias = RelativePositionBias(scale=ch ** 0.5, heads=self.num_heads,
                                            num_buckets=32, max_distance=64,
                                            name="rel_pos")(t, t)
                logits = logits + bias[None]
        if valid_mask is not None:
            logits = jnp.where(valid_mask[:, None, None, :], logits,
                               jnp.finfo(jnp.float32).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(self.dtype)
        if mask is not None:
            w = w * mask[:, None, None, :].astype(w.dtype)
        out = jnp.einsum("bhts,bshd->bthd", w, v.astype(self.dtype))
        out = out.reshape(b, t, c)
        out = nn.Dense(c, dtype=self.dtype, param_dtype=jnp.float32,
                       kernel_init=nn.initializers.zeros, name="proj_out")(out)
        out = x + out
        if valid_mask is not None:
            out = out * valid_mask[:, :, None].astype(out.dtype)
        return out


class ResBlock(nn.Module):
    """1-D residual block, GroupNorm32+SiLU+Conv twice with zero-init second
    conv (reference arch_util.py:181-246, up/down unused by shipped models)."""
    channels: int
    out_channels: int | None = None
    kernel_size: int = 3
    use_conv_skip: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or self.channels
        pad = 1 if self.kernel_size == 3 else 2
        h = GroupNorm32(self.channels)(x)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (self.kernel_size,), padding=pad, dtype=self.dtype,
                    param_dtype=jnp.float32, name="in_conv")(h)
        h = GroupNorm32(out_ch)(h)
        h = nn.silu(h)
        h = nn.Conv(out_ch, (self.kernel_size,), padding=pad, dtype=self.dtype,
                    param_dtype=jnp.float32, kernel_init=nn.initializers.zeros,
                    name="out_conv")(h)
        if out_ch == self.channels:
            skip = x
        elif self.use_conv_skip:
            skip = nn.Conv(out_ch, (self.kernel_size,), padding=pad, dtype=self.dtype,
                           param_dtype=jnp.float32, name="skip_conv")(x)
        else:
            skip = nn.Conv(out_ch, (1,), dtype=self.dtype, param_dtype=jnp.float32,
                           name="skip_conv")(x)
        return skip + h


class Downsample(nn.Module):
    """Strided-conv downsampling (reference arch_util.py:153-178)."""
    channels: int
    out_channels: int | None = None
    factor: int = 4
    ksize: int = 5
    pad: int = 2
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or self.channels
        return nn.Conv(out_ch, (self.ksize,), strides=(self.factor,), padding=self.pad,
                       dtype=self.dtype, param_dtype=jnp.float32, name="conv")(x)


class Upsample(nn.Module):
    """Nearest-neighbor upsample + conv (reference arch_util.py:126-150)."""
    channels: int
    out_channels: int | None = None
    factor: int = 4
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        out_ch = self.out_channels or self.channels
        x = jnp.repeat(x, self.factor, axis=1)
        return nn.Conv(out_ch, (5,), padding=2, dtype=self.dtype,
                       param_dtype=jnp.float32, name="conv")(x)


class ConditioningEncoder(nn.Module):
    """Mel clip -> single conditioning vector: 1x1 conv then attention stack,
    taking the t=0 vector (reference autoregressive.py:204-228)."""
    spec_dim: int
    embedding_dim: int
    attn_blocks: int = 6
    num_attn_heads: int = 4
    mean: bool = False
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, mel_btc):
        # mel_btc: (B, T, spec_dim)
        h = nn.Dense(self.embedding_dim, dtype=self.dtype, param_dtype=jnp.float32,
                     name="init")(mel_btc)
        for i in range(self.attn_blocks):
            h = AttentionBlock(self.embedding_dim, self.num_attn_heads,
                               dtype=self.dtype, name=f"attn_{i}")(h)
        return h.mean(axis=1) if self.mean else h[:, 0]


class AudioMiniEncoder(nn.Module):
    """Waveform/spectrogram pyramid encoder used by the Tortoise-detector
    classifier (reference tortoise/models/classifier.py:78-120)."""
    spec_dim: int
    embedding_dim: int
    base_channels: int = 128
    depth: int = 2
    resnet_blocks: int = 2
    attn_blocks: int = 4
    num_attn_heads: int = 4
    downsample_factor: int = 2
    kernel_size: int = 3
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x_btc):
        h = nn.Conv(self.base_channels, (3,), padding=1, dtype=self.dtype,
                    param_dtype=jnp.float32, name="init")(x_btc)
        ch = self.base_channels
        idx = 0
        for _ in range(self.depth):
            for _ in range(self.resnet_blocks):
                h = ResBlock(ch, kernel_size=self.kernel_size, dtype=self.dtype,
                             name=f"res_{idx}")(h)
                idx += 1
            h = Downsample(ch, out_channels=ch * 2, factor=self.downsample_factor,
                           dtype=self.dtype, name=f"down_{idx}")(h)
            idx += 1
            ch *= 2
        h = GroupNorm32(ch)(h)
        h = nn.silu(h)
        h = nn.Conv(self.embedding_dim, (1,), dtype=self.dtype, param_dtype=jnp.float32,
                    name="final")(h)
        for i in range(self.attn_blocks):
            h = AttentionBlock(self.embedding_dim, self.num_attn_heads,
                               dtype=self.dtype, name=f"attn_{i}")(h)
        return h[:, 0]
