"""HiFi-GAN decoder: GPT latents -> 24 kHz waveform (fast path).

TPU-native re-implementation of the reference generator
(reference: tortoise/models/hifigan_decoder.py:159-303): conv_pre over
1024-d GPT latents + a 1x1 speaker-conditioning layer, four transposed-conv
upsample stages [8, 8, 2, 2] each followed by a multi-receptive-field fusion
of three ResBlocks (kernels 3/7/11, dilations 1/3/5), then conv_post + tanh.
Weight norm is folded into plain kernels at conversion time.

Everything is (B, T, C); transposed convs are expressed as input-dilated
regular convolutions, which XLA maps onto the MXU.
"""
from __future__ import annotations

import dataclasses

import flax.linen as nn
import jax
import jax.numpy as jnp

from tortoise_tpu.ops.interpolate import linear_interpolate, windowed_linear_gather

LRELU_SLOPE = 0.1


def conv_transpose_1d(x, kernel, bias, stride: int, padding: int, output_padding: int = 0):
    """torch ConvTranspose1d equivalence via an input-dilated convolution.

    x: (B, T, Cin); kernel: flax layout (K, Cin, Cout) already time-flipped
    at conversion; output length = (T-1)*stride - 2*padding + K + output_padding.
    """
    k = kernel.shape[0]
    pad = k - 1 - padding
    y = jax.lax.conv_general_dilated(
        x, kernel, window_strides=(1,),
        padding=[(pad, pad + output_padding)],
        lhs_dilation=(stride,),
        dimension_numbers=("NWC", "WIO", "NWC"))
    return y + bias


class ConvTranspose(nn.Module):
    features: int
    kernel_size: int
    stride: int
    padding: int
    output_padding: int = 0
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x):
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (self.kernel_size, x.shape[-1], self.features), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (self.features,), jnp.float32)
        return conv_transpose_1d(x.astype(self.dtype), kernel.astype(self.dtype),
                                 bias.astype(self.dtype), self.stride, self.padding,
                                 self.output_padding)


class ResBlock1(nn.Module):
    """MRF residual block type 1 (reference hifigan_decoder.py:15-103).
    ``valid_mask`` zeros right-padding after every conv so bucketed runs
    match unpadded ones exactly (convs are the only cross-time ops here)."""
    channels: int
    kernel_size: int = 3
    dilations: tuple = (1, 3, 5)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_mask=None):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                         padding=(self.kernel_size * d - d) // 2, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"conv1_{i}")(xt)
            if valid_mask is not None:
                xt = xt * valid_mask  # conv2 reads this; pads must stay zero
            xt = nn.leaky_relu(xt, LRELU_SLOPE)
            xt = nn.Conv(self.channels, (self.kernel_size,),
                         padding=(self.kernel_size - 1) // 2, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"conv2_{i}")(xt)
            if valid_mask is not None:
                xt = xt * valid_mask
            x = x + xt
        return x


class ResBlock2(nn.Module):
    """MRF residual block type 2 (reference hifigan_decoder.py:105-156)."""
    channels: int
    kernel_size: int = 3
    dilations: tuple = (1, 3)
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, valid_mask=None):
        for i, d in enumerate(self.dilations):
            xt = nn.leaky_relu(x, LRELU_SLOPE)
            xt = nn.Conv(self.channels, (self.kernel_size,), kernel_dilation=(d,),
                         padding=(self.kernel_size * d - d) // 2, dtype=self.dtype,
                         param_dtype=jnp.float32, name=f"conv_{i}")(xt)
            if valid_mask is not None:
                xt = xt * valid_mask
            x = x + xt
        return x


@dataclasses.dataclass(frozen=True)
class HifiganConfig:
    """Shipping config from reference api_fast.py:222-225."""
    in_channels: int = 1024
    out_channels: int = 1
    resblock_type: str = "1"
    resblock_dilation_sizes: tuple = ((1, 3, 5), (1, 3, 5), (1, 3, 5))
    resblock_kernel_sizes: tuple = (3, 7, 11)
    upsample_kernel_sizes: tuple = (16, 16, 4, 4)
    upsample_initial_channel: int = 512
    upsample_factors: tuple = (8, 8, 2, 2)
    cond_channels: int = 1024


class HifiganGenerator(nn.Module):
    config: HifiganConfig = HifiganConfig()
    dtype: jnp.dtype = jnp.float32

    @nn.compact
    def __call__(self, x, g=None, valid_frames=None):
        """x: (B, T, in_channels); g: (B, cond_channels) speaker conditioning.
        Returns (B, T * prod(upsample_factors), out_channels) in [-1, 1].

        ``valid_frames`` (scalar): treat frames >= it as right-padding —
        activations are zeroed after every conv, which makes the valid region
        exactly equal to an unpadded run (the stack is convs + elementwise
        only), so one compiled program serves a whole bucket of lengths.
        """
        cfg = self.config

        def mask_for(t, valid):
            if valid is None:
                return None
            return (jnp.arange(t)[None, :, None] < valid).astype(self.dtype)

        vm = mask_for(x.shape[1], valid_frames)
        if vm is not None:
            x = x * vm.astype(x.dtype)
        o = nn.Conv(cfg.upsample_initial_channel, (7,), padding=3, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_pre")(x)
        if g is not None:
            cond = nn.Dense(cfg.upsample_initial_channel, dtype=self.dtype,
                            param_dtype=jnp.float32, name="cond_layer")(g)
            o = o + cond[:, None, :]
        if vm is not None:
            o = o * vm
        resblock = ResBlock1 if cfg.resblock_type == "1" else ResBlock2
        num_kernels = len(cfg.resblock_kernel_sizes)
        valid = valid_frames
        for i, (u, k) in enumerate(zip(cfg.upsample_factors, cfg.upsample_kernel_sizes)):
            o = nn.leaky_relu(o, LRELU_SLOPE)
            ch = cfg.upsample_initial_channel // (2 ** (i + 1))
            o = ConvTranspose(ch, k, u, padding=(k - u) // 2, dtype=self.dtype,
                              name=f"up_{i}")(o)
            if valid is not None:
                valid = valid * u
                vm = mask_for(o.shape[1], valid)
                o = o * vm
            z_sum = None
            for j, (rk, rd) in enumerate(zip(cfg.resblock_kernel_sizes,
                                             cfg.resblock_dilation_sizes)):
                z = resblock(ch, rk, tuple(rd), dtype=self.dtype,
                             name=f"resblock_{i}_{j}")(o, valid_mask=vm)
                z_sum = z if z_sum is None else z_sum + z
            o = z_sum / num_kernels
        o = nn.leaky_relu(o, 0.01)  # reference uses the default slope here (:263)
        o = nn.Conv(cfg.out_channels, (7,), padding=3, dtype=self.dtype,
                    param_dtype=jnp.float32, name="conv_post")(o)
        return jnp.tanh(o)

    def inference(self, c, g, valid_frames=None):
        """c: (B, T, 1024) GPT latents; g: (B, 1024) speaker latent.

        Reference hifigan_decoder.py:268-294: latents are linearly
        interpolated x(1024/256) then x(24000/22050) before decoding.
        When ``c`` is right-padded (edge-pad the latents!) pass the valid
        post-interpolation frame count as ``valid_frames``.
        """
        up = linear_interpolate(c, 1024.0 / 256.0)
        up = linear_interpolate(up, 24000.0 / 22050.0)
        return self(up, g, valid_frames=valid_frames)

    def inference_window(self, c_win, g, lat_offset, n_valid, u_start,
                         u_len: int, valid_u=None):
        """Windowed incremental decode for streaming: the slice
        [u_start*256, (u_start+u_len)*256) of the waveform that
        ``inference(c_full[:, :n_valid], g)`` would produce, computed from
        only ``c_win`` — the latent frames starting at global ``lat_offset``.

        The interpolation chain uses global index math (exact rational
        source positions), so interior samples match the full decode; the
        conv stack's receptive field (~15 u-frames per side for the shipping
        config) means the first/last ~16 u-frames of the window differ —
        callers keep a >=RF halo on each side of the region they emit.
        ``valid_u`` (window-relative) masks u-frames at/after the decode
        frontier, matching the full decode's right edge.

        This replaces the reference's O(prefix) re-decode of the entire
        accumulated latent each chunk (reference api_fast.py:400-420) with an
        O(chunk) fixed-shape program.
        """
        # stage 1 (x4): mel-interp frames [4*lat_offset, 4*(lat_offset+W))
        m_offset = 4 * lat_offset
        mel_win = windowed_linear_gather(c_win, lat_offset, n_valid,
                                         m_offset, 4 * c_win.shape[1], 1024, 256)
        # stage 2 (x160/147): u-frames [u_start, u_start+u_len)
        u = windowed_linear_gather(mel_win, m_offset, 4 * n_valid,
                                   u_start, u_len, 24000, 22050)
        return self(u, g, valid_frames=valid_u)
