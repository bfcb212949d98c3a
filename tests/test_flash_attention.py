"""Pallas flash attention (ops/attn_pallas.py): correctness vs the dense XLA
path, run in interpreter mode on CPU.

The kernel is the serving path for the diffusion stack's 13 relative-position
attention blocks on TPU; these tests pin its math to the existing (parity-
tested) dense formulation, including Toeplitz bias tiles and right-padding
masks.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tortoise_tpu.models.blocks import AttentionBlock, _np_relative_position_bucket
from tortoise_tpu.ops.attn_pallas import flash_rel_attention, rel_bias_blocks


def dense_reference(q, k, v, table, scale, valid):
    t = q.shape[2]
    buckets = _np_relative_position_bucket(
        np.arange(t)[None, :] - np.arange(t)[:, None], 32, 64, False)
    bias = table[buckets].transpose(2, 0, 1) * scale        # (H, T, T)
    s = np.einsum("bhtd,bhsd->bhts", q, k) / np.sqrt(q.shape[-1]) + bias[None]
    s = np.where(np.arange(t)[None, None, None, :] < valid, s, -1e9)
    p = np.exp(s - s.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    return np.einsum("bhts,bhsd->bhtd", p, v)


def test_flash_kernel_matches_dense():
    B, H, T, D = 2, 4, 300, 64
    rng = np.random.default_rng(0)
    q, k, v = (rng.standard_normal((B, H, T, D)).astype(np.float32)
               for _ in range(3))
    table = (rng.standard_normal((32, H)) * 0.1).astype(np.float32)
    valid = 277
    want = dense_reference(q, k, v, table, 8.0, valid)
    bb = rel_bias_blocks(table, T, 8.0, dtype=jnp.float32)
    got = np.asarray(flash_rel_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bb,
        jnp.full((B,), valid, jnp.int32), interpret=True))
    np.testing.assert_allclose(got[:, :, :valid], want[:, :, :valid],
                               rtol=2e-5, atol=2e-5)


def test_flash_kernel_per_batch_lengths():
    B, H, T, D = 2, 2, 160, 64
    rng = np.random.default_rng(1)
    q, k, v = (rng.standard_normal((B, H, T, D)).astype(np.float32)
               for _ in range(3))
    table = (rng.standard_normal((32, H)) * 0.1).astype(np.float32)
    bb = rel_bias_blocks(table, T, 4.0, dtype=jnp.float32)
    lens = np.array([150, 97], np.int32)
    got = np.asarray(flash_rel_attention(
        jnp.asarray(q), jnp.asarray(k), jnp.asarray(v), bb,
        jnp.asarray(lens), interpret=True))
    for b in range(B):
        want = dense_reference(q[b:b + 1], k[b:b + 1], v[b:b + 1], table, 4.0,
                               int(lens[b]))
        np.testing.assert_allclose(got[b:b + 1, :, :lens[b]],
                                   want[:, :, :lens[b]], rtol=2e-5, atol=2e-5)


def test_attention_block_flash_path_matches_dense():
    """AttentionBlock dispatches on bias rank: 4-D tiles -> flash kernel,
    3-D dense -> XLA einsum. Same params, same inputs, same answer."""
    C, H, T, B = 64, 4, 90, 2
    block = AttentionBlock(C, H, relative_pos_embeddings=True)
    rng = np.random.default_rng(2)
    x = rng.standard_normal((B, T, C)).astype(np.float32)
    variables = block.init(jax.random.PRNGKey(0), jnp.asarray(x))
    table = np.asarray(variables["params"]["rel_pos"]["embedding"])  # (32, H)
    scale = (C // H) ** 0.5

    valid = np.zeros((B, T), bool)
    valid[0, :T] = True
    valid[1, :61] = True

    buckets = _np_relative_position_bucket(
        np.arange(T)[None, :] - np.arange(T)[:, None], 32, 64, False)
    dense_bias = jnp.asarray(table[buckets].transpose(2, 0, 1) * scale,
                             jnp.float32)
    want = np.asarray(block.apply(variables, jnp.asarray(x),
                                  valid_mask=jnp.asarray(valid),
                                  precomputed_bias=dense_bias))

    tiles = rel_bias_blocks(table, T, scale, dtype=jnp.float32)
    got = np.asarray(block.apply(variables, jnp.asarray(x),
                                 valid_mask=jnp.asarray(valid),
                                 precomputed_bias=tiles))
    np.testing.assert_allclose(got, want, rtol=3e-5, atol=3e-5)


@pytest.mark.slow
def test_diffusion_model_flash_biases_match_dense():
    from tortoise_tpu.models.diffusion_decoder import (
        DiffusionTts, DiffusionTtsConfig, compute_rel_bias_blocks,
        compute_rel_biases, init_diffusion_tts)

    cfg = DiffusionTtsConfig(model_channels=64, num_layers=2,
                             in_latent_channels=64, num_heads=4)
    m = DiffusionTts(cfg)
    variables = init_diffusion_tts(m, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    T = 48
    x = rng.standard_normal((2, T, 100)).astype(np.float32)
    pre = rng.standard_normal((2, T, 64)).astype(np.float32)
    ts = np.array([600, 600])

    dense = compute_rel_biases(variables["params"], cfg, T, dtype=jnp.float32)
    tiles = compute_rel_bias_blocks(variables["params"], cfg, T,
                                    dtype=jnp.float32)
    want = m.apply(variables, jnp.asarray(x), jnp.asarray(ts),
                   precomputed_aligned_embeddings=jnp.asarray(pre),
                   rel_biases=dense, valid_len=jnp.asarray(40))
    got = m.apply(variables, jnp.asarray(x), jnp.asarray(ts),
                  precomputed_aligned_embeddings=jnp.asarray(pre),
                  rel_biases=tiles, valid_len=jnp.asarray(40))
    np.testing.assert_allclose(np.asarray(got)[:, :40], np.asarray(want)[:, :40],
                               rtol=5e-5, atol=5e-5)


def test_merged_decode_attention_matches_layered():
    """Production merged-layout flash-decode (ops/attention.py) computes the
    same attention as the per-head layered formulation, bf16 and int8."""
    from tortoise_tpu.ops.attention import (chunked_decode_attention_layered,
                                            chunked_decode_attention_merged)

    L, B, T, H, DH = 3, 2, 512, 4, 64
    C = H * DH
    rng = np.random.default_rng(4)
    ckm = rng.standard_normal((L, B, T, C)).astype(np.float32)
    cvm = rng.standard_normal((L, B, T, C)).astype(np.float32)
    q = rng.standard_normal((B, C)).astype(np.float32)
    ckh = jnp.asarray(ckm.reshape(L, B, T, H, DH).transpose(0, 1, 3, 2, 4))
    cvh = jnp.asarray(cvm.reshape(L, B, T, H, DH).transpose(0, 1, 3, 2, 4))
    qh = jnp.asarray(q.reshape(B, H, 1, DH))

    for li, pos in [(0, 0), (1, 17), (2, 300), (2, 511)]:
        want = chunked_decode_attention_layered(qh, ckh, cvh, li, pos)
        got = chunked_decode_attention_merged(jnp.asarray(q), jnp.asarray(ckm),
                                              jnp.asarray(cvm), li, pos,
                                              heads=H)
        np.testing.assert_allclose(
            np.asarray(got).reshape(B, H, DH),
            np.asarray(want).reshape(B, H, DH), rtol=2e-3, atol=2e-3)


def test_pallas_merged_decode_matches_xla_twin():
    """decode_attention_merged (interpret mode) vs its pure-XLA twin: same
    outputs, identical in-place cache row writes."""
    from tortoise_tpu.ops.attn_pallas import (decode_attention_merged,
                                              decode_attention_merged_xla)

    L, B, T, H, DH = 2, 2, 256, 4, 64
    C = H * DH
    rng = np.random.default_rng(5)
    q = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    kn = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    vn = jnp.asarray(rng.standard_normal((B, C)), jnp.float32)
    kc = jnp.asarray(rng.standard_normal((L, B, T, C)), jnp.float32)
    vc = jnp.asarray(rng.standard_normal((L, B, T, C)), jnp.float32)
    for li, pos in [(0, 0), (1, 100)]:
        o1, k1, v1 = decode_attention_merged(q, kn, vn, kc, vc, li, pos,
                                             heads=H, interpret=True)
        o2, k2, v2 = decode_attention_merged_xla(q, kn, vn, kc, vc, li, pos,
                                                 heads=H)
        np.testing.assert_allclose(np.asarray(o1), np.asarray(o2),
                                   rtol=1e-2, atol=1e-2)
        assert jnp.array_equal(k1, k2) and jnp.array_equal(v1, v2)


def test_merged_decode_attention_int8_scales():
    """int8 cache + per-(position, head) scales: scale factoring inside the
    merged flash-decode equals explicit dequantization outside it."""
    from tortoise_tpu.ops.attention import chunked_decode_attention_merged

    L, B, T, H, DH = 2, 2, 512, 4, 64
    C = H * DH
    rng = np.random.default_rng(6)
    ck8 = rng.integers(-127, 128, (L, B, T, C)).astype(np.int8)
    cv8 = rng.integers(-127, 128, (L, B, T, C)).astype(np.int8)
    # scales travel as T-minor (L, B, H, T) slabs (models/gpt2.init_kv_cache)
    ks = (np.abs(rng.standard_normal((L, B, H, T))) * 0.02 + 1e-3).astype(np.float32)
    vs = (np.abs(rng.standard_normal((L, B, H, T))) * 0.02 + 1e-3).astype(np.float32)
    q = rng.standard_normal((B, C)).astype(np.float32)

    # explicit dequant -> float cache, no scales
    ks_bth = ks.transpose(0, 1, 3, 2)                    # (L, B, T, H)
    vs_bth = vs.transpose(0, 1, 3, 2)
    ckf = (ck8.reshape(L, B, T, H, DH) * ks_bth[..., None]).reshape(L, B, T, C)
    cvf = (cv8.reshape(L, B, T, H, DH) * vs_bth[..., None]).reshape(L, B, T, C)

    for li, pos in [(0, 30), (1, 400)]:
        got = chunked_decode_attention_merged(
            jnp.asarray(q), jnp.asarray(ck8), jnp.asarray(cv8), li, pos,
            heads=H, k_scale=jnp.asarray(ks), v_scale=jnp.asarray(vs))
        want = chunked_decode_attention_merged(
            jnp.asarray(q), jnp.asarray(ckf.astype(np.float32)),
            jnp.asarray(cvf.astype(np.float32)), li, pos, heads=H)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=2e-3, atol=2e-3)
