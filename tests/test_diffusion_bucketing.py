"""Bucketed/masked diffusion must match unpadded runs exactly on the valid
region — this is what lets one compiled program serve all output lengths."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.models.diffusion_decoder import (DiffusionTts, DiffusionTtsConfig,
                                                   init_diffusion_tts)

CH, LAYERS, HEADS = 64, 2, 4


@pytest.fixture(scope="module")
def model():
    cfg = DiffusionTtsConfig(model_channels=CH, num_layers=LAYERS,
                             in_latent_channels=CH, num_heads=HEADS)
    m = DiffusionTts(cfg)
    variables = init_diffusion_tts(m, jax.random.PRNGKey(0))
    return m, variables


@pytest.mark.slow
def test_timestep_independent_bucketed_matches_exact(model):
    m, variables = model
    rng = np.random.default_rng(0)
    n_lat, s_bucket = 9, 16
    out_len, out_bucket = 9 * 4 * 24000 // 22050, 48
    lat = rng.standard_normal((1, n_lat, CH)).astype(np.float32)
    lat_padded = np.pad(lat, ((0, 0), (0, s_bucket - n_lat), (0, 0)))
    cond = rng.standard_normal((1, 2 * CH)).astype(np.float32)

    exact = m.apply(variables, jnp.asarray(lat), jnp.asarray(cond), out_len,
                    method=DiffusionTts.timestep_independent)
    bucketed = m.apply(variables, jnp.asarray(lat_padded), jnp.asarray(n_lat),
                       jnp.asarray(cond), jnp.asarray(out_len), out_bucket,
                       method=DiffusionTts.timestep_independent_bucketed)
    np.testing.assert_allclose(np.asarray(bucketed)[:, :out_len],
                               np.asarray(exact), rtol=2e-5, atol=2e-5)
    assert np.abs(np.asarray(bucketed)[:, out_len:]).max() == 0


@pytest.mark.slow
def test_forward_masked_matches_exact(model):
    m, variables = model
    rng = np.random.default_rng(1)
    t_exact, t_bucket = 39, 64
    x = rng.standard_normal((1, t_exact, 100)).astype(np.float32)
    x_padded = np.pad(x, ((0, 0), (0, t_bucket - t_exact), (0, 0)))
    pre = rng.standard_normal((1, t_exact, CH)).astype(np.float32)
    pre_padded = np.pad(pre, ((0, 0), (0, t_bucket - t_exact), (0, 0)))
    ts = np.array([600])

    exact = m.apply(variables, jnp.asarray(x), jnp.asarray(ts),
                    precomputed_aligned_embeddings=jnp.asarray(pre))
    masked = m.apply(variables, jnp.asarray(x_padded), jnp.asarray(ts),
                     precomputed_aligned_embeddings=jnp.asarray(pre_padded),
                     valid_len=jnp.asarray(t_exact))
    np.testing.assert_allclose(np.asarray(masked)[:, :t_exact],
                               np.asarray(exact), rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_forward_masked_cond_free_matches_exact(model):
    m, variables = model
    rng = np.random.default_rng(2)
    t_exact, t_bucket = 25, 32
    x = rng.standard_normal((1, t_exact, 100)).astype(np.float32)
    x_padded = np.pad(x, ((0, 0), (0, t_bucket - t_exact), (0, 0)))
    ts = np.array([50])
    exact = m.apply(variables, jnp.asarray(x), jnp.asarray(ts),
                    conditioning_free=True)
    masked = m.apply(variables, jnp.asarray(x_padded), jnp.asarray(ts),
                     conditioning_free=True, valid_len=jnp.asarray(t_exact))
    np.testing.assert_allclose(np.asarray(masked)[:, :t_exact],
                               np.asarray(exact), rtol=5e-5, atol=5e-5)


@pytest.mark.slow
def test_precomputed_rel_biases_match_inline(model):
    import jax

    from tortoise_tpu.models.diffusion_decoder import compute_rel_biases

    m, variables = model
    rng = np.random.default_rng(3)
    t = 32
    x = jnp.asarray(rng.standard_normal((1, t, 100)), jnp.float32)
    pre = jnp.asarray(rng.standard_normal((1, t, CH)), jnp.float32)
    ts = jnp.asarray([100])
    base = m.apply(variables, x, ts, precomputed_aligned_embeddings=pre)
    biases = compute_rel_biases(variables["params"], m.config, t, dtype=jnp.float32)
    hoisted = m.apply(variables, x, ts, precomputed_aligned_embeddings=pre,
                      rel_biases=biases)
    np.testing.assert_allclose(np.asarray(hoisted), np.asarray(base),
                               rtol=1e-5, atol=1e-5)


@pytest.mark.slow
def test_timestep_independent_bucketed_vector_lengths(model):
    """Per-row (B,) lengths (the k-winner fan-out) must match per-row scalar
    runs exactly — rows are independent through the masked latent stack."""
    m, variables = model
    rng = np.random.default_rng(4)
    s_bucket = 16
    out_bucket = 16 * 4 * 24000 // 22050
    ns = np.array([5, 9, 16])
    out_lens = ns * 4 * 24000 // 22050
    lats = rng.standard_normal((3, s_bucket, CH)).astype(np.float32)
    cond = rng.standard_normal((1, 2 * CH)).astype(np.float32)

    batched = np.asarray(m.apply(
        variables, jnp.asarray(lats), jnp.asarray(ns), jnp.asarray(cond),
        jnp.asarray(out_lens), out_bucket,
        method=DiffusionTts.timestep_independent_bucketed))
    for b in range(3):
        single = np.asarray(m.apply(
            variables, jnp.asarray(lats[b:b + 1]), jnp.asarray(int(ns[b])),
            jnp.asarray(cond), jnp.asarray(int(out_lens[b])), out_bucket,
            method=DiffusionTts.timestep_independent_bucketed))
        np.testing.assert_allclose(batched[b], single[0], rtol=2e-5, atol=2e-5)
        assert np.abs(batched[b, out_lens[b]:]).max() == 0


@pytest.mark.slow
def test_batched_fanout_ddim_rows_match_single(model):
    """The batched k-winner diffusion fan-out (api.tts step 4) must reproduce
    each row's standalone run: DDIM eta=0 is deterministic given the initial
    noise, so batched rows and single-clip runs are directly comparable."""
    from tortoise_tpu.diffusion.sampler import (SamplerConfig,
                                                make_ddim_sample_loop)
    from tortoise_tpu.diffusion.schedule import spaced_schedule

    m, variables = model
    rng = np.random.default_rng(5)
    s_bucket = 8
    out_bucket = 8 * 4 * 24000 // 22050
    ns = np.array([4, 6, 8])
    out_lens = ns * 4 * 24000 // 22050
    lats = rng.standard_normal((3, s_bucket, CH)).astype(np.float32)
    cond = rng.standard_normal((1, 2 * CH)).astype(np.float32)
    noise = rng.standard_normal((3, out_bucket, 100)).astype(np.float32)

    def model_fn(v, x, t, pre_cond, doubled, valid_len=None):
        return m.apply(v, x, t, precomputed_aligned_embeddings=pre_cond,
                       valid_len=valid_len)

    loop = make_ddim_sample_loop(
        model_fn, spaced_schedule("linear", 4000, 2),
        SamplerConfig(cond_free=True, cond_free_k=1.0, eta=0.0))

    def pre_of(la, n, ol):
        pre = m.apply(variables, la, jnp.asarray(n), jnp.asarray(cond),
                      jnp.asarray(ol), out_bucket,
                      method=DiffusionTts.timestep_independent_bucketed)
        uncond = jnp.broadcast_to(
            variables["params"]["unconditioned_embedding"].astype(pre.dtype),
            pre.shape)
        mask = jnp.arange(out_bucket)[None, :, None] < \
            jnp.reshape(jnp.asarray(ol), (-1, 1, 1))
        return jnp.concatenate([pre, uncond * mask.astype(uncond.dtype)], 0)

    batched = np.asarray(loop(
        variables, pre_of(jnp.asarray(lats), ns, out_lens),
        jnp.asarray(noise), jax.random.PRNGKey(0), jnp.asarray(out_lens)))
    for b in range(3):
        single = np.asarray(loop(
            variables, pre_of(jnp.asarray(lats[b:b + 1]), int(ns[b]),
                              int(out_lens[b])),
            jnp.asarray(noise[b:b + 1]), jax.random.PRNGKey(0),
            jnp.asarray(int(out_lens[b]))))
        np.testing.assert_allclose(batched[b, :out_lens[b]],
                                   single[0, :out_lens[b]],
                                   rtol=2e-4, atol=2e-4)
