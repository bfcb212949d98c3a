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
