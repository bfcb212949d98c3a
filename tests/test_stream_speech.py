"""stream_speech must reproduce sample_speech token-for-token (same PRNG
path) and stop early at the stop token."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.models.ar_sampler import (SamplerSettings, sample_speech,
                                            stream_speech)
from tortoise_tpu.models.autoregressive import (UnifiedVoice, UnifiedVoiceConfig,
                                                init_unified_voice)


@pytest.fixture(scope="module")
def model():
    cfg = UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                             max_text_tokens=30, max_mel_tokens=64)
    m = UnifiedVoice(cfg)
    return m, init_unified_voice(m, jax.random.PRNGKey(0))


@pytest.mark.slow
def test_stream_matches_batch(model):
    m, variables = model
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
    text = jnp.asarray(np.pad(rng.integers(3, 250, (1, 9)), ((0, 0), (0, 1))),
                       jnp.int32)
    settings = SamplerSettings(max_generate=32)
    codes, lats = sample_speech(m, variables, cond, text, jax.random.PRNGKey(5),
                                num_samples=1, settings=settings,
                                cache_dtype=jnp.float32)
    codes = np.asarray(codes)[0]

    last = None
    for stream_codes, stream_lats in stream_speech(
            m, variables, cond, text, jax.random.PRNGKey(5), settings=settings,
            seg_len=7, cache_dtype=jnp.float32):
        last = (stream_codes, stream_lats)
    s_codes, s_lats = last
    n = s_codes.shape[1]
    np.testing.assert_array_equal(s_codes[0], codes[:n])
    # if the batch run found a stop token, the stream stops at/after it
    stops = np.where(codes == 8193)[0]
    if len(stops):
        assert n >= stops[0] + 1
        assert (s_codes[0][stops[0]:] == 8193).all() or n <= stops[0] + 7
    np.testing.assert_allclose(np.asarray(s_lats[0]),
                               np.asarray(lats)[0, :n], rtol=1e-5, atol=1e-5)
