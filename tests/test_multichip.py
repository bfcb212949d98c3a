"""Multi-chip sharding tests on the 8-device virtual CPU mesh: candidate
sharding for inference and the dp x tp training step."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.models.ar_sampler import SamplerSettings, sample_speech
from tortoise_tpu.models.autoregressive import (UnifiedVoice, UnifiedVoiceConfig,
                                                init_unified_voice)
from tortoise_tpu.parallel.mesh import batch_sharding, make_mesh

pytestmark = pytest.mark.skipif(len(jax.devices()) < 8,
                                reason="needs 8 (virtual) devices")


@pytest.fixture(scope="module")
def small_model():
    cfg = UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                             max_text_tokens=30, max_mel_tokens=48)
    model = UnifiedVoice(cfg)
    variables = init_unified_voice(model, jax.random.PRNGKey(0))
    return model, variables


def test_candidate_sharded_decode_matches_single_device(small_model):
    model, variables = small_model
    rng = np.random.default_rng(0)
    cond = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
    text = jnp.asarray(np.pad(rng.integers(3, 250, (1, 9)), ((0, 0), (0, 1))),
                       jnp.int32)
    settings = SamplerSettings(do_sample=True, max_generate=16)

    base, _ = sample_speech(model, variables, cond, text, jax.random.PRNGKey(7),
                            num_samples=8, settings=settings,
                            cache_dtype=jnp.float32)
    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        sharded, _ = sample_speech(model, variables, cond, text,
                                   jax.random.PRNGKey(7), num_samples=8,
                                   settings=settings, cache_dtype=jnp.float32,
                                   batch_sharding=batch_sharding(mesh))
    np.testing.assert_array_equal(np.asarray(base), np.asarray(sharded))


@pytest.mark.slow
def test_train_step_multichip():
    from __graft_entry__ import dryrun_multichip

    dryrun_multichip(8)


@pytest.mark.slow
def test_quality_api_with_mesh():
    import warnings

    from tortoise_tpu.api import TextToSpeech
    from tortoise_tpu.models.autoregressive import UnifiedVoiceConfig
    from tortoise_tpu.models.clvp import CLVPConfig
    from tortoise_tpu.models.diffusion_decoder import DiffusionTtsConfig
    from tortoise_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=8, tp=1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = TextToSpeech(
            autoregressive_batch_size=8, half=False, mesh=mesh,
            ar_config=UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                                         max_text_tokens=60, max_mel_tokens=80),
            diffusion_config=DiffusionTtsConfig(model_channels=128, num_layers=2,
                                                in_latent_channels=128, num_heads=4),
            clvp_config=CLVPConfig(dim_text=128, dim_speech=128, dim_latent=128,
                                   text_enc_depth=2, text_heads=4,
                                   speech_enc_depth=2, speech_heads=4))
    with mesh:
        wav = tts.tts("Sharded candidates.", num_autoregressive_samples=8,
                      diffusion_iterations=2, cond_free=False, max_mel_tokens=24,
                      use_deterministic_seed=1, verbose=False)
    assert np.isfinite(wav).all()


def test_tp_sharded_decode_matches_single_device(small_model):
    """Inference under tensor parallelism: Megatron-sharded weights +
    heads-sharded KV cache on a dp=4 x tp=2 mesh reproduce the unsharded
    decode (VERDICT r1 missing #4)."""
    from tortoise_tpu.parallel.sharding import kv_cache_sharding, shard_params

    model, variables = small_model
    rng = np.random.default_rng(1)
    cond = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
    text = jnp.asarray(np.pad(rng.integers(3, 250, (1, 9)), ((0, 0), (0, 1))),
                       jnp.int32)
    settings = SamplerSettings(do_sample=True, max_generate=16)

    base_codes, base_lats = sample_speech(
        model, variables, cond, text, jax.random.PRNGKey(5),
        num_samples=4, settings=settings, cache_dtype=jnp.float32)

    mesh = make_mesh(dp=4, tp=2)
    sharded_vars = {"params": shard_params(variables["params"], mesh)}
    with mesh:
        tp_codes, tp_lats = sample_speech(
            model, sharded_vars, cond, text, jax.random.PRNGKey(5),
            num_samples=4, settings=settings, cache_dtype=jnp.float32,
            batch_sharding=batch_sharding(mesh),
            cache_sharding=kv_cache_sharding(mesh))
    # token streams must agree exactly; latents only up to partial-sum
    # reordering (tp splits the c_proj/mlp_proj reductions across chips)
    np.testing.assert_array_equal(np.asarray(base_codes), np.asarray(tp_codes))
    np.testing.assert_allclose(np.asarray(base_lats), np.asarray(tp_lats),
                               atol=1e-4, rtol=1e-4)


@pytest.mark.slow
def test_quality_api_with_tp_mesh():
    import warnings

    from tortoise_tpu.api import TextToSpeech
    from tortoise_tpu.models.autoregressive import UnifiedVoiceConfig
    from tortoise_tpu.models.clvp import CLVPConfig
    from tortoise_tpu.models.diffusion_decoder import DiffusionTtsConfig
    from tortoise_tpu.parallel.mesh import make_mesh

    mesh = make_mesh(dp=4, tp=2)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        tts = TextToSpeech(
            autoregressive_batch_size=4, half=False, mesh=mesh,
            ar_config=UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                                         max_text_tokens=60, max_mel_tokens=80),
            diffusion_config=DiffusionTtsConfig(model_channels=128, num_layers=2,
                                                in_latent_channels=128, num_heads=4),
            clvp_config=CLVPConfig(dim_text=128, dim_speech=128, dim_latent=128,
                                   text_enc_depth=2, text_heads=4,
                                   speech_enc_depth=2, speech_heads=4))
    with mesh:
        wav = tts.tts("Tensor parallel decode.", num_autoregressive_samples=4,
                      diffusion_iterations=2, cond_free=False, max_mel_tokens=24,
                      use_deterministic_seed=2, verbose=False)
    assert np.isfinite(wav).all()


def test_clvp_scoring_sharded_matches():
    """SURVEY §2.5: CLVP scoring as one dp-sharded matmul — the candidate
    batch shards, the text latent replicates, scores match unsharded."""
    from tortoise_tpu.models.clvp import CLVP, CLVPConfig

    clvp = CLVP(CLVPConfig(dim_text=64, dim_speech=64, dim_latent=64,
                           text_enc_depth=2, text_heads=4,
                           speech_enc_depth=2, speech_heads=4))
    rng = np.random.default_rng(2)
    text = jnp.asarray(rng.integers(0, 256, (1, 11)), jnp.int32)
    cands = jnp.asarray(rng.integers(0, 8192, (16, 17)), jnp.int32)
    variables = clvp.init(jax.random.PRNGKey(3), text, cands[:1])
    score = jax.jit(lambda v, t, c: clvp.apply(
        v, t, c, method=CLVP.score_candidates))
    base = np.asarray(score(variables, text, cands))
    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        sharded = np.asarray(score(
            variables, text, jax.device_put(cands, batch_sharding(mesh))))
    np.testing.assert_allclose(sharded, base, rtol=1e-5, atol=1e-5)


def test_diffusion_fanout_step_sharded_matches():
    """One batched masked diffusion step over k winners with per-row valid
    lengths, candidate batch sharded over dp, matches unsharded."""
    from tortoise_tpu.models.diffusion_decoder import (DiffusionTts,
                                                       DiffusionTtsConfig,
                                                       init_diffusion_tts)

    dcfg = DiffusionTtsConfig(model_channels=64, num_layers=2,
                              in_latent_channels=64, num_heads=4)
    m = DiffusionTts(dcfg)
    variables = init_diffusion_tts(m, jax.random.PRNGKey(4))
    rng = np.random.default_rng(3)
    k, s_bucket = 8, 8
    out_bucket = 8 * 4 * 24000 // 22050
    ns = jnp.asarray(rng.integers(4, s_bucket + 1, (k,)), jnp.int32)
    out_lens = ns * 4 * 24000 // 22050
    lats = jnp.asarray(rng.standard_normal((k, s_bucket, 64)), jnp.float32)
    cond = jnp.asarray(rng.standard_normal((1, 128)), jnp.float32)
    x = jnp.asarray(rng.standard_normal((k, out_bucket, 100)), jnp.float32)
    ts = jnp.asarray(np.full((k,), 600), jnp.int32)

    @jax.jit
    def step(v, la, xx):
        pre = m.apply(v, la, ns, cond, out_lens, out_bucket,
                      method=DiffusionTts.timestep_independent_bucketed)
        return m.apply(v, xx, ts, precomputed_aligned_embeddings=pre,
                       valid_len=out_lens)

    base = np.asarray(step(variables, lats, x))
    mesh = make_mesh(dp=8, tp=1)
    with mesh:
        sharded = np.asarray(step(
            variables, jax.device_put(lats, batch_sharding(mesh)),
            jax.device_put(x, batch_sharding(mesh))))
    np.testing.assert_allclose(sharded, base, rtol=5e-4, atol=5e-4)
