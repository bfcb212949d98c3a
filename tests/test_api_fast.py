"""End-to-end fast path on random weights (shapes/streaming semantics)."""
import warnings

import numpy as np
import pytest

import jax.numpy as jnp

from tortoise_tpu.api_fast import TextToSpeechFast, _expected_samples, handle_chunks
from tortoise_tpu.models.autoregressive import UnifiedVoiceConfig


@pytest.fixture(scope="module")
def tts():
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        return TextToSpeechFast(
            dtype=jnp.float32,
            ar_config=UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                                         max_text_tokens=60, max_mel_tokens=80),
            latent_bucket=16)


def test_tts_shapes_and_determinism(tts):
    wav = tts.tts("Hello there, this is a test.", use_deterministic_seed=5,
                  max_mel_tokens=48, verbose=False)
    assert wav.ndim == 3 and wav.shape[0] == 1 and wav.shape[1] == 1
    assert wav.shape[2] % 256 == 0 and wav.shape[2] > 0
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0

    wav2 = tts.tts("Hello there, this is a test.", use_deterministic_seed=5,
                   max_mel_tokens=48, verbose=False)
    np.testing.assert_array_equal(wav, wav2)


def test_tts_stream_concatenates_to_full_clip(tts):
    chunks = list(tts.tts_stream("Another streaming test sentence.",
                                 use_deterministic_seed=7, max_mel_tokens=48,
                                 stream_chunk_size=8, verbose=False))
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert np.isfinite(total).all()
    # stream covers (nearly) the full clip: the final overlap tail is retained
    wav = tts.tts("Another streaming test sentence.", use_deterministic_seed=7,
                  max_mel_tokens=48, verbose=False)
    assert abs(total.shape[0] - wav.shape[2]) <= 1024


def test_expected_samples_matches_interp_chain():
    import math

    for n in (1, 7, 40, 500):
        up1 = math.floor(n * 1024 / 256)
        up2 = math.floor(up1 * 24000 / 22050)
        assert _expected_samples(n) == up2 * 256


def test_handle_chunks_crossfade_reference_semantics():
    wav1 = np.ones(4096, np.float32)
    c1, prev, ov = handle_chunks(wav1, None, None, 1024)
    assert len(c1) == 4096 - 1024 and ov is not None and len(ov) == 1024
    wav2 = np.ones(8192, np.float32) * 2
    c2, prev, ov = handle_chunks(wav2, prev, ov, 1024)
    # first 1024 samples crossfade 1 -> 2
    assert c2[0] == pytest.approx(1.0, abs=1e-2)
    assert c2[1023] == pytest.approx(2.0, abs=1e-2)


def test_tts_batch_serving(tts):
    import jax

    from tortoise_tpu.parallel.mesh import batch_sharding, make_mesh

    texts = [f"Utterance number {i} for batched serving." for i in range(8)]
    wavs = tts.tts_batch(texts, use_deterministic_seed=4, max_mel_tokens=32,
                         text_bucket=16, verbose=False)
    assert len(wavs) == 8
    for w in wavs:
        assert w.ndim == 3 and np.isfinite(w).all()

    if len(jax.devices()) >= 8:
        mesh = make_mesh(dp=8, tp=1)
        with mesh:
            wavs_sharded = tts.tts_batch(texts, use_deterministic_seed=4,
                                         max_mel_tokens=32, text_bucket=16,
                                         verbose=False,
                                         batch_sharding=batch_sharding(mesh))
        for a, b in zip(wavs, wavs_sharded):
            np.testing.assert_array_equal(a, b)


def test_stream_emits_tail_on_segment_boundary(tts):
    """Regression: a stop token landing exactly on a segment boundary must
    still produce audio (previously the generator could yield nothing)."""
    # force tiny chunks so boundaries are frequent; short max keeps it fast
    for seed in range(3):
        chunks = list(tts.tts_stream("Tiny.", use_deterministic_seed=seed,
                                     max_mel_tokens=16, stream_chunk_size=8,
                                     verbose=False))
        assert len(chunks) >= 1
        assert sum(len(c) for c in chunks) > 0


def test_fused_finish_matches_staged_path(tts):
    """tts() fuses relatent+trim+edge-pad+decode on device; its output must
    equal the staged host-side path on the valid region."""
    import jax
    from tortoise_tpu.models.ar_sampler import SamplerSettings, sample_speech

    text = "Fused finish equality check."
    seed, text_tokens, cond = tts._prepare(text, None, None, 77)
    settings = SamplerSettings(max_generate=24)
    codes, _ = sample_speech(tts.autoregressive, tts.ar_vars,
                             jnp.asarray(cond), jnp.asarray(text_tokens),
                             jax.random.PRNGKey(seed), 1, settings=settings)
    # staged
    latents = tts._relatent(jnp.asarray(cond), jnp.asarray(text_tokens), codes)
    n = tts._trim_codes(np.asarray(codes)[0])
    staged = tts._decode_bucketed(np.asarray(latents)[:, :n].astype(np.float32),
                                  n, cond)
    # fused
    wav_d, n_d, out_d = tts._finish_wav(jnp.asarray(cond),
                                        jnp.asarray(text_tokens), codes)
    assert int(n_d) == n and int(out_d) == _expected_samples(n)
    fused = np.asarray(wav_d)[:, :int(out_d), 0][:, None, :]
    np.testing.assert_array_equal(fused, staged)


def test_bucketed_hifi_decode_matches_exact(tts):
    """The masked+edge-padded bucketed decode equals an unpadded decode."""
    rng = np.random.default_rng(5)
    n = 21  # deliberately not a bucket multiple (bucket=16)
    lat = rng.standard_normal((1, n, 128)).astype(np.float32)
    cond = rng.standard_normal((1, 128)).astype(np.float32)
    bucketed = tts._decode_bucketed(lat, n, cond)
    exact = np.asarray(tts._decode_wav(jnp.asarray(lat), jnp.asarray(cond),
                                       jnp.asarray(_expected_samples(n) // 256)))
    exact = exact[:, :_expected_samples(n), 0][:, None, :]
    np.testing.assert_allclose(bucketed, exact, rtol=2e-4, atol=2e-4)
