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


def test_gpt_fused_step_default_resolution(tts):
    """The fused decode kernel defaults ON only where measured to win
    (TPU, docs/ROOFLINE.md); on the CPU suite it must resolve OFF
    (interpret mode), while an explicit True is honored — since round 4
    also with int8 weights (the kernel streams the QuantDense int8 stack)."""
    assert tts.gpt_fused_step is False  # cpu + f32 fixture
    cfg = UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                             max_text_tokens=60, max_mel_tokens=80)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        on = TextToSpeechFast(dtype=jnp.float32, ar_config=cfg,
                              latent_bucket=16, gpt_fused_step=True)
        on8 = TextToSpeechFast(dtype=jnp.float32, ar_config=cfg,
                               latent_bucket=16, gpt_fused_step=True,
                               gpt_weights="int8")
    assert on.gpt_fused_step is True
    assert on8.gpt_fused_step is True
    assert on8._ar_stacked is not None
    assert on8._ar_stacked["wqkv"].dtype == jnp.int8


def test_tts_shapes_and_determinism(tts):
    wav = tts.tts("Hello there, this is a test.", use_deterministic_seed=5,
                  max_mel_tokens=48, verbose=False)
    assert wav.ndim == 3 and wav.shape[0] == 1 and wav.shape[1] == 1
    assert wav.shape[2] % 256 == 0 and wav.shape[2] > 0
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0

    wav2 = tts.tts("Hello there, this is a test.", use_deterministic_seed=5,
                   max_mel_tokens=48, verbose=False)
    np.testing.assert_array_equal(wav, wav2)


@pytest.mark.slow
def test_tts_stream_concatenates_to_full_clip(tts):
    """Streamed chunks are exact adjacent slices of the full decode of the
    same latents: concatenating them reproduces the whole clip (content, not
    just length)."""
    import jax

    from tortoise_tpu.models.ar_sampler import SamplerSettings, stream_speech

    text = "Another streaming test sentence."
    chunks = list(tts.tts_stream(text, use_deterministic_seed=7,
                                 max_mel_tokens=48, stream_chunk_size=8,
                                 verbose=False))
    assert len(chunks) > 1
    total = np.concatenate(chunks)
    assert np.isfinite(total).all()

    # reproduce the stream's latents (deterministic PRNG) and full-decode them
    seed, text_tokens, cond = tts._prepare(text, None, None, 7)
    assert seed == 7
    settings = SamplerSettings(max_generate=48)
    codes = latents = None
    for codes, latents in stream_speech(tts.autoregressive, tts.ar_vars,
                                        jnp.asarray(cond), jnp.asarray(text_tokens),
                                        jax.random.PRNGKey(seed), settings=settings,
                                        seg_len=8, first_seg_len=8):
        pass
    n = tts._trim_codes(codes[0])
    full = tts._decode_bucketed(latents[:, :n].astype(np.float32), n, cond)[0, 0]
    assert total.shape[0] == full.shape[0]
    np.testing.assert_allclose(total, full, atol=2e-5)


@pytest.mark.slow
def test_tts_stream_fixed_compiled_shapes(tts):
    """Per-chunk decode cost is O(chunk): every window decode uses the same
    input shapes regardless of how long the clip has grown."""
    shapes = []
    orig = tts._decode_window

    def spy(lat_win, cond, *rest):
        shapes.append(lat_win.shape)
        return orig(lat_win, cond, *rest)

    tts._decode_window = spy
    try:
        chunks = list(tts.tts_stream("Fixed shape check for streaming.",
                                     use_deterministic_seed=3, max_mel_tokens=64,
                                     stream_chunk_size=8, verbose=False))
    finally:
        tts._decode_window = orig
    assert len(chunks) >= 1 and len(shapes) >= 1
    assert len(set(shapes)) == 1  # one compiled program serves the stream


@pytest.mark.slow
def test_hifi_inference_window_matches_full_decode(tts):
    """inference_window == the same u-frame slice of a full inference() run,
    for interior windows (halo covers the conv receptive field) and for
    start/end windows (edge clamps match)."""
    from tortoise_tpu.api_fast import _HALO_U, _U_LEN, _u_frames

    rng = np.random.default_rng(9)
    n = 90
    lat = rng.standard_normal((1, n, 128)).astype(np.float32)
    cond = rng.standard_normal((1, 128)).astype(np.float32)
    u_total = _u_frames(n)
    full = np.asarray(tts.hifi_decoder.apply(
        tts.hifi_vars, jnp.asarray(lat), jnp.asarray(cond),
        method=tts.hifi_decoder.inference))[0, :, 0]

    for u_start in (0, 37, u_total - _U_LEN):  # start / interior / end
        lat_hi = min(n, (u_start + _U_LEN) * 147 // 640 + 3)
        lat_off = max(0, lat_hi - 64)
        lat_win = np.pad(lat[:, lat_off:lat_off + 64],
                         ((0, 0), (0, max(0, 64 - (n - lat_off))), (0, 0)))
        valid_u = min(_U_LEN, max(0, u_total - u_start))
        wav = np.asarray(tts.hifi_decoder.apply(
            tts.hifi_vars, jnp.asarray(lat_win), jnp.asarray(cond),
            jnp.asarray(lat_off), jnp.asarray(n), jnp.asarray(u_start),
            _U_LEN, jnp.asarray(valid_u),
            method=tts.hifi_decoder.inference_window))[0, :, 0]
        # emitted region: skip the halo on any side that isn't the clip edge
        # (the conv stack lacks context there; the stream never emits it)
        lo_u = 0 if u_start == 0 else _HALO_U
        hi_u = valid_u if u_start + _U_LEN >= u_total else valid_u - _HALO_U
        got = wav[lo_u * 256:hi_u * 256]
        want = full[(u_start + lo_u) * 256:(u_start + hi_u) * 256]
        np.testing.assert_allclose(got, want, atol=1e-6,
                                   err_msg=f"u_start={u_start}")


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


@pytest.mark.slow
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


@pytest.mark.slow
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


@pytest.mark.slow
def test_tts_int8_weights_end_to_end():
    """gpt_weights="int8" (gpt2.QuantDense): the fast path synthesizes a
    finite clip of the same shape contract as full precision."""
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        qtts = TextToSpeechFast(
            dtype=jnp.float32, gpt_weights="int8",
            ar_config=UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                                         max_text_tokens=60, max_mel_tokens=80),
            latent_bucket=16)
    assert qtts.autoregressive.config.quant_weights
    wav = qtts.tts("Quantized weights test.", use_deterministic_seed=3,
                   max_mel_tokens=48, verbose=False)
    assert wav.ndim == 3 and wav.shape[2] % 256 == 0
    assert np.isfinite(wav).all() and np.abs(wav).max() <= 1.0


def test_tts_stream_staged_fallback_branch(tts):
    """first_chunk_size beyond the fused head's latent window (_W_LAT) takes
    the staged prefill+segment path; the stream still emits finite,
    deterministic audio."""
    kwargs = dict(use_deterministic_seed=21, max_mel_tokens=80,
                  first_chunk_size=70, stream_chunk_size=70, verbose=False)
    chunks = list(tts.tts_stream("Large first chunk fallback.", **kwargs))
    assert len(chunks) >= 1
    total = np.concatenate(chunks)
    assert total.size > 0 and np.isfinite(total).all()
    chunks2 = list(tts.tts_stream("Large first chunk fallback.", **kwargs))
    np.testing.assert_array_equal(np.concatenate(chunks2), total)


@pytest.mark.slow
def test_tts_batch_constructor_mesh(tts):
    """TextToSpeechFast(mesh=...) shards tts_batch's utterance batch over dp
    by default (VERDICT r4 task 6) and reproduces the unsharded wavs."""
    import jax

    from tortoise_tpu.parallel.mesh import make_mesh

    if len(jax.devices()) < 8:
        pytest.skip("needs 8 (virtual) devices")
    mesh = make_mesh(dp=8, tp=1)
    with warnings.catch_warnings():
        warnings.simplefilter("ignore")
        mtts = TextToSpeechFast(
            dtype=jnp.float32,
            ar_config=UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                                         max_text_tokens=60, max_mel_tokens=80),
            latent_bucket=16, mesh=mesh)
    texts = [f"Utterance number {i} for batched serving." for i in range(8)]
    base = tts.tts_batch(texts, use_deterministic_seed=4, max_mel_tokens=32,
                         text_bucket=16, verbose=False)
    with mesh:
        sharded = mtts.tts_batch(texts, use_deterministic_seed=4,
                                 max_mel_tokens=32, text_bucket=16,
                                 verbose=False)
    for a, b in zip(base, sharded):
        np.testing.assert_array_equal(a, b)
    # indivisible batch (7 % dp != 0) must silently stay unsharded
    odd = mtts.tts_batch(texts[:7], use_deterministic_seed=4,
                         max_mel_tokens=32, text_bucket=16, verbose=False)
    assert len(odd) == 7


def test_tts_per_call_fused_override(tts):
    """``tts(gpt_fused_step=...)`` overrides the constructor default per
    call (same contract as ``tts_batch``): OFF on a fused-ON instance rides
    the XLA scan, and ON without a prepared stack degrades to OFF instead
    of crashing (``_ar_stacked is None`` on the ctor-OFF fixture)."""
    wav = tts.tts("Override test sentence.", use_deterministic_seed=3,
                  max_mel_tokens=32, gpt_fused_step=True, verbose=False)
    assert np.isfinite(wav).all()
    # ctor-OFF + per-call False == default path, bitwise equal
    wav_off = tts.tts("Override test sentence.", use_deterministic_seed=3,
                      max_mel_tokens=32, gpt_fused_step=False, verbose=False)
    wav_def = tts.tts("Override test sentence.", use_deterministic_seed=3,
                      max_mel_tokens=32, verbose=False)
    np.testing.assert_array_equal(wav_off, wav_def)
