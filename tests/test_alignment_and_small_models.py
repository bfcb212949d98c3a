"""max_alignment DP parity, redaction with a fake CTC model, and parity for
the small models (classifier, random latent generator)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ref_loader import has_reference, load_ref_module

from tortoise_tpu.utils.wav2vec_alignment import (TacotronCTCTokenizer,
                                                  Wav2VecAlignment, max_alignment)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
@pytest.mark.slow
def test_max_alignment_matches_reference():
    ref = load_ref_module("tortoise.utils.wav2vec_alignment")
    cases = [
        ("hello world", "helo wrld"),
        ("abcdef", "xyz"),
        ("the quick brown fox", "the quik brn fx jumps"),
        ("same", "same"),
        ("", "anything"),
        ("abc", ""),
        ("mississippi", "misisipi"),
    ]
    for s1, s2 in cases:
        assert max_alignment(s1, s2) == ref.max_alignment(s1, s2), (s1, s2)


def test_redact_with_fake_ctc():
    tok = TacotronCTCTokenizer()
    text = "hello [noise] world"
    bare = "hello noise world"
    # Build fake logits whose argmax spells the bare text, one frame per char,
    # with w2v_compression = len(audio) // frames.
    frames = len(bare)
    ids = tok.encode(bare.lower())
    vocab = len(tok.symbols)
    logits = np.full((frames, vocab), -10.0, np.float32)
    for i, t in enumerate(ids):
        logits[i, t] = 10.0

    aligner = Wav2VecAlignment(logits_fn=lambda a: logits)
    audio = np.arange(frames * 100, dtype=np.float32)[None]
    out = aligner.redact(audio, text, audio_sample_rate=24000)
    # redacted audio is shorter and preserves the leading segment
    assert out.shape[-1] < audio.shape[-1]
    np.testing.assert_array_equal(out[0][:100], audio[0][:100])


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_classifier_parity():
    import torch

    from tortoise_tpu.convert.torch_import import classifier_params
    from tortoise_tpu.models.classifier import (AudioMiniEncoderWithClassifierHead,
                                                ClassifierConfig)

    ref_mod = load_ref_module("tortoise.models.classifier")
    torch.manual_seed(0)
    ref = ref_mod.AudioMiniEncoderWithClassifierHead(
        2, spec_dim=1, embedding_dim=64, depth=2, downsample_factor=4,
        resnet_blocks=1, attn_blocks=2, num_attn_heads=4, base_channels=16,
        dropout=0, kernel_size=5, distribute_zero_label=False).eval()
    cfg = ClassifierConfig(embedding_dim=64, depth=2, resnet_blocks=1,
                           attn_blocks=2, base_channels=16)
    ours = AudioMiniEncoderWithClassifierHead(cfg)
    params = classifier_params(ref.state_dict(), depth=2, resnet_blocks=1,
                               attn_blocks=2)
    x = np.random.default_rng(0).standard_normal((2, 1, 256)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x)).numpy()
    got = np.asarray(ours.apply({"params": params},
                                jnp.asarray(x.transpose(0, 2, 1))))
    np.testing.assert_allclose(got, theirs, rtol=2e-3, atol=2e-3)


@pytest.mark.skipif(not has_reference(), reason="reference not mounted")
def test_rlg_parity():
    import torch

    from tortoise_tpu.convert.torch_import import rlg_params
    from tortoise_tpu.models.random_latent import RandomLatentConverter

    ref_mod = load_ref_module("tortoise.models.random_latent_generator")
    torch.manual_seed(0)
    ref = ref_mod.RandomLatentConverter(64).eval()
    ours = RandomLatentConverter(64)
    params = rlg_params(ref.state_dict())
    noise = np.random.default_rng(1).standard_normal((3, 64)).astype(np.float32)

    # drive the reference layers directly with fixed noise (its forward draws
    # its own randn)
    with torch.no_grad():
        theirs = ref.layers(torch.from_numpy(noise)).numpy()
    got = np.asarray(ours.apply({"params": params}, jnp.asarray(noise)))
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=2e-4)


def test_transcribe_and_cer_with_fake_ctc():
    from tortoise_tpu.utils.wav2vec_alignment import character_error_rate

    tok = TacotronCTCTokenizer()
    said = "hello world"
    ids = tok.encode(said)
    vocab = len(tok.symbols)
    # one frame per char plus interleaved blanks (CTC collapse must drop them)
    frames = []
    for t in ids:
        row_blank = np.full(vocab, -10.0, np.float32); row_blank[0] = 10.0
        row = np.full(vocab, -10.0, np.float32); row[t] = 10.0
        frames += [row_blank, row, row]  # repeat collapses too
    logits = np.stack(frames)

    aligner = Wav2VecAlignment(logits_fn=lambda a: logits)
    audio = np.zeros(len(frames) * 320, np.float32)
    assert aligner.transcribe(audio, audio_sample_rate=16000) == said

    assert character_error_rate("hello world", said) == 0.0
    assert character_error_rate("Hello,  WORLD?", "hello, world?") == 0.0
    # one substitution over 11 normalized chars
    assert abs(character_error_rate("hello world", "hallo world") - 1 / 11) < 1e-9
    assert character_error_rate("", "") == 0.0
    assert character_error_rate("abc", "") == 1.0


def test_eval_cer_scoring_with_stub_aligner():
    from tortoise_tpu.apps.eval import evaluate_clips

    class Stub:
        def transcribe(self, wav, audio_sample_rate=24000):
            return "a perfect transcript" if wav.sum() > 0 else "garbage"

    rows = [(0, np.ones(10, np.float32), "A  Perfect transcript"),
            (1, np.zeros(10, np.float32), "something else entirely")]
    out = evaluate_clips(rows, Stub())
    assert out[0][1] == 0.0
    assert out[1][1] > 0.5
