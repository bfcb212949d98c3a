"""wav2vec2-CTC JAX model: parity vs torch HF oracle + masked bucketing +
e2e redaction through the JAX acoustic model."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from tortoise_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2ForCTC

SMALL = dict(vocab_size=11, hidden_size=32, num_layers=2, num_heads=4,
             intermediate_size=64, conv_dim=(16, 16), conv_kernel=(10, 3),
             conv_stride=(5, 2), num_conv_pos_embeddings=16,
             num_conv_pos_embedding_groups=4)


def _hf_model():
    torch = pytest.importorskip("torch")
    transformers = pytest.importorskip("transformers")
    cfg = transformers.Wav2Vec2Config(
        vocab_size=11, hidden_size=32, num_hidden_layers=2,
        num_attention_heads=4, intermediate_size=64,
        conv_dim=(16, 16), conv_kernel=(10, 3), conv_stride=(5, 2),
        num_feat_extract_layers=2, num_conv_pos_embeddings=16,
        num_conv_pos_embedding_groups=4,
        do_stable_layer_norm=True, feat_extract_norm="layer", conv_bias=True,
        hidden_act="gelu", feat_extract_activation="gelu",
        layerdrop=0.0, hidden_dropout=0.0, attention_dropout=0.0,
        feat_proj_dropout=0.0, final_dropout=0.0, activation_dropout=0.0)
    torch.manual_seed(0)
    return transformers.Wav2Vec2ForCTC(cfg).eval()


def test_wav2vec2_logits_parity_vs_torch():
    torch = pytest.importorskip("torch")
    from tortoise_tpu.convert.torch_import import wav2vec2_params

    hf = _hf_model()
    params = wav2vec2_params(hf.state_dict(), num_layers=2, num_convs=2)
    model = Wav2Vec2ForCTC(Wav2Vec2Config(**SMALL))

    rng = np.random.default_rng(1)
    audio = rng.standard_normal((1, 3200)).astype(np.float32)
    with torch.no_grad():
        want = hf(torch.from_numpy(audio)).logits.numpy()
    got, n_frames = model.apply({"params": params}, jnp.asarray(audio))
    got = np.asarray(got)
    assert got.shape == want.shape and int(n_frames) == want.shape[1]
    np.testing.assert_allclose(got, want, atol=2e-4)


@pytest.mark.slow
def test_wav2vec2_masked_bucketing_exact():
    """A zero-padded run with n_samples masking equals an unpadded run on the
    valid frames (the streaming/bucketed serving contract)."""
    model = Wav2Vec2ForCTC(Wav2Vec2Config(**SMALL))
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 3200)))
    rng = np.random.default_rng(2)
    audio = rng.standard_normal((1, 3000)).astype(np.float32)

    exact, _ = model.apply(variables, jnp.asarray(audio))
    padded = np.zeros((1, 4000), np.float32)
    padded[:, :3000] = audio
    got, n_frames = model.apply(variables, jnp.asarray(padded), n_samples=3000)
    n = int(n_frames)
    assert n == exact.shape[1]
    np.testing.assert_allclose(np.asarray(got)[:, :n], np.asarray(exact),
                               atol=1e-5)


@pytest.mark.slow
def test_redaction_e2e_through_jax_model():
    """End-to-end redact() with the JAX acoustic model supplying real logits:
    align the audio against the transcript the model itself hears (so the
    alignment is guaranteed consistent), redact a bracketed span, and check
    the kept spans survive."""
    from tortoise_tpu.utils.wav2vec_alignment import (TacotronCTCTokenizer,
                                                      Wav2VecAlignment)

    cfg = Wav2Vec2Config(**SMALL)
    model = Wav2Vec2ForCTC(cfg)
    variables = model.init(jax.random.PRNGKey(3), jnp.zeros((1, 4000)))
    tok = TacotronCTCTokenizer(symbols=["_", " "] + list("abcdefghi"))

    def logits_fn(audio_16k):
        a = jnp.asarray(np.asarray(audio_16k, np.float32)[None])
        logits, n = model.apply(variables, a)
        return np.asarray(logits)[0]

    rng = np.random.default_rng(4)
    audio_24k = rng.standard_normal(6000).astype(np.float32)

    aligner = Wav2VecAlignment(logits_fn=logits_fn, tokenizer=tok)
    # transcribe with the model itself so expected_text matches its argmax
    logits = aligner._logits(audio_24k, 24000)
    heard = tok.decode(logits.argmax(-1).tolist()).strip()
    if len(heard) < 6:
        pytest.skip("random model emitted too few symbols to build a script")
    third = len(heard) // 3
    text = f"{heard[:third]}[{heard[third:2 * third]}]{heard[2 * third:]}"

    redacted = aligner.redact(audio_24k, text, 24000)
    assert redacted.ndim == 1
    assert 0 < redacted.shape[0] < audio_24k.shape[0]
    # alignment of the bare text must also succeed end-to-end
    offsets = aligner.align(audio_24k, heard, 24000)
    assert len(offsets) == len(heard)
    assert all(0 <= o <= audio_24k.shape[0] for o in offsets)
    assert offsets == sorted(offsets)
