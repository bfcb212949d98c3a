"""Numerical parity: UnifiedVoice (flax) vs the PyTorch reference.

The reference model is instantiated with random weights on CPU, converted via
tortoise_tpu.convert, and both teacher-forced forward and conditioning are
compared. Small config to keep it fast.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ref_loader import has_reference, load_ref_module

from tortoise_tpu.convert.torch_import import unified_voice_params
from tortoise_tpu.models.autoregressive import UnifiedVoice, UnifiedVoiceConfig

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")

LAYERS, DIM, HEADS = 2, 128, 4


@pytest.fixture(scope="module")
def models():
    import torch

    ref_ar = load_ref_module("tortoise.models.autoregressive")
    torch.manual_seed(0)
    ref = ref_ar.UnifiedVoice(
        layers=LAYERS, model_dim=DIM, heads=HEADS, max_text_tokens=30,
        max_mel_tokens=40, max_conditioning_inputs=2, number_text_tokens=255,
        start_text_token=255, checkpointing=False, train_solo_embeddings=False,
    ).eval()
    cfg = UnifiedVoiceConfig(layers=LAYERS, model_dim=DIM, heads=HEADS,
                             max_text_tokens=30, max_mel_tokens=40,
                             max_conditioning_inputs=2)
    ours = UnifiedVoice(cfg)
    params = unified_voice_params(ref.state_dict(), layers=LAYERS)
    return ref, ours, {"params": params}


def test_conditioning_parity(models):
    import torch

    ref, ours, variables = models
    rng = np.random.default_rng(1)
    mels = rng.standard_normal((2, 2, 80, 120)).astype(np.float32)
    with torch.no_grad():
        theirs = ref.get_conditioning(torch.from_numpy(mels)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(mels.transpose(0, 1, 3, 2)),
                                method=UnifiedVoice.get_conditioning))
    np.testing.assert_allclose(got, theirs, rtol=2e-4, atol=2e-4)


def test_forward_losses_and_logits_parity(models):
    import torch

    ref, ours, variables = models
    rng = np.random.default_rng(2)
    b = 2
    text = rng.integers(3, 250, (b, 12)).astype(np.int64)
    mel = rng.integers(0, 8192, (b, 20)).astype(np.int64)
    wav_lengths = np.array([20 * 1024, 15 * 1024], dtype=np.int64)
    cond = rng.standard_normal((b, DIM)).astype(np.float32)

    with torch.no_grad():
        lt, lm, mel_logits = ref(
            torch.from_numpy(cond), torch.from_numpy(text),
            torch.tensor([12, 12]), torch.from_numpy(mel.copy()),
            torch.from_numpy(wav_lengths), clip_inputs=False)
    got_lt, got_lm, got_logits = ours.apply(
        variables, jnp.asarray(cond), jnp.asarray(text), jnp.asarray(mel),
        jnp.asarray(wav_lengths))
    # reference mel_logits are (B, V, T); ours (B, T, V)
    np.testing.assert_allclose(np.asarray(got_logits).transpose(0, 2, 1),
                               mel_logits.numpy(), rtol=2e-3, atol=2e-3)
    np.testing.assert_allclose(float(got_lt), float(lt), rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(float(got_lm), float(lm), rtol=2e-4, atol=2e-4)


def test_return_latent_parity(models):
    import torch

    ref, ours, variables = models
    rng = np.random.default_rng(3)
    b = 2
    text = rng.integers(3, 250, (b, 12)).astype(np.int64)
    mel = rng.integers(0, 8192, (b, 20)).astype(np.int64)
    wav_lengths = np.array([20 * 1024, 20 * 1024], dtype=np.int64)
    cond = rng.standard_normal((b, DIM)).astype(np.float32)

    with torch.no_grad():
        theirs = ref(torch.from_numpy(cond), torch.from_numpy(text),
                     torch.tensor([12, 12]), torch.from_numpy(mel.copy()),
                     torch.from_numpy(wav_lengths), return_latent=True,
                     clip_inputs=False).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(cond), jnp.asarray(text),
                                jnp.asarray(mel), jnp.asarray(wav_lengths),
                                return_latent=True))
    np.testing.assert_allclose(got, theirs, rtol=2e-3, atol=2e-3)
