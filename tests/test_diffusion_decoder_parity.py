"""DiffusionTts parity vs the torch reference (random weights, small config)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ref_loader import has_reference, load_ref_module

from tortoise_tpu.convert.torch_import import diffusion_tts_params
from tortoise_tpu.models.diffusion_decoder import (DiffusionTts, DiffusionTtsConfig,
                                                   timestep_embedding)

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")

CH, LAYERS, HEADS = 128, 2, 4


@pytest.fixture(scope="module")
def models():
    import torch

    ref_mod = load_ref_module("tortoise.models.diffusion_decoder")
    torch.manual_seed(0)
    ref = ref_mod.DiffusionTts(model_channels=CH, num_layers=LAYERS, in_channels=100,
                               out_channels=200, in_latent_channels=CH, in_tokens=8193,
                               dropout=0, use_fp16=False, num_heads=HEADS,
                               layer_drop=0, unconditioned_percentage=0).eval()
    cfg = DiffusionTtsConfig(model_channels=CH, num_layers=LAYERS,
                             in_latent_channels=CH, num_heads=HEADS)
    ours = DiffusionTts(cfg)
    params = diffusion_tts_params(ref.state_dict(), num_layers=LAYERS)
    return ref, ours, {"params": params}


def test_timestep_embedding_matches():
    import torch

    ref_mod = load_ref_module("tortoise.models.diffusion_decoder")
    t = np.array([0, 17, 600, 3999])
    theirs = ref_mod.timestep_embedding(torch.from_numpy(t), 128).numpy()
    got = np.asarray(timestep_embedding(jnp.asarray(t), 128))
    # f32 ULP differences in the frequency table turn into small phase errors
    # at large t; 1e-2 absolute is well below what the model notices.
    np.testing.assert_allclose(got, theirs, rtol=1e-3, atol=1e-2)


def test_get_conditioning_parity(models):
    import torch

    ref, ours, variables = models
    rng = np.random.default_rng(0)
    mels = rng.standard_normal((2, 2, 100, 64)).astype(np.float32)
    with torch.no_grad():
        theirs = ref.get_conditioning(torch.from_numpy(mels)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(mels.transpose(0, 1, 3, 2)),
                                method=DiffusionTts.get_conditioning))
    np.testing.assert_allclose(got, theirs, rtol=2e-3, atol=2e-3)


def test_forward_code_path_parity(models):
    import torch

    ref, ours, variables = models
    rng = np.random.default_rng(1)
    b, t_out = 2, 48
    x = rng.standard_normal((b, 100, t_out)).astype(np.float32)
    codes = rng.integers(0, 8192, (b, 12)).astype(np.int64)
    cond = rng.standard_normal((b, 2 * CH)).astype(np.float32)
    ts = np.array([600, 17])
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x), torch.from_numpy(ts),
                     aligned_conditioning=torch.from_numpy(codes),
                     conditioning_latent=torch.from_numpy(cond)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                jnp.asarray(ts),
                                aligned_conditioning=jnp.asarray(codes),
                                conditioning_latent=jnp.asarray(cond)))
    np.testing.assert_allclose(got.transpose(0, 2, 1), theirs, rtol=3e-3, atol=3e-3)


@pytest.mark.slow
def test_forward_latent_and_precomputed_and_free(models):
    import torch

    ref, ours, variables = models
    rng = np.random.default_rng(2)
    b, t_out = 1, 40
    x = rng.standard_normal((b, 100, t_out)).astype(np.float32)
    latents = rng.standard_normal((b, 9, CH)).astype(np.float32)
    cond = rng.standard_normal((b, 2 * CH)).astype(np.float32)
    ts = np.array([123])

    with torch.no_grad():
        pre_ref = ref.timestep_independent(torch.from_numpy(latents),
                                           torch.from_numpy(cond), t_out, False)
        out_ref = ref(torch.from_numpy(x), torch.from_numpy(ts),
                      precomputed_aligned_embeddings=pre_ref).numpy()
        free_ref = ref(torch.from_numpy(x), torch.from_numpy(ts),
                       aligned_conditioning=torch.from_numpy(latents),
                       conditioning_latent=torch.from_numpy(cond),
                       conditioning_free=True).numpy()

    pre = ours.apply(variables, jnp.asarray(latents), jnp.asarray(cond), t_out,
                     method=DiffusionTts.timestep_independent)
    np.testing.assert_allclose(np.asarray(pre).transpose(0, 2, 1), pre_ref.numpy(),
                               rtol=2e-3, atol=2e-3)
    got = np.asarray(ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                jnp.asarray(ts), precomputed_aligned_embeddings=pre))
    np.testing.assert_allclose(got.transpose(0, 2, 1), out_ref, rtol=3e-3, atol=3e-3)
    free = np.asarray(ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                 jnp.asarray(ts), conditioning_free=True))
    np.testing.assert_allclose(free.transpose(0, 2, 1), free_ref, rtol=3e-3, atol=3e-3)
