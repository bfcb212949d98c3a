"""HiFi-GAN decoder parity vs the torch reference (random weights)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ref_loader import has_reference, load_ref_module

from tortoise_tpu.convert.torch_import import hifigan_params
from tortoise_tpu.models.hifigan import HifiganConfig, HifiganGenerator
from tortoise_tpu.ops.interpolate import linear_interpolate, nearest_interpolate

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")


def test_linear_interpolate_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(0).standard_normal((2, 16, 8)).astype(np.float32)
    for scale in (4.0, 24000 / 22050):
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 2, 1)),
                            scale_factor=[scale], mode="linear").numpy()
        got = np.asarray(linear_interpolate(jnp.asarray(x), scale)).transpose(0, 2, 1)
        np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)


def test_nearest_interpolate_matches_torch():
    import torch
    import torch.nn.functional as F

    x = np.random.default_rng(1).standard_normal((2, 13, 4)).astype(np.float32)
    for out_len in (7, 29, 52):
        ref = F.interpolate(torch.from_numpy(x.transpose(0, 2, 1)),
                            size=out_len, mode="nearest").numpy()
        got = np.asarray(nearest_interpolate(jnp.asarray(x), out_len)).transpose(0, 2, 1)
        np.testing.assert_allclose(got, ref, rtol=1e-6, atol=1e-6)


@pytest.fixture(scope="module")
def models():
    import torch

    ref_mod = load_ref_module("tortoise.models.hifigan_decoder")
    torch.manual_seed(0)
    # Small config, same topology family as shipping (api_fast.py:222-225).
    ref = ref_mod.HifiganGenerator(
        in_channels=32, out_channels=1, resblock_type="1",
        resblock_dilation_sizes=[[1, 3, 5], [1, 3, 5], [1, 3, 5]],
        resblock_kernel_sizes=[3, 7, 11], upsample_kernel_sizes=[16, 16, 4, 4],
        upsample_initial_channel=64, upsample_factors=[8, 8, 2, 2],
        cond_channels=32).eval()
    cfg = HifiganConfig(in_channels=32, upsample_initial_channel=64, cond_channels=32)
    ours = HifiganGenerator(cfg)
    params = hifigan_params(ref.state_dict())
    return ref, ours, {"params": params}


def test_forward_parity(models):
    import torch

    ref, ours, variables = models
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 32, 20)).astype(np.float32)  # (B, C, T)
    g = rng.standard_normal((2, 32, 1)).astype(np.float32)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(x), g=torch.from_numpy(g)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(x.transpose(0, 2, 1)),
                                jnp.asarray(g[:, :, 0])))
    assert got.shape == (2, 20 * 256, 1)
    np.testing.assert_allclose(got.transpose(0, 2, 1), theirs, rtol=5e-4, atol=5e-4)


def test_inference_parity(models):
    import torch

    ref, ours, variables = models
    rng = np.random.default_rng(3)
    c = rng.standard_normal((1, 9, 32)).astype(np.float32)   # (B, T, C) latents
    g = rng.standard_normal((1, 32)).astype(np.float32)
    ref.device = torch.device("cpu")
    with torch.no_grad():
        theirs = ref.inference(torch.from_numpy(c), g=torch.from_numpy(g)).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(c), jnp.asarray(g),
                                method=HifiganGenerator.inference))
    np.testing.assert_allclose(got.transpose(0, 2, 1), theirs, rtol=5e-4, atol=5e-4)
