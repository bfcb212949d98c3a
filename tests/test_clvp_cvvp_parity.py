"""CLVP / CVVP re-ranker parity vs the torch reference (random weights)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ref_loader import has_reference, load_ref_module

from tortoise_tpu.convert.torch_import import clvp_params, cvvp_params
from tortoise_tpu.models.clvp import CLVP, CLVPConfig
from tortoise_tpu.models.cvvp import CVVP, CVVPConfig

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")


@pytest.fixture(scope="module")
def clvp_models():
    import torch

    ref_mod = load_ref_module("tortoise.models.clvp")
    torch.manual_seed(0)
    ref = ref_mod.CLVP(dim_text=128, dim_speech=128, dim_latent=128,
                       num_text_tokens=256, text_enc_depth=3, text_heads=4,
                       num_speech_tokens=8192, speech_enc_depth=3, speech_heads=4,
                       use_xformers=True).eval()
    cfg = CLVPConfig(dim_text=128, dim_speech=128, dim_latent=128,
                     text_enc_depth=3, text_heads=4, speech_enc_depth=3,
                     speech_heads=4)
    ours = CLVP(cfg)
    return ref, ours, {"params": clvp_params(ref.state_dict())}


def test_clvp_similarity_parity(clvp_models):
    import torch

    ref, ours, variables = clvp_models
    rng = np.random.default_rng(0)
    text = rng.integers(0, 256, (3, 14)).astype(np.int64)
    speech = rng.integers(0, 8192, (3, 28)).astype(np.int64)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(text), torch.from_numpy(speech),
                     return_loss=False).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(text), jnp.asarray(speech)))
    np.testing.assert_allclose(got, theirs, rtol=1e-3, atol=1e-3)


def test_clvp_loss_parity(clvp_models):
    import torch

    ref, ours, variables = clvp_models
    rng = np.random.default_rng(1)
    text = rng.integers(0, 256, (4, 10)).astype(np.int64)
    speech = rng.integers(0, 8192, (4, 20)).astype(np.int64)
    with torch.no_grad():
        theirs = float(ref(torch.from_numpy(text), torch.from_numpy(speech),
                           return_loss=True))
    got = float(ours.apply(variables, jnp.asarray(text), jnp.asarray(speech),
                           return_loss=True))
    assert got == pytest.approx(theirs, rel=1e-3, abs=1e-4)


@pytest.mark.slow
def test_clvp_score_candidates_equals_repeat(clvp_models):
    _, ours, variables = clvp_models
    rng = np.random.default_rng(2)
    text = rng.integers(0, 256, (1, 12)).astype(np.int64)
    cands = rng.integers(0, 8192, (5, 18)).astype(np.int64)
    a = np.asarray(ours.apply(variables, jnp.asarray(np.repeat(text, 5, 0)),
                              jnp.asarray(cands)))
    b = np.asarray(ours.apply(variables, jnp.asarray(text), jnp.asarray(cands),
                              method=CLVP.score_candidates))
    np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-5)


@pytest.fixture(scope="module")
def cvvp_models():
    import torch

    ref_mod = load_ref_module("tortoise.models.cvvp")
    torch.manual_seed(0)
    ref = ref_mod.CVVP(model_dim=128, transformer_heads=4, dropout=0,
                       conditioning_enc_depth=2, cond_mask_percentage=0,
                       mel_codes=8192, speech_enc_depth=2,
                       speech_mask_percentage=0, latent_multiplier=1).eval()
    cfg = CVVPConfig(model_dim=128, transformer_heads=4, conditioning_enc_depth=2,
                     speech_enc_depth=2, mel_codes=8192)
    ours = CVVP(cfg)
    return ref, ours, {"params": cvvp_params(ref.state_dict(), cond_depth=2,
                                             speech_depth=2)}


def test_cvvp_similarity_parity(cvvp_models):
    import torch

    ref, ours, variables = cvvp_models
    rng = np.random.default_rng(3)
    mel_cond = rng.standard_normal((2, 80, 96)).astype(np.float32)
    codes = rng.integers(0, 8192, (2, 24)).astype(np.int64)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(mel_cond), torch.from_numpy(codes),
                     return_loss=False).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(mel_cond.transpose(0, 2, 1)),
                                jnp.asarray(codes)))
    np.testing.assert_allclose(got, theirs, rtol=1e-3, atol=1e-3)


@pytest.fixture(scope="module")
def clvp_fallback_models():
    """The non-xformers CLVP fallback (reference clvp.py:84-97): plain
    Transformer stacks (reference transformer.py:182-219) + learned
    absolute position tables."""
    import torch

    ref_mod = load_ref_module("tortoise.models.clvp")
    torch.manual_seed(0)
    ref = ref_mod.CLVP(dim_text=128, dim_speech=128, dim_latent=128,
                       num_text_tokens=256, text_enc_depth=3, text_heads=4,
                       text_seq_len=40, num_speech_tokens=512,
                       speech_enc_depth=3, speech_heads=4, speech_seq_len=60,
                       use_xformers=False).eval()
    cfg = CLVPConfig(dim_text=128, dim_speech=128, dim_latent=128,
                     text_enc_depth=3, text_heads=4, num_speech_tokens=512,
                     speech_enc_depth=3, speech_heads=4,
                     use_xformers=False, text_seq_len=40)
    ours = CLVP(cfg)
    return ref, ours, {"params": clvp_params(ref.state_dict())}


def test_clvp_fallback_similarity_parity(clvp_fallback_models):
    import torch

    ref, ours, variables = clvp_fallback_models
    rng = np.random.default_rng(4)
    text = rng.integers(0, 256, (3, 14)).astype(np.int64)
    speech = rng.integers(0, 512, (3, 28)).astype(np.int64)
    with torch.no_grad():
        theirs = ref(torch.from_numpy(text), torch.from_numpy(speech),
                     return_loss=False).numpy()
    got = np.asarray(ours.apply(variables, jnp.asarray(text), jnp.asarray(speech)))
    np.testing.assert_allclose(got, theirs, rtol=1e-3, atol=1e-3)


def test_clvp_fallback_loss_parity(clvp_fallback_models):
    import torch

    ref, ours, variables = clvp_fallback_models
    rng = np.random.default_rng(5)
    text = rng.integers(0, 256, (4, 10)).astype(np.int64)
    speech = rng.integers(0, 512, (4, 20)).astype(np.int64)
    with torch.no_grad():
        theirs = float(ref(torch.from_numpy(text), torch.from_numpy(speech),
                           return_loss=True))
    got = float(ours.apply(variables, jnp.asarray(text), jnp.asarray(speech),
                           return_loss=True))
    assert got == pytest.approx(theirs, rel=1e-3, abs=1e-4)


def test_layerscale_init_tiers():
    """CaiT init epsilon switches at depth 18 and 24 (reference
    transformer.py:81-87); verify a deep init picks the right tier."""
    import jax

    from tortoise_tpu.models.simple_transformer import (SimpleTransformer,
                                                        layerscale_init)

    assert layerscale_init(18) == 0.1
    assert layerscale_init(19) == 1e-5
    assert layerscale_init(24) == 1e-5
    assert layerscale_init(25) == 1e-6
    m = SimpleTransformer(dim=16, depth=26, heads=2, dim_head=8)
    p = m.init(jax.random.PRNGKey(0), jnp.zeros((1, 4, 16)))["params"]
    assert float(p["block_0"]["attn_scale"][0]) == pytest.approx(0.1)
    assert float(p["block_18"]["ff_scale"][0]) == pytest.approx(1e-5)
    assert float(p["block_25"]["attn_scale"][0]) == pytest.approx(1e-6)
