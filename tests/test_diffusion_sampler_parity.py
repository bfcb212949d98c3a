"""Diffusion step-math parity vs the reference SpacedDiffusion.

The stochastic loops can't share RNG streams across frameworks, so parity is
asserted on the deterministic per-step math (p_mean_variance incl. the
learned-range variance interpolation, timestep mapping, x0 clipping, and the
ramped conditioning-free blend) using a closed-form fake model.
"""
import numpy as np
import pytest

import jax.numpy as jnp

from ref_loader import has_reference, load_ref_module

from tortoise_tpu.diffusion import sampler as jsampler
from tortoise_tpu.diffusion.schedule import spaced_schedule

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")

STEPS = 30


def _ref_diffuser(cond_free):
    ref = load_ref_module("tortoise.utils.diffusion")
    return ref.SpacedDiffusion(
        use_timesteps=ref.space_timesteps(4000, [STEPS]), model_mean_type="epsilon",
        model_var_type="learned_range", loss_type="mse",
        betas=ref.get_named_beta_schedule("linear", 4000),
        conditioning_free=cond_free, conditioning_free_k=2.0)


def _fake_model_torch(cond_free_default=False):
    import torch

    def model(x, ts, conditioning_free=cond_free_default, **kw):
        # deterministic pseudo-model: eps and var from x and t
        t = ts.float().reshape(-1, *([1] * (x.ndim - 1)))
        base = 0.05 * x + 0.001 * t
        if conditioning_free:
            base = base * 0.5
        var = torch.tanh(x)
        return torch.cat([base, var], dim=1)

    return model


def _fake_model_jax(variables, x, t_orig, pre_cond, doubled, valid_len=None):
    t = t_orig.astype(jnp.float32).reshape(-1, *([1] * (x.ndim - 1)))
    base = 0.05 * x + 0.001 * t
    if doubled:
        b = x.shape[0] // 2
        scale = jnp.concatenate([jnp.ones((b,)), jnp.full((b,), 0.5)])
        base = base * scale.reshape(-1, *([1] * (x.ndim - 1)))
    var = jnp.tanh(x)
    return jnp.concatenate([base, var], axis=-1)


@pytest.mark.parametrize("cond_free", [False, True])
@pytest.mark.parametrize("t_step", [0, 7, STEPS - 1])
def test_p_mean_variance_parity(cond_free, t_step):
    import torch

    ref = _ref_diffuser(cond_free)
    x = np.random.default_rng(0).standard_normal((1, 4, 10)).astype(np.float32)
    t = np.array([t_step])
    out_ref = ref.p_mean_variance(_fake_model_torch(), torch.from_numpy(x),
                                  torch.from_numpy(t), clip_denoised=True)

    schedule = spaced_schedule("linear", 4000, STEPS)
    tables = jsampler._tables(schedule)
    cfg = jsampler.SamplerConfig(cond_free=cond_free, cond_free_k=2.0)
    xj = jnp.asarray(x.transpose(0, 2, 1))  # ours is (B, T, C)
    t_orig = jnp.full((1,), tables["timestep_map"][t_step])
    cfk = 2.0 * (1 - t_step / STEPS)
    eps, var_values = jsampler._model_out(_fake_model_jax, None, xj, t_orig, None, cfg, cfk)
    mean, logvar, pred_xstart = jsampler._p_mean_variance(
        tables, xj, t_step, eps, var_values, True)

    np.testing.assert_allclose(np.asarray(mean).transpose(0, 2, 1),
                               out_ref["mean"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(logvar).transpose(0, 2, 1),
                               out_ref["log_variance"].numpy(), rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(np.asarray(pred_xstart).transpose(0, 2, 1),
                               out_ref["pred_xstart"].numpy(), rtol=1e-4, atol=1e-5)


def test_full_loop_runs_and_is_deterministic():
    import jax

    schedule = spaced_schedule("linear", 4000, 10)
    loop = jsampler.make_p_sample_loop(_fake_model_jax, schedule,
                                       jsampler.SamplerConfig(cond_free=True))
    noise = jax.random.normal(jax.random.PRNGKey(0), (1, 16, 4))
    out1 = loop(None, None, noise, jax.random.PRNGKey(1))
    out2 = loop(None, None, noise, jax.random.PRNGKey(1))
    out3 = loop(None, None, noise, jax.random.PRNGKey(2))
    assert np.isfinite(np.asarray(out1)).all()
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    assert np.abs(np.asarray(out1) - np.asarray(out3)).max() > 0


@pytest.mark.parametrize("cond_free", [False, True])
def test_ddim_full_loop_parity(cond_free):
    """eta=0 DDIM is fully deterministic, so the WHOLE loop can be compared
    against the reference ddim_sample iterated step by step
    (reference diffusion.py:624-780)."""
    import jax
    import torch

    ref = _ref_diffuser(cond_free)
    rng = np.random.default_rng(3)
    noise = rng.standard_normal((1, 4, 12)).astype(np.float32)

    x = torch.from_numpy(noise.copy())
    model = _fake_model_torch()
    with torch.no_grad():
        for t_step in range(STEPS - 1, -1, -1):
            out = ref.ddim_sample(model, x, torch.tensor([t_step]),
                                  clip_denoised=True, eta=0.0)
            x = out["sample"]
    want = x.numpy()

    schedule = spaced_schedule("linear", 4000, STEPS)
    loop = jsampler.make_ddim_sample_loop(
        _fake_model_jax, schedule,
        jsampler.SamplerConfig(cond_free=cond_free, cond_free_k=2.0, eta=0.0))
    got = np.asarray(loop(None, None, jnp.asarray(noise.transpose(0, 2, 1)),
                          jax.random.PRNGKey(0)))
    np.testing.assert_allclose(got.transpose(0, 2, 1), want, rtol=2e-4, atol=2e-4)
