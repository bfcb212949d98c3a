"""Training-loss parity vs the reference GaussianDiffusion (forced noise)."""
import numpy as np
import pytest

import jax.numpy as jnp

from ref_loader import has_reference, load_ref_module

from tortoise_tpu.diffusion.losses import training_losses
from tortoise_tpu.diffusion.schedule import spaced_schedule

pytestmark = pytest.mark.skipif(not has_reference(), reason="reference not mounted")

STEPS = 50


def test_training_losses_match_reference():
    import torch

    ref_mod = load_ref_module("tortoise.utils.diffusion")
    ref = ref_mod.SpacedDiffusion(
        use_timesteps=ref_mod.space_timesteps(4000, [STEPS]),
        model_mean_type="epsilon", model_var_type="learned_range",
        loss_type="mse", betas=ref_mod.get_named_beta_schedule("linear", 4000))

    rng = np.random.default_rng(0)
    b, c, n = 3, 4, 12
    x_start = rng.standard_normal((b, c, n)).astype(np.float32) * 0.5
    noise = rng.standard_normal((b, c, n)).astype(np.float32)
    t = np.array([0, 13, STEPS - 1])

    def fake_model_torch(x, ts, **kw):
        tt = ts.float().reshape(-1, 1, 1)
        return torch.cat([0.1 * x + 0.0003 * tt, torch.tanh(x)], dim=1)

    terms_ref = ref.training_losses(fake_model_torch, torch.from_numpy(x_start),
                                    torch.from_numpy(t),
                                    noise=torch.from_numpy(noise))

    schedule = spaced_schedule("linear", 4000, STEPS)

    def fake_model_jax(x, t_orig):
        tt = t_orig.astype(jnp.float32).reshape(-1, 1, 1)
        return jnp.concatenate([0.1 * x + 0.0003 * tt, jnp.tanh(x)], axis=-1)

    terms = training_losses(fake_model_jax, schedule,
                            jnp.asarray(x_start.transpose(0, 2, 1)),
                            jnp.asarray(t), noise=jnp.asarray(noise.transpose(0, 2, 1)))
    for key in ("mse", "vb", "loss"):
        np.testing.assert_allclose(np.asarray(terms[key]),
                                   terms_ref[key].detach().numpy(),
                                   rtol=2e-4, atol=2e-5, err_msg=key)
