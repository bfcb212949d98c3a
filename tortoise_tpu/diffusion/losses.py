"""Diffusion training losses (the training contract).

Behavioral equivalent of the reference's training-only paths
(reference: tortoise/utils/diffusion.py:830-916 training_losses and
:781-828 _vb_terms_bpd): epsilon-MSE plus the variational bound on the
learned-range variance with a stop-gradient'd mean ("frozen out"), all as
pure jittable functions over a DiffusionSchedule.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tortoise_tpu.diffusion.schedule import DiffusionSchedule


def _extract(arr: np.ndarray, t: jnp.ndarray, ndim: int) -> jnp.ndarray:
    out = jnp.asarray(arr, jnp.float32)[t]
    return out.reshape(out.shape + (1,) * (ndim - 1))


def q_sample(schedule: DiffusionSchedule, x_start, t, noise):
    """Sample q(x_t | x_0) (reference diffusion.py:272-290)."""
    return (_extract(schedule.sqrt_alphas_cumprod, t, x_start.ndim) * x_start
            + _extract(schedule.sqrt_one_minus_alphas_cumprod, t, x_start.ndim) * noise)


def normal_kl(mean1, logvar1, mean2, logvar2):
    """KL between two diagonal gaussians, in nats (reference diffusion.py:24-45)."""
    return 0.5 * (-1.0 + logvar2 - logvar1 + jnp.exp(logvar1 - logvar2)
                  + ((mean1 - mean2) ** 2) * jnp.exp(-logvar2))


def _mean_flat(x):
    return x.reshape(x.shape[0], -1).mean(axis=1)


def discretized_gaussian_log_likelihood(x, means, log_scales):
    """Log-likelihood of a discretized (8-bit) gaussian (reference :48-86)."""
    centered = x - means
    inv_stdv = jnp.exp(-log_scales)
    plus_in = inv_stdv * (centered + 1.0 / 255.0)
    min_in = inv_stdv * (centered - 1.0 / 255.0)
    cdf = lambda z: 0.5 * (1.0 + jnp.tanh(np.sqrt(2.0 / np.pi) * (z + 0.044715 * z ** 3)))
    cdf_plus, cdf_min = cdf(plus_in), cdf(min_in)
    log_cdf_plus = jnp.log(jnp.clip(cdf_plus, min=1e-12))
    log_one_minus_cdf_min = jnp.log(jnp.clip(1.0 - cdf_min, min=1e-12))
    cdf_delta = cdf_plus - cdf_min
    return jnp.where(x < -0.999, log_cdf_plus,
                     jnp.where(x > 0.999, log_one_minus_cdf_min,
                               jnp.log(jnp.clip(cdf_delta, min=1e-12))))


def _p_mean_variance_from_out(schedule, x_t, t, eps, var_values, clip_denoised):
    nd = x_t.ndim
    min_log = _extract(schedule.posterior_log_variance_clipped, t, nd)
    max_log = _extract(np.log(schedule.betas), t, nd)
    frac = (var_values + 1) / 2
    model_log_variance = frac * max_log + (1 - frac) * min_log
    pred_xstart = (_extract(schedule.sqrt_recip_alphas_cumprod, t, nd) * x_t
                   - _extract(schedule.sqrt_recipm1_alphas_cumprod, t, nd) * eps)
    if clip_denoised:
        pred_xstart = jnp.clip(pred_xstart, -1, 1)
    mean = (_extract(schedule.posterior_mean_coef1, t, nd) * pred_xstart
            + _extract(schedule.posterior_mean_coef2, t, nd) * x_t)
    return mean, model_log_variance


def vb_terms_bpd(schedule: DiffusionSchedule, x_start, x_t, t, eps, var_values):
    """Variational-bound term in bits-per-dim (reference :781-828)."""
    nd = x_t.ndim
    true_mean = (_extract(schedule.posterior_mean_coef1, t, nd) * x_start
                 + _extract(schedule.posterior_mean_coef2, t, nd) * x_t)
    true_logvar = _extract(schedule.posterior_log_variance_clipped, t, nd)
    mean, logvar = _p_mean_variance_from_out(schedule, x_t, t, eps, var_values,
                                             clip_denoised=False)
    kl = _mean_flat(normal_kl(true_mean, true_logvar, mean, logvar)) / np.log(2.0)
    decoder_nll = -_mean_flat(discretized_gaussian_log_likelihood(
        x_start, mean, 0.5 * logvar)) / np.log(2.0)
    return jnp.where(t == 0, decoder_nll, kl)


def training_losses(model_fn, schedule: DiffusionSchedule, x_start, t, rng=None,
                    rescale_vb: bool = False, noise=None):
    """MSE + frozen-mean VB loss for an epsilon/learned-range model.

    model_fn(x_t, t_orig) -> (B, T, 2C). Returns dict of per-batch terms.
    """
    if noise is None:
        noise = jax.random.normal(rng, x_start.shape)
    x_t = q_sample(schedule, x_start, t, noise)
    t_orig = jnp.asarray(schedule.timestep_map)[t]
    out = model_fn(x_t, t_orig)
    c = out.shape[-1] // 2
    eps, var_values = out[..., :c], out[..., c:]

    vb = vb_terms_bpd(schedule, x_start, x_t, t,
                      jax.lax.stop_gradient(eps), var_values)
    if rescale_vb:
        vb = vb * schedule.num_timesteps / 1000.0
    mse = _mean_flat((noise - eps) ** 2)
    return {"loss": mse + vb, "mse": mse, "vb": vb}
