"""Gaussian diffusion sampling loops as jitted ``lax.scan`` programs.

TPU-native equivalent of the reference's vendored improved-diffusion sampler
(reference: tortoise/utils/diffusion.py:312-780 p_mean_variance / p_sample /
ddim_sample and the SpacedDiffusion wrapper :1093-1149). Differences by
design:

* the whole T-step loop is one compiled ``lax.scan`` — coefficient tables
  are baked in as constants indexed by the (traced) step;
* conditioning-free guidance runs cond and uncond in ONE model call on a
  doubled batch instead of two sequential forwards (cf. diffusion.py:340-342);
* the ramped guidance strength cfk = k·(1 − t/T) (diffusion.py:377-383) is
  computed per-step inside the scan.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from tortoise_tpu.diffusion.schedule import DiffusionSchedule


@dataclasses.dataclass(frozen=True)
class SamplerConfig:
    cond_free: bool = True
    cond_free_k: float = 2.0
    ramp_conditioning_free: bool = True
    clip_denoised: bool = True
    eta: float = 0.0  # ddim only
    # ancestral only: scales the per-step noise term. 0 gives the fully
    # deterministic mean trajectory (the per-step analog of the reference's
    # diffusion_temperature=0, which only zeroes the INITIAL noise) — used
    # for reproduction/debugging and cross-framework parity runs.
    noise_scale: float = 1.0


def _tables(schedule: DiffusionSchedule) -> dict[str, jnp.ndarray]:
    f = lambda a: jnp.asarray(a, jnp.float32)
    return {
        "timestep_map": jnp.asarray(schedule.timestep_map, jnp.int32),
        "sqrt_recip": f(schedule.sqrt_recip_alphas_cumprod),
        "sqrt_recipm1": f(schedule.sqrt_recipm1_alphas_cumprod),
        "post_logvar": f(schedule.posterior_log_variance_clipped),
        "post_coef1": f(schedule.posterior_mean_coef1),
        "post_coef2": f(schedule.posterior_mean_coef2),
        "log_betas": f(np.log(schedule.betas)),
        "alphas_cumprod": f(schedule.alphas_cumprod),
        "alphas_cumprod_prev": f(schedule.alphas_cumprod_prev),
    }


def _model_out(model_fn, variables, x, t_orig, pre_cond, cfg: SamplerConfig, cfk,
               valid_len=None):
    """One (optionally CFG-doubled) model call -> (eps, var_values).

    ``variables`` is threaded explicitly (never closed over): baking a large
    param tree into the jaxpr as constants makes compilation pathological.
    """
    b = x.shape[0]
    if cfg.cond_free:
        x2 = jnp.concatenate([x, x], axis=0)
        t2 = jnp.concatenate([t_orig, t_orig], axis=0)
        vl2 = valid_len
        if valid_len is not None and jnp.ndim(valid_len) == 1:
            # per-element lengths (batched k-winner fan-out) must cover the
            # CFG-doubled [cond ; uncond] batch
            vl2 = jnp.concatenate([valid_len, valid_len], axis=0)
        out = model_fn(variables, x2, t2, pre_cond, True, vl2)
        c = out.shape[-1] // 2
        eps_c, var_c = out[:b, :, :c], out[:b, :, c:]
        eps_u = out[b:, :, :c]
        eps = (1 + cfk) * eps_c - cfk * eps_u
        return eps, var_c
    out = model_fn(variables, x, t_orig, pre_cond, False, valid_len)
    c = out.shape[-1] // 2
    return out[:, :, :c], out[:, :, c:]


def _p_mean_variance(tables, x, t, eps, var_values, clip_denoised):
    min_log = tables["post_logvar"][t]
    max_log = tables["log_betas"][t]
    frac = (var_values + 1) / 2
    model_log_variance = frac * max_log + (1 - frac) * min_log
    pred_xstart = tables["sqrt_recip"][t] * x - tables["sqrt_recipm1"][t] * eps
    if clip_denoised:
        pred_xstart = jnp.clip(pred_xstart, -1, 1)
    mean = tables["post_coef1"][t] * pred_xstart + tables["post_coef2"][t] * x
    return mean, model_log_variance, pred_xstart


def make_p_sample_loop(model_fn: Callable, schedule: DiffusionSchedule,
                       cfg: SamplerConfig = SamplerConfig()):
    """Build a jitted ancestral-sampling loop.

    model_fn(x, t_orig, pre_cond, cond_free_doubled) -> (B[, x2], T, 2C):
    caller closes over the model/params; when ``cond_free_doubled`` the
    input batch is [cond ; uncond] and pre_cond carries both halves.
    """
    tables = _tables(schedule)
    n = schedule.num_timesteps

    @jax.jit
    def loop(variables, pre_cond, noise, rng, valid_len=None):
        def step(carry, t):
            x, rng = carry
            rng, r = jax.random.split(rng)
            t_orig = jnp.full((x.shape[0],), tables["timestep_map"][t])
            cfk = cfg.cond_free_k * (1 - t / n) if cfg.ramp_conditioning_free \
                else cfg.cond_free_k
            eps, var_values = _model_out(model_fn, variables, x, t_orig, pre_cond,
                                         cfg, cfk, valid_len)
            mean, logvar, _ = _p_mean_variance(tables, x, t, eps.astype(jnp.float32),
                                               var_values.astype(jnp.float32),
                                               cfg.clip_denoised)
            nonzero = (t != 0).astype(jnp.float32)
            z = jax.random.normal(r, x.shape)
            x_next = mean + cfg.noise_scale * nonzero * jnp.exp(0.5 * logvar) * z
            return (x_next, rng), None

        (x_final, _), _ = jax.lax.scan(step, (noise, rng),
                                       jnp.arange(n - 1, -1, -1))
        return x_final

    return loop


def make_ddim_sample_loop(model_fn: Callable, schedule: DiffusionSchedule,
                          cfg: SamplerConfig = SamplerConfig()):
    """Build a jitted DDIM loop (reference diffusion.py:624-780)."""
    tables = _tables(schedule)
    n = schedule.num_timesteps

    @jax.jit
    def loop(variables, pre_cond, noise, rng, valid_len=None):
        def step(carry, t):
            x, rng = carry
            rng, r = jax.random.split(rng)
            t_orig = jnp.full((x.shape[0],), tables["timestep_map"][t])
            cfk = cfg.cond_free_k * (1 - t / n) if cfg.ramp_conditioning_free \
                else cfg.cond_free_k
            eps_m, var_values = _model_out(model_fn, variables, x, t_orig, pre_cond,
                                           cfg, cfk, valid_len)
            _, _, pred_xstart = _p_mean_variance(
                tables, x, t, eps_m.astype(jnp.float32),
                var_values.astype(jnp.float32), cfg.clip_denoised)
            # re-derive eps from the (possibly clipped) x0
            eps = (tables["sqrt_recip"][t] * x - pred_xstart) / tables["sqrt_recipm1"][t]
            ab = tables["alphas_cumprod"][t]
            ab_prev = tables["alphas_cumprod_prev"][t]
            sigma = cfg.eta * jnp.sqrt((1 - ab_prev) / (1 - ab)) * \
                jnp.sqrt(1 - ab / ab_prev)
            mean_pred = pred_xstart * jnp.sqrt(ab_prev) + \
                jnp.sqrt(1 - ab_prev - sigma ** 2) * eps
            nonzero = (t != 0).astype(jnp.float32)
            z = jax.random.normal(r, x.shape)
            x_next = mean_pred + nonzero * sigma * z
            return (x_next, rng), None

        (x_final, _), _ = jax.lax.scan(step, (noise, rng),
                                       jnp.arange(n - 1, -1, -1))
        return x_final

    return loop
