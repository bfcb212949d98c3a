"""Training step for the UnifiedVoice prior (the training contract).

The reference ships no training loop (training lived in DL-Art-School,
reference Advanced_Usage.md:63-69) but its models keep the training-only
code paths that define the contract: UnifiedVoice's dual text/mel
cross-entropy (reference autoregressive.py:454-512), the diffusion
MSE/VLB losses (tortoise/utils/diffusion.py:830-988) and CLVP's symmetric
contrastive loss (clvp.py:133-140). This module provides a TPU-native
(pjit/GSPMD) training step over that contract: data parallel over ``dp``,
Megatron-style tensor parallel over ``tp`` (parallel/sharding.py).
"""
from __future__ import annotations

import dataclasses
from typing import Any, Callable

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tortoise_tpu.models.autoregressive import UnifiedVoice
from tortoise_tpu.parallel.sharding import shard_params, unified_voice_pspec


@dataclasses.dataclass
class TrainState:
    params: Any
    opt_state: Any
    step: jnp.ndarray


def make_optimizer(lr: float = 1e-4, weight_decay: float = 0.01,
                   warmup: int = 100) -> optax.GradientTransformation:
    sched = optax.linear_schedule(0.0, lr, warmup)
    return optax.chain(optax.clip_by_global_norm(1.0),
                       optax.adamw(sched, b1=0.9, b2=0.96, weight_decay=weight_decay))


def unified_voice_loss(model: UnifiedVoice, params, batch,
                       text_loss_weight: float = 0.01):
    """Dual CE loss (mel-weighted, DL-Art-School style)."""
    loss_text, loss_mel, _ = model.apply(
        {"params": params}, batch["cond_latent"], batch["text_tokens"],
        batch["mel_codes"], batch["wav_lengths"])
    return loss_mel + text_loss_weight * loss_text, {
        "loss_text": loss_text, "loss_mel": loss_mel}


def make_train_step(model: UnifiedVoice, optimizer: optax.GradientTransformation,
                    loss_fn: Callable = unified_voice_loss):
    """jitted (state, batch) -> (state, metrics). Under a mesh with sharded
    params/batch, GSPMD inserts the dp gradient all-reduce and tp collectives
    automatically."""

    @jax.jit
    def step(state: TrainState, batch):
        def lf(p):
            return loss_fn(model, p, batch)

        (loss, aux), grads = jax.value_and_grad(lf, has_aux=True)(state.params)
        updates, opt_state = optimizer.update(grads, state.opt_state, state.params)
        params = optax.apply_updates(state.params, updates)
        metrics = {"loss": loss, **aux, "grad_norm": optax.global_norm(grads)}
        return TrainState(params, opt_state, state.step + 1), metrics

    return step


def init_sharded_train_state(model: UnifiedVoice, params, optimizer,
                             mesh: Mesh) -> TrainState:
    params = shard_params(params, mesh, unified_voice_pspec)
    opt_state = jax.jit(optimizer.init)(params)
    step = jax.device_put(jnp.zeros((), jnp.int32), NamedSharding(mesh, P()))
    return TrainState(params, opt_state, step)


jax.tree_util.register_pytree_node(
    TrainState,
    lambda s: ((s.params, s.opt_state, s.step), None),
    lambda _, c: TrainState(*c))
