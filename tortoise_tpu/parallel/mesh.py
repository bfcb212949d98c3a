"""Device mesh construction and sharding helpers.

The serving-scale layout follows SURVEY §2.5: one SPMD program under a
``Mesh(("dp", "tp"))`` — the AR candidate batch, CLVP scoring batch and
per-candidate diffusion shard over ``dp`` (the reference's workhorse
parallelism is exactly this candidate-batch split, api.py:407-442), while
model weights shard over ``tp`` (true tensor parallel via GSPMD, replacing
the reference's HF layer-placement ``parallelize``, autoregressive.py:49-67).
Collectives ride ICI within a slice; independent serving replicas scale over
DCN. Sequence/expert parallelism are not applicable to this model family
(max sequence ~1030 tokens, no MoE) — see SURVEY §2.5.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(dp: int | None = None, tp: int = 1, devices=None) -> Mesh:
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    if dp is None:
        assert n % tp == 0, f"{n} devices not divisible by tp={tp}"
        dp = n // tp
    assert dp * tp == n, f"mesh {dp}x{tp} != {n} devices"
    arr = np.asarray(devices).reshape(dp, tp)
    return Mesh(arr, ("dp", "tp"))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/candidate) axis over dp."""
    return NamedSharding(mesh, P("dp"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(x, mesh: Mesh):
    return jax.device_put(x, batch_sharding(mesh))


def replicate_tree(tree, mesh: Mesh):
    return jax.device_put(tree, replicated(mesh))
