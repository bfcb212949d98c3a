"""Subprocess worker for the REAL 2-process jax.distributed test.

Launched (not collected) by test_multihost.py: two copies of this script,
one per rank, form an actual multi-process JAX runtime over localhost —
``jax.process_count() == 2`` for real, Gloo collectives across process
boundaries — and exercise the exact code paths the multi-host serving
claims rest on: ``multihost.initialize`` → ``hybrid_mesh`` → a
cross-process psum → the tiny dp×tp train step from training/train_step.py.

Usage: python multihost_worker.py <rank> <coordinator_port>
Prints "RANK<r> PASS" as the last line on success.
"""
import os
import sys

rank = int(sys.argv[1])
port = sys.argv[2]

# 4 virtual CPU devices per process -> 8 global. XLA_FLAGS is read at
# backend init (still ahead of us); JAX_PLATFORMS must go through
# jax.config because the axon plugin's sitecustomize pre-imports jax.
os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                           + " --xla_force_host_platform_device_count=4")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

from tortoise_tpu.parallel import multihost

ok = multihost.initialize(coordinator_address=f"localhost:{port}",
                          num_processes=2, process_id=rank)
assert ok is True, "initialize() must report multi-process"
assert jax.process_count() == 2, jax.process_count()
assert jax.local_device_count() == 4 and jax.device_count() == 8

import numpy as np
import jax.numpy as jnp
from jax.experimental.shard_map import shard_map
from jax.sharding import NamedSharding, PartitionSpec as P

# --- layout policy on REAL devices: tp groups never straddle a process ---
mesh = multihost.hybrid_mesh(tp=2)
assert mesh.shape == {"dp": 4, "tp": 2}, mesh.shape
for row in mesh.devices:
    assert len({d.process_index for d in row}) == 1, f"tp row crosses hosts: {row}"
assert {d.process_index for d in mesh.devices[:, 0]} == {0, 1}
assert multihost.process_local_batch(256) == 128

# --- cross-process collective: psum over the dp axis rides Gloo ---
@jax.jit
def dp_sum(x):
    return shard_map(lambda v: jax.lax.psum(v, "dp"), mesh=mesh,
                     in_specs=P("dp"), out_specs=P())(x)

x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P("dp")), np.full((4, 4), rank + 1.0, np.float32))
val = float(np.asarray(dp_sum(x).addressable_data(0))[0, 0])
assert val == 6.0, val  # 4 dp shards: ranks contribute 1+1+2+2

# --- the tiny dp x tp train step, batch genuinely sharded across ranks ---
from tortoise_tpu.models.autoregressive import (UnifiedVoice, UnifiedVoiceConfig,
                                                init_unified_voice)
from tortoise_tpu.parallel.mesh import batch_sharding
from tortoise_tpu.training.train_step import (init_sharded_train_state,
                                              make_optimizer, make_train_step)

cfg = UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                         max_text_tokens=60, max_mel_tokens=80)
model = UnifiedVoice(cfg, dtype=jnp.float32)
variables = init_unified_voice(model, jax.random.PRNGKey(0))  # same on all ranks

optimizer = make_optimizer()
with mesh:
    state = init_sharded_train_state(model, variables["params"], optimizer, mesh)
    b_global, b_local = 8, 4
    rng = np.random.default_rng(0)  # SAME data both ranks; each keeps its slice
    full = {
        "cond_latent": rng.standard_normal((b_global, cfg.model_dim)).astype(np.float32),
        "text_tokens": rng.integers(0, 255, (b_global, 12)).astype(np.int32),
        "mel_codes": rng.integers(0, 8192, (b_global, 24)).astype(np.int32),
        "wav_lengths": np.full((b_global,), 24 * cfg.mel_length_compression, np.int32),
    }
    sh = batch_sharding(mesh)
    lo = rank * b_local
    batch = {k: jax.make_array_from_process_local_data(
        NamedSharding(mesh, sh.spec), v[lo:lo + b_local]) for k, v in full.items()}
    step = make_train_step(model, optimizer)
    state, metrics = step(state, batch)
    loss = float(np.asarray(metrics["loss"].addressable_data(0)))
    gnorm = float(np.asarray(metrics["grad_norm"].addressable_data(0)))
    assert np.isfinite(loss) and np.isfinite(gnorm), (loss, gnorm)

# the dp grad all-reduce makes loss/grads identical on every rank; print for
# the parent to cross-check
print(f"RANK{rank} loss={loss:.6f} gnorm={gnorm:.6f}", flush=True)
print(f"RANK{rank} PASS", flush=True)
