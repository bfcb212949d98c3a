"""Test configuration: force an 8-device virtual CPU mesh before jax import.

Multi-chip sharding tests run on fake CPU devices (the standard JAX
substitute for a real slice); parity tests compare against the PyTorch
reference on CPU.
"""
import os

# Force-override: the axon TPU plugin's sitecustomize imports jax and sets
# JAX_PLATFORMS=axon before user code runs, so both setdefault and a plain
# env write are no-ops — the config update below (after jax import) wins.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"

import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")
# XLA:CPU's oneDNN path computes f32 matmuls at bf16-ish precision by
# default, which swamps parity tolerances. Tests compare math, not speed.
jax.config.update("jax_default_matmul_precision", "highest")
