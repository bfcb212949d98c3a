"""Multi-host topology helpers (parallel/multihost.py).

Real multi-host needs several processes; here the layout policy itself is
tested on the 8-virtual-device mesh by spoofing process indices — the
property that matters (tp groups never straddle a host boundary, dp
concatenates hosts) is pure device-array arithmetic.
"""
import jax
import numpy as np
import pytest

from tortoise_tpu.parallel import multihost


class FakeDev:
    """Stands in for a jax Device: only process_index is consulted."""

    def __init__(self, i, host):
        self.id = i
        self.process_index = host

    def __repr__(self):
        return f"d{self.id}@h{self.process_index}"


def test_initialize_noop_single_host(monkeypatch):
    for var in ("COORDINATOR_ADDRESS", "NUM_PROCESSES", "PROCESS_ID",
                "TPU_WORKER_HOSTNAMES"):
        monkeypatch.delenv(var, raising=False)
    assert multihost.initialize() is False
    assert jax.process_count() == 1


def test_hybrid_mesh_single_host_matches_make_mesh():
    from tortoise_tpu.parallel.mesh import make_mesh

    got = multihost.hybrid_mesh(tp=2)
    want = make_mesh(tp=2)
    assert got.shape == want.shape == {"dp": 4, "tp": 2}
    assert [d.id for d in got.devices.flat] == [d.id for d in want.devices.flat]


def test_hybrid_mesh_tp_stays_on_host():
    # 4 hosts x 4 local chips, tp=2: every tp pair must share a host
    devs = [FakeDev(h * 4 + i, h) for h in range(4) for i in range(4)]
    mesh_arr = multihost.hybrid_mesh(tp=2, devices=devs).devices
    assert mesh_arr.shape == (8, 2)
    for row in mesh_arr:
        hosts = {d.process_index for d in row}
        assert len(hosts) == 1, f"tp group {row} crosses hosts {hosts}"
    # dp axis covers all hosts
    assert {d.process_index for d in mesh_arr[:, 0]} == {0, 1, 2, 3}


def test_hybrid_mesh_rejects_tp_across_hosts():
    devs = [FakeDev(h * 2 + i, h) for h in range(4) for i in range(2)]
    with pytest.raises(AssertionError):
        multihost.hybrid_mesh(tp=4, devices=devs)  # only 2 local chips


def test_process_local_batch():
    assert multihost.process_local_batch(256) == 256  # single process


def test_decode_on_hybrid_mesh():
    """The hybrid mesh drives the same sharded decode as make_mesh."""
    import jax.numpy as jnp

    from tortoise_tpu.models.ar_sampler import SamplerSettings, sample_speech
    from tortoise_tpu.models.autoregressive import (UnifiedVoice,
                                                    UnifiedVoiceConfig,
                                                    init_unified_voice)
    from tortoise_tpu.parallel.mesh import batch_sharding

    cfg = UnifiedVoiceConfig(layers=2, model_dim=128, heads=4,
                             max_text_tokens=40, max_mel_tokens=60,
                             number_text_tokens=32, number_mel_codes=64,
                             start_mel_token=60, stop_mel_token=61)
    model = UnifiedVoice(cfg, dtype=jnp.float32)
    variables = init_unified_voice(model, 0)
    cond = jax.random.normal(jax.random.PRNGKey(1), (1, cfg.model_dim))
    text = jnp.asarray(np.random.RandomState(0).randint(1, 30, (1, 8)), jnp.int32)
    settings = SamplerSettings(max_generate=16, emit_latents=False)

    mesh = multihost.hybrid_mesh(tp=1)
    codes, _ = sample_speech(model, variables, cond, text,
                             jax.random.PRNGKey(2), num_samples=8,
                             settings=settings,
                             batch_sharding=batch_sharding(mesh))
    codes = np.asarray(codes)
    assert codes.shape == (8, 16)
    assert ((codes >= 0) & (codes < cfg.number_mel_codes)).all()
