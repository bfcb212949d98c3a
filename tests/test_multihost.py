"""Multi-host topology helpers (parallel/multihost.py).

Two tiers: the layout policy is unit-tested on the 8-virtual-device mesh by
spoofing process indices (pure device-array arithmetic), and the REAL
multi-process path — jax.distributed.initialize, hybrid_mesh over two
actual processes, Gloo cross-process psum, the dp×tp train step — is
exercised by spawning two worker subprocesses (multihost_worker.py) so
``jax.process_count() == 2`` genuinely holds.
"""
import os
import socket
import subprocess
import sys

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


@pytest.mark.slow
def test_two_process_distributed_train_step():
    """REAL multi-process: 2 local CPU processes form one JAX runtime.

    Each worker asserts initialize()->True, process_count()==2, the
    hybrid_mesh layout on real devices, a cross-process psum value, and a
    finite dp×tp train-step loss; the parent additionally checks the dp
    all-reduce made loss/grad_norm identical across ranks.
    """
    with socket.socket() as s:  # free localhost port for the coordinator
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "multihost_worker.py")
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen([sys.executable, worker, str(r), str(port)],
                              stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                              text=True, env=env) for r in range(2)]
    outs = []
    for r, p in enumerate(procs):
        try:
            out, _ = p.communicate(timeout=300)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            pytest.fail(f"rank {r} timed out")
        outs.append(out)
        assert p.returncode == 0, f"rank {r} failed:\n{out}"
        assert f"RANK{r} PASS" in out, out
    metrics = [[ln for ln in o.splitlines() if ln.startswith("RANK")][0].split(" ", 1)[1]
               for o in outs]
    assert metrics[0] == metrics[1], f"ranks disagree: {metrics}"


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
