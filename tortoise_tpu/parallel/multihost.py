"""Multi-host (multi-process) serving topology.

A TPU pod slice spans several hosts; each host runs one copy of this program
and sees only its local chips. ``initialize()`` wires them into one JAX
runtime (the SPMD analog of the reference's NCCL/MPI process groups — the
reference has none for inference, it pins one model per GPU), after which
``jax.devices()`` is global and the same Mesh/GSPMD code used single-host
runs unchanged across the slice.

Layout policy (SURVEY §2.5, scaling-book recipe):
* ``tp`` (weight shards, one all-reduce per block) must stay inside a host's
  ICI domain — never across DCN;
* ``dp`` (candidate batches / serving replicas) spans hosts: its collectives
  are a final score gather, bandwidth-trivial, fine over DCN.
``hybrid_mesh`` encodes that: the DCN axis factors over hosts, the ICI axes
over local chips.
"""
from __future__ import annotations

import os
import warnings

import jax
import numpy as np
from jax.sharding import Mesh


def _distributed_client_active() -> bool:
    """True iff jax.distributed.initialize() already ran in this process.

    Probed via the distributed service state, NOT ``jax.process_count()``:
    process_count() *creates* (and caches) the XLA backend as a side effect,
    which would make a later ``jax.distributed.initialize()`` raise
    unconditionally — the exact failure mode this helper exists to avoid.
    """
    try:
        from jax._src import distributed

        return distributed.global_state.coordinator_address is not None
    except Exception:  # pragma: no cover - private-API drift safety net
        return False


def initialize(coordinator_address: str | None = None,
               num_processes: int | None = None,
               process_id: int | None = None) -> bool:
    """Initialize the multi-process JAX runtime (idempotent).

    With no arguments, relies on the TPU metadata autodetection that covers
    GKE/GCE pod slices; explicit args cover manual bring-up
    (``COORDINATOR_ADDRESS host:port``, world size, rank). Returns True when
    running multi-process (jax.process_count() > 1 after init), False for
    plain single-process runs — callers can branch once and use the same
    mesh code either way.

    MUST be called before anything touches the XLA backend (jax.devices(),
    any jit dispatch, even jax.process_count()) — that is a JAX contract,
    not ours. If the backend is already up, this warns and falls back to
    single-host instead of crashing the pipeline.
    """
    if _distributed_client_active():
        return jax.process_count() > 1  # safe now: backend init already done
    coordinator_address = coordinator_address or os.environ.get("COORDINATOR_ADDRESS")
    n = num_processes if num_processes is not None else \
        int(os.environ.get("NUM_PROCESSES", "0")) or None
    pid = process_id if process_id is not None else \
        (int(os.environ["PROCESS_ID"]) if "PROCESS_ID" in os.environ else None)
    # TPU pod autodetection: only meaningful when the metadata names >1 worker
    # (single-chip/tunneled backends export the var with one entry)
    pod_hosts = [h for h in os.environ.get("TPU_WORKER_HOSTNAMES", "").split(",") if h]
    if coordinator_address is None and n is None and pid is None and \
            len(pod_hosts) <= 1:
        return False  # single host, nothing to do
    try:
        jax.distributed.initialize(coordinator_address=coordinator_address,
                                   num_processes=n, process_id=pid)
    except RuntimeError as e:
        msg = str(e).lower()
        # ONLY the in-process re-initialization race is benign. A bare
        # "already" match would also swallow genuine coordinator failures
        # ("address already in use", "coordination service already
        # exists"), silently serving a pod from one host.
        if ("initialize" in msg or "initialized" in msg) and \
                ("once" in msg or "already" in msg) and \
                "address" not in msg:
            # raced with another initializer in-process; state is valid
            return jax.process_count() > 1
        # Genuine failure (backend already up, bad coordinator address,
        # rank/world mismatch...). A silent fallback here would serve a
        # 4-host pod from 1 host with no diagnostic — surface it loudly.
        warnings.warn(
            f"jax.distributed.initialize failed; falling back to "
            f"SINGLE-HOST serving. Cause: {e}", RuntimeWarning, stacklevel=2)
        return False
    return jax.process_count() > 1


def hybrid_mesh(tp: int = 1, dp_per_host: int | None = None,
                devices=None) -> Mesh:
    """Mesh(("dp", "tp")) for a (possibly) multi-host run.

    The device array is laid out [hosts x local] so that:
    * consecutive ``tp`` groups are always devices of ONE host (all-reduces
      ride ICI);
    * ``dp`` concatenates hosts (replica traffic may cross DCN — it is one
      scalar score gather per batch, so DCN latency is irrelevant).

    Single-host runs degenerate to ``make_mesh`` exactly.
    """
    devices = devices if devices is not None else jax.devices()
    by_host: dict[int, list] = {}
    for d in devices:
        by_host.setdefault(getattr(d, "process_index", 0), []).append(d)
    hosts = [by_host[k] for k in sorted(by_host)]
    local = len(hosts[0])
    assert all(len(h) == local for h in hosts), "uneven devices per host"
    assert local % tp == 0, f"tp={tp} must divide {local} local devices"
    if dp_per_host is None:
        dp_per_host = local // tp
    assert dp_per_host * tp == local, \
        f"dp_per_host={dp_per_host} x tp={tp} != {local} local devices"
    arr = np.asarray([h for host in hosts
                      for h in np.asarray(host).reshape(dp_per_host, tp)])
    return Mesh(arr.reshape(len(hosts) * dp_per_host, tp), ("dp", "tp"))


def process_local_batch(global_batch: int) -> int:
    """Per-host share of a globally-sharded candidate batch."""
    assert global_batch % jax.process_count() == 0, (
        f"global batch {global_batch} not divisible by "
        f"{jax.process_count()} processes")
    return global_batch // jax.process_count()
