"""Parameter partition rules (GSPMD tensor parallelism).

Megatron-style sharding for the UnifiedVoice GPT stack: qkv/fc kernels split
on the output feature axis, proj kernels on the input feature axis, so each
block needs exactly one all-reduce (emitted automatically by GSPMD) per
attention/MLP. Everything else (norms, small convs, embeddings' table axis)
is replicated or vocab-sharded.
"""
from __future__ import annotations

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def unified_voice_pspec(path: tuple[str, ...], leaf) -> P:
    """Partition spec for a UnifiedVoice param leaf, keyed by its tree path."""
    keys = [getattr(p, "key", str(p)) for p in path]
    name = "/".join(keys)
    if "gpt" in keys:
        # scanned-stack layout: kernels are (L, in, out)
        stacked = "h_scan" in keys
        if keys[-1] == "kernel":
            if any(k in keys for k in ("c_attn", "mlp_fc")):
                return P(None, None, "tp") if stacked else P(None, "tp")
            if any(k in keys for k in ("c_proj", "mlp_proj")):
                return P(None, "tp", None) if stacked else P("tp", None)
        return P()
    if keys[-1] == "embedding" and keys[0] in ("text_embedding", "mel_embedding"):
        return P(None, None)
    if keys[0] in ("mel_head", "text_head") and keys[-1] == "kernel":
        return P(None, "tp")              # vocab-sharded output projection
    if keys[0] == "conditioning_encoder" and keys[-1] == "kernel" and "qkv" in keys:
        return P(None, "tp")
    return P()


class KVCacheSharding:
    """Key-aware shardings for the decode KV cache (both layouts).

    Candidate batch over ``dp``, the channel/head minor axis over ``tp``.
    Heads live wholly inside one C shard (C/tp is a multiple of Dh), so a
    channel-sharded cache matches the tp-sharded qkv projection output and
    attention stays embarrassingly parallel over heads — GSPMD inserts no
    cache collectives. B-major leaves ("k"/"v"(+_scale), (L, B, T, C|H))
    shard dim 1 over dp; T-major leaves ("k_tm"/..., (L, T, B, C|H))
    shard dim 2 (models/gpt2.init_kv_cache)."""

    def __init__(self, mesh: Mesh):
        self.mesh = mesh

    # value semantics: this object is a static jit argument of the decode
    # programs (ar_sampler._prefill/_decode) — identity hashing would force
    # a full recompile per instance even over the same mesh
    def __eq__(self, other):
        return isinstance(other, KVCacheSharding) and self.mesh == other.mesh

    def __hash__(self):
        return hash(("KVCacheSharding", self.mesh))

    def spec(self, key: str) -> P:
        if key.startswith(("k_tm", "v_tm")):
            return P(None, None, "dp", "tp")
        return P(None, "dp", None, "tp")

    def apply(self, cache: dict) -> dict:
        import jax

        return {k: jax.lax.with_sharding_constraint(
            v, NamedSharding(self.mesh, self.spec(k)))
            for k, v in cache.items()}


def kv_cache_sharding(mesh: Mesh) -> KVCacheSharding:
    return KVCacheSharding(mesh)


def shard_params(params, mesh: Mesh, rules=unified_voice_pspec):
    """Place a param tree on the mesh according to ``rules``."""
    def place(path, leaf):
        spec = rules(path, leaf)
        # drop specs that don't divide the axis evenly
        shape = leaf.shape
        clean = []
        for i, ax in enumerate(spec):
            if ax is None:
                clean.append(None)
            elif i < len(shape) and shape[i] % mesh.shape[ax] == 0:
                clean.append(ax)
            else:
                clean.append(None)
        return jax.device_put(leaf, NamedSharding(mesh, P(*clean)))

    return jax.tree_util.tree_map_with_path(place, params)
