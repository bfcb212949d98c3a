"""Torch checkpoint -> flax param pytree converters.

One-time conversion of the reference's shipped ``.pth`` checkpoints
(reference: tortoise/api.py:31-40) into this framework's parameter trees.
Handles the layout differences:

* torch ``Conv1d`` weight (out, in, k)  -> flax ``nn.Conv`` kernel (k, in, out)
* torch ``Linear`` weight (out, in)     -> flax ``nn.Dense`` kernel (in, out)
* HF GPT-2 ``Conv1D`` weight (in, out)  -> flax kernel unchanged
* weight-norm (g, v) pairs              -> folded to g·v/‖v‖ at convert time
  (inference removes weight norm anyway, reference vocoder.py:290-298)

The same converters power the parity test-suite: reference modules are
instantiated with random weights on CPU torch, converted, and outputs
compared numerically.
"""
from __future__ import annotations

import numpy as np


def t2n(t) -> np.ndarray:
    return np.asarray(t.detach().cpu().numpy())


def conv1d_kernel(w) -> np.ndarray:
    """torch Conv1d (out, in, k) -> flax (k, in, out)."""
    return t2n(w).transpose(2, 1, 0)


def dense_kernel(w) -> np.ndarray:
    """torch Linear (out, in) -> flax (in, out)."""
    return t2n(w).T


def conv1x1_as_dense(w) -> np.ndarray:
    """torch Conv1d kernel-1 (out, in, 1) -> flax Dense (in, out)."""
    return t2n(w)[:, :, 0].T


def fold_weight_norm(g, v, dim: int = 0) -> np.ndarray:
    """Fold weight-norm parametrization: w = g * v / ||v|| (norm over all dims
    except ``dim``, matching torch.nn.utils.weight_norm's default dim=0)."""
    g, v = t2n(g), t2n(v)
    axes = tuple(i for i in range(v.ndim) if i != dim)
    norm = np.sqrt((v ** 2).sum(axis=axes, keepdims=True))
    return g * v / norm


def _groupnorm(sd, prefix):
    return {"GroupNorm_0": {"scale": t2n(sd[f"{prefix}.weight"]),
                            "bias": t2n(sd[f"{prefix}.bias"])}}


def _layernorm(sd, prefix):
    return {"scale": t2n(sd[f"{prefix}.weight"]), "bias": t2n(sd[f"{prefix}.bias"])}


def attention_block_params(sd, prefix: str) -> dict:
    """reference arch_util.AttentionBlock -> blocks.AttentionBlock params."""
    p = {
        "GroupNorm32_0": _groupnorm(sd, f"{prefix}.norm"),
        "qkv": {"kernel": conv1x1_as_dense(sd[f"{prefix}.qkv.weight"]),
                "bias": t2n(sd[f"{prefix}.qkv.bias"])},
        "proj_out": {"kernel": conv1x1_as_dense(sd[f"{prefix}.proj_out.weight"]),
                     "bias": t2n(sd[f"{prefix}.proj_out.bias"])},
    }
    rel = f"{prefix}.relative_pos_embeddings.relative_attention_bias.weight"
    if rel in sd:
        p["rel_pos"] = {"embedding": t2n(sd[rel])}
    return p


def resblock_params(sd, prefix: str) -> dict:
    """reference arch_util/classifier ResBlock -> blocks.ResBlock params."""
    p = {
        "GroupNorm32_0": _groupnorm(sd, f"{prefix}.in_layers.0"),
        "in_conv": {"kernel": conv1d_kernel(sd[f"{prefix}.in_layers.2.weight"]),
                    "bias": t2n(sd[f"{prefix}.in_layers.2.bias"])},
        "GroupNorm32_1": _groupnorm(sd, f"{prefix}.out_layers.0"),
        "out_conv": {"kernel": conv1d_kernel(sd[f"{prefix}.out_layers.3.weight"]),
                     "bias": t2n(sd[f"{prefix}.out_layers.3.bias"])},
    }
    if f"{prefix}.skip_connection.weight" in sd:
        p["skip_conv"] = {"kernel": conv1d_kernel(sd[f"{prefix}.skip_connection.weight"]),
                          "bias": t2n(sd[f"{prefix}.skip_connection.bias"])}
    return p


def conditioning_encoder_params(sd, prefix: str, attn_blocks: int = 6) -> dict:
    p = {"init": {"kernel": conv1x1_as_dense(sd[f"{prefix}.init.weight"]),
                  "bias": t2n(sd[f"{prefix}.init.bias"])}}
    for i in range(attn_blocks):
        p[f"attn_{i}"] = attention_block_params(sd, f"{prefix}.attn.{i}")
    return p


def gpt2_stack_params(sd, prefix: str, n_layer: int) -> dict:
    """HF GPT2Model -> gpt2.GPT2Stack params. HF Conv1D weights are already
    (in, out), so they map straight onto flax Dense kernels."""
    p = {}
    for i in range(n_layer):
        hp = f"{prefix}.h.{i}"
        p[f"h_{i}"] = {
            "ln_1": _layernorm(sd, f"{hp}.ln_1"),
            "ln_2": _layernorm(sd, f"{hp}.ln_2"),
            "attn": {
                "c_attn": {"kernel": t2n(sd[f"{hp}.attn.c_attn.weight"]),
                           "bias": t2n(sd[f"{hp}.attn.c_attn.bias"])},
                "c_proj": {"kernel": t2n(sd[f"{hp}.attn.c_proj.weight"]),
                           "bias": t2n(sd[f"{hp}.attn.c_proj.bias"])},
            },
            "mlp_fc": {"kernel": t2n(sd[f"{hp}.mlp.c_fc.weight"]),
                       "bias": t2n(sd[f"{hp}.mlp.c_fc.bias"])},
            "mlp_proj": {"kernel": t2n(sd[f"{hp}.mlp.c_proj.weight"]),
                         "bias": t2n(sd[f"{hp}.mlp.c_proj.bias"])},
        }
    p["ln_f"] = _layernorm(sd, f"{prefix}.ln_f")
    return p


def unified_voice_params(sd, layers: int = 30) -> dict:
    """reference UnifiedVoice state_dict -> models.autoregressive.UnifiedVoice."""
    return {
        "conditioning_encoder": conditioning_encoder_params(sd, "conditioning_encoder"),
        "text_embedding": {"embedding": t2n(sd["text_embedding.weight"])},
        "mel_embedding": {"embedding": t2n(sd["mel_embedding.weight"])},
        "text_pos_embedding": {"embedding": t2n(sd["text_pos_embedding.emb.weight"])},
        "mel_pos_embedding": {"embedding": t2n(sd["mel_pos_embedding.emb.weight"])},
        "gpt": gpt2_stack_params(sd, "gpt", layers),
        "final_norm": _layernorm(sd, "final_norm"),
        "text_head": {"kernel": dense_kernel(sd["text_head.weight"]),
                      "bias": t2n(sd["text_head.bias"])},
        "mel_head": {"kernel": dense_kernel(sd["mel_head.weight"]),
                     "bias": t2n(sd["mel_head.bias"])},
    }
