"""Checkpoint loading / saving for the TPU framework.

The reference downloads 8 torch ``.pth`` checkpoints from HuggingFace Hub
(reference: tortoise/api.py:29-49, cached in ~/.cache/tortoise/models or
$TORTOISE_MODELS_DIR). This framework stores parameters as flat ``.npz``
param trees, searched in $TORTOISE_TPU_MODELS_DIR (default
~/.cache/tortoise_tpu/models). When a native checkpoint is missing but the
corresponding torch ``.pth`` is available locally, it is converted on the
fly via ``tortoise_tpu.convert``; with no weights at all the caller decides
(tests and benchmarks run random-init).
"""
from __future__ import annotations

import os
import warnings

import numpy as np
from flax.traverse_util import flatten_dict, unflatten_dict

DEFAULT_MODELS_DIR = os.path.join(os.path.expanduser("~"), ".cache", "tortoise_tpu", "models")
MODELS_DIR = os.environ.get("TORTOISE_TPU_MODELS_DIR", DEFAULT_MODELS_DIR)
TORCH_MODELS_DIR = os.environ.get(
    "TORTOISE_MODELS_DIR",
    os.path.join(os.path.expanduser("~"), ".cache", "tortoise", "models"))

# torch checkpoint name -> (our name, converter entrypoint)
TORCH_CHECKPOINTS = {
    "autoregressive": "autoregressive.pth",
    "diffusion_decoder": "diffusion_decoder.pth",
    "clvp": "clvp2.pth",
    "cvvp": "cvvp.pth",
    "vocoder": "vocoder.pth",
    "classifier": "classifier.pth",
    "rlg_auto": "rlg_auto.pth",
    "rlg_diffuser": "rlg_diffuser.pth",
    "hifidecoder": "hifidecoder.pth",
    # HF hub checkpoint, not a tortoise .pth: place a torch-saved state_dict
    # (or the pytorch_model.bin) at this name to convert offline
    "wav2vec2": "wav2vec2.pth",
}


def save_params(path: str, params: dict) -> None:
    flat = {"/".join(k): np.asarray(v) for k, v in flatten_dict(params).items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np.savez(path, **flat)


def load_params(path: str) -> dict:
    z = np.load(path)
    return unflatten_dict({tuple(k.split("/")): z[k] for k in z.files})


def find_checkpoint(name: str, models_dir: str | None = None) -> str | None:
    """Return the path of a native checkpoint for ``name``, or None."""
    d = models_dir or MODELS_DIR
    p = os.path.join(d, f"{name}.npz")
    return p if os.path.exists(p) else None


def convert_from_torch(name: str, torch_path: str) -> dict:
    """Convert a reference torch checkpoint into our param tree."""
    import torch

    from tortoise_tpu.convert import torch_import as ti

    sd = torch.load(torch_path, map_location="cpu", weights_only=False)
    if name == "vocoder":
        sd = sd["model_g"]  # reference api.py:237
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    converters = {
        "autoregressive": lambda s: ti.unified_voice_params(s, layers=30),
        "hifidecoder": ti.hifigan_params,
    }
    # Converters for the remaining families are registered as they land.
    extra = {
        n: getattr(ti, f)
        for n, f in (("diffusion_decoder", "diffusion_tts_params"),
                     ("clvp", "clvp_params"), ("cvvp", "cvvp_params"),
                     ("vocoder", "univnet_params"), ("classifier", "classifier_params"),
                     ("rlg_auto", "rlg_params"), ("rlg_diffuser", "rlg_params"),
                     ("wav2vec2", "wav2vec2_params"))
        if hasattr(ti, f)
    }
    converters.update(extra)
    if name not in converters:
        raise NotImplementedError(f"no converter registered for '{name}'")
    return converters[name](sd)


def get_params(name: str, init_fn, models_dir: str | None = None,
               allow_random: bool = True) -> tuple[dict, str]:
    """Load params for model ``name``; returns (params, source) where source
    is one of 'native', 'torch', 'random'."""
    native = find_checkpoint(name, models_dir)
    if native:
        return load_params(native), "native"
    torch_path = os.path.join(TORCH_MODELS_DIR, TORCH_CHECKPOINTS.get(name, f"{name}.pth"))
    if os.path.exists(torch_path):
        params = convert_from_torch(name, torch_path)
        # cache the converted tree for next time
        try:
            save_params(os.path.join(models_dir or MODELS_DIR, f"{name}.npz"), params)
        except OSError:
            pass
        return params, "torch"
    if not allow_random:
        raise FileNotFoundError(
            f"no checkpoint found for '{name}' in {models_dir or MODELS_DIR} "
            f"or {TORCH_MODELS_DIR}")
    warnings.warn(f"no checkpoint for '{name}'; using random initialization "
                  "(output will be noise, perf/shape testing only)")
    return init_fn(), "random"


def cast_for_inference(params: dict, dtype) -> dict:
    """Cast float params to the serving dtype (bf16), keeping normalization
    scales/biases in float32. Halves HBM residency, host->device transfer and
    the per-decode-step weight reads.

    Host numpy leaves cast host-side via ml_dtypes: ``jnp.asarray`` per leaf
    would dispatch one ``convert_element_type`` program per (shape, dtype) —
    ~0.5 s compile each over a tunneled TPU, below the persistent-cache
    threshold, hundreds of leaves per model — measured as the bulk of
    TextToSpeech instantiation time."""
    import jax
    import jax.numpy as jnp

    if dtype == jnp.bfloat16:
        import ml_dtypes

        np_dtype = np.dtype(ml_dtypes.bfloat16)
    else:
        np_dtype = np.dtype(dtype)

    def cast(path, leaf):
        name = "/".join(getattr(p, "key", str(p)) for p in path)
        if leaf.dtype != np.float32 and leaf.dtype != jnp.float32:
            return leaf
        if any(k in name for k in ("Norm", "norm", "ln_", "qscale")):
            return leaf
        if isinstance(leaf, np.ndarray):
            return leaf.astype(np_dtype)
        return jnp.asarray(leaf, dtype)

    return jax.tree_util.tree_map_with_path(cast, params)


def resolve_gpt_quant(cfg, gpt_weights: str):
    """Apply a ``gpt_weights`` ctor option ("bf16" | "int8") to a
    UnifiedVoiceConfig: "int8" turns on the weight-only int8 GPT kernels
    (gpt2.QuantDense). Single source of the enable rule for both API
    front-ends; pair with ``quantize_gpt_weights`` on the loaded params."""
    import dataclasses

    if gpt_weights == "int8" and not cfg.quant_weights:
        cfg = dataclasses.replace(cfg, quant_weights=True)
    return cfg


def quantize_gpt_weights(params: dict) -> dict:
    """Per-output-channel symmetric int8 quantization of the GPT stack's
    block dense kernels (c_attn/c_proj/mlp_fc/mlp_proj), for
    ``quant_weights=True`` models (gpt2.QuantDense). Each kernel
    ((in, out) or scan-stacked (L, in, out)) becomes {kernel int8,
    qscale f32 per output channel}; biases/norms/embeddings are untouched.
    Already-int8 kernels (random QuantDense init) pass through."""
    import jax

    quant_names = {"c_attn", "c_proj", "mlp_fc", "mlp_proj"}

    def quantize_one(sub: dict) -> dict:
        k = np.asarray(jax.device_get(sub["kernel"]), np.float32)
        s = np.maximum(np.abs(k).max(axis=-2), 1e-12) / 127.0   # over in axis
        q = np.clip(np.round(k / s[..., None, :]), -127, 127).astype(np.int8)
        out = dict(sub)
        out["kernel"] = q
        out["qscale"] = s.astype(np.float32)
        return out

    def walk(d, name=""):
        if not isinstance(d, dict):
            return d
        if name in quant_names and "kernel" in d:
            if np.asarray(d["kernel"]).dtype == np.int8:
                return d
            return quantize_one(d)
        return {k: walk(v, k) for k, v in d.items()}

    out = dict(params)
    if "gpt" in out:
        out["gpt"] = walk(out["gpt"])
    return out


def host_init(shape_fn, seed: int = 0) -> dict:
    """Initialize a param tree host-side: trace shapes with jax.eval_shape and
    fill with numpy randoms (zeros/ones for biases/scales). Avoids compiling
    and running large on-device init programs — on a remote TPU those cost
    minutes per model."""
    import jax
    import jax.numpy as jnp

    shapes = jax.eval_shape(shape_fn)
    gen = np.random.Generator(np.random.SFC64(seed))

    def fill(name, sd, siblings):
        shape, dtype = sd.shape, sd.dtype
        if name == "qscale":
            # QuantDense scale: mimic lecun-normal magnitude against the
            # sibling int8 kernel's uniform [-127, 127] fill
            in_f = siblings["kernel"].shape[-2]
            return np.full(shape, 1.0 / (127.0 * np.sqrt(in_f)), dtype)
        if np.issubdtype(np.dtype(dtype), np.integer):
            return gen.integers(-127, 128, shape).astype(dtype)
        if name in ("bias", "b"):
            return np.zeros(shape, dtype)
        if name in ("scale", "g"):
            return np.ones(shape, dtype)
        if name in ("embedding", "unconditioned_embedding", "temperature", "weight"):
            std = 0.02 if name == "embedding" else 1.0
            if name == "temperature":
                return np.ones(shape, dtype)
            return (gen.standard_normal(shape, dtype=np.float32) * std).astype(dtype)
        fan_in = int(np.prod(shape[:-1])) if len(shape) >= 2 else \
            max(shape[-1] if shape else 1, 1)
        return (gen.standard_normal(shape, dtype=np.float32)
                / np.sqrt(fan_in)).astype(dtype)

    from collections.abc import Mapping

    def walk(d):
        return {k: (walk(v) if isinstance(v, Mapping) else fill(k, v, d))
                for k, v in d.items()}

    return walk(shapes)


def save_params_safetensors(path: str, params: dict) -> None:
    """Export a param tree as safetensors (flat '/'-joined keys)."""
    from safetensors.numpy import save_file

    flat = {"/".join(k): np.ascontiguousarray(v)
            for k, v in flatten_dict(params).items()}
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    save_file(flat, path)


def load_params_safetensors(path: str) -> dict:
    from safetensors.numpy import load_file

    flat = load_file(path)
    return unflatten_dict({tuple(k.split("/")): v for k, v in flat.items()})


def save_params_orbax(path: str, params: dict) -> None:
    """Export via orbax (directory checkpoint, async-capable)."""
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(path), params, force=True)
    ckptr.wait_until_finished()


def load_params_orbax(path: str) -> dict:
    import orbax.checkpoint as ocp

    ckptr = ocp.StandardCheckpointer()
    return ckptr.restore(os.path.abspath(path))
