#!/usr/bin/env python
"""One-command path from a clean machine to converted, verified weights.

The reference acquires its checkpoints itself via ``hf_hub_download``
(reference: tortoise/api.py:31-49 quality table, api_fast.py:34-48 fast
table, wav2vec_alignment.py:53 the aligner). This tool mirrors that:

    python tools/fetch_weights.py              # fetch + convert + verify all
    python tools/fetch_weights.py fast         # just the fast-path set
    python tools/fetch_weights.py autoregressive vocoder
    python tools/fetch_weights.py --offline    # convert/verify local files only

Per checkpoint: download the torch ``.pth`` into $TORTOISE_MODELS_DIR (the
reference's cache layout, so both frameworks share one download), convert to
a native ``.npz`` param tree in $TORTOISE_TPU_MODELS_DIR, then verify the
converted tree covers the shipping-config module tree key-for-key and
shape-for-shape (the same contract tests/test_full_config_audit.py enforces
against the reference modules). Offline (no egress) it skips downloads
gracefully and processes whatever is already on disk.
"""
import argparse
import os
import sys
import urllib.error
import urllib.request

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

# Download URL per torch checkpoint file. The reference's get_model_path
# resolves every name through the HF repo Manmay/tortoise-tts
# (reference api.py:42-49, api_fast.py:42-48); the jbetker/tortoise-tts-v2
# URLs in its quality-path MODELS table (api.py:31-40) are the original
# mirror of the same files and serve as fallback.
_HUB = "https://huggingface.co/Manmay/tortoise-tts/resolve/main"
_HUB_FALLBACK = "https://huggingface.co/jbetker/tortoise-tts-v2/resolve/main/.models"
_W2V_REPO = "https://huggingface.co/jbetker/wav2vec2-large-robust-ft-libritts-voxpopuli"

URLS = {
    "autoregressive.pth": (f"{_HUB}/autoregressive.pth",
                           f"{_HUB_FALLBACK}/autoregressive.pth"),
    "classifier.pth": (f"{_HUB}/classifier.pth", f"{_HUB_FALLBACK}/classifier.pth"),
    "clvp2.pth": (f"{_HUB}/clvp2.pth", f"{_HUB_FALLBACK}/clvp2.pth"),
    "cvvp.pth": (f"{_HUB}/cvvp.pth", f"{_HUB_FALLBACK}/cvvp.pth"),
    "diffusion_decoder.pth": (f"{_HUB}/diffusion_decoder.pth",
                              f"{_HUB_FALLBACK}/diffusion_decoder.pth"),
    "vocoder.pth": (f"{_HUB}/vocoder.pth", f"{_HUB_FALLBACK}/vocoder.pth"),
    "rlg_auto.pth": (f"{_HUB}/rlg_auto.pth", f"{_HUB_FALLBACK}/rlg_auto.pth"),
    "rlg_diffuser.pth": (f"{_HUB}/rlg_diffuser.pth",
                         f"{_HUB_FALLBACK}/rlg_diffuser.pth"),
    "hifidecoder.pth": (f"{_HUB}/hifidecoder.pth",),  # fast path only
    # the aligner the reference loads through transformers
    # (wav2vec_alignment.py:53); saved under our expected local name
    "wav2vec2.pth": (f"{_W2V_REPO}/resolve/main/pytorch_model.bin",),
}

FAST_SET = ("autoregressive", "classifier", "rlg_auto", "hifidecoder")


def _init_shape_tree(name: str):
    """Expected param tree (jax.eval_shape, no compute) for the shipping
    config of each model family — the verify oracle."""
    import jax
    import jax.numpy as jnp

    def shapes(thunk):
        return jax.eval_shape(thunk)

    if name == "autoregressive":
        from tortoise_tpu.models.autoregressive import (UnifiedVoice,
                                                        UnifiedVoiceConfig,
                                                        init_unified_voice)

        model = UnifiedVoice(UnifiedVoiceConfig())
        return shapes(lambda: init_unified_voice(model, 0))["params"]
    if name == "diffusion_decoder":
        from tortoise_tpu.models.diffusion_decoder import (DiffusionTts,
                                                           DiffusionTtsConfig,
                                                           init_diffusion_tts)

        model = DiffusionTts(DiffusionTtsConfig(in_latent_channels=1024))
        return shapes(lambda: init_diffusion_tts(model, jax.random.PRNGKey(0)))["params"]
    if name == "clvp":
        from tortoise_tpu.models.clvp import CLVP, CLVPConfig

        model = CLVP(CLVPConfig())
        return shapes(lambda: model.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 4), jnp.int32),
                                         jnp.zeros((1, 4), jnp.int32)))["params"]
    if name == "cvvp":
        from tortoise_tpu.models.cvvp import CVVP, CVVPConfig

        model = CVVP(CVVPConfig())
        return shapes(lambda: model.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 16, 80)),
                                         jnp.zeros((1, 8), jnp.int32)))["params"]
    if name == "vocoder":
        from tortoise_tpu.models.vocoder import UnivNetConfig, UnivNetGenerator

        model = UnivNetGenerator(UnivNetConfig())
        return shapes(lambda: model.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 12, 100)),
                                         jnp.zeros((1, 12, 64))))["params"]
    if name == "classifier":
        from tortoise_tpu.models.classifier import (
            AudioMiniEncoderWithClassifierHead, ClassifierConfig)

        model = AudioMiniEncoderWithClassifierHead(ClassifierConfig())
        return shapes(lambda: model.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 1024, 1))))["params"]
    if name in ("rlg_auto", "rlg_diffuser"):
        from tortoise_tpu.models.random_latent import RandomLatentConverter

        d = 1024 if name == "rlg_auto" else 2048
        model = RandomLatentConverter(d)
        return shapes(lambda: model.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, d))))["params"]
    if name == "hifidecoder":
        from tortoise_tpu.models.hifigan import HifiganConfig, HifiganGenerator

        model = HifiganGenerator(HifiganConfig(in_channels=1024, cond_channels=1024))
        return shapes(lambda: model.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 8, 1024)),
                                         jnp.zeros((1, 1024))))["params"]
    if name == "wav2vec2":
        from tortoise_tpu.models.wav2vec2 import Wav2Vec2Config, Wav2Vec2ForCTC

        model = Wav2Vec2ForCTC(Wav2Vec2Config())
        return shapes(lambda: model.init(jax.random.PRNGKey(0),
                                         jnp.zeros((1, 16000)),
                                         n_samples=16000))["params"]
    raise ValueError(f"unknown family {name!r}")


def verify_coverage(name: str, params: dict) -> list[str]:
    """Key+shape diff of a converted tree vs the shipping-config module tree.
    Returns a list of problems (empty = verified)."""
    from flax.traverse_util import flatten_dict

    want = {"/".join(k): tuple(v.shape)
            for k, v in flatten_dict(_init_shape_tree(name)).items()}
    got = {"/".join(k): tuple(getattr(v, "shape", ()))
           for k, v in flatten_dict(params).items()}
    problems = [f"missing key {k} {want[k]}" for k in sorted(want.keys() - got.keys())]
    problems += [f"unexpected key {k} {got[k]}" for k in sorted(got.keys() - want.keys())]
    problems += [f"shape mismatch {k}: converted {got[k]} != model {want[k]}"
                 for k in sorted(want.keys() & got.keys()) if want[k] != got[k]]
    return problems


def download(urls, dest: str, quiet: bool = False) -> bool:
    """Fetch the first reachable URL to ``dest`` (atomic via .part)."""
    os.makedirs(os.path.dirname(dest), exist_ok=True)
    for url in urls:
        try:
            def hook(blocks, bs, total, _last=[-1]):
                if quiet or total <= 0:
                    return
                pct = min(100, blocks * bs * 100 // total)
                if pct != _last[0] and pct % 10 == 0:
                    _last[0] = pct
                    print(f"    {pct}% of {total / 2**20:.0f} MiB", flush=True)

            urllib.request.urlretrieve(url, dest + ".part", reporthook=hook)
            os.replace(dest + ".part", dest)
            return True
        except (urllib.error.URLError, OSError) as e:
            print(f"    {url}: {e}")
    return False


def main():
    from tortoise_tpu import weights as w

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*",
                    help="checkpoint families (default: all); 'fast' = the "
                         "fast-path set")
    ap.add_argument("--offline", action="store_true",
                    help="never touch the network; convert/verify local files")
    ap.add_argument("--src", default=w.TORCH_MODELS_DIR,
                    help="torch checkpoint cache ($TORTOISE_MODELS_DIR)")
    ap.add_argument("--dst", default=w.MODELS_DIR,
                    help="native checkpoint dir ($TORTOISE_TPU_MODELS_DIR)")
    ap.add_argument("--force", action="store_true",
                    help="re-download/re-convert even if files exist")
    args = ap.parse_args()

    names = list(w.TORCH_CHECKPOINTS)
    if args.names == ["fast"]:
        names = list(FAST_SET)
    elif args.names:
        unknown = set(args.names) - set(w.TORCH_CHECKPOINTS)
        if unknown:
            ap.error(f"unknown families {sorted(unknown)}; "
                     f"choose from {sorted(w.TORCH_CHECKPOINTS)}")
        names = args.names

    results = {}
    for name in names:
        fname = w.TORCH_CHECKPOINTS[name]
        torch_path = os.path.join(args.src, fname)
        npz_path = os.path.join(args.dst, f"{name}.npz")
        print(f"[{name}]")

        if not os.path.exists(torch_path) or (args.force and not args.offline):
            if args.offline:
                print(f"    no local {fname}, --offline: skipped")
                results[name] = "skipped (offline, no local file)"
                continue
            print(f"    downloading {fname} -> {torch_path}")
            if not download(URLS[fname], torch_path):
                print("    download failed (no egress?); skipped")
                results[name] = "skipped (download failed)"
                continue

        if args.force or not os.path.exists(npz_path):
            try:
                params = w.convert_from_torch(name, torch_path)
            except Exception as e:
                print(f"    convert FAILED: {type(e).__name__}: {e}")
                results[name] = f"convert failed: {e}"
                continue
            w.save_params(npz_path, params)
            print(f"    converted -> {npz_path}")
        else:
            params = w.load_params(npz_path)
            print(f"    already converted ({npz_path})")

        problems = verify_coverage(name, params)
        if problems:
            for p in problems[:12]:
                print(f"    VERIFY: {p}")
            if len(problems) > 12:
                print(f"    VERIFY: ... {len(problems) - 12} more")
            results[name] = f"verify failed ({len(problems)} problems)"
        else:
            n_params = sum(
                int(__import__('numpy').prod(getattr(v, 'shape', ())))
                for v in __import__('jax').tree_util.tree_leaves(params))
            print(f"    verified: full key+shape coverage ({n_params / 1e6:.1f}M params)")
            results[name] = "ok"

    print("\nsummary:")
    for name, status in results.items():
        print(f"  {name:20s} {status}")
    sys.exit(0 if all(v == "ok" or v.startswith("skipped") for v in results.values())
             else 1)


if __name__ == "__main__":
    main()
