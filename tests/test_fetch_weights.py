"""tools/fetch_weights.py — the weight acquisition entry point.

Network fetches can't run here (zero egress); what IS testable offline is
the whole rest of the pipeline: URL-table completeness, graceful offline
skips, torch->npz conversion of a real reference-module checkpoint, and the
key+shape coverage verifier (both the pass and the catch-a-problem side).
"""
import os
import subprocess
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "tools"))

import fetch_weights
from tortoise_tpu import weights as weights_lib


def test_url_table_covers_every_checkpoint():
    # every family in the weights store has a download URL (reference
    # api.py:31-40 + api_fast.py:34-41 + the aligner hub repo)
    for name, fname in weights_lib.TORCH_CHECKPOINTS.items():
        assert fname in fetch_weights.URLS, f"no URL for {name} ({fname})"
        assert all(u.startswith("https://") for u in fetch_weights.URLS[fname])


def test_offline_mode_skips_gracefully(tmp_path):
    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(fetch_weights.__file__),
                                      "fetch_weights.py"),
         "--offline", "--src", str(tmp_path / "src"), "--dst", str(tmp_path / "dst"),
         "rlg_auto"],
        capture_output=True, text=True, timeout=120)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "skipped" in out.stdout


def test_convert_and_verify_real_checkpoint(tmp_path):
    """A reference-module rlg_auto .pth converts and passes full coverage."""
    torch = pytest.importorskip("torch")
    from ref_loader import load_ref_module

    ref_rlg = load_ref_module("tortoise.models.random_latent_generator")
    sd = ref_rlg.RandomLatentConverter(1024).state_dict()
    src = tmp_path / "src"
    src.mkdir()
    torch.save(sd, src / "rlg_auto.pth")

    out = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(fetch_weights.__file__),
                                      "fetch_weights.py"),
         "--offline", "--src", str(src), "--dst", str(tmp_path / "dst"),
         "rlg_auto"],
        capture_output=True, text=True, timeout=240)
    assert out.returncode == 0, out.stdout + out.stderr
    assert "verified: full key+shape coverage" in out.stdout
    assert (tmp_path / "dst" / "rlg_auto.npz").exists()


def test_verify_coverage_catches_problems():
    params = weights_lib.host_init(
        lambda: __import__("jax").eval_shape(
            lambda: fetch_weights._init_shape_tree("rlg_auto")))
    assert fetch_weights.verify_coverage("rlg_auto", params) == []

    broken = {k: v for k, v in params.items()}
    (first_key, first_val), = list(broken.items())[:1]
    del broken[first_key]
    broken["bogus"] = {"kernel": np.zeros((3, 3))}
    problems = fetch_weights.verify_coverage("rlg_auto", broken)
    assert any("missing key" in p for p in problems)
    assert any("unexpected key" in p for p in problems)
