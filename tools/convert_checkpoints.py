#!/usr/bin/env python
"""Convert reference torch checkpoints -> native .npz param trees.

Usage:
    python tools/convert_checkpoints.py [--src ~/.cache/tortoise/models] \
        [--dst ~/.cache/tortoise_tpu/models] [names...]

Without names, converts every reference checkpoint found in --src
(reference: tortoise/api.py:31-40 lists the 8 shipped files, api_fast.py
adds hifidecoder.pth).
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    from tortoise_tpu import weights as w

    ap = argparse.ArgumentParser()
    ap.add_argument("names", nargs="*", default=[])
    ap.add_argument("--src", default=w.TORCH_MODELS_DIR)
    ap.add_argument("--dst", default=w.MODELS_DIR)
    args = ap.parse_args()

    names = args.names or list(w.TORCH_CHECKPOINTS)
    for name in names:
        torch_file = os.path.join(args.src, w.TORCH_CHECKPOINTS[name])
        if not os.path.exists(torch_file):
            print(f"skip {name}: {torch_file} not found")
            continue
        try:
            params = w.convert_from_torch(name, torch_file)
        except NotImplementedError as e:
            print(f"skip {name}: {e}")
            continue
        out = os.path.join(args.dst, f"{name}.npz")
        w.save_params(out, params)
        print(f"wrote {out}")


if __name__ == "__main__":
    main()
