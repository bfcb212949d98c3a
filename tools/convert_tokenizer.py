#!/usr/bin/env python
"""One-time converter: HF tokenizers BPE json -> tortoise_tpu vocab asset.

Extracts the 255-symbol BPE vocab + merge list from a reference
``tokenizer.json`` (reference: tortoise/data/tokenizer.json, consumed by
tortoise/utils/tokenizer.py:172-194) into this framework's own compact
schema. Usage:

    python tools/convert_tokenizer.py /root/reference/tortoise/data/tokenizer.json \
        tortoise_tpu/data/bpe_vocab.json
"""
import json
import sys


def convert(src: str, dst: str) -> None:
    with open(src) as f:
        d = json.load(f)
    model = d["model"]
    out = {
        "schema": "tortoise-tpu-bpe-v1",
        "unk_token": model.get("unk_token", "[UNK]"),
        "special_tokens": [t["content"] for t in d.get("added_tokens", [])],
        "vocab": model["vocab"],
        "merges": model["merges"],
    }
    with open(dst, "w") as f:
        json.dump(out, f, indent=1, sort_keys=True)
    print(f"wrote {dst}: {len(out['vocab'])} tokens, {len(out['merges'])} merges")


if __name__ == "__main__":
    convert(sys.argv[1], sys.argv[2])
