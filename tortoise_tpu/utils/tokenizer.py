"""Voice BPE tokenizer.

Behavioral equivalent of the reference ``VoiceBpeTokenizer``
(reference: tortoise/utils/tokenizer.py:172-194): clean text, replace spaces
with the ``[SPACE]`` symbol, then encode with a 255-symbol BPE vocabulary.

The vocabulary ships as ``tortoise_tpu/data/bpe_vocab.json`` (schema
``tortoise-tpu-bpe-v1``, produced by ``tools/convert_tokenizer.py``); a raw HF
``tokenizers`` json file is also accepted for drop-in compatibility.
"""
from __future__ import annotations

import json
import os

from tokenizers import Tokenizer
from tokenizers.models import BPE
from tokenizers.pre_tokenizers import Whitespace

from tortoise_tpu.utils.cleaners import basic_cleaners, english_cleaners

DEFAULT_VOCAB_FILE = os.path.join(os.path.dirname(os.path.realpath(__file__)), "..", "data", "bpe_vocab.json")

STOP_TEXT_TOKEN = 0  # [STOP]
UNK_TOKEN = 1        # [UNK]
SPACE_TOKEN = 2      # [SPACE]


def _build_tokenizer(vocab_file: str) -> Tokenizer:
    with open(vocab_file) as f:
        d = json.load(f)
    if d.get("schema") == "tortoise-tpu-bpe-v1":
        merges = [tuple(m.split(" ")) if isinstance(m, str) else tuple(m) for m in d["merges"]]
        tok = Tokenizer(BPE(vocab=d["vocab"], merges=merges, unk_token=d["unk_token"], fuse_unk=False))
        tok.pre_tokenizer = Whitespace()
        tok.add_special_tokens(d.get("special_tokens", []))
        return tok
    # Raw HF tokenizers json (same format the reference consumes).
    return Tokenizer.from_file(vocab_file)


class VoiceBpeTokenizer:
    def __init__(self, vocab_file: str | None = None, use_basic_cleaners: bool = False):
        self.tokenizer = _build_tokenizer(vocab_file or DEFAULT_VOCAB_FILE)
        self.preprocess_text = basic_cleaners if use_basic_cleaners else english_cleaners

    def vocab_size(self) -> int:
        return self.tokenizer.get_vocab_size()

    def encode(self, txt: str) -> list[int]:
        txt = self.preprocess_text(txt)
        txt = txt.replace(" ", "[SPACE]")
        return self.tokenizer.encode(txt).ids

    def decode(self, seq) -> str:
        seq = [int(s) for s in seq]
        txt = self.tokenizer.decode(seq, skip_special_tokens=False).replace(" ", "")
        txt = txt.replace("[SPACE]", " ")
        txt = txt.replace("[STOP]", "")
        txt = txt.replace("[UNK]", "")
        return txt
