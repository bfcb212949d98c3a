"""Sentence-aware text chunking for long-form synthesis.

Behavioral equivalent of the reference splitter
(reference: tortoise/utils/text.py:4-73): walk the text a character at a
time tracking quote state, record sentence-boundary split points, emit chunks
of roughly ``desired_length`` characters and force a split at ``max_length``
— backtracking to the last sentence boundary, or to a word boundary if no
sentence fits.
"""
from __future__ import annotations

import re


def split_and_recombine_text(text: str, desired_length: int = 200, max_length: int = 300) -> list[str]:
    text = re.sub(r"\n\n+", "\n", text)
    text = re.sub(r"\s+", " ", text)
    text = re.sub(r"[“”]", '"', text)

    chunks: list[str] = []
    in_quote = False
    current = ""
    split_pos: list[int] = []
    pos = -1
    end_pos = len(text) - 1

    def seek(delta: int) -> str:
        nonlocal pos, in_quote, current
        step = -1 if delta < 0 else 1
        for _ in range(abs(delta)):
            if step < 0:
                pos -= 1
                current = current[:-1]
            else:
                pos += 1
                current += text[pos]
            if text[pos] == '"':
                in_quote = not in_quote
        return text[pos]

    def peek(delta: int) -> str:
        p = pos + delta
        return text[p] if 0 <= p < end_pos else ""

    def commit() -> None:
        nonlocal current, split_pos
        chunks.append(current)
        current = ""
        split_pos = []

    while pos < end_pos:
        c = seek(1)
        if len(current) >= max_length:
            # Force a split: prefer the last sentence boundary if the chunk is
            # already reasonably long, else back up to a word boundary.
            if split_pos and len(current) > (desired_length / 2):
                seek(split_pos[-1] - pos)
            else:
                while c not in "!?.\n " and pos > 0 and len(current) > desired_length:
                    c = seek(-1)
            commit()
        elif not in_quote and (c in "!?\n" or (c == "." and peek(1) in "\n ")):
            # Swallow consecutive boundary markers (e.g. "?!?!", "...").
            while pos < len(text) - 1 and len(current) < max_length and peek(1) in "!?.":
                c = seek(1)
            split_pos.append(pos)
            if len(current) >= desired_length:
                commit()
        elif in_quote and peek(1) == '"' and peek(2) in "\n ":
            seek(2)
            split_pos.append(pos)
    chunks.append(current)

    chunks = [s.strip() for s in chunks]
    return [s for s in chunks if s and not re.match(r"^[\s\.,;:!?]*$", s)]
