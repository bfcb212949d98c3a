"""wav2vec2-CTC audio<->text alignment and bracket redaction.

Behavioral equivalent of the reference aligner
(reference: tortoise/utils/wav2vec_alignment.py): a character-level DP
alignment of the expected text against the CTC argmax string, used to cut
``[bracketed]`` prompt-engineering spans out of the audio.

The DP (``max_alignment``) is reimplemented iteratively (the reference's
recursive memoized version blows the Python stack on long texts) and the
CTC acoustic model is pluggable: by default the HF torch checkpoint
``jbetker/wav2vec2-large-robust-ft-libritts-voxpopuli`` is loaded lazily
when available locally; tests inject a fake ``logits_fn``.
"""
from __future__ import annotations

from typing import Callable

import numpy as np


def max_alignment(s1: str, s2: str, skip_character: str = "~") -> str:
    """Align s1 to s2, replacing unmatched s1 characters with ``~``.

    Iterative LCS-style DP with the same tie-breaking as the reference
    (prefer consuming s2 when scores are equal, reference
    wav2vec_alignment.py:10-45).
    """
    assert skip_character not in s1, (
        f"Found the skip character {skip_character} in the provided string, {s1}")
    from tortoise_tpu import native

    if native.available():
        fast = native.align_dp(s1, s2, skip_character)
        if fast is not None:
            return fast
    n, m = len(s1), len(s2)
    if n == 0:
        return ""
    if m == 0:
        return skip_character * n
    if s1 == s2:
        return s1

    # score[i][j] = matched chars aligning s1[i:] with s2[j:]
    score = np.zeros((n + 1, m + 1), dtype=np.int32)
    for i in range(n - 1, -1, -1):
        for j in range(m - 1, -1, -1):
            if s1[i] == s2[j]:
                score[i, j] = 1 + score[i + 1, j + 1]
            else:
                score[i, j] = max(score[i, j + 1], score[i + 1, j])
    out = []
    i = j = 0
    while i < n:
        if j >= m:
            out.append(skip_character)
            i += 1
        elif s1[i] == s2[j]:
            out.append(s1[i])
            i += 1
            j += 1
        elif score[i, j + 1] > score[i + 1, j]:
            j += 1  # consume s2 (take_s1 branch in the reference)
        else:
            out.append(skip_character)
            i += 1
    return "".join(out)


# Tacotron symbol set used by the CTC tokenizer ('jbetker/tacotron-symbols'):
# pad '_' at 0, then punctuation, letters; space maps to its own symbol.
_TACOTRON_SYMBOLS = ["_", "-", "!", "'", "(", ")", ",", ".", ":", ";", "?", " "] + \
    list("abcdefghijklmnopqrstuvwxyz") + list("ABCDEFGHIJKLMNOPQRSTUVWXYZ")


class TacotronCTCTokenizer:
    """Character tokenizer with CTC decode (collapse repeats, drop blanks)."""

    def __init__(self, symbols=None):
        self.symbols = symbols or _TACOTRON_SYMBOLS
        self.sym_to_id = {s: i for i, s in enumerate(self.symbols)}

    UNK = -100  # never equals an argmax id; keeps token/char lists aligned

    def encode(self, text: str) -> list[int]:
        return [self.sym_to_id.get(c, self.UNK) for c in text]

    def decode(self, ids) -> str:
        out = []
        prev = None
        for i in ids:
            if i != prev and i != 0:
                out.append(self.symbols[i])
            prev = i
        return "".join(out)


class Wav2VecAlignment:
    """Audio<->text alignment via a CTC model (reference :48-150).

    ``logits_fn(audio_16k) -> (frames, vocab)`` supplies the acoustic model;
    the default lazily loads the HF torch checkpoint the reference uses.
    """

    def __init__(self, logits_fn: Callable | None = None, tokenizer=None):
        self._logits_fn = logits_fn
        self.tokenizer = tokenizer or TacotronCTCTokenizer()

    def _default_logits_fn(self):
        import torch
        from transformers import Wav2Vec2ForCTC

        model = Wav2Vec2ForCTC.from_pretrained(
            "jbetker/wav2vec2-large-robust-ft-libritts-voxpopuli").cpu().eval()

        def fn(audio_16k: np.ndarray) -> np.ndarray:
            with torch.no_grad():
                clip = torch.from_numpy(audio_16k[None].astype(np.float32))
                norm = (clip - clip.mean()) / torch.sqrt(clip.var() + 1e-7)
                return model(norm).logits[0].numpy()

        return fn

    def _logits(self, audio: np.ndarray, sample_rate: int) -> np.ndarray:
        from tortoise_tpu.utils.audio import resample

        audio16 = resample(np.asarray(audio, np.float32), sample_rate, 16000)
        if self._logits_fn is None:
            self._logits_fn = self._default_logits_fn()
        return self._logits_fn(audio16)

    def align(self, audio: np.ndarray, expected_text: str,
              audio_sample_rate: int = 24000) -> list[int]:
        """-> per-character sample offsets of expected_text within audio
        (reference :58-123)."""
        audio = np.asarray(audio)
        if audio.ndim > 1:
            audio = audio.reshape(-1)
        orig_len = audio.shape[-1]
        logits = self._logits(audio, audio_sample_rate)
        argmaxes = logits.argmax(-1)
        pred_string = self.tokenizer.decode(argmaxes.tolist())

        fixed_expectation = max_alignment(expected_text.lower(), pred_string)
        w2v_compression = orig_len // logits.shape[0]
        expected_tokens = self.tokenizer.encode(fixed_expectation)
        expected_chars = list(fixed_expectation)
        if len(expected_tokens) == 1:
            return [0]
        expected_tokens.pop(0)
        expected_chars.pop(0)

        alignments = [0]

        def pop_till_you_win():
            if len(expected_tokens) == 0:
                return None
            popped = expected_tokens.pop(0)
            popped_char = expected_chars.pop(0)
            while popped_char == "~":
                alignments.append(-1)
                if len(expected_tokens) == 0:
                    return None
                popped = expected_tokens.pop(0)
                popped_char = expected_chars.pop(0)
            return popped

        next_expected = pop_till_you_win()
        for i, top in enumerate(argmaxes):
            if next_expected == int(top):
                alignments.append(i * w2v_compression)
                if len(expected_tokens) > 0:
                    next_expected = pop_till_you_win()
                else:
                    break

        pop_till_you_win()
        if not (len(expected_tokens) == 0 and len(alignments) == len(expected_text)):
            np.savez("alignment_debug.npz", audio=audio, text=expected_text)
            raise AssertionError(
                "Something went wrong with the alignment algorithm. I've dumped a "
                "file, 'alignment_debug.npz' to your current working directory. "
                "Please report this along with the file so it can get fixed.")

        # Interpolate unmatched (-1) positions (reference :111-121).
        alignments.append(orig_len)
        for i in range(len(alignments)):
            if alignments[i] == -1:
                for j in range(i + 1, len(alignments)):
                    if alignments[j] != -1:
                        next_found = j
                        break
                for j in range(i, next_found):
                    gap = alignments[next_found] - alignments[i - 1]
                    alignments[j] = (j - i + 1) * gap // (next_found - i + 1) \
                        + alignments[i - 1]
        return alignments[:-1]

    def redact(self, audio: np.ndarray, expected_text: str,
               audio_sample_rate: int = 24000) -> np.ndarray:
        """Cut out the audio spans for [bracketed] text (reference :125-150)."""
        if "[" not in expected_text:
            return audio
        audio = np.asarray(audio)
        squeeze = audio.ndim == 1
        if squeeze:
            audio = audio[None]
        splitted = expected_text.split("[")
        fully_split = [splitted[0]]
        for spl in splitted[1:]:
            assert "]" in spl, 'Every "[" character must be paired with a "]" with no nesting.'
            fully_split.extend(spl.split("]"))

        non_redacted = []
        last_point = 0
        for i, part in enumerate(fully_split):
            if i % 2 == 0 and part != "":
                non_redacted.append((last_point, max(0, last_point + len(part) - 1)))
            last_point += len(part)

        bare_text = "".join(fully_split)
        alignments = self.align(audio.reshape(-1), bare_text, audio_sample_rate)

        out = [audio[:, alignments[s]:alignments[e]] for s, e in non_redacted]
        result = np.concatenate(out, axis=-1)
        return result[0] if squeeze else result
