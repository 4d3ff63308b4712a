"""Clean-room CLIP byte-pair-encoding tokenizer.

The reference's text CLIP features were produced off-pipeline by its
companion repo with the OpenAI CLIP tokenizer (lower-cased byte-level BPE,
vocab 49408, ``<|startoftext|>``/``<|endoftext|>`` specials, context 77 —
Radford et al. 2021). This is a dependency-light reimplementation that
loads the standard ``vocab.json`` + ``merges.txt`` pair from any local HF
``openai/clip-vit-base-patch32`` save, for use with
``models.clip.CLIPTextEncoder`` (scripts/extract_clip_features.py --captions
--texts mode).

Notes vs the OpenAI original: we skip the optional ``ftfy.fix_text`` pass
(not installed here; it only matters for mojibake inputs) and keep the
html-unescape + whitespace-clean + lowercase pipeline, the GPT-2
byte-to-unicode table, and the ``</w>`` end-of-word convention.
"""

from __future__ import annotations

import functools
import html
import json
import os
from typing import Iterable, List, Sequence

import numpy as np

try:  # full unicode classes when available (transformers ships `regex`)
    import regex as _re

    _PAT = _re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[\p{L}]+|[\p{N}]|[^\s\p{L}\p{N}]+",
        _re.IGNORECASE,
    )
except ImportError:  # pragma: no cover - ASCII-only fallback
    import re as _re

    _PAT = _re.compile(
        r"<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d"
        r"|[A-Za-z]+|[0-9]|[^\sA-Za-z0-9]+",
        _re.IGNORECASE,
    )


@functools.lru_cache()
def bytes_to_unicode() -> dict:
    """GPT-2's reversible byte -> printable-unicode-codepoint table."""
    bs = (
        list(range(ord("!"), ord("~") + 1))
        + list(range(ord("\xa1"), ord("\xac") + 1))
        + list(range(ord("\xae"), ord("\xff") + 1))
    )
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return dict(zip(bs, (chr(c) for c in cs)))


def _whitespace_clean(text: str) -> str:
    import re

    return re.sub(r"\s+", " ", text).strip()


def _get_pairs(word: Sequence[str]):
    pairs = set()
    prev = word[0]
    for ch in word[1:]:
        pairs.add((prev, ch))
        prev = ch
    return pairs


class CLIPBPETokenizer:
    """vocab.json + merges.txt -> encode() token-id lists / batch arrays."""

    def __init__(self, vocab_file: str, merges_file: str):
        with open(vocab_file, encoding="utf-8") as f:
            self.encoder: dict = json.load(f)
        self.decoder = {v: k for k, v in self.encoder.items()}
        with open(merges_file, encoding="utf-8") as f:
            lines = f.read().split("\n")
        # standard merges header ("#version: ...") then one merge per line
        merges = [
            tuple(line.split()) for line in lines
            if line and not line.startswith("#version") and len(line.split()) == 2
        ]
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.byte_encoder = bytes_to_unicode()
        self.byte_decoder = {v: k for k, v in self.byte_encoder.items()}
        self.bos_id = self.encoder.get("<|startoftext|>")
        self.eos_id = self.encoder.get("<|endoftext|>")
        self._cache: dict = {}

    def bpe(self, token: str) -> List[str]:
        if token in self._cache:
            return self._cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        if len(word) == 1:
            self._cache[token] = list(word)
            return list(word)
        pairs = _get_pairs(word)
        while True:
            bigram = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if bigram not in self.bpe_ranks:
                break
            first, second = bigram
            new_word: List[str] = []
            i = 0
            while i < len(word):
                try:
                    j = word.index(first, i)
                except ValueError:
                    new_word.extend(word[i:])
                    break
                new_word.extend(word[i:j])
                i = j
                if i < len(word) - 1 and word[i] == first and word[i + 1] == second:
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
            if len(word) == 1:
                break
            pairs = _get_pairs(word)
        out = list(word)
        self._cache[token] = out
        return out

    def encode(self, text: str) -> List[int]:
        """Text -> BPE ids (no specials, no padding)."""
        text = _whitespace_clean(html.unescape(html.unescape(text))).lower()
        ids: List[int] = []
        for tok in _PAT.findall(text):
            if tok in ("<|startoftext|>", "<|endoftext|>"):
                # literal specials map to their single id (OpenAI preloads
                # them in the BPE cache); byte-level merging would instead
                # encode them as ordinary pieces
                ids.append(self.encoder[tok])
                continue
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[piece] for piece in self.bpe(tok))
        return ids

    def decode(self, ids: Iterable[int]) -> str:
        """Specials are dropped; trailing zero-padding from __call__ rows is
        dropped too (vocab id 0 is the real token '!', so only the PADDING
        run is stripped, not literal '!' inside the text)."""
        ids = list(ids)
        while ids and ids[-1] == 0:
            ids.pop()
        text = "".join(self.decoder[i] for i in ids if i not in (self.bos_id, self.eos_id))
        data = bytearray(self.byte_decoder[c] for c in text)
        return data.decode("utf-8", errors="replace").replace("</w>", " ").strip()

    def __call__(self, texts: Sequence[str], context_length: int = 77) -> np.ndarray:
        """Batch encode: [B, context_length] int32, BOS + ids + EOS, zero
        padded; over-long inputs truncate with EOS forced last (OpenAI
        ``tokenize(truncate=True)`` behavior)."""
        out = np.zeros((len(texts), context_length), np.int32)
        for r, text in enumerate(texts):
            ids = [self.bos_id] + self.encode(text) + [self.eos_id]
            if len(ids) > context_length:
                ids = ids[:context_length]
                ids[-1] = self.eos_id
            out[r, : len(ids)] = ids
        return out


def from_hf_dir(tokenizer_dir: str) -> CLIPBPETokenizer:
    """Load from a local HF CLIP save (vocab.json + merges.txt)."""
    return CLIPBPETokenizer(
        os.path.join(tokenizer_dir, "vocab.json"),
        os.path.join(tokenizer_dir, "merges.txt"),
    )
