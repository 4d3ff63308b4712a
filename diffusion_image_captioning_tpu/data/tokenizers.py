"""Tokenizers: a frequency-vocabulary word tokenizer and a WordPiece engine.

Two tokenizer families mirror the reference's (CLIP-DDPM.py:132-165, 181-188):

  * ``DictTokenizer`` over a caption-built vocabulary {START:0, END:1, UNK:2,
    PAD:3, word:...} keeping words with frequency > 10 — used by the
    TRAIN_EMBEDDING path. The reference tokenizes with spaCy's blank
    English rule tokenizer; ``word_tokenize`` delegates to
    ``data.spacy_en``, a clean-room implementation of that documented
    rule algorithm (contraction exceptions, affix peeling, infixes) with
    zero external deps.
  * ``WordPieceTokenizer``: a from-scratch BERT-style WordPiece encoder/
    decoder (greedy longest-match-first over a vocab.txt) that is drop-in
    compatible with HF's DistilBertTokenizer when given the same vocab file
    (CLIP-DDPM.py:205). Includes the exact fixed-length encode the reference
    relies on (pad/truncate to max_length with [CLS]/[SEP]) and an HF-style
    decode (## merge, special tokens kept) because the BLEU protocol is
    sensitive to that formatting (SURVEY.md section 2, fidelity note 8).
"""

from __future__ import annotations

import re
import unicodedata
from collections import Counter
from typing import Iterable, Sequence

import numpy as np

from diffusion_image_captioning_tpu.data.spacy_en import (
    tokenize as _spacy_en_tokenize,
)

def word_tokenize(text: str) -> list[str]:
    """The reference's per-caption tokenization (CLIP-DDPM.py:132-142:
    blank ``spacy.lang.en.English()`` tokenizer, then ``.lower()`` per
    token), via the clean-room rule engine in ``data.spacy_en``.

    Round 1 shipped a regex stand-in with documented divergences
    (contractions kept whole, digit-adjacent hyphens split, emoticons
    split per char); ``spacy_en`` now reproduces spaCy's documented
    behavior on all three classes (tests/test_spacy_en.py). Residual
    risk is exception-TABLE completeness, not algorithm: an exotic form
    missing from the table stays one unsplit token. The spaCy-gated
    corpus test (tests/test_data.py) and ``scripts/vocab_diff.py``
    quantify true divergence whenever spaCy + real captions appear.
    Only the TRAIN_EMBEDDING freq>10 vocab uses this path.
    """
    return [tok.lower() for tok in _spacy_en_tokenize(text)]


def split_sentences(tokens: list[str]) -> list[list[str]]:
    """Split a token stream on '.', dropping any trailing fragment without
    a period. BOTH behaviors are exact reference parity: its groupby split
    (CLIP-DDPM.py:143-147) keeps '.' attached to the preceding sentence AND
    its `spl[:-1]` discards the final element — the full last sentence when
    the caption lacks a trailing period (verified against the reference
    source; affects which words reach the freq>10 vocab)."""
    out: list[list[str]] = [[]]
    for tok in tokens:
        out[-1].append(tok)
        if tok == ".":
            out.append([])
    return out[:-1]


def build_caption_vocab(captions: Iterable[str], min_freq: int = 10) -> dict[str, int]:
    """{START:0, END:1, UNK:2, PAD:3, word: 4...} with freq > min_freq
    (CLIP-DDPM.py:149-155 — strictly greater)."""
    counter: Counter = Counter()
    for cap in captions:
        for sent in split_sentences(word_tokenize(cap)):
            counter.update(sent)
    vocab = {"START": 0, "END": 1, "UNK": 2, "PAD": 3}
    for word, freq in counter.items():
        if freq > min_freq:
            vocab[word] = len(vocab)
    return vocab


class DictTokenizer:
    """Minimal decode-capable tokenizer over a built vocabulary.

    Encoding follows the reference's TRAIN_EMBEDDING item path
    (CLIP-DDPM.py:184-188): START + units (UNK-mapped) truncated to
    max_length-2 + END, padded with UNK; attention mask covers the
    non-padding prefix.

    ``char_slice`` selects what a "unit" is. The reference slices the raw
    caption STRING — ``caption[:MAX_LENGTH-2]`` — and vocab-maps each
    CHARACTER (un-lowercased, spaces included), so nearly every unit is
    UNK; its trial_train_embedding/ logs were trained on that. False (the
    default) tokenizes into lowercased words with the same rule tokenizer
    the vocab build uses — the evident intent. Flag-gated per the
    project's quirk policy (docs/PARITY.md "DictTokenizer char-slice").
    """

    def __init__(self, vocab: dict[str, int], char_slice: bool = False):
        self.vocab = vocab
        self.inv = {v: k for k, v in vocab.items()}
        self.char_slice = char_slice

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def encode(self, text: str, max_length: int) -> tuple[np.ndarray, np.ndarray]:
        if self.char_slice:
            units: Sequence[str] = text[: max_length - 2]
        else:
            units = word_tokenize(text)[: max_length - 2]
        ids = [0] + [self.vocab.get(w, 2) for w in units] + [1]
        pad = max(0, max_length - len(ids))
        input_ids = np.asarray(ids + [2] * pad, np.int32)
        mask = np.asarray([1] * len(ids) + [0] * pad, np.int32)
        return input_ids[:max_length], mask[:max_length]

    def decode(self, ids: Sequence[int]) -> str:
        return " ".join(self.inv.get(int(i), "UNK") for i in ids)


# ---------------------------------------------------------------------------
# WordPiece
# ---------------------------------------------------------------------------

_PUNCT_CATEGORIES = ("P",)


def _is_punct(ch: str) -> bool:
    cp = ord(ch)
    if (33 <= cp <= 47) or (58 <= cp <= 64) or (91 <= cp <= 96) or (123 <= cp <= 126):
        return True
    return unicodedata.category(ch).startswith(_PUNCT_CATEGORIES)


# HF BasicTokenizer's _is_chinese_char blocks (all 8, not just the basic
# one — Extension A..F and the compatibility blocks split the same way)
_CJK_BLOCKS = (
    (0x4E00, 0x9FFF), (0x3400, 0x4DBF), (0x20000, 0x2A6DF),
    (0x2A700, 0x2B73F), (0x2B740, 0x2B81F), (0x2B820, 0x2CEAF),
    (0xF900, 0xFAFF), (0x2F800, 0x2FA1F),
)


def _is_cjk(cp: int) -> bool:
    return any(lo <= cp <= hi for lo, hi in _CJK_BLOCKS)


def _is_control(ch: str) -> bool:
    """HF _clean_text semantics: drop control/format chars (Cc/Cf) except
    the whitespace trio, plus NUL and U+FFFD."""
    if ch in ("\t", "\n", "\r"):
        return False
    if ch == "\x00" or ch == "�":
        return True
    return unicodedata.category(ch) in ("Cc", "Cf")


def basic_tokenize(text: str, lowercase: bool = True) -> list[str]:
    """BERT BasicTokenizer behavior: clean control chars, NFD-strip
    accents, lowercase, split on whitespace and around punctuation/CJK
    (all 8 of HF's _is_chinese_char blocks)."""
    text = unicodedata.normalize("NFD", text)
    out: list[str] = []
    buf: list[str] = []

    def flush():
        if buf:
            out.append("".join(buf))
            buf.clear()

    for ch in text:
        if _is_control(ch):
            continue  # HF _clean_text drops these before tokenizing
        if unicodedata.category(ch) == "Mn":
            continue  # strip accents
        if lowercase:
            ch = ch.lower()
        if ch.isspace():
            flush()
        elif _is_punct(ch) or _is_cjk(ord(ch)):
            flush()
            out.append(ch)
        else:
            buf.append(ch)
    flush()
    return out


class WordPieceTokenizer:
    """BERT-uncased-compatible WordPiece tokenizer (vocab.txt in, ids out).

    Special tokens follow the bert-base/distilbert-base-uncased convention:
    [PAD]=0, [UNK]=100, [CLS]=101, [SEP]=102 when using the stock vocab; the
    actual ids are looked up from the vocab so any vocab file works.
    """

    SPECIAL_TOKENS = ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]")

    def __init__(self, vocab: dict[str, int], lowercase: bool = True, max_chars: int = 100):
        self.vocab = vocab
        self.inv = {v: k for k, v in vocab.items()}
        self.lowercase = lowercase
        self.max_chars = max_chars
        self.pad_id = vocab.get("[PAD]", 0)
        self.unk_id = vocab.get("[UNK]", 0)
        self.cls_id = vocab.get("[CLS]", 0)
        self.sep_id = vocab.get("[SEP]", 0)
        # HF never splits/lowercases special tokens appearing IN text
        # (tokenize() pre-splits on all_special_tokens); mirror that.
        specials = [t for t in self.SPECIAL_TOKENS if t in vocab]
        self._special_re = (
            re.compile("(" + "|".join(re.escape(t) for t in specials) + ")")
            if specials
            else None
        )

    @classmethod
    def from_file(cls, path: str, **kw) -> "WordPieceTokenizer":
        vocab: dict[str, int] = {}
        with open(path, encoding="utf-8") as f:
            for i, line in enumerate(f):
                tok = line.rstrip("\n")
                if tok:
                    vocab[tok] = i
        return cls(vocab, **kw)

    @property
    def vocab_size(self) -> int:
        return len(self.vocab)

    def wordpiece(self, word: str) -> list[int]:
        if len(word) > self.max_chars:
            return [self.unk_id]
        ids: list[int] = []
        start = 0
        while start < len(word):
            end = len(word)
            cur = None
            while start < end:
                sub = word[start:end]
                if start > 0:
                    sub = "##" + sub
                if sub in self.vocab:
                    cur = self.vocab[sub]
                    break
                end -= 1
            if cur is None:
                return [self.unk_id]
            ids.append(cur)
            start = end
        return ids

    def tokenize_ids(self, text: str) -> list[int]:
        ids: list[int] = []
        chunks = (
            self._special_re.split(text) if self._special_re else [text]
        )
        for chunk in chunks:
            if self._special_re and self._special_re.fullmatch(chunk):
                ids.append(self.vocab[chunk])
                continue
            for word in basic_tokenize(chunk, self.lowercase):
                ids.extend(self.wordpiece(word))
        return ids

    def encode(self, text: str, max_length: int) -> tuple[np.ndarray, np.ndarray]:
        """[CLS] ids [SEP] padded/truncated to exactly max_length — HF's
        padding='max_length', truncation=True behavior (CLIP-DDPM.py:182)."""
        body = self.tokenize_ids(text)[: max_length - 2]
        ids = [self.cls_id] + body + [self.sep_id]
        n = len(ids)
        input_ids = np.full((max_length,), self.pad_id, np.int32)
        input_ids[:n] = ids
        mask = np.zeros((max_length,), np.int32)
        mask[:n] = 1
        return input_ids, mask

    # transformers.PreTrainedTokenizerBase.clean_up_tokenization, verbatim
    # semantics: the reference decodes with the (then-)default
    # clean_up_tokenization_spaces=True, and its run logs show the cleaned
    # bytes ("the ball. [SEP]", "don't") — so the cleanup IS part of the
    # contractual BLEU-candidate format (CLIP-DDPM.py:623).
    _CLEANUP = (
        (" .", "."), (" ?", "?"), (" !", "!"), (" ,", ","),
        (" ' ", "'"), (" n't", "n't"), (" 'm", "'m"), (" 's", "'s"),
        (" 've", "'ve"), (" 're", "'re"),
    )

    def decode(self, ids: Sequence[int]) -> str:
        """HF-style decode: wordpieces merged via '##', tokens joined by
        spaces, special tokens KEPT — the BLEU candidates depend on '[CLS]'
        '[SEP]' '[PAD]' appearing in the string (CLIP-DDPM.py:623-627) —
        and HF's tokenization-space cleanup applied (see _CLEANUP)."""
        toks = [self.inv.get(int(i), "[UNK]") for i in ids]
        out: list[str] = []
        for tok in toks:
            if tok.startswith("##") and out:
                out[-1] = out[-1] + tok[2:]
            else:
                out.append(tok)
        text = " ".join(out)
        for a, b in self._CLEANUP:
            text = text.replace(a, b)
        return text


def build_wordpiece_vocab(
    texts: Iterable[str], vocab_size: int = 8000, lowercase: bool = True
) -> dict[str, int]:
    """Tiny self-contained WordPiece-style vocab builder (whole words by
    frequency + single characters as continuation pieces). Not BPE-trained —
    its purpose is hermetic tests and the no-pretrained-assets path, where
    any consistent subword vocab works."""
    counter: Counter = Counter()
    chars: Counter = Counter()
    for t in texts:
        for w in basic_tokenize(t, lowercase):
            counter.update([w])
            chars.update(w)
    vocab: dict[str, int] = {}
    for tok in ("[PAD]", "[UNK]", "[CLS]", "[SEP]", "[MASK]"):
        vocab[tok] = len(vocab)
    for ch in sorted(chars):
        for piece in (ch, "##" + ch):
            if piece not in vocab:
                vocab[piece] = len(vocab)
    for w, _ in counter.most_common():
        if len(vocab) >= vocab_size:
            break
        if w not in vocab:
            vocab[w] = len(vocab)
    return vocab
