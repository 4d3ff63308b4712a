"""Text-only pipeline — the framework's minimum end-to-end slice.

Equivalent of the reference's lm-trial precursor (lm-trial/main.py:193-219):
a diffusion LM trained on a CSV of raw text with no CLIP conditioning
(BASELINE.json config #1). Deviation by design: the reference collates with
dynamic padding (lm-trial/main.py:205); TPU batches are padded to the static
``max_length`` so one compiled graph serves every batch.

The CSV schema is the "Don't Patronize Me" export bundled with the reference
(columns: par_id, keyword, country, text, label, orig_label); only ``text``
is consumed, NaN rows dropped (lm-trial/main.py:25-27).
"""

from __future__ import annotations

import csv
from typing import Optional

import numpy as np

from diffusion_image_captioning_tpu.data.tokenizers import (
    WordPieceTokenizer,
    build_wordpiece_vocab,
)


def read_text_column(path: str, column: str = "text") -> list[str]:
    out: list[str] = []
    with open(path, newline="", encoding="utf-8") as f:
        for row in csv.DictReader(f):
            t = row.get(column)
            if t:  # dropna()
                out.append(t)
    return out


def make_text_dataset(
    texts: list[str],
    max_length: int,
    tokenizer: Optional[WordPieceTokenizer] = None,
    vocab_size: int = 8000,
) -> tuple[dict, WordPieceTokenizer]:
    """Tokenize every row to fixed shape. Returns (columns, tokenizer).

    columns: input_ids [n, L] int32, attention_mask [n, L] int32, text list.
    """
    if tokenizer is None:
        tokenizer = WordPieceTokenizer(build_wordpiece_vocab(texts, vocab_size))
    n = len(texts)
    input_ids = np.zeros((n, max_length), np.int32)
    mask = np.zeros((n, max_length), np.int32)
    for i, t in enumerate(texts):
        input_ids[i], mask[i] = tokenizer.encode(t, max_length)
    return {"input_ids": input_ids, "attention_mask": mask, "text": texts}, tokenizer
