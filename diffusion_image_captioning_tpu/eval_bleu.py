"""BLEU-4 evaluation with the reference's exact candidate/reference protocol.

Two scorer entry points mirror the two references:

  * ``bleu_from_strings`` — torchmetrics ``BLEUScore()`` semantics
    (CLIP-DDPM.py:604-629): whitespace-tokenized corpus BLEU-4, computed per
    val batch and averaged over batches.
  * ``bleu_corpus`` — token-list corpus BLEU, the torchtext ``bleu_score``
    semantics used by the COCO evaluator (COCO_BLEU.py:261-263).

Both reduce to the same NLTK-style corpus BLEU: clipped n-gram precision up
to 4, geometric mean with uniform weights, brevity penalty against the
closest reference length (ties -> shorter). Implemented from the BLEU
definition (Papineni et al. 2002) in plain numpy — no torch anywhere.

Protocol fidelity helpers reproduce the quirky formatting BLEU scores depend
on (SURVEY.md section 2, fidelity note 8):
  * candidates keep special tokens and padding ('[CLS] a dog ... [SEP] [PAD]
    [PAD]'), after consecutive-duplicate token-id collapse;
  * references are all GT captions of the image as
    '[CLS] ' + caption.strip().lower() + ' [SEP]' (CLIP-DDPM.py:627).
"""

from __future__ import annotations

import math
import re
from collections import Counter
from typing import Sequence


def _ngrams(tokens: Sequence[str], n: int) -> Counter:
    return Counter(tuple(tokens[i : i + n]) for i in range(len(tokens) - n + 1))


def bleu_corpus(
    candidates: list[list[str]],
    references: list[list[list[str]]],
    max_n: int = 4,
) -> float:
    """Corpus BLEU over token lists. candidates[i] is a token list;
    references[i] is a list of token lists."""
    num = [0] * max_n
    den = [0] * max_n
    cand_len = 0
    ref_len = 0
    for cand, refs in zip(candidates, references):
        c = len(cand)
        cand_len += c
        # closest reference length; ties -> shorter
        ref_len += min((abs(len(r) - c), len(r)) for r in refs)[1]
        for n in range(1, max_n + 1):
            cn = _ngrams(cand, n)
            if not cn:
                continue
            max_ref = Counter()
            for r in refs:
                for g, k in _ngrams(r, n).items():
                    if k > max_ref[g]:
                        max_ref[g] = k
            num[n - 1] += sum(min(k, max_ref[g]) for g, k in cn.items())
            den[n - 1] += sum(cn.values())
    if min(num) == 0 or min(den) == 0:
        return 0.0
    log_p = sum(math.log(num[i] / den[i]) for i in range(max_n)) / max_n
    bp = 1.0 if cand_len > ref_len else math.exp(1.0 - ref_len / max(cand_len, 1))
    return bp * math.exp(log_p)


def bleu_from_strings(preds: list[str], targets: list[list[str]], max_n: int = 4) -> float:
    """torchmetrics BLEUScore()(preds, targets): whitespace tokenization."""
    return bleu_corpus(
        [p.split() for p in preds],
        [[t.split() for t in ts] for ts in targets],
        max_n=max_n,
    )


# ---------------------------------------------------------------------------
# Reference-protocol formatting
# ---------------------------------------------------------------------------


def format_references(captions: list[str]) -> list[str]:
    """'[CLS] ' + caption.strip().lower() + ' [SEP]' (CLIP-DDPM.py:627)."""
    return ["[CLS] " + c.strip().lower() + " [SEP]" for c in captions]


_COCO_SPLIT = re.compile(r"\.| ")


def coco_candidate_tokens(decoded: str, max_length: int) -> list[str]:
    """re.split('\\.| ', decode)[:MAX_LENGTH] (COCO_BLEU.py:259)."""
    return _COCO_SPLIT.split(decoded)[:max_length]


def coco_reference_tokens(captions: list[str], max_length: int) -> list[list[str]]:
    """['[CLS]'] + split(lower)[:MAX_LENGTH-2] + ['[SEP]'] (COCO_BLEU.py:261)."""
    return [
        ["[CLS]"] + _COCO_SPLIT.split(c.strip().lower())[: max_length - 2] + ["[SEP]"]
        for c in captions
    ]


def flickr_batch_bleu(
    decoded_candidates: list[str],
    per_image_captions: list[list[str]],
) -> float:
    """One val batch of the Flickr BLEU loop (CLIP-DDPM.py:623-629)."""
    return bleu_from_strings(
        decoded_candidates, [format_references(caps) for caps in per_image_captions]
    )
