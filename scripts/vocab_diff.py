#!/usr/bin/env python
"""Vocab-diff harness: regex word_tokenize vs spaCy English tokenization.

The reference builds its TRAIN_EMBEDDING vocabulary with spaCy
(CLIP-DDPM.py:132-155: tokenize every Flickr caption, split on '.', keep
words with freq>10); our ``data.tokenizers.word_tokenize`` is a regex
stand-in because spaCy isn't installed in the build environment. This
script quantifies the divergence whenever spaCy AND real caption data are
available:

    python scripts/vocab_diff.py /path/to/captions.txt [--min_freq 10]

It prints (a) token-level disagreement rate over the corpus, (b) the
vocab entries unique to each side, and (c) the net effect on vocab size —
the exact evidence needed to judge DictTokenizer fidelity (VERDICT round-1
item 9 / SURVEY section 2.5).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from collections import Counter  # noqa: E402

from diffusion_image_captioning_tpu.data.tokenizers import (  # noqa: E402
    build_caption_vocab,
    split_sentences,
    word_tokenize,
)


def spacy_tokenize(nlp, text: str) -> list[str]:
    """The reference's per-caption tokenization (CLIP-DDPM.py:139-141):
    spaCy tokens, lowercased."""
    return [t.text.lower() for t in nlp(text)]


def build_vocab_with(tokenize, captions, min_freq: int) -> dict[str, int]:
    counter: Counter = Counter()
    for cap in captions:
        for sent in split_sentences(tokenize(cap)):
            counter.update(sent)
    vocab = {"START": 0, "END": 1, "UNK": 2, "PAD": 3}
    for word, freq in counter.items():
        if freq > min_freq:
            vocab[word] = len(vocab)
    return vocab


def read_captions(path: str) -> list[str]:
    from diffusion_image_captioning_tpu.data.flickr import read_captions_csv

    _, caps = read_captions_csv(path)
    return caps


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("captions", help="Flickr-style captions CSV/TXT")
    p.add_argument("--min_freq", type=int, default=10)
    p.add_argument("--max_examples", type=int, default=20)
    args = p.parse_args()

    try:
        import spacy
    except ImportError:
        raise SystemExit(
            "spaCy is not installed — this harness exists to run in an "
            "environment that has it (pip install spacy && python -m spacy "
            "download en_core_web_sm)."
        )
    try:
        nlp = spacy.load("en_core_web_sm", disable=["parser", "ner", "tagger"])
    except OSError:
        raise SystemExit("spaCy model en_core_web_sm is not downloaded.")

    caps = read_captions(args.captions)
    print(f"{len(caps)} captions from {args.captions}")

    diff_caps = 0
    examples = []
    for cap in caps:
        ours = word_tokenize(cap)
        ref = spacy_tokenize(nlp, cap)
        if ours != ref:
            diff_caps += 1
            if len(examples) < args.max_examples:
                examples.append((cap, ours, ref))
    print(
        f"token-level disagreement: {diff_caps}/{len(caps)} captions "
        f"({100.0 * diff_caps / max(len(caps), 1):.2f}%)"
    )
    for cap, ours, ref in examples:
        print(f"  caption: {cap!r}\n    regex: {ours}\n    spacy: {ref}")

    v_ours = build_caption_vocab(caps, min_freq=args.min_freq)
    v_ref = build_vocab_with(
        lambda t: spacy_tokenize(nlp, t), caps, args.min_freq
    )
    only_ours = sorted(set(v_ours) - set(v_ref))
    only_ref = sorted(set(v_ref) - set(v_ours))
    print(f"vocab sizes: regex {len(v_ours)} vs spacy {len(v_ref)}")
    print(f"entries only in regex vocab ({len(only_ours)}): {only_ours}")
    print(f"entries only in spacy vocab ({len(only_ref)}): {only_ref}")


if __name__ == "__main__":
    main()
