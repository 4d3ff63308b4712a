"""WordPiece ⇄ HuggingFace tokenizer parity (VERDICT round-1 item 5).

The reference tokenizes with HF's DistilBertTokenizer loaded from a saved
vocab (CLIP-DDPM.py:205,329); our clean-room ``WordPieceTokenizer`` claims
drop-in compatibility given the same vocab.txt. BLEU parity on real Flickr
hinges on identical ids and decodes, so this suite instantiates HF's slow
(pure-Python, offline-safe) DistilBertTokenizer from the SAME vocab file
and asserts agreement on:

  * basic+wordpiece tokenization ids over corpus-like and fuzzed strings
    (punctuation, contractions, accents, CJK, long words, empty);
  * the fixed-length encode contract (padding='max_length',
    truncation=True — CLIP-DDPM.py:182): ids AND attention mask;
  * decode strings (special tokens kept, '##' pieces merged) — the BLEU
    candidate formatting depends on these bytes (CLIP-DDPM.py:623-627).
"""

import random
import string

import numpy as np
import pytest

transformers = pytest.importorskip("transformers")

from diffusion_image_captioning_tpu.data.tokenizers import (  # noqa: E402
    WordPieceTokenizer,
    build_wordpiece_vocab,
)

CORPUS = [
    "A young girl is running through the grassy field .",
    "Two dogs play fetch; one catches the ball!",
    "don't stop believin' — it's a mid-1980s classic",
    "the well-known photographer re-entered the room",
    "Ünïcödé café naïve résumé",  # accents strip under uncased rules
    "weird   whitespace\tand\nnewlines",
    "numbers 123 45.67 8,910 and $100",
    "ALL CAPS SENTENCE HERE",
    "trailing punctuation...",
    "[CLS] looks special but is plain text here",
    "日本語 mixed with english words",
    "x" * 120 + " overlong word becomes UNK",
    "",
    "a",
    "antidisestablishmentarianism fragmentation subword pieces",
    # control chars: HF _clean_text drops Cc/Cf (incl. \f and \v — NOT
    # whitespace splits: "a\fb" is ONE word) — round-2 review finding
    "stray\x01control\x02chars",
    "form\ffeed and vertical\vtab",
    "tab\tand\nnewline survive as splits",
    # CJK beyond the basic block: Extension A + compatibility ideographs
    "ext-a \u3400\u3401 compat \ufa00 mixed",
]


@pytest.fixture(scope="module")
def vocabs(tmp_path_factory):
    """One vocab.txt feeding BOTH tokenizers."""
    vocab = build_wordpiece_vocab(CORPUS, vocab_size=400)
    path = tmp_path_factory.mktemp("wp") / "vocab.txt"
    rows = [""] * (max(vocab.values()) + 1)
    for tok, i in vocab.items():
        rows[i] = tok
    path.write_text("\n".join(rows) + "\n", encoding="utf-8")
    ours = WordPieceTokenizer.from_file(str(path))
    hf = transformers.DistilBertTokenizer(vocab_file=str(path))
    return ours, hf


def _fuzz_strings(n=150, seed=7):
    rng = random.Random(seed)
    pools = [
        string.ascii_letters,
        string.digits,
        string.punctuation,
        " \t",
        "éüñàç",
        "日本語汉字",
    ]
    out = []
    for _ in range(n):
        length = rng.randint(0, 40)
        s = "".join(
            rng.choice(rng.choice(pools)) for _ in range(length)
        )
        out.append(s)
    return out


class TestTokenizeIds:
    @pytest.mark.parametrize("text", CORPUS)
    def test_corpus(self, vocabs, text):
        ours, hf = vocabs
        got = ours.tokenize_ids(text)
        ref = hf.convert_tokens_to_ids(hf.tokenize(text))
        assert got == ref, text

    def test_fuzzed(self, vocabs):
        ours, hf = vocabs
        for text in _fuzz_strings():
            got = ours.tokenize_ids(text)
            ref = hf.convert_tokens_to_ids(hf.tokenize(text))
            assert got == ref, repr(text)


class TestFixedLengthEncode:
    """The exact pad/truncate contract the dataset path uses
    (CLIP-DDPM.py:182: padding='max_length', truncation=True)."""

    @pytest.mark.parametrize("max_length", [6, 16])
    def test_ids_and_mask(self, vocabs, max_length):
        ours, hf = vocabs
        for text in CORPUS + _fuzz_strings(60, seed=11):
            ids, mask = ours.encode(text, max_length)
            enc = hf(
                text,
                padding="max_length",
                truncation=True,
                max_length=max_length,
            )
            np.testing.assert_array_equal(
                ids, np.asarray(enc["input_ids"], np.int32), err_msg=repr(text)
            )
            np.testing.assert_array_equal(
                mask,
                np.asarray(enc["attention_mask"], np.int32),
                err_msg=repr(text),
            )

    def test_special_token_ids_match(self, vocabs):
        ours, hf = vocabs
        assert ours.cls_id == hf.cls_token_id
        assert ours.sep_id == hf.sep_token_id
        assert ours.pad_id == hf.pad_token_id
        assert ours.unk_id == hf.unk_token_id


class TestDecode:
    def test_decode_matches_hf(self, vocabs):
        ours, hf = vocabs
        for text in CORPUS:
            ids, _ = ours.encode(text, 16)
            got = ours.decode(ids)
            # clean_up_tokenization_spaces pinned True: the reference-era
            # transformers default, visible in its run-log bytes
            # ("the ball. [SEP]"); newer transformers flip the default.
            ref = hf.decode(ids.tolist(), clean_up_tokenization_spaces=True)
            assert got == ref, repr(text)

    def test_roundtrip_unknown_id(self, vocabs):
        ours, _ = vocabs
        assert "[UNK]" in ours.decode([ours.unk_id])
