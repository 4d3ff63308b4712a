"""Native/Python parity tests for the C++ WordPiece batch encoder."""

import numpy as np
import pytest

from diffusion_image_captioning_tpu.data.tokenizers import (
    WordPieceTokenizer,
    build_wordpiece_vocab,
)
from diffusion_image_captioning_tpu.utils import native


@pytest.fixture(scope="module")
def tok():
    texts = [
        "A man riding a horse.",
        "two dogs running on grass!",
        "the quick brown fox jumps over the lazy dog",
        "children playing soccer in a park",
    ]
    return WordPieceTokenizer(build_wordpiece_vocab(texts, vocab_size=400)), texts


def test_native_builds(tok):
    if native.load() is None:
        pytest.skip("g++ unavailable")


def test_parity_with_python(tok):
    t, texts = tok
    if native.load() is None:
        pytest.skip("g++ unavailable")
    nat = native.NativeWordPiece(t.vocab)
    more = texts + ["UNSEEN wordform zzzqqq", "punct,separated.words", ""]
    ids_n, mask_n = nat.encode_batch(more, 16)
    for i, s in enumerate(more):
        ids_p, mask_p = t.encode(s, 16)
        np.testing.assert_array_equal(ids_n[i], ids_p, err_msg=f"ids for {s!r}")
        np.testing.assert_array_equal(mask_n[i], mask_p, err_msg=f"mask for {s!r}")


def test_encode_batch_fallback_path(tok):
    t, texts = tok
    ids, mask = native.encode_batch(t, texts, 12)
    assert ids.shape == (4, 12)
    ids0, mask0 = t.encode(texts[0], 12)
    np.testing.assert_array_equal(ids[0], ids0)


def test_special_token_texts_use_python_path(tok):
    """tokenize_ids keeps special tokens in text whole (HF behavior); the
    C++ basic_tokenize splits them. _native_ok must therefore refuse such
    texts so engine choice never changes ids (round-2 review finding)."""
    t, _ = tok
    texts = ["a photo of [SEP] marker", "clean caption"]
    assert not native._native_ok(t, texts)
    ids, mask = native.encode_batch(t, texts, max_length=12)
    for i, s in enumerate(texts):
        want_ids, want_mask = t.encode(s, 12)
        np.testing.assert_array_equal(ids[i], want_ids)
        np.testing.assert_array_equal(mask[i], want_mask)
    # and the clean batch still qualifies for the native engine
    assert native._native_ok(t, ["a clean caption"])


def test_engine_cache_single_entry_rebuilds(tok):
    """The single-entry cache must rebuild on a different vocab object and
    not serve ids from a previously cached one."""
    if native.load() is None:
        pytest.skip("g++ unavailable")
    t, texts = tok
    native.encode_batch(t, texts[:1], max_length=12)
    t2 = WordPieceTokenizer(dict(t.vocab))  # equal content, new object
    ids, _ = native.encode_batch(t2, texts[:1], max_length=12)
    want, _ = t2.encode(texts[0], 12)
    np.testing.assert_array_equal(ids[0], want)
    assert native._engine_cache is not None
    assert native._engine_cache[0] is t2.vocab


def test_control_char_parity(tok):
    """HF _clean_text drops control chars; both engines must agree —
    including \f/\v being DROPPED (one word), not whitespace splits."""
    if native.load() is None:
        pytest.skip("g++ unavailable")
    t, _ = tok
    texts = ["stray\x01control\x02chars", "form\ffeed one\vword", "del\x7fchar"]
    assert native._native_ok(t, texts)
    ids, mask = native.encode_batch(t, texts, max_length=12)
    for i, s in enumerate(texts):
        want_ids, want_mask = t.encode(s, 12)
        np.testing.assert_array_equal(ids[i], want_ids)
        np.testing.assert_array_equal(mask[i], want_mask)
