"""Loader for the native (C++) host-side components.

Builds native/wordpiece.cpp into a shared object on first use (g++ -O3) and
exposes it via ctypes. Every entry point has a pure-Python fallback — the
native path is a performance optimization of identical behavior, enforced by
parity tests (tests/test_native.py).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading
from typing import Optional

import numpy as np

_REPO = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
_SRC = os.path.join(_REPO, "native", "wordpiece.cpp")
_SO = os.path.join(_REPO, "native", "libwordpiece.so")
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_build_failed = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-std=c++17", "-shared", "-fPIC", _SRC, "-o", _SO],
            check=True,
            capture_output=True,
            timeout=300,
        )
        return True
    except Exception:
        return False


def load() -> Optional[ctypes.CDLL]:
    """The shared library, building it if needed; None if unavailable."""
    global _lib, _build_failed
    with _lock:
        if _lib is not None:
            return _lib
        if _build_failed:
            return None
        have_src = os.path.exists(_SRC)
        stale = (
            not os.path.exists(_SO)
            or (have_src and os.path.getmtime(_SO) < os.path.getmtime(_SRC))
        )
        if stale:
            # a prebuilt .so with no source is still usable; only rebuild
            # when the source exists and is newer
            if not have_src or not _build():
                _build_failed = True
                return None
        lib = ctypes.CDLL(_SO)
        lib.wp_create.restype = ctypes.c_void_p
        lib.wp_create.argtypes = [ctypes.c_char_p]
        lib.wp_free.argtypes = [ctypes.c_void_p]
        lib.wp_encode_batch.argtypes = [
            ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_char_p),
            ctypes.c_int32,
            ctypes.c_int32,
            ctypes.POINTER(ctypes.c_int32),
            ctypes.POINTER(ctypes.c_int32),
        ]
        _lib = lib
        return _lib


class NativeWordPiece:
    """ctypes wrapper with the same encode contract as
    data.tokenizers.WordPieceTokenizer (ASCII corpora)."""

    def __init__(self, vocab: dict[str, int]):
        lib = load()
        if lib is None:
            raise RuntimeError("native wordpiece unavailable")
        self._lib = lib
        size = max(vocab.values()) + 1
        rows = [""] * size
        for tok, i in vocab.items():
            rows[i] = tok
        blob = "\n".join(rows).encode("utf-8")
        self._handle = lib.wp_create(blob)

    def __del__(self):
        try:
            if getattr(self, "_handle", None):
                self._lib.wp_free(self._handle)
        except Exception:
            pass

    def encode_batch(self, texts: list[str], max_length: int):
        if max_length < 2:
            # the C++ side unconditionally writes CLS/SEP; smaller rows
            # would corrupt the output buffer
            raise ValueError("max_length must be >= 2")
        n = len(texts)
        ids = np.empty((n, max_length), np.int32)
        mask = np.empty((n, max_length), np.int32)
        arr = (ctypes.c_char_p * n)(*[t.encode("utf-8") for t in texts])
        self._lib.wp_encode_batch(
            self._handle,
            arr,
            n,
            max_length,
            ids.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            mask.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        )
        return ids, mask


# Single-entry engine cache holding (vocab, engine). Storing the vocab
# object keeps it alive and makes the ``is`` identity check sound (a bare
# id() key could collide with a recycled dict address — round-1 advisor
# finding); a SINGLE entry bounds memory (an id-keyed dict of strong refs
# would pin every vocab ever seen). Real pipelines use one tokenizer;
# alternating tokenizers just rebuild the engine (~ms for BERT vocab).
_engine_cache: tuple[dict, "NativeWordPiece"] | None = None


def _native_ok(tokenizer, texts) -> bool:
    """The C++ engine implements exactly the lowercase=True / max_chars=100
    / ASCII configuration — and, unlike WordPieceTokenizer.tokenize_ids,
    it does NOT keep special tokens appearing in text whole. Refuse
    silently-divergent inputs: the engine picked must never depend on
    toolchain presence AND input content giving different ids."""
    if not (tokenizer.lowercase and tokenizer.max_chars == 100):
        return False
    specials = tuple(
        t for t in tokenizer.SPECIAL_TOKENS if t in tokenizer.vocab
    )
    return all(
        t.isascii() and not any(s in t for s in specials) for t in texts
    )


def encode_batch(tokenizer, texts: list[str], max_length: int):
    """Batch-encode with the native engine when it matches the tokenizer's
    exact configuration (ASCII text, lowercase, default max_chars), else
    the Python tokenizer. ``tokenizer`` is a
    data.tokenizers.WordPieceTokenizer."""
    if max_length >= 2 and _native_ok(tokenizer, texts):
        try:
            global _engine_cache
            vocab = tokenizer.vocab
            if _engine_cache is None or _engine_cache[0] is not vocab:
                _engine_cache = (vocab, NativeWordPiece(vocab))
            return _engine_cache[1].encode_batch(texts, max_length)
        except Exception:
            pass
    n = len(texts)
    ids = np.zeros((n, max_length), np.int32)
    mask = np.zeros((n, max_length), np.int32)
    for i, t in enumerate(texts):
        ids[i], mask[i] = tokenizer.encode(t, max_length)
    return ids, mask
