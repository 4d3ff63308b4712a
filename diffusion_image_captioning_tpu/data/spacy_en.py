"""Clean-room implementation of spaCy's rule-based English tokenizer.

The reference builds its TRAIN_EMBEDDING vocabulary with the *blank*
English pipeline's tokenizer (CLIP-DDPM.py:132-141: ``from spacy.lang.en
import English; nlp = English()``, then ``x.text.lower() for x in
nlp.tokenizer(sentences)``). That tokenizer is a deterministic rule
engine — no model weights — whose algorithm and rule tables are publicly
documented (spaCy docs, "How tokenization works"):

  1. split the text on whitespace;
  2. for each chunk, repeatedly peel *prefix* punctuation off the front
     and *suffix* punctuation off the back (checking the exception table
     before each peel, so e.g. ``"(can't"`` still splits the exception);
  3. whatever remains is either an exception (emitted as its predefined
     sub-tokens: ``don't`` -> ``do`` + ``n't``) or is split on *infix*
     matches (hyphens between letters, commas between letters, ...).

This module reimplements that algorithm plus the English rule data
(contraction exceptions, punctuation affixes, infix rules) from the
documented behavior — no spaCy code is used or required. Fidelity
guards: ``tests/test_spacy_en.py`` pins the documented behaviors, and
``tests/test_data.py`` has a spaCy-gated corpus comparison plus
``scripts/vocab_diff.py`` that measure true divergence the moment spaCy
is installed. The exception table is the practical English set
(pronoun/auxiliary contractions, irregular n't forms, o'clock/cannot/
gonna-style fusions, title/month abbreviations, emoticons); exotic
entries absent here surface only as single unsplit tokens.

Only affects the TRAIN_EMBEDDING vocabulary path (SURVEY.md section 2.5);
the flagship WordPiece path never uses this.
"""

from __future__ import annotations

import re
from typing import Dict, List

# ---------------------------------------------------------------------------
# character classes (Latin coverage; spaCy's are Unicode-wide, captions are
# English — the extended-Latin ranges cover loanwords like "café")
# ---------------------------------------------------------------------------

_AL = "a-zß-öø-ÿ"  # lowercase letters
_AU = "A-ZÀ-ÖØ-Þ"  # uppercase letters
_A = _AL + _AU

_QUOTES = "'\"`´‘’‚‛“”„‟«»"
_PUNCT = r",:;!?¿؟¡()\[\]{}<>_#*&。？！，、；：～·"
_CURRENCY = r"\$£€¥¢₹₽"
_ELLIPSES = r"\.\.+|…"
_HYPHENS = r"-|–|—|--|---|~"
_UNITS = (
    "km|m|cm|mm|mi|ft|in|kg|g|mg|lb|lbs|oz|l|ml|gal|mph|kmh|km/h|mb|gb|kb|tb"
)

_PREFIX_RE = re.compile(
    "|".join(
        [
            _ELLIPSES,
            f"[{_PUNCT}]",
            f"[{_QUOTES}]",
            f"[{_CURRENCY}]",
            "[§%=—–]",
            r"\+(?![0-9])",
        ]
    )
)

# End-anchored UNION (the anchor sits outside the alternation, so the
# regex engine backtracks through alternatives at each start position —
# a bare finditer would let the quote alternative shadow "'s")
_SUFFIX_RE = re.compile(
    "(?:"
    + "|".join(
        [
            _ELLIPSES,
            f"[{_PUNCT}]",
            f"[{_QUOTES}]",
            "[—–]",
            "(?:'s|'S|’s|’S)",
            r"(?<=[0-9])\+",
            r"(?<=°[FfCcKk])\.",
            f"(?<=[0-9])[{_CURRENCY}]",
            f"(?<=[0-9])(?:{_UNITS})",
            # trailing period: after a digit, a lowercase letter, a quote,
            # or two uppercase letters ("US." splits, "U.S." does not)
            f"(?<=[0-9{_AL}{_QUOTES}])\\.",
            f"(?<=[{_AU}][{_AU}])\\.",
        ]
    )
    + ")$"
)

_INFIX_RE = re.compile(
    "|".join(
        [
            _ELLIPSES,
            r"(?<=[0-9])[+\-*^](?=[0-9\-])",
            f"(?<=[{_AL}{_QUOTES}])\\.(?=[{_AU}{_QUOTES}])",
            f"(?<=[{_A}]),(?=[{_A}])",
            f"(?<=[{_A}])(?:{_HYPHENS})(?=[{_A}])",
            f"(?<=[{_A}0-9])[:<>=/](?=[{_A}])",
        ]
    )
)


# ---------------------------------------------------------------------------
# exception table (chunk -> predefined sub-tokens)
# ---------------------------------------------------------------------------


def _title(s: str) -> str:
    return s[0].upper() + s[1:]


def _build_exceptions() -> Dict[str, List[str]]:
    exc: Dict[str, List[str]] = {}

    def add(form: str, parts: List[str]) -> None:
        """Register the lowercase form and its first-letter-capitalized
        variant (tokens are lowercased AFTER splitting by the vocab
        builder, but the split itself must fire for both spellings)."""
        exc[form] = parts
        exc[_title(form)] = [_title(parts[0])] + parts[1:]

    apos = ("'", "’")  # straight and curly apostrophe forms

    # pronoun + clitic contractions
    pron_clitics = {
        "i": ["'m", "'ma", "'ll", "'d", "'ve"],
        "you": ["'re", "'ll", "'d", "'ve"],
        "he": ["'s", "'ll", "'d"],
        "she": ["'s", "'ll", "'d"],
        "it": ["'s", "'ll", "'d"],
        "we": ["'re", "'ll", "'d", "'ve"],
        "they": ["'re", "'ll", "'d", "'ve"],
        "who": ["'s", "'re", "'ll", "'d", "'ve"],
        "what": ["'s", "'re", "'ll", "'ve"],
        "when": ["'s"],
        "where": ["'s", "'re", "'ve"],
        "why": ["'s", "'re"],
        "how": ["'s", "'re", "'d", "'ve"],
        "there": ["'s", "'re", "'d", "'ve"],
        "that": ["'s", "'ll", "'d"],
        "let": ["'s"],
    }
    for base, clitics in pron_clitics.items():
        for cl in clitics:
            for a in apos:
                add(base + cl.replace("'", a), [base, cl.replace("'", a)])

    # auxiliary verbs + n't (regular)
    nt_verbs = [
        "do", "does", "did", "had", "has", "have", "is", "are", "was",
        "were", "would", "could", "should", "might", "must", "need",
        "dare", "ought",
    ]
    for v in nt_verbs:
        for a in apos:
            add(f"{v}n{a}t", [v, f"n{a}t"])
    # irregular n't stems
    for whole, stem in [("can't", "ca"), ("won't", "wo"), ("shan't", "sha"),
                        ("ain't", "ai")]:
        for a in apos:
            add(whole.replace("'", a), [stem, f"n{a}t"])

    # fused colloquial forms
    add("cannot", ["can", "not"])
    add("gonna", ["gon", "na"])
    add("gotta", ["got", "ta"])
    for a in apos:
        exc[f"o{a}clock"] = [f"o{a}clock"]
        exc[f"O{a}clock"] = [f"O{a}clock"]
        add(f"y{a}all", [f"y{a}", "all"])
        add(f"c{a}mon", [f"c{a}mon"])

    # abbreviations kept whole (period retained)
    for ab in [
        "a.m.", "p.m.", "Mr.", "Mrs.", "Ms.", "Dr.", "Prof.", "St.",
        "Mt.", "Ave.", "Inc.", "Ltd.", "Co.", "Corp.", "Jr.", "Sr.",
        "vs.", "e.g.", "i.e.", "etc.",
        "Jan.", "Feb.", "Mar.", "Apr.", "Jun.", "Jul.", "Aug.", "Sep.",
        "Sept.", "Oct.", "Nov.", "Dec.",
    ]:
        exc[ab] = [ab]
        exc[ab.lower()] = [ab.lower()]

    # emoticons and symbol tokens kept whole
    for emo in [
        ":)", ":(", ":))", ":((", ":D", ":P", ":p", ":O", ":o", ":/",
        ":-)", ":-(", ":-D", ":-P", ";)", ";-)", ";(", "<3", "</3",
        ":'(", ":')", "=)", "=(", "^_^", "o.O", "O.o", "o_O", "xD", "XD",
    ]:
        exc[emo] = [emo]

    return exc


_EXC = _build_exceptions()


# ---------------------------------------------------------------------------
# the tokenizer algorithm
# ---------------------------------------------------------------------------


def _split_infixes(chunk: str) -> List[str]:
    out: List[str] = []
    pos = 0
    for m in _INFIX_RE.finditer(chunk):
        if m.start() > pos:
            out.append(chunk[pos : m.start()])
        if m.group(0):
            out.append(m.group(0))
        pos = m.end()
    if pos < len(chunk):
        out.append(chunk[pos:])
    return out or [chunk]


def _tokenize_chunk(chunk: str) -> List[str]:
    pre: List[str] = []
    post: List[str] = []
    while chunk:
        if chunk in _EXC:
            break
        m = _PREFIX_RE.match(chunk)
        if m and m.end() > 0:
            pre.append(chunk[: m.end()])
            chunk = chunk[m.end() :]
            continue
        if chunk in _EXC:
            break
        m = _SUFFIX_RE.search(chunk)
        if m is not None and m.start() > 0:
            post.append(chunk[m.start() :])
            chunk = chunk[: m.start()]
            continue
        break
    if not chunk:
        middle: List[str] = []
    elif chunk in _EXC:
        middle = list(_EXC[chunk])
    else:
        middle = _split_infixes(chunk)
    return pre + middle + post[::-1]


def tokenize(text: str) -> List[str]:
    """spaCy-English-rules tokenization of ``text`` (case preserved —
    the reference lowercases the resulting tokens, CLIP-DDPM.py:142)."""
    out: List[str] = []
    for chunk in text.split():
        out.extend(_tokenize_chunk(chunk))
    return out
