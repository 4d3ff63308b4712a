"""Behavior pins for the clean-room spaCy-English rule tokenizer.

Each case is a documented behavior of spaCy's blank ``English()``
tokenizer (the reference's vocab tokenizer, CLIP-DDPM.py:132-142):
exception splits for contractions, affix peeling order, infix hyphen/
comma/period rules. The spaCy-gated corpus test in test_data.py is the
ground-truth check whenever spaCy is actually installed; these pins stop
regressions meanwhile.
"""

import pytest

from diffusion_image_captioning_tpu.data.spacy_en import tokenize
from diffusion_image_captioning_tpu.data import tokenizers as tk


CASES = [
    # exception splits (contractions)
    ("don't stop", ["do", "n't", "stop"]),
    ("Don't", ["Do", "n't"]),
    ("can't won't shan't ain't",
     ["ca", "n't", "wo", "n't", "sha", "n't", "ai", "n't"]),
    ("I'm happy, you're not.",
     ["I", "'m", "happy", ",", "you", "'re", "not", "."]),
    ("it's we've they'll he'd",
     ["it", "'s", "we", "'ve", "they", "'ll", "he", "'d"]),
    ("let's go", ["let", "'s", "go"]),
    ("cannot gonna gotta", ["can", "not", "gon", "na", "got", "ta"]),
    ("o'clock", ["o'clock"]),
    # curly-apostrophe variants split the same way
    ("don’t", ["do", "n’t"]),
    # 's possessive is a SUFFIX rule, not an exception
    ("the man's dog", ["the", "man", "'s", "dog"]),
    ("the dogs' toys", ["the", "dogs", "'", "toys"]),
    # infix hyphens: split between letters, kept next to digits
    ("a well-known artist", ["a", "well", "-", "known", "artist"]),
    ("the mid-1980s style", ["the", "mid-1980s", "style"]),
    # affix peeling, incl. exception check after prefix peel
    ("(can't)", ["(", "ca", "n't", ")"]),
    ('"Hello," she said.', ['"', "Hello", ",", '"', "she", "said", "."]),
    ("it costs $5.", ["it", "costs", "$", "5", "."]),
    # trailing period: splits after lowercase/digit, not inside U.S.
    ("the U.S. team", ["the", "U.S.", "team"]),
    ("at 5 p.m. today", ["at", "5", "p.m.", "today"]),
    # ellipses are one token
    ("wait... what?", ["wait", "...", "what", "?"]),
    ("so… yes", ["so", "…", "yes"]),
    # numbers stay whole
    ("1.5 km", ["1.5", "km"]),
    ("10,000 people", ["10,000", "people"]),
    # comma between letters is an infix
    ("red,green", ["red", ",", "green"]),
    # emoticons survive whole
    (":) <3", [":)", "<3"]),
    # unknown apostrophe forms stay single unsplit tokens (documented
    # residual-divergence class)
    ("rock'n'roll", ["rock'n'roll"]),
]


@pytest.mark.parametrize("text,want", CASES, ids=[c[0] for c in CASES])
def test_rule_pins(text, want):
    assert tokenize(text) == want


class TestWordTokenizeIntegration:
    def test_lowercases_after_split(self):
        assert tk.word_tokenize("Don't Stop!") == ["do", "n't", "stop", "!"]

    def test_vocab_counts_contraction_parts(self):
        caps = ["the dog can't run ."] * 11
        vocab = tk.build_caption_vocab(caps, min_freq=10)
        # split parts enter the vocab, the joined form does not
        assert "ca" in vocab and "n't" in vocab
        assert "can't" not in vocab

    def test_round1_regex_divergences_resolved(self):
        # the three divergence classes the round-1 docstring disclosed
        assert tk.word_tokenize("man's") == ["man", "'s"]
        assert tk.word_tokenize("mid-1980s") == ["mid-1980s"]
        assert tk.word_tokenize("<3 :)") == ["<3", ":)"]
