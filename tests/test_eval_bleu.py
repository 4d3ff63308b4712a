"""BLEU scorer tests against hand-computed values (Papineni et al. 2002
definition), plus the reference's formatting protocol."""

import math

import numpy as np
import pytest

from diffusion_image_captioning_tpu import eval_bleu as eb


class TestBleuCorpus:
    def test_perfect_match(self):
        c = [["a", "b", "c", "d", "e"]]
        r = [[["a", "b", "c", "d", "e"]]]
        assert eb.bleu_corpus(c, r) == pytest.approx(1.0)

    def test_no_fourgram_overlap_is_zero(self):
        c = [["a", "b", "c", "d"]]
        r = [[["a", "b", "c", "x"]]]
        assert eb.bleu_corpus(c, r) == 0.0

    def test_hand_computed_value(self):
        # candidate: "the cat sat on the mat" (6 tokens)
        # reference: "the cat sat on a mat"   (6 tokens)
        c = [["the", "cat", "sat", "on", "the", "mat"]]
        r = [[["the", "cat", "sat", "on", "a", "mat"]]]
        # 1-gram: matches the,cat,sat,on,mat(the clipped: ref has 1 'the') = 5/6
        # 2-gram: the-cat, cat-sat, sat-on, (on-the X), (the-mat X) = 3/5
        # 3-gram: the-cat-sat, cat-sat-on = 2/4
        # 4-gram: the-cat-sat-on = 1/3
        expect = math.exp(
            (math.log(5 / 6) + math.log(3 / 5) + math.log(2 / 4) + math.log(1 / 3)) / 4
        )
        assert eb.bleu_corpus(c, r) == pytest.approx(expect, rel=1e-9)

    def test_brevity_penalty(self):
        c = [["a", "b", "c", "d"]]
        r = [[["a", "b", "c", "d", "e", "f"]]]
        # precisions all 1 (clipped); BP = exp(1 - 6/4)
        assert eb.bleu_corpus(c, r) == pytest.approx(math.exp(1 - 6 / 4), rel=1e-9)

    def test_closest_ref_length_tie_prefers_shorter(self):
        c = [["a", "b", "c"]]  # len 3
        r = [[["a", "b"], ["a", "b", "c", "d"]]]  # lens 2 and 4, both |d|=1
        # chosen ref len = 2 -> cand longer -> BP = 1
        # 1g: a,b,c -> a,b clipped from ref1? max counts over refs: a1 b1 c1 d1 => 3/3
        # 2g: ab, bc -> ab(1), bc(1 from ref2) => 2/2; 3g: abc -> ref2 has abc => 1/1
        # 4g: none in candidate -> bleu = 0 (min num == 0)
        assert eb.bleu_corpus(c, r, max_n=3) == pytest.approx(1.0)

    def test_corpus_pooling(self):
        # two sentences pooled: counts add before the ratio
        c = [["a", "b"], ["c", "d"]]
        r = [[["a", "b"]], [["c", "x"]]]
        got = eb.bleu_corpus(c, r, max_n=2)
        # 1g: (2 + 1)/(2+2)=3/4 ; 2g: (1 + 0)/(1+1)=1/2 -> min num 1 ok
        expect = math.exp((math.log(3 / 4) + math.log(1 / 2)) / 2)
        assert got == pytest.approx(expect, rel=1e-9)


class TestAgainstNLTK:
    """Cross-validate against nltk.corpus_bleu — the algorithm torchmetrics
    BLEUScore (the reference's scorer, CLIP-DDPM.py:604-629) implements."""

    def _cases(self):
        rng = np.random.default_rng(0)
        vocab = ["a", "b", "c", "d", "e", "f", "g", "the", "dog", "ran"]
        cases = []
        for _ in range(8):
            cands, refs = [], []
            for _ in range(4):
                n = int(rng.integers(5, 12))
                cands.append(list(rng.choice(vocab, n)))
                rs = []
                for _ in range(int(rng.integers(1, 4))):
                    m = int(rng.integers(4, 13))
                    rs.append(list(rng.choice(vocab, m)))
                refs.append(rs)
            cases.append((cands, refs))
        return cases

    def test_matches_nltk_corpus_bleu(self):
        nltk_bleu = pytest.importorskip("nltk.translate.bleu_score")
        import warnings

        for cands, refs in self._cases():
            ours = eb.bleu_corpus(cands, refs)
            with warnings.catch_warnings():
                warnings.simplefilter("ignore")
                theirs = nltk_bleu.corpus_bleu(refs, cands)
            assert ours == pytest.approx(theirs, abs=1e-9), (cands, refs)


class TestProtocol:
    def test_format_references(self):
        out = eb.format_references(["A Dog runs. ", "Cat"])
        assert out == ["[CLS] a dog runs. [SEP]", "[CLS] cat [SEP]"]

    def test_flickr_batch_bleu_selfmatch(self):
        cands = ["[CLS] a dog runs fast today [SEP]"]
        refs = [["a dog runs fast today"]]
        # candidate == '[CLS] ' + ref + ' [SEP]' exactly
        assert eb.flickr_batch_bleu(cands, refs) == pytest.approx(1.0)

    def test_coco_tokens(self):
        toks = eb.coco_candidate_tokens("a dog.runs fast", 4)
        assert toks == ["a", "dog", "runs", "fast"]
        refs = eb.coco_reference_tokens(["A dog RUNS"], 16)
        assert refs == [["[CLS]", "a", "dog", "runs", "[SEP]"]]


class TestMultiDrawValBleu:
    def test_mean_sd_logged_and_draw0_matches_single(self, tmp_path):
        """cfg.bleu_draws > 1 repeats the from-noise val loop K times and
        logs mean ± sd; draw 0 reuses the single-draw key stream so the
        reference-exact protocol is a strict prefix (VERDICT r2 item 4)."""
        import io

        import jax

        from diffusion_image_captioning_tpu import pipeline
        from diffusion_image_captioning_tpu.data import Batcher
        from diffusion_image_captioning_tpu.data.synthetic import (
            synthetic_captions,
            synthetic_clip_features,
        )
        from diffusion_image_captioning_tpu.data.tokenizers import (
            WordPieceTokenizer,
            build_wordpiece_vocab,
        )
        from diffusion_image_captioning_tpu.data import flickr
        from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
        from tests.tiny import TINY

        cfg = TINY.replace(refine_steps_eval=2)
        imgs, caps = synthetic_captions(8)
        tok = WordPieceTokenizer(build_wordpiece_vocab(caps, cfg.vocab_size))
        cols = flickr.make_flickr_dataset(
            imgs, caps, synthetic_clip_features(8), synthetic_clip_features(8),
            tok, cfg.max_length,
        )
        idx = np.arange(8)
        model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
        gt = flickr.captions_by_image(imgs, caps)

        class Buf(io.StringIO):
            flush = lambda self: None  # noqa: E731

        single = Buf()
        s1 = pipeline.run_val_bleu(
            single, model, cfg, params,
            Batcher(cols, idx, cfg.batch_size, shuffle=False), tok, gt,
        )
        multi = Buf()
        s3 = pipeline.run_val_bleu(
            multi, model, cfg.replace(bleu_draws=3), params,
            Batcher(cols, idx, cfg.batch_size, shuffle=False), tok, gt,
        )
        txt = multi.getvalue()
        assert "BLEU-4 draws (n=3): mean" in txt and "sd" in txt
        assert txt.rstrip().rsplit("BLEU-4 score: ", 1)[1] == str(s3)
        # draw 0 of the multi run IS the single-draw protocol
        vals = txt.split("values [")[1].split("]")[0].split(", ")
        assert float(vals[0]) == pytest.approx(s1, abs=1e-6)
        # the contractual final line still ends WITHOUT a trailing newline
        assert not txt.endswith("\n")
