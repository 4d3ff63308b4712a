"""CLIP text tower: BPE tokenizer vs HF, encoder geometry, HF numerical
parity for BOTH CLIP converters (text + vision) via a tiny random-init
CLIPModel saved locally (no downloads)."""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu.data import clip_bpe
from diffusion_image_captioning_tpu.models.clip import (
    CLIPTextEncoder,
    CLIPVisionEncoder,
    preprocess_images,
)


@pytest.fixture(scope="module")
def bpe_assets(tmp_path_factory):
    """Tiny-but-well-formed CLIP vocab.json + merges.txt."""
    d = tmp_path_factory.mktemp("clip_tok")
    be = clip_bpe.bytes_to_unicode()
    chars = [be[b] for b in range(256)]
    vocab = {}
    for c in chars:
        vocab[c] = len(vocab)
    for c in chars:
        vocab[c + "</w>"] = len(vocab)
    merges = [("t", "h"), ("th", "e</w>"), ("a", "n</w>"), ("o", "n</w>"), ("th", "e")]
    for a, b in merges:
        vocab.setdefault(a + b, len(vocab))
    vocab["<|startoftext|>"] = len(vocab)
    vocab["<|endoftext|>"] = len(vocab)
    (d / "vocab.json").write_text(json.dumps(vocab))
    (d / "merges.txt").write_text(
        "#version: 0.2\n" + "\n".join(f"{a} {b}" for a, b in merges) + "\n"
    )
    return str(d)


class TestBPE:
    def test_roundtrip(self, bpe_assets):
        tok = clip_bpe.from_hf_dir(bpe_assets)
        ids = tok.encode("the cat, on an   odd THE mat!")
        assert tok.decode(ids) == "the cat , on an odd the mat !"

    def test_matches_hf_clip_tokenizer(self, bpe_assets):
        transformers = pytest.importorskip("transformers")
        hf = transformers.CLIPTokenizer(
            os.path.join(bpe_assets, "vocab.json"),
            os.path.join(bpe_assets, "merges.txt"),
        )
        ours = clip_bpe.from_hf_dir(bpe_assets)
        for text in (
            "the cat sat on the mat",
            "an antelope, 42 zebras; THE end!",
            "on-device   text   features",
        ):
            assert ours.encode(text) == hf(text, add_special_tokens=False)[
                "input_ids"
            ], text


    def test_special_token_literal(self, bpe_assets):
        """A literal special in the input must map to its single id (OpenAI
        preloads specials in the BPE cache), not byte-level pieces."""
        tok = clip_bpe.from_hf_dir(bpe_assets)
        assert tok.encode("<|endoftext|>") == [tok.eos_id]
        assert tok.encode("the <|endoftext|>")[-1] == tok.eos_id

    def test_decode_strips_row_padding(self, bpe_assets):
        """__call__ rows are zero-padded; decode must drop the TRAILING pad
        run (vocab id 0 is a real token, so only the tail is stripped)."""
        tok = clip_bpe.from_hf_dir(bpe_assets)
        row = tok(["the"], context_length=12)[0]
        assert tok.decode(row) == "the"

    def test_batch_layout(self, bpe_assets):
        tok = clip_bpe.from_hf_dir(bpe_assets)
        arr = tok(["the", "the an on " * 40], context_length=16)
        assert arr.shape == (2, 16) and arr.dtype == np.int32
        assert arr[0, 0] == tok.bos_id and tok.eos_id in arr[0]
        assert arr[0][arr[0] != 0][-1] == tok.eos_id
        # truncated row still ends with EOS
        assert arr[1, -1] == tok.eos_id


class TestTextEncoder:
    def _tiny(self):
        return CLIPTextEncoder(
            vocab_size=64, context_length=12, width=32, layers=2, heads=4,
            embed_dim=16, dtype=jnp.float32,
        )

    def test_shapes_and_norm(self):
        enc = self._tiny()
        ids = jnp.asarray(
            [[62, 5, 6, 63, 0, 0, 0, 0, 0, 0, 0, 0],
             [62, 9, 9, 9, 9, 63, 0, 0, 0, 0, 0, 0]], jnp.int32
        )
        params = enc.init(jax.random.PRNGKey(0), ids)["params"]
        feats = enc.apply({"params": params}, ids)
        assert feats.shape == (2, 16)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5
        )

    def test_causal_padding_invariance(self):
        """Garbage AFTER the EOT position must not change the features —
        that is what makes zero-padding safe (causal attention + EOT pool)."""
        enc = self._tiny()
        ids_a = jnp.asarray([[62, 5, 6, 63, 0, 0, 0, 0, 0, 0, 0, 0]], jnp.int32)
        ids_b = jnp.asarray([[62, 5, 6, 63, 7, 8, 9, 1, 2, 3, 4, 5]], jnp.int32)
        params = enc.init(jax.random.PRNGKey(0), ids_a)["params"]
        fa = enc.apply({"params": params}, ids_a)
        fb = enc.apply({"params": params}, ids_b)
        np.testing.assert_allclose(np.asarray(fa), np.asarray(fb), atol=1e-5)


class TestHFClipParity:
    @pytest.fixture(scope="class")
    def hf_save(self, tmp_path_factory):
        transformers = pytest.importorskip("transformers")
        torch = pytest.importorskip("torch")
        cfg = transformers.CLIPConfig(
            text_config={
                "vocab_size": 64, "hidden_size": 32, "intermediate_size": 128,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "max_position_embeddings": 12, "hidden_act": "quick_gelu",
                # EOT = highest vocab id, as in the real CLIP vocab: makes
                # HF's eos-position pooling coincide with argmax pooling
                "bos_token_id": 62, "eos_token_id": 63,
            },
            vision_config={
                "hidden_size": 32, "intermediate_size": 128,
                "num_hidden_layers": 2, "num_attention_heads": 4,
                "image_size": 32, "patch_size": 16, "hidden_act": "quick_gelu",
            },
            projection_dim=16,
        )
        torch.manual_seed(0)
        m = transformers.CLIPModel(cfg)
        m.eval()
        d = tmp_path_factory.mktemp("clip_hf")
        m.save_pretrained(str(d))
        return str(d), m

    def test_text_parity(self, hf_save):
        torch = pytest.importorskip("torch")
        from diffusion_image_captioning_tpu.models.hf_convert import (
            apply_flat_updates,
            convert_clip_text,
        )

        d, m = hf_save
        enc = CLIPTextEncoder(
            vocab_size=64, context_length=12, width=32, layers=2, heads=4,
            embed_dim=16, dtype=jnp.float32,
        )
        ids = np.array(
            [[62, 5, 6, 63, 0, 0, 0, 0, 0, 0, 0, 0],
             [62, 1, 2, 3, 4, 5, 6, 7, 8, 9, 10, 63]], np.int32
        )
        params = enc.init(jax.random.PRNGKey(0), jnp.asarray(ids))["params"]
        params = apply_flat_updates(params, convert_clip_text(d, layers=2))
        ours = np.asarray(
            enc.apply({"params": params}, jnp.asarray(ids), normalize=False)
        )
        with torch.no_grad():
            theirs = m.get_text_features(input_ids=torch.tensor(ids.astype(np.int64)))
        np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-5)

    def test_vision_parity(self, hf_save):
        torch = pytest.importorskip("torch")
        from diffusion_image_captioning_tpu.models.hf_convert import (
            apply_flat_updates,
            convert_clip_vision,
        )

        d, m = hf_save
        enc = CLIPVisionEncoder(
            image_size=32, patch_size=16, width=32, layers=2, heads=4,
            embed_dim=16, dtype=jnp.float32,
        )
        pix = np.random.default_rng(0).uniform(0, 255, (2, 32, 32, 3)).astype(
            np.uint8
        )
        norm = preprocess_images(jnp.asarray(pix))
        params = enc.init(jax.random.PRNGKey(0), norm)["params"]
        params = apply_flat_updates(params, convert_clip_vision(d, layers=2))
        ours = np.asarray(enc.apply({"params": params}, norm, normalize=False))
        with torch.no_grad():
            theirs = m.get_image_features(
                pixel_values=torch.tensor(
                    np.asarray(norm).transpose(0, 3, 1, 2)
                )
            )
        np.testing.assert_allclose(ours, theirs.numpy(), atol=2e-5)
