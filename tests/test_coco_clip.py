"""COCO data-path and CLIP vision-encoder tests (synthetic assets)."""

import json

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu.data import coco
from diffusion_image_captioning_tpu.models.clip import (
    CLIPVisionEncoder,
    preprocess_images,
)


@pytest.fixture(scope="module")
def coco_assets(tmp_path_factory):
    root = tmp_path_factory.mktemp("coco")
    img_dir = root / "val2014"
    img_dir.mkdir()
    from PIL import Image

    rng = np.random.default_rng(0)
    images, annotations = [], []
    for i in range(5):
        fn = f"img_{i}.jpg"
        # varied sizes to exercise resize-shortest-side + center crop
        w, h = int(rng.integers(60, 120)), int(rng.integers(60, 120))
        Image.fromarray(
            rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
        ).save(img_dir / fn)
        images.append({"id": i, "file_name": fn})
        for j in range(2):
            annotations.append(
                {"image_id": i, "caption": f"caption {i} variant {j}"}
            )
    ann = root / "captions.json"
    ann.write_text(json.dumps({"images": images, "annotations": annotations}))
    return str(img_dir), str(ann)


class TestCocoData:
    def test_read_captions(self, coco_assets):
        _, ann = coco_assets
        images, caps = coco.read_coco_captions(ann)
        assert len(images) == 5
        assert caps[0] == ["caption 0 variant 0", "caption 0 variant 1"]

    def test_iter_batches_fixed_shape(self, coco_assets):
        root, ann = coco_assets
        batches = list(coco.iter_coco_batches(root, ann, batch_size=2))
        # 5 images -> 3 batches; the ragged tail is ZERO-PADDED to the
        # static pixel shape while captions keep the true length, so all 5
        # images are scored (reference protocol: COCO_BLEU.py:265)
        assert len(batches) == 3
        for b in batches:
            assert b["pixels"].shape == (2, 224, 224, 3)
            assert b["pixels"].dtype == np.uint8
        assert [len(b["captions"]) for b in batches] == [2, 2, 1]
        assert (batches[-1]["pixels"][1] == 0).all()  # pad row

    def test_limit(self, coco_assets):
        root, ann = coco_assets
        batches = list(coco.iter_coco_batches(root, ann, batch_size=2, limit=2))
        assert len(batches) == 1


class TestCLIPVision:
    def test_tiny_encoder_shapes_and_norm(self):
        enc = CLIPVisionEncoder(
            image_size=32, patch_size=16, width=32, layers=2, heads=4,
            embed_dim=16, dtype=jnp.float32,
        )
        pix = jax.random.uniform(jax.random.PRNGKey(0), (3, 32, 32, 3))
        params = enc.init(jax.random.PRNGKey(1), pix)["params"]
        feats = enc.apply({"params": params}, pix)
        assert feats.shape == (3, 16)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(feats), axis=-1), 1.0, atol=1e-5
        )
        raw = enc.apply({"params": params}, pix, normalize=False)
        assert np.abs(np.linalg.norm(np.asarray(raw), axis=-1) - 1.0).max() > 1e-3

    def test_preprocess(self):
        u8 = jnp.zeros((1, 4, 4, 3), jnp.uint8)
        out = preprocess_images(u8)
        # zero pixels -> -mean/std
        expect = -np.asarray([0.48145466, 0.4578275, 0.40821073]) / np.asarray(
            [0.26862954, 0.26130258, 0.27577711]
        )
        np.testing.assert_allclose(np.asarray(out[0, 0, 0]), expect, rtol=1e-5)
