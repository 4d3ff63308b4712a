"""Model-layer tests: encoder invariants, fusion math, CFG mixing, variants.

Expected behaviors come from the documented reference contract
(SURVEY.md sections 2.7, 3.2) — recomputed by hand here, never from
reference code."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu.models import fusion
from diffusion_image_captioning_tpu.models.denoiser import init_denoiser, param_labels
from diffusion_image_captioning_tpu.models.distilbert import mha_reference
from tests.tiny import TINY


@pytest.fixture(scope="module")
def model_and_params():
    return init_denoiser(TINY, jax.random.PRNGKey(0))


def _inputs(n=4, key=7):
    x = jax.random.normal(jax.random.PRNGKey(key), (n, TINY.max_length, TINY.dim))
    clip = jax.random.normal(jax.random.PRNGKey(key + 1), (n, 1, TINY.clip_dim))
    mask = jnp.ones((n, TINY.max_length))
    cmask = jnp.tile(jnp.asarray([1.0, 0.0]), (n, 1))
    return x, clip, mask, cmask


class TestMHAReference:
    def test_matches_numpy(self):
        N, H, L, dh = 2, 2, 5, 4
        q = jax.random.normal(jax.random.PRNGKey(0), (N, H, L, dh))
        k = jax.random.normal(jax.random.PRNGKey(1), (N, H, L, dh))
        v = jax.random.normal(jax.random.PRNGKey(2), (N, H, L, dh))
        mask = jnp.ones((N, L))
        out = mha_reference(q, k, v, mask)
        qn, kn, vn = map(np.asarray, (q, k, v))
        s = np.einsum("nhqd,nhkd->nhqk", qn, kn) / np.sqrt(dh)
        p = np.exp(s - s.max(-1, keepdims=True))
        p /= p.sum(-1, keepdims=True)
        np.testing.assert_allclose(
            np.asarray(out), np.einsum("nhqk,nhkd->nhqd", p, vn), atol=1e-5
        )

    def test_masked_keys_ignored(self):
        """Padding-masked keys must not influence attention output."""
        N, H, L, dh = 1, 1, 4, 4
        q = jax.random.normal(jax.random.PRNGKey(0), (N, H, L, dh))
        k = jax.random.normal(jax.random.PRNGKey(1), (N, H, L, dh))
        v = jax.random.normal(jax.random.PRNGKey(2), (N, H, L, dh))
        mask = jnp.asarray([[1.0, 1.0, 0.0, 0.0]])
        out1 = mha_reference(q, k, v, mask)
        k2 = k.at[:, :, 2:].set(99.0)
        v2 = v.at[:, :, 2:].set(-99.0)
        out2 = mha_reference(q, k2, v2, mask)
        np.testing.assert_allclose(np.asarray(out1), np.asarray(out2), atol=1e-5)


class TestFusion:
    def test_concat_layout(self):
        x, clip, mask, _ = _inputs()
        img = jnp.ones((4, 1, TINY.dim))
        txt = 2 * jnp.ones((4, 1, TINY.dim))
        seg = jnp.zeros((2, TINY.dim)).at[1].set(5.0)
        f = fusion.fuse_concat(x, img, txt, mask, seg)
        assert f.unguided_x.shape == (4, TINY.max_length + 2, TINY.dim)
        # appended tokens carry projected clip + segment-1 embedding
        np.testing.assert_allclose(np.asarray(f.unguided_x[:, -2]), 1.0 + 5.0)
        np.testing.assert_allclose(np.asarray(f.unguided_x[:, -1]), 2.0 + 5.0)
        # text positions get segment-0 (zero here)
        np.testing.assert_allclose(
            np.asarray(f.unguided_x[:, : TINY.max_length]), np.asarray(x), atol=1e-6
        )
        # mask extension: [1,1] guided, [1,0] unguided (CLIP-DDPM.py:296-297)
        np.testing.assert_array_equal(np.asarray(f.guided_mask[:, -2:]), 1.0)
        np.testing.assert_array_equal(
            np.asarray(f.unguided_mask[:, -2:]), np.tile([1.0, 0.0], (4, 1))
        )

    def test_add_fusion(self):
        x, clip, mask, _ = _inputs()
        img = jnp.ones((4, 1, TINY.dim))
        txt = 2 * jnp.ones((4, 1, TINY.dim))
        f = fusion.fuse_add(x, img, txt, mask)
        np.testing.assert_allclose(np.asarray(f.unguided_x), np.asarray(x) + 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(f.guided_x), np.asarray(x) + 3.0, atol=1e-6)
        assert f.unguided_mask.shape == mask.shape

    def test_cfg_mix(self):
        """(1+w)*guided - w*unguided on flagged rows only (CLIP-DDPM.py:315-317)."""
        u = jnp.ones((3, 2, 2))
        g = 2 * jnp.ones((3, 2, 2))
        rows = jnp.asarray([1.0, 0.0, 1.0])
        out = fusion.cfg_mix(u, g, rows, 0.5)
        expect = 1.5 * 2 - 0.5 * 1
        np.testing.assert_allclose(np.asarray(out[0]), expect, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[1]), 1.0, atol=1e-6)
        np.testing.assert_allclose(np.asarray(out[2]), expect, atol=1e-6)


class TestDenoiser:
    def test_shapes_concat(self, model_and_params):
        model, params = model_and_params
        x, clip, mask, cmask = _inputs()
        out = model.apply({"params": params}, x, clip, clip, mask, cmask)
        assert out.logits.shape == (4, TINY.max_length, TINY.vocab_size)
        assert out.hidden.shape == (4, TINY.max_length + 2, TINY.dim)
        assert out.logits.dtype == jnp.float32

    def test_deterministic(self, model_and_params):
        model, params = model_and_params
        x, clip, mask, cmask = _inputs()
        a = model.apply({"params": params}, x, clip, clip, mask, cmask)
        b = model.apply({"params": params}, x, clip, clip, mask, cmask)
        np.testing.assert_array_equal(np.asarray(a.hidden), np.asarray(b.hidden))

    def test_dropout_rng_changes_output(self, model_and_params):
        model, params = model_and_params
        x, clip, mask, cmask = _inputs()
        a = model.apply(
            {"params": params}, x, clip, clip, mask, cmask,
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(1)},
        )
        b = model.apply(
            {"params": params}, x, clip, clip, mask, cmask,
            deterministic=False, rngs={"dropout": jax.random.PRNGKey(2)},
        )
        assert np.abs(np.asarray(a.hidden) - np.asarray(b.hidden)).max() > 1e-6

    def test_cfg_weight_zero_ignores_concat_mask_flag(self, model_and_params):
        """With w<=0 the guided branch must not run (CLIP-DDPM.py:313)."""
        model, params = model_and_params
        x, clip, mask, cmask = _inputs()
        flagged = cmask.at[:, 1].set(1.0)
        a = model.apply({"params": params}, x, clip, clip, mask, cmask)
        b = model.apply({"params": params}, x, clip, clip, mask, flagged)
        np.testing.assert_array_equal(np.asarray(a.hidden), np.asarray(b.hidden))

    def test_cfg_guidance_matches_manual_mix(self):
        cfg = TINY.replace(classifier_free_weight=0.4)
        model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
        x, clip, mask, _ = _inputs()
        unflagged = jnp.tile(jnp.asarray([1.0, 0.0]), (4, 1))
        flagged = jnp.tile(jnp.asarray([1.0, 1.0]), (4, 1))
        # Unflagged rows equal a no-guidance forward of the same params.
        base_model, _ = init_denoiser(TINY, jax.random.PRNGKey(0))
        out_u = model.apply({"params": params}, x, clip, clip, mask, unflagged)
        out_base = base_model.apply({"params": params}, x, clip, clip, mask, unflagged)
        np.testing.assert_allclose(
            np.asarray(out_u.hidden), np.asarray(out_base.hidden), atol=1e-5
        )
        # Flagged rows: both branches exist and differ (text token attended).
        out_g = model.apply({"params": params}, x, clip, clip, mask, flagged)
        assert np.abs(np.asarray(out_g.hidden) - np.asarray(out_u.hidden)).max() > 1e-6

    def test_embed_lookup(self, model_and_params):
        model, params = model_and_params
        ids = jnp.asarray([[0, 1, 2], [3, 4, 5]], jnp.int32)
        emb = model.apply({"params": params}, ids, method="embed")
        table = params["embedding_table"]
        np.testing.assert_array_equal(np.asarray(emb[0, 0]), np.asarray(table[0]))
        np.testing.assert_array_equal(np.asarray(emb[1, 2]), np.asarray(table[5]))

    def test_lm_head_bias_free(self, model_and_params):
        """Vocab head is kernel-only — reference zeroes the bias forever
        (CLIP-DDPM.py:247)."""
        model, params = model_and_params
        h = jnp.zeros((2, 3, TINY.dim))
        logits = model.apply({"params": params}, h, method="decode_logits")
        np.testing.assert_array_equal(np.asarray(logits), 0.0)

    def test_train_embedding_variant(self):
        cfg = TINY.replace(train_embedding=True)
        model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
        x = jax.random.normal(jax.random.PRNGKey(1), (4, cfg.max_length, 16))
        clip = jnp.zeros((4, 1, cfg.clip_dim))
        mask = jnp.ones((4, cfg.max_length))
        cmask = jnp.tile(jnp.asarray([1.0, 0.0]), (4, 1))
        out = model.apply({"params": params}, x, clip, clip, mask, cmask)
        assert out.hidden.shape == (4, cfg.max_length + 2, 16)
        assert out.logits.shape == (4, cfg.max_length, cfg.vocab_size)

    def test_param_labels(self, model_and_params):
        from flax import traverse_util

        _, params = model_and_params
        labels = traverse_util.flatten_dict(param_labels(params, TINY))
        assert labels[("embedding_table",)] == "frozen"
        assert labels[("lm_head_kernel",)] == "frozen"
        assert all(
            v == "trainable"
            for k, v in labels.items()
            if k[0] not in ("embedding_table", "lm_head_kernel")
        )
        # lm-trial semantics: nothing frozen
        labels2 = traverse_util.flatten_dict(
            param_labels(params, TINY.replace(freeze_embedding=False))
        )
        assert all(v == "trainable" for v in labels2.values())
