"""Sampler tests: scan refinement vs explicit python loop, decode protocol,
restore-at-t batching, ancestral sampler."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu import sample as sp
from diffusion_image_captioning_tpu import schedules
from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
from tests.tiny import TINY


@pytest.fixture(scope="module")
def model_and_params():
    return init_denoiser(TINY, jax.random.PRNGKey(0))


class TestRefine:
    def test_scan_equals_python_loop(self, model_and_params):
        """The lax.scan must reproduce the reference's per-step feedback loop
        (CLIP-DDPM.py:616-617) exactly."""
        model, params = model_and_params
        B = 2
        x0 = jax.random.normal(jax.random.PRNGKey(3), (B, TINY.max_length, TINY.dim))
        clip = jax.random.normal(jax.random.PRNGKey(4), (B, TINY.clip_dim))

        logits, x_final, _ = sp.refine(model, TINY, params, x0, clip, steps=3)

        # hand loop
        img = clip[:, None, :]
        txt = jnp.zeros_like(img)
        mask = jnp.ones((B, TINY.max_length))
        cmask = jnp.tile(jnp.asarray([1.0, 0.0]), (B, 1))
        x = x0
        for _ in range(3):
            out = model.apply({"params": params}, x, img, txt, mask, cmask)
            x = out.hidden[:, : TINY.max_length]
        np.testing.assert_allclose(np.asarray(x_final), np.asarray(x), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(logits), np.asarray(out.logits), atol=1e-3
        )


    def test_cfg_model_eval_equivalence(self, model_and_params):
        """sample._eval_model drops the guided forward for w > 0 models at
        eval; since every eval row is unguided, the outputs must be
        IDENTICAL to running the w > 0 model as-is."""
        from diffusion_image_captioning_tpu.models.denoiser import (
            CLIPDiffusionLM,
        )

        model, params = model_and_params
        cfg_w = TINY.replace(classifier_free_weight=1.0)
        model_w = CLIPDiffusionLM(cfg=cfg_w, logits_fn=model.logits_fn)
        B = 2
        x0 = jax.random.normal(jax.random.PRNGKey(5), (B, TINY.max_length, TINY.dim))
        clip = jax.random.normal(jax.random.PRNGKey(6), (B, TINY.clip_dim))
        # direct forward with the w>0 model, all rows unguided
        img = clip[:, None, :]
        txt = jnp.zeros_like(img)
        mask = jnp.ones((B, TINY.max_length))
        cmask = jnp.tile(jnp.asarray([1.0, 0.0]), (B, 1))
        x = x0
        for _ in range(2):
            out = model_w.apply({"params": params}, x, img, txt, mask, cmask)
            x = out.hidden[:, : TINY.max_length]
        _, x_fast, _ = sp.refine(model_w, cfg_w, params, x0, clip, steps=2)
        np.testing.assert_allclose(np.asarray(x_fast), np.asarray(x), atol=1e-4)

    def test_collect_logits(self, model_and_params):
        model, params = model_and_params
        x0 = jax.random.normal(jax.random.PRNGKey(3), (2, TINY.max_length, TINY.dim))
        logits, _, seq = sp.refine(
            model, TINY, params, x0, None, steps=3, collect_logits=True
        )
        assert seq.shape == (3, 2, TINY.max_length, TINY.vocab_size)
        np.testing.assert_allclose(np.asarray(logits), np.asarray(seq[-1]), atol=1e-6)

    def test_sample_captions_shapes(self, model_and_params):
        model, params = model_and_params
        clip = jax.random.normal(jax.random.PRNGKey(5), (3, TINY.clip_dim))
        logits, x = sp.sample_captions(
            model, TINY, params, clip, jax.random.PRNGKey(0), steps=2
        )
        assert logits.shape == (3, TINY.max_length, TINY.vocab_size)
        assert x.shape == (3, TINY.max_length, TINY.dim)


class TestRestoreAtT:
    def test_batched_probe(self, model_and_params):
        model, params = model_and_params
        abar = schedules.alpha_cumprod_table(TINY)
        x0 = jax.random.normal(jax.random.PRNGKey(1), (1, TINY.max_length, TINY.dim))
        t = jnp.asarray([1, 50, 99], jnp.int32)
        clip = jax.random.normal(jax.random.PRNGKey(2), (1, TINY.clip_dim))
        mask = jnp.ones((1, TINY.max_length))
        logits = sp.restore_at_t(
            model, TINY, params, abar, x0, t, clip, mask, jax.random.PRNGKey(3)
        )
        assert logits.shape == (3, TINY.max_length, TINY.vocab_size)


class TestAncestral:
    def test_runs_and_finite(self, model_and_params):
        model, params = model_and_params
        abar = schedules.alpha_cumprod_table(TINY)
        clip = jax.random.normal(jax.random.PRNGKey(6), (2, TINY.clip_dim))
        logits, x = sp.ancestral_sample(
            model, TINY, params, abar, clip, jax.random.PRNGKey(0), steps=5
        )
        assert logits.shape == (2, TINY.max_length, TINY.vocab_size)
        assert np.all(np.isfinite(np.asarray(x)))


class TestDDIM:
    def test_runs_deterministic(self, model_and_params):
        model, params = model_and_params
        abar = schedules.alpha_cumprod_table(TINY)
        clip = jax.random.normal(jax.random.PRNGKey(6), (2, TINY.clip_dim))
        l1, x1 = sp.ddim_sample(
            model, TINY, params, abar, clip, jax.random.PRNGKey(0), steps=4
        )
        l2, x2 = sp.ddim_sample(
            model, TINY, params, abar, clip, jax.random.PRNGKey(0), steps=4
        )
        np.testing.assert_array_equal(np.asarray(x1), np.asarray(x2))
        assert l1.shape == (2, TINY.max_length, TINY.vocab_size)
        assert np.all(np.isfinite(np.asarray(x1)))


class TestDecode:
    def test_unique_consecutive(self):
        logits = np.zeros((1, 6, 4), np.float32)
        # argmax sequence: 1 1 2 2 1 3 -> dedup 1 2 1 3
        for pos, tok in enumerate([1, 1, 2, 2, 1, 3]):
            logits[0, pos, tok] = 5.0
        out = sp.greedy_decode_ids(logits)
        np.testing.assert_array_equal(out[0], [1, 2, 1, 3])

    def test_dedup_consecutive_matches_greedy(self):
        logits = np.zeros((2, 5, 4), np.float32)
        for pos, tok in enumerate([0, 0, 3, 3, 2]):
            logits[0, pos, tok] = 5.0
            logits[1, pos, (tok + 1) % 4] = 5.0
        a = sp.greedy_decode_ids(logits)
        b = sp.dedup_consecutive(logits.argmax(-1))
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)

    def test_sample_caption_ids_matches_logits_argmax(self, model_and_params):
        """The device-argmax fast path (ships [B, L] ids, not [B, L, V]
        logits) must reproduce sample_captions + host argmax exactly."""
        model, params = model_and_params
        clip = jax.random.normal(jax.random.PRNGKey(9), (3, TINY.clip_dim))
        key = jax.random.PRNGKey(4)
        logits, _ = sp.sample_captions(model, TINY, params, clip, key, steps=2)
        ids = sp.sample_caption_ids(model, TINY, params, clip, key, steps=2)
        np.testing.assert_array_equal(ids, np.asarray(logits).argmax(-1))
