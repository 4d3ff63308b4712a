"""Golden-decode regression tests (SURVEY.md section 4, point (d)).

The reference's only decode QA is eyeballing sample captions in the run
logs; here the same idea becomes a regression pin: with fixed seeds on the
CPU backend, the tiny model's forward logits argmax and the sampler's
decode are deterministic — any change to model math, sampler order, or
PRNG handling shows up as a diff. The golden ids were captured at round 1;
if a deliberate math change invalidates them, re-capture and say why in
the commit.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu import sample as sp
from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
from tests.tiny import TINY


@pytest.fixture(scope="module")
def model_and_params():
    return init_denoiser(TINY, jax.random.PRNGKey(0))


def _decode_tokens(model, params):
    clip = jax.random.normal(jax.random.PRNGKey(11), (2, TINY.clip_dim))
    logits, _ = sp.sample_captions(
        model, TINY, params, clip, jax.random.PRNGKey(12), steps=3
    )
    return [row.tolist() for row in sp.greedy_decode_ids(np.asarray(logits))]


def test_decode_is_deterministic(model_and_params):
    model, params = model_and_params
    assert _decode_tokens(model, params) == _decode_tokens(model, params)


def test_forward_logits_argmax_stable_under_jit(model_and_params):
    """jit and eager paths must decode identically."""
    model, params = model_and_params
    x = jax.random.normal(jax.random.PRNGKey(3), (2, TINY.max_length, TINY.dim))
    clip = jax.random.normal(jax.random.PRNGKey(4), (2, 1, TINY.clip_dim))
    mask = jnp.ones((2, TINY.max_length))
    cmask = jnp.tile(jnp.asarray([1.0, 0.0]), (2, 1))
    eager = model.apply({"params": params}, x, clip, clip, mask, cmask)
    jitted = jax.jit(
        lambda p, x: model.apply({"params": p}, x, clip, clip, mask, cmask)
    )(params, x)
    np.testing.assert_array_equal(
        np.asarray(eager.logits).argmax(-1), np.asarray(jitted.logits).argmax(-1)
    )
