"""Golden-decode regression tests (SURVEY.md section 4, point (d)).

The reference's only decode QA is eyeballing sample captions in the run
logs; here the same idea becomes a real regression pin: with fixed seeds on
the CPU backend, the tiny model's sampler decode and forward-logits argmax
are deterministic, and their token ids are stored IN THE REPO
(tests/golden_decode_ids.json, captured in round 2). Any change to model
math, sampler order, or PRNG handling diffs against the stored ids.

Re-capture procedure (only after a DELIBERATE math change — say why in the
commit message):  python tests/capture_golden.py
"""

import json
import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from diffusion_image_captioning_tpu import sample as sp
from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
from tests.tiny import TINY

_GOLDEN_PATH = os.path.join(
    os.path.dirname(os.path.abspath(__file__)), "golden_decode_ids.json"
)


@pytest.fixture(scope="module")
def model_and_params():
    return init_denoiser(TINY, jax.random.PRNGKey(0))


@pytest.fixture(scope="module")
def golden():
    with open(_GOLDEN_PATH) as f:
        return json.load(f)


def decode_tokens(model, params):
    """Sampler path: 3 refinement steps from fixed-seed noise, dedup decode
    (shared with tests/capture_golden.py)."""
    clip = jax.random.normal(jax.random.PRNGKey(11), (2, TINY.clip_dim))
    logits, _ = sp.sample_captions(
        model, TINY, params, clip, jax.random.PRNGKey(12), steps=3
    )
    return [
        [int(t) for t in row]
        for row in sp.greedy_decode_ids(np.asarray(logits))
    ]


def train_loss_trajectory():
    """5 fixed-seed train steps on a fixed synthetic batch: pins q-sample,
    loss semantics, CFG masking, AdamW and the LR schedule in one number
    series (shared with tests/capture_golden.py)."""
    from diffusion_image_captioning_tpu import train as tr

    model, params = init_denoiser(TINY, jax.random.PRNGKey(0))
    tx = tr.make_optimizer(TINY)
    state = tr.init_train_state(TINY, params, tx)
    step = tr.make_train_step(model, TINY, tx)
    rng = np.random.default_rng(7)
    B = TINY.batch_size
    batch = {
        "input_ids": rng.integers(
            0, TINY.vocab_size, (B, TINY.max_length)
        ).astype(np.int32),
        "attention_mask": np.ones((B, TINY.max_length), np.int32),
        "image_clip": rng.normal(size=(B, TINY.clip_dim)).astype(np.float32),
        "text_clip": rng.normal(size=(B, TINY.clip_dim)).astype(np.float32),
    }
    lam = jnp.asarray(TINY.rounding_weight, jnp.float32)
    key = jax.random.PRNGKey(21)
    out = []
    for _ in range(5):
        state, m = step(state, batch, key, lam)
        out.append(
            [float(m[k]) for k in ("x_t_loss", "x_1_loss", "prob_loss", "total")]
        )
    return out


def forward_argmax(model, params):
    """One full forward (concat fusion, CFG mask) at fixed inputs."""
    x = jax.random.normal(jax.random.PRNGKey(3), (2, TINY.max_length, TINY.dim))
    clip = jax.random.normal(jax.random.PRNGKey(4), (2, 1, TINY.clip_dim))
    mask = jnp.ones((2, TINY.max_length))
    cmask = jnp.tile(jnp.asarray([1.0, 0.0]), (2, 1))
    out = model.apply({"params": params}, x, clip, clip, mask, cmask)
    return np.asarray(out.logits).argmax(-1).tolist()


def test_sampler_decode_matches_golden(model_and_params, golden):
    model, params = model_and_params
    assert decode_tokens(model, params) == golden["sampler_decode_ids"]


def test_forward_argmax_matches_golden(model_and_params, golden):
    model, params = model_and_params
    assert forward_argmax(model, params) == golden["forward_argmax_ids"]


def test_train_loss_trajectory_matches_golden(golden):
    got = train_loss_trajectory()
    want = golden["train_loss_trajectory"]
    np.testing.assert_allclose(
        np.asarray(got), np.asarray(want), rtol=2e-5, atol=1e-6,
        err_msg="training math diverged from the stored trajectory; if the "
        "change is deliberate, re-capture via tests/capture_golden.py and "
        "say why in the commit",
    )


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
