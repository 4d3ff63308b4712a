"""Grouped BLEU-eval sampling (Config.bleu_sample_group) is bit-identical.

The combined-protocol eval leg loops 4,984 val batches at batch 8 through
the from-noise sampler (reference protocol, CLIP-DDPM.py:604-631); grouping
G consecutive batches into one device call must not change a single score:
per-batch keys, noise draws, decode and per-batch corpus-BLEU accumulation
are all preserved (pipeline.run_val_bleu, sample.sample_caption_ids_grouped).
"""

import io

import jax
import numpy as np
import pytest

from diffusion_image_captioning_tpu import pipeline, sample
from diffusion_image_captioning_tpu.data import Batcher
from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
from tests.tiny import TINY


@pytest.fixture(scope="module")
def eval_world():
    cfg = TINY
    model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    n = 28  # 7 batches of 4 -> group 4 leaves a 3-batch remainder group
    imgs = [f"im{i // 2}.jpg" for i in range(n)]  # 2 captions per image
    caps = [f"tok{rng.integers(3, 40)} tok{rng.integers(3, 40)} x" for _ in range(n)]
    columns = {
        "input_ids": rng.integers(0, cfg.vocab_size, (n, cfg.max_length)).astype(np.int32),
        "attention_mask": np.ones((n, cfg.max_length), np.float32),
        "image_clip": rng.normal(size=(n, cfg.clip_dim)).astype(np.float32),
        "text_clip": rng.normal(size=(n, cfg.clip_dim)).astype(np.float32),
        "image": imgs,
        "caption": caps,
    }
    gt = {}
    for im, c in zip(imgs, caps):
        gt.setdefault(im, []).append(c)

    class IdTok:
        def decode(self, ids):
            return " ".join(f"tok{int(i)}" for i in ids)

    return cfg, model, params, columns, gt, IdTok()


def _bleu(cfg, model, params, columns, gt, tok, group, draws=1):
    val_b = Batcher(columns, np.arange(len(columns["image"])), cfg.batch_size,
                    shuffle=False)
    buf = io.StringIO()  # Summary-like: write + flush
    return pipeline.run_val_bleu(
        buf, model, cfg.replace(bleu_sample_group=group, bleu_draws=draws),
        params, val_b, tok, gt, seed=0,
    )


def test_grouped_bleu_bit_identical(eval_world):
    cfg, model, params, columns, gt, tok = eval_world
    base = _bleu(cfg, model, params, columns, gt, tok, group=1)
    for g in (2, 4, 16):  # 16 > n_batches: one whole-split group
        assert _bleu(cfg, model, params, columns, gt, tok, group=g) == base


def test_grouped_bleu_multi_draw(eval_world):
    cfg, model, params, columns, gt, tok = eval_world
    assert _bleu(cfg, model, params, columns, gt, tok, group=4, draws=2) == (
        _bleu(cfg, model, params, columns, gt, tok, group=1, draws=2)
    )


def _fit_history(cfg, model, params, columns, eval_group):
    """One tiny fit() with the given val-loss dispatch grouping."""
    from diffusion_image_captioning_tpu import train as tr

    n = len(columns["image"])
    idx = np.arange(n)
    train_b = Batcher(columns, idx[: n // 2], cfg.batch_size, shuffle=True, seed=0)
    val_b = Batcher(columns, idx, cfg.batch_size, shuffle=False)
    c = cfg.replace(epoch_num=2, eval_loss_group=eval_group)
    tx = tr.make_optimizer(c)
    state = tr.init_train_state(c, jax.tree.map(np.copy, params), tx)
    _, hist = tr.fit(model, c, state, train_b, val_b, seed=0, tx=tx)
    return hist


def test_grouped_val_loss_bit_identical(eval_world):
    """Config.eval_loss_group: the grouped lax.scan dispatch accumulates the
    per-batch eval losses in the same order as the G=1 loop — the logged
    epoch rows must match bit for bit (7 val batches, group 3 -> two full
    groups + a 1-batch tail through the per-batch step)."""
    cfg, model, params, columns, gt, tok = eval_world
    base = _fit_history(cfg, model, params, columns, eval_group=1)
    for g in (3, 16):  # 16 > n_batches: whole split is one partial tail
        hist = _fit_history(cfg, model, params, columns, eval_group=g)
        assert hist == base, f"group {g} diverged"


def test_grouped_sampler_matches_per_batch(eval_world):
    cfg, model, params, columns, gt, tok = eval_world
    k1, k2 = jax.random.split(jax.random.PRNGKey(7))
    c1 = columns["image_clip"][:4]
    c2 = columns["image_clip"][4:8]
    grouped = sample.sample_caption_ids_grouped(
        model, cfg, params, [c1, c2], [k1, k2], steps=2
    )
    one = sample.sample_caption_ids(model, cfg, params, np.asarray(c1), k1, steps=2)
    two = sample.sample_caption_ids(model, cfg, params, np.asarray(c2), k2, steps=2)
    np.testing.assert_array_equal(grouped, np.concatenate([one, two], axis=0))
