"""Loss functions.

The reference's loss has three terms (CLIP-DDPM.py:382-445): an x_t-restore
embedding distance, an x_1-restore distance, and a "rounding" term — the
negative log-probability of the ground-truth tokens under the lm_head logits —
scaled by the rounding weight lambda. All are pure functions here; the
orchestration that runs the denoiser twice lives in train.py.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from diffusion_image_captioning_tpu.config import Config

# ---------------------------------------------------------------------------
# Embedding-distance functions (CLIP-DDPM.py:77-92 + lm-trial/main.py:241).
# Shapes: x_hat, x are [N, L, C].
# ---------------------------------------------------------------------------


def series_sum_sample_mean(x_hat, x, cfg: Config):
    """|d| summed over the sequence axis, then mean over batch AND channels
    (the reference's `.abs().sum(dim=1).mean()` on [N, L, C])."""
    return jnp.abs(x_hat - x).sum(axis=1).mean()


def series_sum(x_hat, x, cfg: Config):
    """Global |d| sum divided by the literal constants BATCH_SIZE*768*100
    (CLIP-DDPM.py:80-81 hardcodes 768 and 100).

    DELIBERATE PARITY DEVIATION (docs/PARITY.md "series_sum normalizer"):
    we divide by the config values ``in_channel``/``sample_size`` instead of
    the hardcoded literals. Identical at defaults (in_channel=768,
    sample_size=100); under ``train_embedding`` (in_channel=16) or a
    non-default sample_size the reference would still divide by 768*100 —
    a loss-SCALE difference only (the gradient direction is unchanged), and
    the reference itself never ran series_sum with train_embedding (no such
    trial log exists). The config-value form is the self-consistent one."""
    return jnp.abs(x_hat - x).sum() / (cfg.batch_size * cfg.in_channel * cfg.sample_size)


def mse_series_mean(x_hat, x, cfg: Config):
    """sqrt of the per-sample squared-error sum, mean over samples."""
    return jnp.sqrt(jnp.square(x_hat - x).sum(axis=(-2, -1))).mean()


def mse_series_sum(x_hat, x, cfg: Config):
    """sqrt of the per-sample squared-error sum, summed, / batch_size."""
    return jnp.sqrt(jnp.square(x_hat - x).sum(axis=(-2, -1))).sum() / cfg.batch_size


def mse_mean(x_hat, x, cfg: Config):
    """Plain MSE (lm-trial/main.py:241 uses nn.MSELoss)."""
    return jnp.square(x_hat - x).mean()


DISTANCES = {
    "series_sum_sample_mean": series_sum_sample_mean,
    "series_sum": series_sum,
    "mse_series_mean": mse_series_mean,
    "mse_series_sum": mse_series_sum,
    "mse_mean": mse_mean,
}

# Distance functions whose paired rounding loss uses sum-over-seq-then-mean
# (CLIP-DDPM.py:435-437); the others use sum()/batch_size (:438-440).
_MEAN_STYLE = ("series_sum_sample_mean", "mse_series_mean", "mse_mean")


def distance(name: str):
    return DISTANCES[name]


# ---------------------------------------------------------------------------
# Rounding (token-probability) loss.
# ---------------------------------------------------------------------------


def gathered_log_prob(logits: jnp.ndarray, idx: jnp.ndarray, *, stable: bool = True):
    """log p(idx) per token. [N, L, V] logits, [N, L] int ids -> [N, L].

    stable=True uses log-softmax (logsumexp); stable=False reproduces the
    reference's numerically naive `softmax().gather().log()`
    (CLIP-DDPM.py:436-440) for bit-level comparison runs.
    """
    logits = logits.astype(jnp.float32)
    tgt = jnp.take_along_axis(logits, idx[..., None], axis=-1)[..., 0]
    if stable:
        return tgt - jax.nn.logsumexp(logits, axis=-1)
    p = jnp.take_along_axis(jax.nn.softmax(logits, axis=-1), idx[..., None], axis=-1)[..., 0]
    return jnp.log(p)


def reduce_rounding(lp: jnp.ndarray, cfg: Config) -> jnp.ndarray:
    """Reduce per-token log-probs [N, L] to the rounding-loss scalar using
    the style paired with the active distance (CLIP-DDPM.py:434-440)."""
    if cfg.loss_func in _MEAN_STYLE:
        return -lp.sum(axis=1).mean()
    return -lp.sum() / cfg.batch_size


def rounding_loss(
    logits: jnp.ndarray,
    idx: jnp.ndarray,
    cfg: Config,
    *,
    log_prob_fn=None,
) -> jnp.ndarray:
    """-log p(GT tokens), reduced per the active distance function's style:
    sum over the sequence then mean over batch for the *mean-style* distances,
    else global sum / batch_size (CLIP-DDPM.py:434-440).

    `log_prob_fn(logits, idx) -> [N, L]` may be injected to swap in the fused
    Pallas kernel (ops/rounding_loss.py) that never materializes the
    [N, L, vocab] softmax.
    """
    lp = (log_prob_fn or partial(gathered_log_prob, stable=cfg.stable_rounding_loss))(
        logits, idx
    )
    return reduce_rounding(lp, cfg)


def max_prob_rounding_loss(logits: jnp.ndarray) -> jnp.ndarray:
    """lm-trial's rounding term: -mean log max softmax (lm-trial/main.py:187)."""
    logits = logits.astype(jnp.float32)
    return -(jax.nn.log_softmax(logits, axis=-1).max(axis=-1)).mean()


# ---------------------------------------------------------------------------
# Classifier-free-guidance conditioning mask.
# ---------------------------------------------------------------------------


def cfg_concat_mask(key: jax.Array, n_rows: int, cfg: Config) -> jnp.ndarray:
    """The [N, 2] `concat_mask`: column 0 is always 1 (image conditioning on),
    column 1 flags text-guided rows. With guidance enabled, each row keeps text
    conditioning with prob 1-classifier_free_prob, with rows 0 and 1 pinned to
    0 and 1 so neither population is ever empty (CLIP-DDPM.py:406-412)."""
    if cfg.classifier_free_weight > 0:
        keep = (
            jax.random.uniform(key, (n_rows, 1)) > cfg.classifier_free_prob
        ).astype(jnp.float32)
        keep = keep.at[0].set(0.0).at[1].set(1.0)
        return jnp.concatenate([jnp.ones((n_rows, 1), jnp.float32), keep], axis=1)
    return jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (n_rows, 1))
