"""Noise and learning-rate schedules.

Pure, precomputed jnp constant tables — the TPU-idiomatic replacement for the
reference's module-level torch tensors (CLIP-DDPM.py:337-346, 451-456).
"""

from __future__ import annotations

import math

import jax.numpy as jnp
import numpy as np

from diffusion_image_captioning_tpu.config import Config


def alpha_cumprod_table(cfg: Config) -> jnp.ndarray:
    """The cumulative-alpha table, shape [step_tot], float32.

    Cosine schedule (Improved-DDPM, s=0.008), normalized by its t=0 value
    (reference: CLIP-DDPM.py:337-342)::

        abar_t = cos(pi/2 * (t/T + s)/(1+s))^2 / cos(pi/2 * s/(1+s))^2

    Linear-beta fallback (reference: CLIP-DDPM.py:343-346): betas are
    ``[0, linspace(beta_min, beta_max, T)]`` and the table is the cumprod of
    ``1 - beta`` over the first T entries, so entry 0 is exactly 1.
    """
    T = cfg.step_tot
    if cfg.cosin_schedule:
        t = np.arange(T, dtype=np.float64)
        s = 0.008
        f = np.cos(math.pi / 2 * (t / T + s) / (1 + s)) ** 2
        f0 = math.cos(math.pi / 2 * s / (1 + s)) ** 2
        table = f / f0
    else:
        betas = np.concatenate([np.zeros(1), np.linspace(cfg.beta_min, cfg.beta_max, T)])
        table = np.cumprod(1.0 - betas[:-1])
    return jnp.asarray(table, dtype=jnp.float32)


def posterior_tables(cfg: Config):
    """DDPM ancestral-sampling constants derived from the alpha-bar table.

    The reference never computes a reverse posterior (its sampler is iterative
    self-refinement, CLIP-DDPM.py:611-621); these tables power this framework's
    *extension*: a proper 100-step ancestral sampler (see sample.py).

    Returns dict of [T] arrays: betas, alphas, posterior mean coefficients for
    (x0, x_t) and the posterior log-variance, using the standard DDPM identities
    with abar_{-1} := 1.
    """
    abar = np.asarray(alpha_cumprod_table(cfg), dtype=np.float64)
    abar_prev = np.concatenate([[1.0], abar[:-1]])
    alphas = abar / abar_prev
    betas = 1.0 - alphas
    post_var = betas * (1.0 - abar_prev) / np.maximum(1.0 - abar, 1e-20)
    coef_x0 = betas * np.sqrt(abar_prev) / np.maximum(1.0 - abar, 1e-20)
    coef_xt = (1.0 - abar_prev) * np.sqrt(alphas) / np.maximum(1.0 - abar, 1e-20)
    if abar[0] >= 1.0 - 1e-12:
        # degenerate first step (abar[0] == 1 for both schedules): the 0/0
        # guard above would yield coef_x0[0] = 0, but the analytic limit is
        # the posterior collapsing onto x0
        coef_x0[0], coef_xt[0], post_var[0] = 1.0, 0.0, 0.0
    return {
        "alpha_cumprod": jnp.asarray(abar, jnp.float32),
        "betas": jnp.asarray(betas, jnp.float32),
        "alphas": jnp.asarray(alphas, jnp.float32),
        "posterior_variance": jnp.asarray(post_var, jnp.float32),
        "posterior_mean_coef_x0": jnp.asarray(coef_x0, jnp.float32),
        "posterior_mean_coef_xt": jnp.asarray(coef_xt, jnp.float32),
    }


def learning_rates(cfg: Config) -> np.ndarray:
    """Per-epoch learning-rate array (host-side, feeds the optimizer each epoch).

    Three shapes (reference: CLIP-DDPM.py:63-70, 451-456):
      * linspace:  LR -> END over epoch_num points
      * logspace:  10^linspace(log10 LR, log10 END, epoch_num)
      * cosine_annealing: 5-epoch half-cosine LR->END, repeated. The
        reference helper returns a FIXED length-15 array (3 repeats,
        CLIP-DDPM.py:63-67) and would IndexError past epoch 15; here the
        cycle repeats enough to cover epoch_num — identical values wherever
        the reference is defined, no mid-run crash beyond.

    Schedule-correct segments (cfg.schedule_offset_epochs /
    schedule_total_epochs, see config.py): the array is built over the
    PROTOCOL length and this run's epoch_num-long window starting at the
    offset is returned, so a continue_train segment resumes the anneal at
    its global position instead of restarting it (the reference restart is
    the (0, 0) default).
    """
    lr, end = cfg.learning_rate, cfg.end_learning_rate
    n = max(cfg.schedule_total_epochs, cfg.epoch_num)
    off = cfg.schedule_offset_epochs
    if off + cfg.epoch_num > n:
        raise ValueError(
            f"schedule_offset_epochs={off} + epoch_num={cfg.epoch_num} "
            f"exceeds schedule_total_epochs={n}"
        )
    if cfg.scheduler == "linspace":
        full = np.linspace(lr, end, n)
    elif cfg.scheduler == "logspace":
        full = np.logspace(math.log10(lr), math.log10(end), n)
    elif cfg.scheduler == "cosine_annealing":
        sub = 5
        x = np.arange(sub, dtype=np.float64)
        one = end + (lr - end) * (1 + np.cos(x / sub * math.pi)) / 2
        full = np.tile(one, max(3, -(-n // sub)))
    else:
        raise ValueError(cfg.scheduler)
    # Window to this run's epochs only when the segment fields are in play;
    # otherwise return the full array — the reference helper's FIXED
    # length-15 cosine tile (3 repeats regardless of EPOCH_NUM,
    # CLIP-DDPM.py:63-67) is part of the parity contract, and fit() only
    # ever indexes [0, epoch_num).
    if off or cfg.schedule_total_epochs:
        return full[off : off + cfg.epoch_num]
    return full
