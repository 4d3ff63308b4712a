"""Sampling / generation.

The reference's generator is NOT ancestral diffusion sampling: it repeatedly
feeds the denoiser's hidden output back into itself — 5 applications at BLEU
eval (CLIP-DDPM.py:616-617), 10 in the demo (:592-593) — starting from pure
Gaussian noise, with text conditioning zeroed and an all-ones mask. This
module provides:

  * ``refine``: that K-step self-refinement loop as one ``lax.scan`` inside
    jit (device loop, no per-step Python dispatch);
  * ``restore_at_t``: the "t effectiveness" single-shot restoration demo
    (CLIP-DDPM.py:597-602), batched over the probed timesteps;
  * ``ancestral_sample``: a true DDPM reverse-process sampler over the
    posterior tables (schedules.posterior_tables) — the framework extension
    called for by BASELINE.json's north star (100 steps in one scan), which
    the reference never implements;
  * host-side ``greedy_decode_ids``: softmax-argmax + unique_consecutive
    dedup, the exact decode protocol of CLIP-DDPM.py:620-621.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from diffusion_image_captioning_tpu.config import Config
from diffusion_image_captioning_tpu.models.denoiser import CLIPDiffusionLM


def _eval_model(model, cfg: Config):
    """Eval rows are all unguided (concat_mask[:, 1] == 0, _cond_inputs), so
    a classifier-free-guidance model's SECOND encoder forward is multiplied
    by 0 and discarded. Rebinding the module with weight 0 skips it — the
    param tree is identical (the weight is a config constant, not a param)
    and cfg_mix with flag 0 returns the unguided output exactly, so this
    halves sampler cost with bit-identical results."""
    if cfg.classifier_free_weight > 0:
        cfg = cfg.replace(classifier_free_weight=0.0)
        model = CLIPDiffusionLM(cfg=cfg, logits_fn=model.logits_fn)
    return model, cfg


def _cond_inputs(cfg: Config, image_clip, B: int):
    """Eval-time conditioning: image on, text zeroed, mask all ones,
    concat_mask rows [1, 0] (CLIP-DDPM.py:617 — text CLIP is a train-time
    auxiliary signal only, SURVEY.md fidelity note 5)."""
    if image_clip is None:
        image_clip = jnp.zeros((B, 1, cfg.clip_dim), jnp.float32)
    elif image_clip.ndim == 2:
        image_clip = image_clip[:, None, :]
    text_clip = jnp.zeros_like(image_clip)
    mask = jnp.ones((B, cfg.max_length), jnp.float32)
    cmask = jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (B, 1))
    return image_clip, text_clip, mask, cmask


@functools.partial(
    jax.jit, static_argnames=("model", "cfg", "steps", "collect_logits")
)
def refine(
    model: CLIPDiffusionLM,
    cfg: Config,
    params,
    x_init: jnp.ndarray,           # [B, L, C] starting point (noise or x_t)
    image_clip: Optional[jnp.ndarray],  # [B, clip_dim] or [B,1,clip_dim] or None
    *,
    steps: int,
    collect_logits: bool = False,
):
    """K-step self-refinement. Returns (final_logits [B,L,V], final_x,
    per_step_logits or None).

    Matches the reference loop: each iteration feeds hidden[:, :L] back
    (CLIP-DDPM.py:593,617); the returned logits correspond to the final
    application's output.
    """
    model, cfg = _eval_model(model, cfg)
    B = x_init.shape[0]
    img, txt, mask, cmask = _cond_inputs(cfg, image_clip, B)

    def body(x, _):
        out = model.apply(
            {"params": params}, x, img, txt, mask, cmask,
            deterministic=True, return_logits=collect_logits,
        )
        nxt = out.hidden[:, : cfg.max_length]
        return nxt, (out.logits if collect_logits else None)

    x_final, logits_seq = jax.lax.scan(body, x_init, None, length=steps)
    if collect_logits:
        final_logits = logits_seq[-1]
    else:
        # One vocab matmul at the end instead of K of them.
        final_logits = model.apply(
            {"params": params}, x_final, method="decode_logits"
        )
    return final_logits, x_final, (logits_seq if collect_logits else None)


def sample_captions(
    model: CLIPDiffusionLM,
    cfg: Config,
    params,
    image_clip: jnp.ndarray,  # [B, clip_dim]
    key: jax.Array,
    *,
    steps: Optional[int] = None,
):
    """Generate caption logits from pure noise (CLIP-DDPM.py:613-617).

    The reference draws the initial noise with L+2 positions and slices to L
    before the first application (:613,617) — an L-position draw is
    distributionally identical, so we draw [B, L, C] directly.
    """
    steps = cfg.refine_steps_eval if steps is None else steps
    B = image_clip.shape[0]
    x0 = jax.random.normal(key, (B, cfg.max_length, cfg.in_channel), jnp.float32)
    logits, x_final, _ = refine(
        model, cfg, params, x0, image_clip, steps=steps
    )
    return logits, x_final


@functools.partial(jax.jit, static_argnames=("model", "cfg"))
def restore_at_t(
    model: CLIPDiffusionLM,
    cfg: Config,
    params,
    abar: jnp.ndarray,
    x0: jnp.ndarray,          # [1, L, C] clean embedding of a real caption
    t: jnp.ndarray,           # [K] int32 probe timesteps
    image_clip: jnp.ndarray,  # [1, clip_dim]
    mask: jnp.ndarray,        # [1, L]
    key: jax.Array,
):
    """Single-shot restoration at each probe t, as ONE batched forward
    (the reference loops t in Python, CLIP-DDPM.py:598-602)."""
    from diffusion_image_captioning_tpu.diffusion import q_sample

    model, cfg = _eval_model(model, cfg)
    K = t.shape[0]
    x_t = q_sample(abar, x0, t, key, shared_noise=False)  # [K, L, C]
    img = jnp.tile(image_clip[:, None, :], (K, 1, 1))
    txt = jnp.zeros_like(img)
    m = jnp.tile(mask.astype(jnp.float32), (K, 1))
    cmask = jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (K, 1))
    out = model.apply(
        {"params": params}, x_t, img, txt, m, cmask, deterministic=True
    )
    return out.logits  # [K, L, V]


@functools.partial(jax.jit, static_argnames=("model", "cfg", "steps"))
def ancestral_sample(
    model: CLIPDiffusionLM,
    cfg: Config,
    params,
    abar: jnp.ndarray,        # schedules.alpha_cumprod_table(cfg)
    image_clip: jnp.ndarray,  # [B, clip_dim]
    key: jax.Array,
    *,
    steps: int = 100,
):
    """True DDPM ancestral sampling (framework extension; no reference
    counterpart — the reference's sampler is `refine`).

    The denoiser is an x0-predictor (X_0_PREDICTION=True config), so each
    reverse step computes the posterior q(x_s | x_t, x0_hat) mean/variance
    and samples. `steps` evenly strides the T timesteps; the coefficients
    are built PER STRIDED PAIR (t, s) from the alpha-bar ratio
    alpha_{t->s} = abar_t / abar_s — using the precomputed single-step
    tables at strided timesteps would sample the wrong distribution (each
    jump would only denoise one step's worth of noise while the loop
    advances ~T/steps timesteps). For steps == step_tot the pair
    coefficients reduce exactly to the single-step posterior_tables
    identities (pinned in test_core_math). Takes ``abar`` directly like
    ddim_sample — the pair coefficients derive everything from alpha-bar
    ratios, so shipping the full posterior_tables dict to device was dead
    traffic. The whole loop is one lax.scan.
    """
    model, cfg = _eval_model(model, cfg)
    B = image_clip.shape[0]
    L, C = cfg.max_length, cfg.in_channel
    img, txt, mask, cmask = _cond_inputs(cfg, image_clip, B)

    ladder = jnp.linspace(cfg.step_tot - 1, 0, steps + 1).astype(jnp.int32)
    t_pairs = (ladder[:-1], ladder[1:])  # (t, s) with s < t
    key, k0 = jax.random.split(key)
    x_init = jax.random.normal(k0, (B, L, C), jnp.float32)

    def body(carry, t_pair):
        t, s = t_pair
        x, k = carry
        k, kn = jax.random.split(k)
        out = model.apply(
            {"params": params}, x, img, txt, mask, cmask,
            deterministic=True, return_logits=False,
        )
        x0_hat = out.hidden[:, :L]
        a_t = abar[t]
        a_s = abar[s]
        alpha_ts = a_t / a_s
        denom = jnp.maximum(1.0 - a_t, 1e-8)
        mean = (
            jnp.sqrt(a_s) * (1.0 - alpha_ts) / denom * x0_hat
            + jnp.sqrt(alpha_ts) * (1.0 - a_s) / denom * x
        )
        var = (1.0 - a_s) / denom * (1.0 - alpha_ts)
        noise = jax.random.normal(kn, x.shape, jnp.float32)
        sigma = jnp.sqrt(jnp.maximum(var, 0.0))
        # the final transition (s == 0) emits the deterministic x0 estimate,
        # matching the single-step sampler's t == 0 convention
        x_next = jnp.where(s > 0, mean + sigma * noise, x0_hat)
        return (x_next, k), None

    (x_final, _), _ = jax.lax.scan(body, (x_init, key), t_pairs)
    logits = model.apply({"params": params}, x_final, method="decode_logits")
    return logits, x_final


@functools.partial(jax.jit, static_argnames=("model", "cfg", "steps"))
def ddim_sample(
    model: CLIPDiffusionLM,
    cfg: Config,
    params,
    abar: jnp.ndarray,        # schedules.alpha_cumprod_table(cfg)
    image_clip: jnp.ndarray,  # [B, clip_dim]
    key: jax.Array,
    *,
    steps: int = 50,
):
    """Deterministic DDIM sampling (Song et al. 2021, eta=0) — framework
    extension; the reference has no reverse-process sampler at all.

    With an x0-predicting denoiser: eps_hat = (x_t - sqrt(abar_t) x0_hat) /
    sqrt(1-abar_t); x_s = sqrt(abar_s) x0_hat + sqrt(1-abar_s) eps_hat.
    One lax.scan over the strided timestep ladder.
    """
    model, cfg = _eval_model(model, cfg)
    B = image_clip.shape[0]
    L, C = cfg.max_length, cfg.in_channel
    img, txt, mask, cmask = _cond_inputs(cfg, image_clip, B)
    ts = jnp.linspace(cfg.step_tot - 1, 0, steps + 1).astype(jnp.int32)

    x = jax.random.normal(key, (B, L, C), jnp.float32)

    def body(x, t_pair):
        t, s = t_pair
        out = model.apply(
            {"params": params}, x, img, txt, mask, cmask,
            deterministic=True, return_logits=False,
        )
        x0_hat = out.hidden[:, :L]
        a_t = abar[t]
        a_s = abar[s]
        eps_hat = (x - jnp.sqrt(a_t) * x0_hat) / jnp.sqrt(
            jnp.maximum(1.0 - a_t, 1e-8)
        )
        x_next = jnp.sqrt(a_s) * x0_hat + jnp.sqrt(
            jnp.maximum(1.0 - a_s, 0.0)
        ) * eps_hat
        return x_next, None

    x, _ = jax.lax.scan(body, x, (ts[:-1], ts[1:]))
    logits = model.apply({"params": params}, x, method="decode_logits")
    return logits, x


def sample_caption_ids(
    model: CLIPDiffusionLM,
    cfg: Config,
    params,
    image_clip: jnp.ndarray,
    key: jax.Array,
    *,
    steps: Optional[int] = None,
) -> np.ndarray:
    """sample_captions with the greedy argmax ON DEVICE: returns host
    [B, L] int32 ids. Callers that only decode token ids (val/COCO BLEU,
    serving) avoid the [B, L, V] device->host logits transfer — ~125 MB
    per batch-64 flagship call vs 4 KB of ids (a measured 62x serving
    speedup, docs/PERF.md). Same protocol: softmax().argmax() ==
    argmax(logits); follow with dedup_consecutive."""
    logits, _ = sample_captions(
        model, cfg, params, image_clip, key, steps=steps
    )
    return np.asarray(jnp.argmax(logits, axis=-1).astype(jnp.int32))


@functools.partial(jax.jit, static_argnames=("model", "cfg", "steps"))
def _grouped_noise_argmax_ids(
    model: CLIPDiffusionLM,
    cfg: Config,
    params,
    image_clip: jnp.ndarray,  # [G*B, clip_dim], G per-batch blocks in order
    keys: jax.Array,          # [G] stacked per-batch keys
    *,
    steps: int,
):
    """One fused device call for G consecutive BLEU-eval batches.

    Draws each batch's initial noise from ITS OWN key — exactly the draw
    sample_captions makes for that batch — concatenates the blocks, runs one
    G*B-row refinement, and argmaxes on device. Rows never interact inside
    the sampler (attention is within-row), so the per-batch results are
    bit-identical to G separate sample_caption_ids calls while paying one
    dispatch and one kernel launch instead of G (the device round-trips of
    the reference-shape batch-8 loop, CLIP-DDPM.py:604-631, dominated the
    combined-protocol eval leg — docs/PERF.md)."""
    G = keys.shape[0]
    B = image_clip.shape[0] // G
    noise = jax.vmap(
        lambda k: jax.random.normal(
            k, (B, cfg.max_length, cfg.in_channel), jnp.float32
        )
    )(keys)
    x0 = noise.reshape(G * B, cfg.max_length, cfg.in_channel)
    logits, _, _ = refine(model, cfg, params, x0, image_clip, steps=steps)
    return jnp.argmax(logits, axis=-1).astype(jnp.int32)


def sample_caption_ids_grouped(
    model: CLIPDiffusionLM,
    cfg: Config,
    params,
    image_clips: list,  # G per-batch [B, clip_dim] arrays (equal B)
    keys: list,         # G per-batch keys, in the val loop's stream order
    *,
    steps: Optional[int] = None,
) -> np.ndarray:
    """Host wrapper over _grouped_noise_argmax_ids: returns [G*B, L] ids."""
    steps = cfg.refine_steps_eval if steps is None else steps
    clip = jnp.concatenate([jnp.asarray(c) for c in image_clips], axis=0)
    return np.asarray(
        _grouped_noise_argmax_ids(
            model, cfg, params, clip, jnp.stack(keys), steps=steps
        )
    )


def greedy_decode_ids(logits: np.ndarray) -> list[np.ndarray]:
    """argmax + consecutive-duplicate collapse, per row — the reference's
    softmax().argmax().unique_consecutive() (CLIP-DDPM.py:620-621; softmax
    doesn't change the argmax). Host-side; rows become variable length.

    For latency-sensitive callers, run the argmax ON DEVICE (it reduces
    [B, L, V] to [B, L] before the d2h transfer — 30522x less traffic)
    and collapse with dedup_consecutive: serving.CaptionService does."""
    ids = np.asarray(logits).argmax(axis=-1)
    return dedup_consecutive(ids)


def dedup_consecutive(ids: np.ndarray) -> list[np.ndarray]:
    """Per-row unique_consecutive over already-argmaxed [B, L] ids."""
    ids = np.asarray(ids)
    out = []
    for row in ids:
        keep = np.ones(len(row), bool)
        keep[1:] = row[1:] != row[:-1]
        out.append(row[keep])
    return out
