"""Forward diffusion (q-sampling) in explicit-PRNG JAX.

Replaces the reference's stateful `torch.normal` q-sampler (CLIP-DDPM.py:347-380)
with pure functions of (alpha_cumprod table, x0, t, key). Everything is static
shape and jit/vmap-friendly: callers pass `t` as an int32 vector of length S and
receive an [S*B, L, C] batch, matching the reference layout that downstream
fusion/loss code expects.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def q_sample(
    abar: jnp.ndarray,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    *,
    shared_noise: bool = True,
) -> jnp.ndarray:
    """x_t = sqrt(abar_t) * x0 + sqrt(1 - abar_t) * eps, for a vector of t.

    Args:
      abar: [T] cumulative-alpha table.
      x0:   [B, L, C] clean embeddings.
      t:    [S] int32 timesteps (any length; S=1 for single-diffuse use).
      key:  PRNG key.
      shared_noise: reproduce the reference quirk of drawing ONE [B, L, C]
        noise tensor shared across all S timesteps (CLIP-DDPM.py:359 draws
        noise with x.shape, not [S, ...]). False draws fresh noise per
        timestep sample — the statistically conventional choice, flag-gated
        per SURVEY.md section 2.9.

    Returns:
      [S*B, L, C] noised embeddings, ordered timestep-major like the
      reference's reshape (CLIP-DDPM.py:362).
    """
    B, L, C = x0.shape
    S = t.shape[0]
    a = abar[t].astype(x0.dtype).reshape(S, 1, 1, 1)
    if shared_noise:
        eps = jax.random.normal(key, (1, B, L, C), dtype=x0.dtype)
    else:
        eps = jax.random.normal(key, (S, B, L, C), dtype=x0.dtype)
    xt = jnp.sqrt(a) * x0[None] + jnp.sqrt(1.0 - a) * eps
    return xt.reshape(S * B, L, C)


def diffuse_pair(
    abar: jnp.ndarray,
    x0: jnp.ndarray,
    t: jnp.ndarray,
    key: jax.Array,
    *,
    x_0_prediction: bool = True,
    t_interval: int = 100,
    shared_noise: bool = True,
):
    """(network input, network target) for the x_t restore loss.

    x0-prediction mode returns (x_t, x0) — the shipped configuration
    (CLIP-DDPM.py:375-377). Otherwise returns (x_t, x_{max(t-interval,0)})
    with an independent noise draw for the target, like the reference's two
    separate `diffuse_t` calls (CLIP-DDPM.py:380, :467).
    """
    k1, k2 = jax.random.split(key)
    xt = q_sample(abar, x0, t, k1, shared_noise=shared_noise)
    if x_0_prediction:
        return xt, x0
    t_next = jnp.maximum(t - t_interval, 0)
    x_tgt = q_sample(abar, x0, t_next, k2, shared_noise=shared_noise)
    return xt, x_tgt
