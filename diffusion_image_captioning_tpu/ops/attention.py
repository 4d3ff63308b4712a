"""Pallas fused attention for the denoiser's short-sequence regime.

The denoiser attends over 16-18 positions with 12 heads and head_dim 64
(SURVEY.md section 3.2) at an effective batch of ~800 rows. There is nothing
to "flash" at L=18 — scores fit in VMEM trivially — so the right kernel
shape is a *batched* fused attention: the grid walks tiles of the flattened
(batch x head) axis and each program computes QK^T -> masked softmax -> PV
for its tile entirely in VMEM, one HBM round-trip for q/k/v/out instead of
XLA's intermediate materializations.

The kernel is numerically identical to models.distilbert.mha_reference
(large-negative masking, fp32 softmax) and is only used when attention
dropout is off (eval/sampling, or dropout=0 training); the XLA path covers
the rest. On non-TPU backends ``fused_attention`` transparently falls back
to the reference implementation.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from diffusion_image_captioning_tpu.models.distilbert import mha_reference

_TILE_G = 8  # (batch*head) rows per program


def _attn_kernel(q_ref, k_ref, v_ref, mask_ref, out_ref):
    q = q_ref[:].astype(jnp.float32)  # [TG, L, dh]
    k = k_ref[:].astype(jnp.float32)
    v = v_ref[:].astype(jnp.float32)
    mask = mask_ref[:]  # [TG, L]
    dh = q.shape[-1]
    s = jax.lax.dot_general(
        q, k,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ) / jnp.sqrt(jnp.float32(dh))  # [TG, L, L]
    s = jnp.where(mask[:, None, :] > 0, s, jnp.float32(-1e30))
    s = s - s.max(axis=-1, keepdims=True)
    e = jnp.exp(s)
    p = e / e.sum(axis=-1, keepdims=True)
    out = jax.lax.dot_general(
        p, v,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[:] = out.astype(out_ref.dtype)


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_attention(q, k, v, mask, *, interpret: bool = False):
    """q, k, v: [N, H, L, dh]; mask: [N, L] keys-padding mask (1 = attend).
    Returns [N, H, L, dh]. Drop-in for mha_reference (no dropout path)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N, H, L, dh = q.shape
    G = N * H
    pad = (-G) % _TILE_G
    Gp = G + pad

    def flat(t):
        t = t.reshape(G, L, dh)
        if pad:
            t = jnp.pad(t, ((0, pad), (0, 0), (0, 0)))
        return t

    qf, kf, vf = flat(q), flat(k), flat(v)
    maskf = jnp.broadcast_to(
        mask.astype(jnp.float32)[:, None, :], (N, H, L)
    ).reshape(G, L)
    if pad:
        # padded programs attend to position 0 to avoid 0/0 softmax
        maskf = jnp.concatenate(
            [maskf, jnp.zeros((pad, L), jnp.float32).at[:, 0].set(1.0)], axis=0
        )

    grid = (Gp // _TILE_G,)
    spec3 = pl.BlockSpec(
        (_TILE_G, L, dh), lambda i: (i, 0, 0), memory_space=pltpu.VMEM
    )
    spec2 = pl.BlockSpec((_TILE_G, L), lambda i: (i, 0), memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _attn_kernel,
        out_shape=jax.ShapeDtypeStruct((Gp, L, dh), q.dtype),
        grid=grid,
        in_specs=[spec3, spec3, spec3, spec2],
        out_specs=spec3,
        interpret=interpret,
    )(qf, kf, vf, maskf)
    return out[:G].reshape(N, H, L, dh)


def make_attention_fn(interpret: bool = False):
    """attention_fn for models.distilbert.MultiHeadSelfAttention: the Pallas
    kernel on TPU, the XLA reference elsewhere."""
    # TPU may surface as 'tpu' or via an experimental plugin platform name.
    on_tpu = (
        any(d.platform in ("tpu", "axon") for d in jax.devices()) or interpret
    )

    if not on_tpu:
        return None  # models fall back to mha_reference

    def fn(q, k, v, mask):
        return fused_attention(q, k, v, mask, interpret=interpret)

    return fn
