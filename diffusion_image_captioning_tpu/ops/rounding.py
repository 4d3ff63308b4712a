"""Fused rounding-loss op: log p(token) without materializing logits.

The reference's rounding loss materializes softmax over the full vocab for
the whole effective batch — an [800, 16, 30522] fp32 tensor (~1.6 GB) plus
its gradient, the training loop's memory peak (SURVEY.md section 3.1,
CLIP-DDPM.py:434-440). This op computes

    logp[m] = (h[m] @ W)[idx[m]] - logsumexp(h[m] @ W)

streaming the vocab dimension in tiles, so peak memory is O(M * tile)
instead of O(M * V), with a custom VJP that recomputes tiles in the
backward pass (flash-attention-style online logsumexp, applied to the
classifier).

Two interchangeable implementations:
  * ``_xla_chunked``: lax.scan over vocab tiles — runs everywhere (CPU
    tests), already memory-bounded;
  * ``_pallas_call``: Pallas TPU kernel (ops/rounding_pallas.py) with the
    vocab as the minormost sequential grid dimension and an online-lse
    VMEM accumulator.

``fused_logprob`` picks per backend; both share the same custom VJP math.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from diffusion_image_captioning_tpu.ops.common import (
    DIMS_AB, DIMS_ABT, DIMS_ATB, on_tpu as _on_tpu,
)

# Default vocab tile. 1024 is the production-proven value (train.py, the
# bench sweep): at tile_v=2048 the fp32-default Pallas forward's W block
# alone is 6.3 MB double-buffered — over the ~16 MB v5e VMEM budget once
# h/z/iota intermediates join, i.e. the library defaults would not even
# compile on the target hardware (the failure mode is a remote Mosaic
# error or hang, CLAUDE.md).
_TILE_V = 1024


def _pad_vocab(kernel: jnp.ndarray, tile: int):
    C, V = kernel.shape
    pad = (-V) % tile
    if pad:
        kernel = jnp.pad(kernel, ((0, 0), (0, pad)), constant_values=0.0)
    return kernel, V, pad


def _dot_f32(a, b, dims, dtype):
    """MXU matmul: inputs cast to ``dtype`` (bf16 = full-rate MXU), fp32
    accumulation and output."""
    return jax.lax.dot_general(
        a.astype(dtype), b.astype(dtype), dims,
        preferred_element_type=jnp.float32,
    )




def _xla_chunked_fwd(h, kernel, idx, tile, dtype=jnp.bfloat16):
    """Online logsumexp + target gather over vocab tiles.

    h [M, C]; kernel [C, V]; idx [M] int32.
    Returns (logp [M], lse [M]).
    """
    kernel_p, true_v, _ = _pad_vocab(kernel, tile)
    M = h.shape[0]
    n_tiles = kernel_p.shape[1] // tile
    kt = kernel_p.T.reshape(n_tiles, tile, -1)  # [T, tile, C]

    def body(carry, inputs):
        m, s, tgt = carry
        k_tile, t_i = inputs
        z = _dot_f32(h, k_tile, DIMS_ABT, dtype)  # [M, tile]
        base = t_i * tile
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + base
        # padding columns must not contribute to the lse
        z = jnp.where(col < true_v, z, -jnp.inf)
        zmax = z.max(axis=-1)
        m_new = jnp.maximum(m, zmax)
        s = s * jnp.exp(m - m_new) + jnp.exp(z - m_new[:, None]).sum(axis=-1)
        local = idx - base
        in_tile = (local >= 0) & (local < tile)
        t_here = jnp.take_along_axis(
            z, jnp.clip(local, 0, tile - 1)[:, None], axis=-1
        )[:, 0]
        tgt = jnp.where(in_tile, t_here, tgt)
        return (m_new, s, tgt), None

    init = (
        jnp.full((M,), -jnp.inf, jnp.float32),
        jnp.zeros((M,), jnp.float32),
        jnp.zeros((M,), jnp.float32),
    )
    (m, s, tgt), _ = jax.lax.scan(body, init, (kt, jnp.arange(n_tiles)))
    lse = m + jnp.log(s)
    return tgt - lse, lse


def _xla_chunked_bwd(h, kernel, idx, lse, g, tile, dtype=jnp.bfloat16):
    """dh = g*(W[:,idx].T - softmax @ W.T); dW = h.T @ (g*(onehot - softmax)).

    Recomputes logits per tile; accumulates dh [M,C] and dW tiles.
    """
    M, C = h.shape
    kernel_p, true_v, pad = _pad_vocab(kernel, tile)
    Vp = kernel_p.shape[1]
    n_tiles = Vp // tile
    kt = kernel_p.T.reshape(n_tiles, tile, C)

    def body(dh, inputs):
        k_tile, t_i = inputs
        z = _dot_f32(h, k_tile, DIMS_ABT, dtype)  # [M, tile]
        base = t_i * tile
        col = jax.lax.broadcasted_iota(jnp.int32, (1, tile), 1) + base
        p = jnp.where(col < true_v, jnp.exp(z - lse[:, None]), 0.0)
        onehot = (col == idx[:, None]).astype(jnp.float32)
        dz = g[:, None] * (onehot - p)  # [M, tile]
        dh = dh + _dot_f32(dz, k_tile, DIMS_AB, dtype)  # [M, C]
        dw_tile = _dot_f32(dz.T, h, DIMS_AB, dtype)  # [tile, C]
        return dh, dw_tile

    dh, dw_tiles = jax.lax.scan(
        body, jnp.zeros((M, C), jnp.float32), (kt, jnp.arange(n_tiles))
    )
    dW = dw_tiles.reshape(Vp, C).T
    if pad:
        dW = dW[:, :true_v]
    return dh, dW


def _forward(h, kernel, idx, tile, backend, dtype):
    if backend == "pallas" or (backend == "auto" and _on_tpu()):
        from diffusion_image_captioning_tpu.ops.rounding_pallas import pallas_logprob

        return pallas_logprob(h, kernel, idx, tile_v=tile, dtype=dtype)
    return _xla_chunked_fwd(h, kernel, idx, tile, dtype)


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_logprob(
    h, kernel, idx,
    tile: int = _TILE_V,
    backend: str = "auto",
    matmul_dtype: str = "float32",
):
    """logp [M] of tokens idx under logits h @ kernel, never materializing
    [M, V]. Differentiable in h and kernel.

    backend: "auto" (Pallas kernel on TPU, chunked XLA elsewhere), "xla",
    or "pallas". matmul_dtype: dtype the MXU contractions run in (fp32
    accumulation either way) — "bfloat16" doubles-to-octuples TPU matmul
    rate at ~3 decimal digits of logit precision; default fp32 is exact.
    """
    logp, _ = _forward(h, kernel, idx, tile, backend, jnp.dtype(matmul_dtype))
    return logp


def _flp_fwd(h, kernel, idx, tile, backend, matmul_dtype):
    logp, lse = _forward(h, kernel, idx, tile, backend, jnp.dtype(matmul_dtype))
    return logp, (h, kernel, idx, lse)


def _flp_bwd(tile, backend, matmul_dtype, res, g):
    h, kernel, idx, lse = res
    if backend == "pallas":
        # Available but not the default: measured on v5e the streaming XLA
        # scan backward matches/beats it (11.9 vs 12.7 ms at flagship
        # shape), so "auto" pairs the Pallas forward with the XLA backward.
        from diffusion_image_captioning_tpu.ops.rounding_pallas import (
            pallas_logprob_bwd,
        )

        dh, dW = pallas_logprob_bwd(
            h, kernel, idx, lse, g, tile_v=tile, dtype=jnp.dtype(matmul_dtype)
        )
    else:
        dh, dW = _xla_chunked_bwd(
            h, kernel, idx, lse, g, tile, jnp.dtype(matmul_dtype)
        )
    return dh, dW, None


fused_logprob.defvjp(_flp_fwd, _flp_bwd)


# ---------------------------------------------------------------------------
# save-z variant: trade HBM for the backward's recompute matmul
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5))
def fused_logprob_savez(
    h, kernel, idx,
    tile: int = _TILE_V,
    backend: str = "auto",
    matmul_dtype: str = "float32",
):
    """fused_logprob that SAVES the logits (bf16, padded [Mp, Vp]) from the
    forward so the backward skips its 2*M*C*V recompute matmul — one full
    MXU pass traded for ~|M*V| bf16 of HBM (794 MB at flagship shape).

    Intended for the frozen-vocab-head configuration: dh comes straight
    from the saved z (pallas_dh_from_z); the dW cotangent is implemented
    dense-from-z for correctness but is expensive — XLA dead-code
    eliminates it when the head is frozen, and train.py only selects this
    variant in that case (cfg docstring: rounding_save_z)."""
    logp, _, _ = _forward_savez(h, kernel, idx, tile, backend, jnp.dtype(matmul_dtype))
    return logp


def _forward_savez(h, kernel, idx, tile, backend, dtype):
    if backend == "pallas" or (backend == "auto" and _on_tpu()):
        from diffusion_image_captioning_tpu.ops.rounding_pallas import (
            pallas_logprob_savez,
        )

        return pallas_logprob_savez(h, kernel, idx, tile_v=tile, dtype=dtype)
    # XLA fallback (tests / CPU): dense logits, bf16 storage like the kernel
    z_f32 = _dot_f32(h, kernel, DIMS_AB, dtype)  # [M, V]
    lse = jax.nn.logsumexp(z_f32, axis=-1)
    tgt = jnp.take_along_axis(z_f32, idx[:, None], axis=-1)[:, 0]
    return tgt - lse, lse, z_f32.astype(jnp.bfloat16)


def _flpz_fwd(h, kernel, idx, tile, backend, matmul_dtype):
    logp, lse, z = _forward_savez(
        h, kernel, idx, tile, backend, jnp.dtype(matmul_dtype)
    )
    return logp, (h, kernel, idx, lse, z)


def _flpz_bwd(tile, backend, matmul_dtype, res, g):
    h, kernel, idx, lse, z = res
    M = h.shape[0]
    V = kernel.shape[1]
    dt = jnp.dtype(matmul_dtype)
    if backend == "pallas" or (backend == "auto" and _on_tpu()):
        from diffusion_image_captioning_tpu.ops.rounding_pallas import (
            pallas_dh_from_z,
        )

        dh = pallas_dh_from_z(
            z, kernel, idx, lse, g, m_true=M, tile_v=tile, dtype=dt
        )
        dz = None
    else:
        p = jnp.exp(z[:M, :V].astype(jnp.float32) - lse[:, None])
        onehot = jax.nn.one_hot(idx, V, dtype=jnp.float32)
        dz = g[:, None] * (onehot - p)
        dh = _dot_f32(dz, kernel, DIMS_ABT, dt)
    # dW dense-from-z: correct but costly — dead-code-eliminated whenever
    # the vocab head is frozen (the only configuration train.py routes
    # through this variant). The XLA branch reuses its dz above rather
    # than rebuilding the [M, V] fp32 intermediates.
    if dz is None:
        p = jnp.exp(z[:M, :V].astype(jnp.float32) - lse[:, None])
        dz = g[:, None] * (jax.nn.one_hot(idx, V, dtype=jnp.float32) - p)
    dW = _dot_f32(h, dz, DIMS_ATB, dt)
    return dh, dW, None


fused_logprob_savez.defvjp(_flpz_fwd, _flpz_bwd)
