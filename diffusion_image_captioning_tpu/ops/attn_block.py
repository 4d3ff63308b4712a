"""Fused attention half-block: qkv proj -> attention -> out proj -> +residual -> LN.

Round-1 evidence (docs/PERF.md): the encoder runs at ~50% of its matmul
speed-of-light in BOTH directions, and the loss concentrates around the
attention custom-call — XLA fails to fuse the dense/LN work surrounding it
the way it fuses the pure-XLA FFN chain (the fp32-composition experiment
regressed 53 -> 77 ms for exactly this reason). This op absorbs the whole
attention half INTO the kernel so there is no boundary left to fuse across:
one Pallas forward computes, per R-row tile,

    qkv = x @ Wqkv + bqkv                  (bf16 MXU, fp32 accum)
    ctx = blockdiag-softmax-attention(qkv) (ops/attention_core math,
                                            in-kernel dropout)
    z   = x + ctx @ Wout + bout            (fp32 residual)
    out = LayerNorm(z) * gamma + beta      (fp32 stats)

saving (qkv bf16, ctx bf16, z fp32) for the backward. The backward follows
the proven ffn_block pattern: plain XLA over the saved activations (LN
backward from z, the four weight-grad/input-grad matmuls — XLA schedules
these at speed of light) around ONE Pallas call — attention_core's
existing backward kernel, which regenerates softmax probabilities and the
bit-identical in-kernel dropout mask from (qkv, seed).

Numerics are identical to the unfused path (same attention kernel, same
fp32 LN stats/residual as nn.LayerNorm with param_dtype fp32 — verified by
tests vs the XLA oracle). Off-TPU, the XLA composition runs (autodiff VJP).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from diffusion_image_captioning_tpu.ops.attention_core import (
    _bwd_kernel as _attn_bwd_kernel,
    _compiler_params,
    _score_bias,
    _softmax_block,
    _tile_n,
    _xla_core,
)
from diffusion_image_captioning_tpu.ops.common import (
    DIMS_AB, DIMS_ABT, DIMS_ATB, dot_f32 as _dot,
    dropout_bits as _dropout_bits, on_tpu,
)


def _ln_stats(z_f32, eps):
    mean = z_f32.mean(axis=-1, keepdims=True)
    c = z_f32 - mean
    var = (c * c).mean(axis=-1, keepdims=True)
    return c, jax.lax.rsqrt(var + eps)


# ---------------------------------------------------------------------------
# forward kernel
# ---------------------------------------------------------------------------


def _fwd_kernel(
    x_ref, wqkv_ref, bqkv_ref, wout_ref, bout_ref, ga_ref, be_ref,
    mask_ref, seed_ref,
    out_ref, qkv_ref, ctx_ref, z_ref,
    *, H, dh, TN, L, rate, eps,
):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    if rate > 0:
        # EXACT attention_core._fwd_kernel PRNG protocol: seed with
        # (seed, program_id), one mask draw per head in head order — the
        # reused attention backward kernel regenerates this stream.
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    x = x_ref[:]                                          # [R, D] bf16
    qkv = (
        _dot(x, wqkv_ref[:], DIMS_AB) + bqkv_ref[:]
    ).astype(x.dtype)                                     # [R, 3D]
    qkv_ref[:] = qkv

    R = TN * L
    bias, row_ok = _score_bias(mask_ref[:], R, L)
    scale = 1.0 / (dh ** 0.5)
    keep_scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    for h in range(H):
        p, _, _, v_h = _softmax_block(qkv, bias, row_ok, H, dh, h, scale)
        if rate > 0:
            p = p * _dropout_bits(p.shape, keep_scale, rate)
        o = _dot(p.astype(v_h.dtype), v_h, DIMS_AB)       # [R, dh]
        ctx_ref[:, h * dh : (h + 1) * dh] = o.astype(ctx_ref.dtype)

    ctx = ctx_ref[:]
    z = (
        x.astype(jnp.float32)
        + _dot(ctx, wout_ref[:], DIMS_AB)
        + bout_ref[:]
    )                                                     # [R, D] fp32
    z_ref[:] = z
    c, rstd = _ln_stats(z, eps)
    out = c * rstd * ga_ref[:].astype(jnp.float32) + be_ref[:].astype(
        jnp.float32
    )
    out_ref[:] = out.astype(out_ref.dtype)


def _pallas_fwd(x, wqkv, bqkv, wout, bout, gamma, beta, mask, seed,
                *, H, dh, L, rate, eps, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = mask.shape[0]
    TN = _tile_n(L)
    R = TN * L
    D = H * dh
    grid = (N // TN,)
    row2 = lambda v: v.reshape(1, -1).astype(jnp.float32)  # noqa: E731
    full = lambda r, c: pl.BlockSpec(  # noqa: E731
        (r, c), lambda i: (0, 0), memory_space=pltpu.VMEM
    )
    tile = lambda c: pl.BlockSpec(  # noqa: E731
        (R, c), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    return pl.pallas_call(
        functools.partial(
            _fwd_kernel, H=H, dh=dh, TN=TN, L=L, rate=rate, eps=eps
        ),
        out_shape=(
            jax.ShapeDtypeStruct((N * L, D), x.dtype),       # out
            jax.ShapeDtypeStruct((N * L, 3 * D), x.dtype),   # qkv (saved)
            jax.ShapeDtypeStruct((N * L, D), x.dtype),       # ctx (saved)
            jax.ShapeDtypeStruct((N * L, D), jnp.float32),   # z (saved)
        ),
        grid=grid,
        in_specs=[
            tile(D),
            full(D, 3 * D),
            full(1, 3 * D),
            full(D, D),
            full(1, D),
            full(1, D),
            full(1, D),
            tile(1),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=(tile(D), tile(3 * D), tile(D), tile(D)),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(
        x,
        wqkv.astype(x.dtype), row2(bqkv),
        wout.astype(x.dtype), row2(bout),
        row2(gamma), row2(beta),
        mask.astype(jnp.float32).reshape(N * L, 1),
        seed,
    )


def _pallas_attn_bwd(qkv, mask, seed, dctx, *, H, dh, TN, L, rate, interpret):
    """attention_core's backward kernel at THIS op's tile size (the dropout
    stream is a function of (seed, program_id, head), so fwd and bwd must
    share the grid)."""
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = mask.shape[0]
    R = TN * L
    grid = (N // TN,)
    return pl.pallas_call(
        functools.partial(
            _attn_bwd_kernel, H=H, dh=dh, TN=TN, L=L, rate=rate
        ),
        out_shape=jax.ShapeDtypeStruct((N * L, 3 * H * dh), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, 3 * H * dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((R, H * dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (R, 3 * H * dh), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(qkv, mask.astype(jnp.float32).reshape(N * L, 1), seed, dctx)


# ---------------------------------------------------------------------------
# custom VJP
# ---------------------------------------------------------------------------


@functools.partial(jax.custom_vjp, nondiff_argnums=(9, 10, 11, 12, 13))
def _attn_block_tpu(
    x, wqkv, bqkv, wout, bout, gamma, beta, mask, seed,
    H, L, rate, eps, interpret,
):
    out, _, _, _ = _pallas_fwd(
        x, wqkv, bqkv, wout, bout, gamma, beta, mask, seed,
        H=H, dh=x.shape[-1] // H, L=L, rate=rate, eps=eps,
        interpret=interpret,
    )
    return out


def _ab_fwd(x, wqkv, bqkv, wout, bout, gamma, beta, mask, seed,
            H, L, rate, eps, interpret):
    out, qkv, ctx, z = _pallas_fwd(
        x, wqkv, bqkv, wout, bout, gamma, beta, mask, seed,
        H=H, dh=x.shape[-1] // H, L=L, rate=rate, eps=eps,
        interpret=interpret,
    )
    return out, (x, wqkv, wout, gamma, mask, seed, qkv, ctx, z)


def _ab_bwd(H, L, rate, eps, interpret, res, dout):
    x, wqkv, wout, gamma, mask, seed, qkv, ctx, z = res
    f32 = jnp.float32
    dt = x.dtype
    dh = x.shape[-1] // H
    TN = _tile_n(L)

    # LayerNorm backward from the saved fp32 residual sum
    c, rstd = _ln_stats(z, eps)
    norm = c * rstd
    do_f = dout.astype(f32)
    dgamma = (do_f * norm).sum(axis=0)
    dbeta = do_f.sum(axis=0)
    dg_ = do_f * gamma.astype(f32)
    dz = rstd * (
        dg_
        - dg_.mean(axis=-1, keepdims=True)
        - norm * (dg_ * norm).mean(axis=-1, keepdims=True)
    )

    # out-projection backward
    dz_m = dz.astype(dt)
    dctx = _dot(dz_m, wout.astype(dt), DIMS_ABT)          # [M, D]
    dWout = _dot(ctx, dz_m, DIMS_ATB)                     # [D, D] fp32
    dbout = dz.sum(axis=0)

    # attention backward: Pallas kernel regenerating softmax + dropout
    dqkv = _pallas_attn_bwd(
        qkv, mask, seed, dctx.astype(dt),
        H=H, dh=dh, TN=TN, L=L, rate=rate, interpret=interpret,
    )

    # qkv-projection backward + residual
    dx = (dz + _dot(dqkv, wqkv.astype(dt), DIMS_ABT)).astype(dt)
    dWqkv = _dot(x, dqkv, DIMS_ATB)                       # [D, 3D] fp32
    dbqkv = dqkv.astype(f32).sum(axis=0)
    return (dx, dWqkv, dbqkv, dWout, dbout, dgamma, dbeta, None, None)


_attn_block_tpu.defvjp(_ab_fwd, _ab_bwd)


# ---------------------------------------------------------------------------
# XLA composition (fallback + oracle)
# ---------------------------------------------------------------------------


def _xla_block(x, wqkv, bqkv, wout, bout, gamma, beta, mask,
               *, H, L, eps, dropout_mask=None):
    dt = x.dtype
    qkv = (_dot(x, wqkv.astype(dt), DIMS_AB) + bqkv.astype(jnp.float32)).astype(dt)
    ctx = _xla_core(
        qkv, mask, H=H, dh=x.shape[-1] // H, L=L, dropout_mask=dropout_mask
    )
    y = _dot(ctx, wout.astype(dt), DIMS_AB) + bout.astype(jnp.float32)
    z = x.astype(jnp.float32) + y
    c, rstd = _ln_stats(z, eps)
    out = c * rstd * gamma.astype(jnp.float32) + beta.astype(jnp.float32)
    return out.astype(dt)


# ---------------------------------------------------------------------------
# public entry
# ---------------------------------------------------------------------------


def attn_ln_block(
    x: jnp.ndarray,        # [N*L, D] flat activations (compute dtype)
    wqkv: jnp.ndarray,     # [D, 3D] fp32 params (cast internally)
    bqkv: jnp.ndarray,     # [3D]
    wout: jnp.ndarray,     # [D, D]
    bout: jnp.ndarray,     # [D]
    gamma: jnp.ndarray,    # [D] LN scale
    beta: jnp.ndarray,     # [D] LN bias
    mask: jnp.ndarray,     # [N, L] key-padding mask (1 = attend)
    *,
    n_heads: int,
    seq_len: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,
    eps: float = 1e-12,
    interpret: bool = False,
    force_xla: bool = False,
) -> jnp.ndarray:
    """Whole attention half-block, flat in / flat out.

    TPU: one fused Pallas forward (custom VJP; XLA + attention-kernel
    backward). Elsewhere: the XLA composition (autodiff)."""
    L = seq_len
    if L > 32:
        force_xla = True  # same short-sequence regime bound as attention_core
    if (interpret or on_tpu()) and not force_xla:
        if dropout_rate > 0:
            if dropout_rng is None:
                raise ValueError("dropout_rng required when dropout_rate > 0")
            seed = jax.random.randint(
                dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
        else:
            seed = jnp.zeros((1,), jnp.int32)
        N = mask.shape[0]
        rows = x.shape[0]
        pad = (-N) % _tile_n(L)
        if pad:
            x = jnp.concatenate(
                [x, jnp.zeros((pad * L, x.shape[-1]), x.dtype)], axis=0
            )
            mask = jnp.concatenate(
                [mask, jnp.zeros((pad, L), mask.dtype)], axis=0
            )
        out = _attn_block_tpu(
            x, wqkv, bqkv, wout, bout, gamma, beta, mask, seed,
            n_heads, L, float(dropout_rate), float(eps), interpret,
        )
        return out[:rows] if pad else out
    dropout_mask = None
    if dropout_rate > 0:
        if dropout_rng is None:
            raise ValueError("dropout_rng required when dropout_rate > 0")
        N = mask.shape[0]
        keep = jax.random.bernoulli(
            dropout_rng, 1.0 - dropout_rate, (N, n_heads, L, L)
        )
        dropout_mask = keep.astype(jnp.float32) / (1.0 - dropout_rate)
    return _xla_block(
        x, wqkv, bqkv, wout, bout, gamma, beta, mask,
        H=n_heads, L=L, eps=eps, dropout_mask=dropout_mask,
    )
