"""Fused attention core: flat qkv in, flat context out, custom VJP.

Motivation (docs/PERF.md): at L=18, dh=64 the XLA attention path pays
~11 ms fwd per step in head transposes and 3.5x-padded per-head tiles —
half the encoder forward — despite negligible FLOPs. This kernel consumes
the fused QKV projection's natural [N*L, 3D] layout and computes all heads'
scaled-dot-product attention entirely in VMEM (one HBM read of qkv, one
HBM write of the context), with a recompute-based backward for training.

Kernel design (v2, "block-diagonal flat attention"): a tile holds TN
sequences = R = TN*L flat rows. Per head, Q/K/V are plain 2-D [R, dh]
column slices and attention is ONE [R, R] score matmul masked down to the
block-diagonal (rows and columns of different sequences can't attend),
followed by softmax and a [R, R] @ [R, dh] context matmul. Off-block
entries cost extra MXU flops that are ~free at these sizes, and the kernel
never materializes a 3-D [TN, L, dh] view — every operand is 2-D, which
both Mosaic-compiles quickly (the 3-D reshape form took 40-400 s, and a
bf16 variant of it HUNG the remote compiler — see git 62997a4) and runs
~4x faster (docs/PERF.md).

Attention dropout (HF DistilBERT applies dropout to the softmax weights)
runs in-kernel via the TPU PRNG: the mask is a pure function of
(seed, program_id, head), so the backward regenerates bit-identical masks
with zero residual memory.

Numerics match models.distilbert.mha_reference: fp32 scores/softmax,
large-negative masking of padded keys.

Off-TPU, ``attention_core`` falls back to the pure-XLA composition (same
math, jax autodiff) — used by the CPU test suite.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp

from diffusion_image_captioning_tpu.ops.common import (
    DIMS_AB, DIMS_ABT, DIMS_ATB, dot_f32 as _dot,
    dropout_bits as _dropout_bits, on_tpu,
)

import os

# Per-program flat rows (see _tile_n) and the Mosaic scoped-VMEM budget the
# kernels request. Round 1 shipped R=360 because R=432's backward needed
# 16.26 MB scoped VMEM — over Mosaic's 16 MB DEFAULT — inside the full
# train-step jit; CompilerParams(vmem_limit_bytes) lifts that default
# (v5e has 128 MB physical VMEM; the limit exists to preserve
# double-buffering headroom, which these single-pass-per-tile kernels
# don't need much of). Round-2 sweep: bench/attn_tile_sweep.py.
# Env overrides exist for that sweep only — production uses the defaults.
_TILE_ROWS = int(os.environ.get("DIC_ATTN_TILE_ROWS", "360"))
_VMEM_MB = int(os.environ.get("DIC_ATTN_VMEM_MB", "0"))  # 0 = Mosaic default


def _compiler_params():
    if not _VMEM_MB:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_MB * 1024 * 1024)


def _tile_n(L: int) -> int:
    """Sequences per program: R = TN*L flat rows, kept 8-sublane-divisible.
    Measured on v5e at L=18: R=288 fwd 1.48 ms / fwd+bwd 2.20; R=432
    1.04 / 2.14 standalone but its backward's 16.26 MB scoped VMEM OOMs
    inside the full train-step jit at Mosaic's default 16 MB limit (lifted
    via _VMEM_MB); R=576 OOMs standalone at that default (22.2 MB).
    L=18 -> TN=20 (R=360); L=128 -> TN=2 (R=256)."""
    TN = max(1, _TILE_ROWS // L)
    while TN > 1 and (TN * L) % 8:
        TN -= 1
    return TN




def _score_bias(kcol, R: int, L: int):
    """Additive score bias: 0 where attending is allowed (same sequence AND
    key not padding), -1e30 elsewhere. Computed ONCE per tile — it is
    head-independent, and its [R, R] iota/compare work is pure VPU overhead
    if repeated inside the head loop.

    kcol: [R, 1] fp32 key-padding column (1 = attend). The per-COLUMN
    broadcast of a column vector is produced by a rank-1 MXU matmul
    (ones @ kcol^T) — a [1, R] lane-oriented delivery isn't a legal
    TPU block (lanes must divide 128), and in-kernel transposes/reshapes
    of the mask are exactly the forms that destabilized the Mosaic
    compile (git 62997a4)."""
    rseq = jax.lax.broadcasted_iota(jnp.int32, (R, R), 0) // L
    cseq = jax.lax.broadcasted_iota(jnp.int32, (R, R), 1) // L
    key_ok = _dot(jnp.ones((R, 1), jnp.float32), kcol, DIMS_ABT)  # [R, R] = kcol[c]
    allowed = (rseq == cseq) & (key_ok > 0.0)
    bias = jnp.where(allowed, jnp.float32(0.0), jnp.float32(-1e30))
    # Per-row any-key-valid indicator [R, 1]: rows with NO attendable key
    # (tile-padding sequences, or a pathological all-zero mask row) must
    # emit zero probabilities, otherwise the post-max-subtraction softmax
    # spreads uniform 1/R weight over the ENTIRE tile — including OTHER
    # sequences' keys — leaking forward outputs and dv/dk gradients across
    # sequences sharing the tile (advisor finding, round 1).
    row_ok = allowed.astype(jnp.float32).max(axis=-1, keepdims=True)
    return bias, row_ok


def _head_cols(flat, H: int, dh: int, part: int, h: int):
    """2-D [R, dh] slice of one head's q/k/v out of [R, 3D], kept in the
    INPUT dtype: MXU fp32 matmuls run at ~1/8 the bf16 rate on v5e, and
    bf16 x bf16 products accumulate exactly in fp32 (8+8 mantissa bits fit
    24), so bf16 operands + preferred_element_type=f32 give bit-identical
    scores at full MXU rate."""
    col = part * H * dh + h * dh
    return flat[:, col : col + dh]




def _softmax_block(qkv, bias, row_ok, H, dh, h, scale):
    """Per-head masked softmax probabilities [R, R] (fp32) + (q, k, v).

    ``bias``/``row_ok`` are the precomputed [R, R] additive mask and [R, 1]
    any-key-valid indicator (_score_bias); the 1/sqrt(dh) scale is folded
    into q ([R, dh]) instead of scaling the [R, R] score matrix."""
    q_h = _head_cols(qkv, H, dh, 0, h)
    k_h = _head_cols(qkv, H, dh, 1, h)
    v_h = _head_cols(qkv, H, dh, 2, h)
    s = _dot(q_h * jnp.asarray(scale, q_h.dtype), k_h, DIMS_ABT) + bias  # [R, R]
    # Standard max-subtracted softmax. (A clamp-instead-of-max variant was
    # tried and REVERTED: the diagonal score is q.k of the same token —
    # not q.q — so no lower bound on the row max exists, and a row whose
    # valid scores all underflow exp() would silently emit zero context
    # and zero gradients. The max pass costs nothing measurable at step
    # level; docs/PERF.md.)
    s = s - s.max(axis=-1, keepdims=True)
    e = jnp.exp(s)
    # row_ok zeroes FULLY-masked rows (their e is uniform 1 after max
    # subtraction — without this they'd get 1/R weight over the whole
    # tile, crossing sequence boundaries). The 1e-37 floor is then pure
    # defense-in-depth against a 0/0 -> NaN leaking into dv/dk through the
    # tile's column-wise reductions (NaN * 0 = NaN).
    p = (e * row_ok) / (e.sum(axis=-1, keepdims=True) + jnp.float32(1e-37))
    return p, q_h, k_h, v_h


def _fwd_kernel(qkv_ref, mask_ref, seed_ref, out_ref, *, H, dh, TN, L, rate):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    if rate > 0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    qkv = qkv_ref[:]  # [R, 3D]
    R = TN * L
    bias, row_ok = _score_bias(mask_ref[:], R, L)  # once: head-independent
    scale = 1.0 / (dh ** 0.5)
    keep_scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    for h in range(H):
        p, _, _, v_h = _softmax_block(qkv, bias, row_ok, H, dh, h, scale)
        if rate > 0:
            p = p * _dropout_bits(p.shape, keep_scale, rate)
        o = _dot(p.astype(v_h.dtype), v_h, DIMS_AB)  # [R, dh]
        out_ref[:, h * dh : (h + 1) * dh] = o.astype(out_ref.dtype)


def _bwd_kernel(
    qkv_ref, mask_ref, seed_ref, dout_ref, dqkv_ref, *, H, dh, TN, L, rate
):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    if rate > 0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    qkv = qkv_ref[:]
    dout = dout_ref[:]
    R = TN * L
    bias, row_ok = _score_bias(mask_ref[:], R, L)  # once: head-independent
    scale = 1.0 / (dh ** 0.5)
    keep_scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    D = H * dh
    for h in range(H):
        # identical PRNG stream order as the forward: one draw per head
        p, q_h, k_h, v_h = _softmax_block(qkv, bias, row_ok, H, dh, h, scale)
        if rate > 0:
            drop = _dropout_bits(p.shape, keep_scale, rate)
            pd = p * drop
        else:
            drop = None
            pd = p
        do_h = dout[:, h * dh : (h + 1) * dh]
        dv = _dot(pd.astype(do_h.dtype), do_h, DIMS_ATB)  # [R(keys), dh]
        dpd = _dot(do_h, v_h, DIMS_ABT)  # [R, R] fp32
        dp = dpd * drop if drop is not None else dpd
        # softmax backward on the pre-dropout p; off-block entries have
        # p == 0 so ds vanishes there — no re-masking needed. The score
        # scale is applied to the [R, dh] results, not the [R, R] ds.
        ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
        ds_m = ds.astype(q_h.dtype)
        dq = _dot(ds_m, k_h, DIMS_AB) * scale  # [R, dh]
        dk = _dot(ds_m, q_h, DIMS_ATB) * scale  # [R(keys), dh]
        dqkv_ref[:, h * dh : (h + 1) * dh] = dq.astype(dqkv_ref.dtype)
        dqkv_ref[:, D + h * dh : D + (h + 1) * dh] = dk.astype(dqkv_ref.dtype)
        dqkv_ref[:, 2 * D + h * dh : 2 * D + (h + 1) * dh] = dv.astype(
            dqkv_ref.dtype
        )


def _pallas_fwd(qkv, mask, seed, *, H, dh, L, rate, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = mask.shape[0]
    TN = _tile_n(L)
    R = TN * L
    grid = (N // TN,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, dh=dh, TN=TN, L=L, rate=rate),
        out_shape=jax.ShapeDtypeStruct((N * L, H * dh), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((R, 3 * H * dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((R, 1), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (R, H * dh), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        compiler_params=_compiler_params(),
        interpret=interpret,
    )(qkv, mask.astype(jnp.float32).reshape(N * L, 1), seed)


def _pallas_bwd(qkv, mask, seed, dout, *, H, dh, L, rate, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = mask.shape[0]
    TN = _tile_n(L)
    R = TN * L
    grid = (N // TN,)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, dh=dh, TN=TN, L=L, rate=rate),
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
    )(qkv, mask.astype(jnp.float32).reshape(N * L, 1), seed, dout)


# ---------------------------------------------------------------------------
# XLA reference composition (fallback + test oracle)
# ---------------------------------------------------------------------------


def _xla_core(qkv, mask, *, H, dh, L, dropout_mask=None):
    N = mask.shape[0]
    D = H * dh
    q, k, v = jnp.split(qkv, 3, axis=-1)
    rs = lambda t: t.reshape(N, L, H, dh).transpose(0, 2, 1, 3)  # noqa: E731
    q, k, v = rs(q), rs(k), rs(v)
    s = jnp.einsum("nhqd,nhkd->nhqk", q.astype(jnp.float32), k.astype(jnp.float32))
    s = s / (dh ** 0.5)
    s = jnp.where(mask[:, None, None, :] > 0, s, jnp.float32(-1e30))
    p = jax.nn.softmax(s, axis=-1)
    if dropout_mask is not None:
        p = p * dropout_mask
    o = jnp.einsum("nhqk,nhkd->nhqd", p, v.astype(jnp.float32))
    return o.transpose(0, 2, 1, 3).reshape(N * L, D).astype(qkv.dtype)


# ---------------------------------------------------------------------------
# custom-VJP entry point
# ---------------------------------------------------------------------------


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7)
)
def _attention_core_tpu(qkv, mask, seed, H, dh, L, rate, interpret):
    return _pallas_fwd(
        qkv, mask, seed, H=H, dh=dh, L=L, rate=rate, interpret=interpret
    )


def _ac_fwd(qkv, mask, seed, H, dh, L, rate, interpret):
    out = _pallas_fwd(
        qkv, mask, seed, H=H, dh=dh, L=L, rate=rate, interpret=interpret
    )
    return out, (qkv, mask, seed)


def _ac_bwd(H, dh, L, rate, interpret, res, g):
    qkv, mask, seed = res
    dqkv = _pallas_bwd(
        qkv, mask, seed, g.astype(qkv.dtype),
        H=H, dh=dh, L=L, rate=rate, interpret=interpret,
    )
    return dqkv, None, None


_attention_core_tpu.defvjp(_ac_fwd, _ac_bwd)


def attention_core(
    qkv: jnp.ndarray,          # [N*L, 3D] fused projections
    mask: jnp.ndarray,         # [N, L] key-padding mask (1 = attend)
    *,
    n_heads: int,
    seq_len: int,
    dropout_rate: float = 0.0,
    dropout_rng: Optional[jax.Array] = None,  # required when rate > 0
    interpret: bool = False,
    force_xla: bool = False,
) -> jnp.ndarray:
    """All-heads attention over the fused qkv, flat in/flat out.

    TPU: single Pallas kernel (custom VJP, in-kernel dropout). Elsewhere:
    XLA composition with jax.random dropout (autodiff handles the VJP).
    """
    D3 = qkv.shape[-1]
    dh = D3 // 3 // n_heads
    L = seq_len
    # The kernel targets the reference's short-sequence regime (its win was
    # measured at L=18). At larger L the [R, R] block-diagonal form wastes
    # quadratically more work and XLA handles long-L attention fine.
    if L > 32:
        force_xla = True
    if (interpret or on_tpu()) and not force_xla:
        if dropout_rate > 0:
            if dropout_rng is None:
                raise ValueError("dropout_rng required when dropout_rate > 0")
            seed = jax.random.randint(
                dropout_rng, (1,), 0, jnp.iinfo(jnp.int32).max, dtype=jnp.int32
            )
        else:
            seed = jnp.zeros((1,), jnp.int32)
        # Pad the sequence count to the tile multiple (fully-masked pad
        # rows, sliced off after).
        N = mask.shape[0]
        rows = qkv.shape[0]
        pad = (-N) % _tile_n(L)
        if pad:
            qkv = jnp.concatenate(
                [qkv, jnp.zeros((pad * L, D3), qkv.dtype)], axis=0
            )
            mask = jnp.concatenate(
                [mask, jnp.zeros((pad, L), mask.dtype)], axis=0
            )
        out = _attention_core_tpu(
            qkv, mask, seed, n_heads, dh, L, float(dropout_rate), interpret
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
    return _xla_core(qkv, mask, H=n_heads, dh=dh, L=L, dropout_mask=dropout_mask)
