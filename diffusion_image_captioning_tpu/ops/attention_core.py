"""Fused attention core: flat qkv in, flat context out, custom VJP.

Motivation (docs/PERF.md): at L=18, dh=64 the XLA attention path pays
~11 ms fwd per step in head transposes and 3.5x-padded per-head tiles —
half the encoder forward — despite negligible FLOPs. This kernel consumes
the fused QKV projection's natural [N*L, 3D] layout, computes all heads'
scaled-dot-product attention entirely in VMEM (one HBM read of qkv, one
HBM write of the context), and defines a recompute-based backward, so it
serves the TRAINING path too.

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

_TILE_N = 8  # max sequences per program (808 = 101 x 8 at flagship size)


def _tile_n(L: int) -> int:
    """Sequences per program, scaled so a tile's qkv block (+ dqkv in the
    backward) stays within the ~16MB VMEM budget at any L: ~256 rows/tile.
    L=18 -> 8 (flagship), L=128 -> 2 (lm-trial)."""
    return max(1, min(_TILE_N, 256 // L))


def _heads(block, H: int, dh: int, TN: int, L: int, part: int):
    """Slice all H head tensors of one part out of a [TN*L, 3D] qkv block,
    cast to fp32 eagerly. part: 0=q, 1=k, 2=v. List of [TN, L, dh] fp32.

    NOTE (Mosaic hazard, verified on the v5e remote compiler 2026-08-16):
    slicing lazily in input dtype — bf16 [TN*L, dh] -> [TN, L, dh] reshapes
    inside the head loop combined with a [TN*L, 1] mask delivery — makes the
    Mosaic compile HANG (>9 min, vs ~1-3 min for this form). Eager fp32
    slicing is safe here because L>32 routes to XLA (attention_core below),
    so the per-head working set is bounded: 3H fp32 [TN, L<=32, 64] tensors
    = <2.5 MB. Do not "optimize" this back to lazy/bf16 without re-verifying
    a real-TPU compile."""
    D = H * dh
    out = []
    for h in range(H):
        col = part * D + h * dh
        out.append(block[:, col : col + dh].reshape(TN, L, dh).astype(jnp.float32))
    return out


def _dropout_bits(shape, keep_scale, rate):
    """Regenerable dropout mask from the seeded in-kernel PRNG."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.prng_random_bits(shape)  # uint32
    thresh = jnp.uint32(int(rate * (2**32)))
    return jnp.where(bits >= thresh, keep_scale, 0.0)


def _fwd_kernel(qkv_ref, mask_ref, seed_ref, out_ref, *, H, dh, TN, L, rate):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    if rate > 0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    qkv = qkv_ref[:]
    mask = mask_ref[:]  # [TN, L]
    scale = 1.0 / (dh ** 0.5)
    keep_scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    neg = jnp.float32(-1e30)
    qs = _heads(qkv, H, dh, TN, L, 0)
    ks = _heads(qkv, H, dh, TN, L, 1)
    vs = _heads(qkv, H, dh, TN, L, 2)
    for h in range(H):
        s = jax.lax.dot_general(
            qs[h], ks[h], (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale  # [TN, L, L]
        s = jnp.where(mask[:, None, :] > 0, s, neg)
        s = s - s.max(axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / e.sum(axis=-1, keepdims=True)
        if rate > 0:
            p = p * _dropout_bits(p.shape, keep_scale, rate)
        o = jax.lax.dot_general(
            p, vs[h], (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TN, L, dh]
        out_ref[:, h * dh : (h + 1) * dh] = o.reshape(TN * L, dh).astype(
            out_ref.dtype
        )


def _bwd_kernel(
    qkv_ref, mask_ref, seed_ref, dout_ref, dqkv_ref, *, H, dh, TN, L, rate
):
    from jax.experimental.pallas import tpu as pltpu
    import jax.experimental.pallas as pl

    if rate > 0:
        pltpu.prng_seed(seed_ref[0], pl.program_id(0))
    qkv = qkv_ref[:]
    mask = mask_ref[:]  # [TN, L]
    dout = dout_ref[:]
    scale = 1.0 / (dh ** 0.5)
    keep_scale = 1.0 / (1.0 - rate) if rate > 0 else 1.0
    neg = jnp.float32(-1e30)
    D = H * dh
    qs = _heads(qkv, H, dh, TN, L, 0)
    ks = _heads(qkv, H, dh, TN, L, 1)
    vs = _heads(qkv, H, dh, TN, L, 2)
    for h in range(H):
        q_h, k_h, v_h = qs[h], ks[h], vs[h]
        s = jax.lax.dot_general(
            q_h, k_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        ) * scale
        s = jnp.where(mask[:, None, :] > 0, s, neg)
        s = s - s.max(axis=-1, keepdims=True)
        e = jnp.exp(s)
        p = e / e.sum(axis=-1, keepdims=True)  # pre-dropout softmax
        if rate > 0:
            # identical PRNG stream order as the forward: one draw per head
            drop = _dropout_bits(p.shape, keep_scale, rate)
            pd = p * drop
        else:
            drop = None
            pd = p
        do_h = dout[:, h * dh : (h + 1) * dh].reshape(TN, L, dh).astype(
            jnp.float32
        )
        # dv = pd^T @ do
        dv = jax.lax.dot_general(
            pd, do_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TN, L(keys), dh]
        # dpd = do @ v^T
        dpd = jax.lax.dot_general(
            do_h, v_h, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TN, L, L]
        if drop is not None:
            dp = dpd * drop
        else:
            dp = dpd
        # softmax backward on the pre-dropout p
        ds = p * (dp - (dp * p).sum(axis=-1, keepdims=True))
        ds = ds * scale
        # masked keys contributed 0 probability => ds already 0 there
        ds = ds.astype(qkv.dtype)
        dq = jax.lax.dot_general(
            ds, k_h, (((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TN, L, dh]
        dk = jax.lax.dot_general(
            ds, q_h, (((1,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32,
        )  # [TN, L(keys), dh]
        dqkv_ref[:, h * dh : (h + 1) * dh] = dq.reshape(TN * L, dh).astype(
            dqkv_ref.dtype
        )
        dqkv_ref[:, D + h * dh : D + (h + 1) * dh] = dk.reshape(TN * L, dh).astype(
            dqkv_ref.dtype
        )
        dqkv_ref[:, 2 * D + h * dh : 2 * D + (h + 1) * dh] = dv.reshape(
            TN * L, dh
        ).astype(dqkv_ref.dtype)


def _pallas_fwd(qkv, mask, seed, *, H, dh, L, rate, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = mask.shape[0]
    TN = _tile_n(L)
    grid = (N // TN,)
    return pl.pallas_call(
        functools.partial(_fwd_kernel, H=H, dh=dh, TN=TN, L=L, rate=rate),
        out_shape=jax.ShapeDtypeStruct((N * L, H * dh), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN * L, 3 * H * dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (TN * L, H * dh), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qkv, mask.astype(jnp.float32), seed)


def _pallas_bwd(qkv, mask, seed, dout, *, H, dh, L, rate, interpret):
    import jax.experimental.pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    N = mask.shape[0]
    TN = _tile_n(L)
    grid = (N // TN,)
    return pl.pallas_call(
        functools.partial(_bwd_kernel, H=H, dh=dh, TN=TN, L=L, rate=rate),
        out_shape=jax.ShapeDtypeStruct((N * L, 3 * H * dh), qkv.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TN * L, 3 * H * dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TN, L), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((TN * L, H * dh), lambda i: (i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (TN * L, 3 * H * dh), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(qkv, mask.astype(jnp.float32), seed, dout)


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


def on_tpu() -> bool:
    return any(d.platform in ("tpu", "axon") for d in jax.devices())


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
    # measured at L=18). At larger L the unrolled-head kernel's Mosaic
    # compile time explodes (tens of minutes at L=128 on the remote
    # compiler) for no expected gain — XLA handles long-L attention fine.
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
        # Mosaic requires (8, 128)-divisible blocks: pad the sequence count
        # to the tile multiple (fully-masked pad rows, sliced off after).
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
