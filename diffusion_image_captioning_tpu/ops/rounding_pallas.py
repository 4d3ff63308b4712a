"""Pallas TPU kernel: streamed gathered-log-softmax forward.

Computes logp[m] = z[m, idx[m]] - logsumexp_v z[m, v] with z = h @ W,
never materializing z. Grid = (M tiles, V tiles) with the vocab as the
minormost (sequential) dimension; per-row online max/sum accumulators live
in VMEM scratch across the vocab sweep (flash-attention-style reduction,
applied to the vocab classifier). The [TM, C] activation block stays
resident while W streams through VMEM, so HBM traffic is
|h| + |W| + |out| — the speed-of-light minimum for this contraction.

Used as the forward of ops.rounding.fused_logprob on TPU; the backward
reuses the XLA-chunked recompute path (same memory bound, MXU-dominated).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from diffusion_image_captioning_tpu.ops.common import DIMS_AB, DIMS_ABT, DIMS_ATB


def _kernel(
    idx_ref, h_ref, w_ref, out_ref, lse_ref, m_acc, s_acc, t_acc,
    *, true_v, tile_v
):
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_acc[:] = jnp.full_like(m_acc, -jnp.inf)
        s_acc[:] = jnp.zeros_like(s_acc)
        t_acc[:] = jnp.zeros_like(t_acc)

    h = h_ref[:]  # [TM, C] already in the matmul dtype (cast by the caller)
    w = w_ref[:]  # [C, TV]
    z = jax.lax.dot_general(
        h, w, DIMS_AB, preferred_element_type=jnp.float32
    )  # [TM, TV] fp32 accumulation
    base = j * tile_v
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) + base
    z = jnp.where(col < true_v, z, -jnp.inf)

    m_prev = m_acc[:, 0]  # [TM]
    zmax = z.max(axis=-1)
    m_new = jnp.maximum(m_prev, zmax)
    # exp(-inf - -inf) guard: where m_new is still -inf nothing accumulated
    scale = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
    s_new = s_acc[:, 0] * scale + jnp.where(
        jnp.isfinite(z), jnp.exp(z - m_new[:, None]), 0.0
    ).sum(axis=-1)
    m_acc[:, 0] = m_new
    s_acc[:, 0] = s_new

    idx = idx_ref[:, 0]  # [TM] int32 (kept 2-D in VMEM for layout, see caller)
    hit = col == idx[:, None]
    t_here = jnp.where(hit, z, 0.0).sum(axis=-1)
    t_acc[:, 0] = t_acc[:, 0] + t_here

    @pl.when(j == nj - 1)
    def _():
        lse = m_acc[:, 0] + jnp.log(s_acc[:, 0])
        out_ref[:, 0] = t_acc[:, 0] - lse
        lse_ref[:, 0] = lse


def _dh_kernel(idx_ref, g_ref, lse_ref, h_ref, w_ref, dh_ref, acc, *, true_v, tile_v):
    """dh = sum_v dz[:, v] W[:, v]^T with dz = g * (onehot - softmax),
    recomputing z per vocab tile. Grid (M tiles, V tiles), V minormost."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    h = h_ref[:]
    w = w_ref[:]  # [C, TV]
    z = jax.lax.dot_general(
        h, w, DIMS_AB, preferred_element_type=jnp.float32
    )
    base = j * tile_v
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) + base
    lse = lse_ref[:, 0]
    p = jnp.where(col < true_v, jnp.exp(z - lse[:, None]), 0.0)
    onehot = (col == idx_ref[:, 0][:, None]).astype(jnp.float32)
    dz = g_ref[:, 0][:, None] * (onehot - p)  # [TM, TV] fp32
    acc[:] = acc[:] + jax.lax.dot_general(
        dz.astype(w.dtype), w, DIMS_ABT,
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nj - 1)
    def _():
        dh_ref[:] = acc[:].astype(dh_ref.dtype)


def _dw_kernel(idx_ref, g_ref, lse_ref, h_ref, w_ref, dw_ref, acc, *, true_v, tile_v):
    """dW[:, tile] = sum_m h[m]^T dz[m, tile]. Grid (V tiles, M tiles),
    M minormost so the dW tile accumulates in scratch."""
    from jax.experimental import pallas as pl

    i = pl.program_id(1)
    ni = pl.num_programs(1)

    @pl.when(i == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    h = h_ref[:]  # [TM, C]
    w = w_ref[:]  # [C, TV]
    z = jax.lax.dot_general(
        h, w, DIMS_AB, preferred_element_type=jnp.float32
    )
    base = pl.program_id(0) * tile_v
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) + base
    lse = lse_ref[:, 0]
    p = jnp.where(col < true_v, jnp.exp(z - lse[:, None]), 0.0)
    onehot = (col == idx_ref[:, 0][:, None]).astype(jnp.float32)
    dz = g_ref[:, 0][:, None] * (onehot - p)  # [TM, TV]
    acc[:] = acc[:] + jax.lax.dot_general(
        h, dz.astype(h.dtype), DIMS_ATB,
        preferred_element_type=jnp.float32,
    )  # [C, TV]

    @pl.when(i == ni - 1)
    def _():
        dw_ref[:] = acc[:].astype(dw_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_m", "tile_v", "interpret", "dtype")
)
def pallas_logprob_bwd(
    h: jnp.ndarray,        # [M, C]
    kernel: jnp.ndarray,   # [C, V]
    idx: jnp.ndarray,      # [M] int32
    lse: jnp.ndarray,      # [M] fp32 (saved by the forward)
    g: jnp.ndarray,        # [M] fp32 cotangent
    *,
    tile_m: int = 256,
    tile_v: int = 1024,
    interpret: bool = False,
    dtype=jnp.float32,
):
    """(dh [M, C] fp32, dW [C, V] fp32) via two streaming kernels. When the
    vocab head is frozen, the unused dW pallas_call is dead-code-eliminated
    by XLA."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    M, C = h.shape
    V = kernel.shape[1]
    h = h.astype(dtype)
    kernel = kernel.astype(dtype)
    pad_m = (-M) % tile_m
    pad_v = (-V) % tile_v
    Mp, Vp = M + pad_m, V + pad_v
    if pad_m:
        h = jnp.pad(h, ((0, pad_m), (0, 0)))
        idx = jnp.pad(idx, (0, pad_m))
        lse = jnp.pad(lse, (0, pad_m), constant_values=1.0)
        g = jnp.pad(g, (0, pad_m))  # zero cotangent -> zero dz for pad rows
    if pad_v:
        kernel = jnp.pad(kernel, ((0, 0), (0, pad_v)))
    idx2 = idx.reshape(Mp, 1)
    lse2 = lse.astype(jnp.float32).reshape(Mp, 1)
    g2 = g.astype(jnp.float32).reshape(Mp, 1)

    row_specs = [
        pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, tile_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
    ]
    dh = pl.pallas_call(
        functools.partial(_dh_kernel, true_v=V, tile_v=tile_v),
        out_shape=jax.ShapeDtypeStruct((Mp, C), jnp.float32),
        grid=(Mp // tile_m, Vp // tile_v),
        in_specs=row_specs,
        out_specs=pl.BlockSpec(
            (tile_m, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((tile_m, C), jnp.float32)],
        interpret=interpret,
    )(idx2, g2, lse2, h, kernel)

    col_specs = [
        pl.BlockSpec((tile_m, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, 1), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((tile_m, C), lambda j, i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((C, tile_v), lambda j, i: (0, j), memory_space=pltpu.VMEM),
    ]
    dW = pl.pallas_call(
        functools.partial(_dw_kernel, true_v=V, tile_v=tile_v),
        out_shape=jax.ShapeDtypeStruct((C, Vp), jnp.float32),
        grid=(Vp // tile_v, Mp // tile_m),
        in_specs=col_specs,
        out_specs=pl.BlockSpec(
            (C, tile_v), lambda j, i: (0, j), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((C, tile_v), jnp.float32)],
        interpret=interpret,
    )(idx2, g2, lse2, h, kernel)
    return dh[:M], dW[:, :V]


def _kernel_savez(
    idx_ref, h_ref, w_ref, out_ref, lse_ref, z_ref, m_acc, s_acc, t_acc,
    *, true_v, tile_v
):
    """_kernel plus a bf16 copy of the logits tile written to HBM: the
    backward then skips its 2*M*C*V recompute matmul entirely (trading
    ~|z| bf16 of HBM for a full MXU pass — docs/PERF.md round 2)."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        m_acc[:] = jnp.full_like(m_acc, -jnp.inf)
        s_acc[:] = jnp.zeros_like(s_acc)
        t_acc[:] = jnp.zeros_like(t_acc)

    h = h_ref[:]
    w = w_ref[:]
    z = jax.lax.dot_general(
        h, w, DIMS_AB, preferred_element_type=jnp.float32
    )
    z_ref[:] = z.astype(z_ref.dtype)
    base = j * tile_v
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) + base
    z = jnp.where(col < true_v, z, -jnp.inf)

    m_prev = m_acc[:, 0]
    zmax = z.max(axis=-1)
    m_new = jnp.maximum(m_prev, zmax)
    scale = jnp.where(jnp.isfinite(m_prev), jnp.exp(m_prev - m_new), 0.0)
    s_new = s_acc[:, 0] * scale + jnp.where(
        jnp.isfinite(z), jnp.exp(z - m_new[:, None]), 0.0
    ).sum(axis=-1)
    m_acc[:, 0] = m_new
    s_acc[:, 0] = s_new

    idx = idx_ref[:, 0]
    hit = col == idx[:, None]
    t_acc[:, 0] = t_acc[:, 0] + jnp.where(hit, z, 0.0).sum(axis=-1)

    @pl.when(j == nj - 1)
    def _():
        lse = m_acc[:, 0] + jnp.log(s_acc[:, 0])
        out_ref[:, 0] = t_acc[:, 0] - lse
        lse_ref[:, 0] = lse


def _dh_from_z_kernel(
    idx_ref, g_ref, lse_ref, z_ref, w_ref, dh_ref, acc, *, true_v, tile_v
):
    """dh accumulation from SAVED logits: dz = g * (onehot - exp(z - lse)),
    dh += dz @ W_tile^T. Identical math to _dh_kernel minus its h @ W
    recompute. Grid (M tiles, V tiles), V minormost."""
    from jax.experimental import pallas as pl

    j = pl.program_id(1)
    nj = pl.num_programs(1)

    @pl.when(j == 0)
    def _():
        acc[:] = jnp.zeros_like(acc)

    z = z_ref[:].astype(jnp.float32)  # [TM, TV] (bf16 storage)
    w = w_ref[:]
    base = j * tile_v
    col = jax.lax.broadcasted_iota(jnp.int32, z.shape, 1) + base
    lse = lse_ref[:, 0]
    p = jnp.where(col < true_v, jnp.exp(z - lse[:, None]), 0.0)
    onehot = (col == idx_ref[:, 0][:, None]).astype(jnp.float32)
    dz = g_ref[:, 0][:, None] * (onehot - p)
    acc[:] = acc[:] + jax.lax.dot_general(
        dz.astype(w.dtype), w, DIMS_ABT,
        preferred_element_type=jnp.float32,
    )

    @pl.when(j == nj - 1)
    def _():
        dh_ref[:] = acc[:].astype(dh_ref.dtype)


@functools.partial(
    jax.jit, static_argnames=("tile_m", "tile_v", "interpret", "dtype")
)
def pallas_logprob_savez(
    h: jnp.ndarray,
    kernel: jnp.ndarray,
    idx: jnp.ndarray,
    *,
    tile_m: int = 256,
    tile_v: int = 1024,
    interpret: bool = False,
    dtype=jnp.float32,
):
    """(logp [M], lse [M], z [Mp, Vp] bf16) — forward that materializes the
    logits (padded shape) for a recompute-free backward."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    h = h.astype(dtype)
    kernel = kernel.astype(dtype)
    M, C = h.shape
    V = kernel.shape[1]
    pad_m = (-M) % tile_m
    pad_v = (-V) % tile_v
    Mp, Vp = M + pad_m, V + pad_v
    if pad_m:
        h = jnp.pad(h, ((0, pad_m), (0, 0)))
        idx = jnp.pad(idx, (0, pad_m))
    if pad_v:
        kernel = jnp.pad(kernel, ((0, 0), (0, pad_v)))
    idx2 = idx.reshape(Mp, 1)

    grid = (Mp // tile_m, Vp // tile_v)
    out, lse, z = pl.pallas_call(
        functools.partial(
            _kernel_savez, true_v=V, tile_v=tile_v
        ),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, Vp), jnp.bfloat16),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_v), lambda i, j: (i, j), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_m, 1), jnp.float32),
            pltpu.VMEM((tile_m, 1), jnp.float32),
            pltpu.VMEM((tile_m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(idx2, h, kernel)
    return out[:M, 0], lse[:M, 0], z


@functools.partial(
    jax.jit,
    static_argnames=("m_true", "tile_m", "tile_v", "interpret", "dtype"),
)
def pallas_dh_from_z(
    z: jnp.ndarray,        # [Mp, Vp] bf16 (padded, from pallas_logprob_savez)
    kernel: jnp.ndarray,   # [C, V]
    idx: jnp.ndarray,      # [M] int32
    lse: jnp.ndarray,      # [M] fp32
    g: jnp.ndarray,        # [M] fp32
    *,
    m_true: int,
    tile_m: int = 256,
    tile_v: int = 1024,
    interpret: bool = False,
    dtype=jnp.float32,
):
    """dh [M, C] fp32 from saved logits — no recompute matmul."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    Mp, Vp = z.shape
    C, V = kernel.shape
    kernel = kernel.astype(dtype)
    if Vp != V:
        kernel = jnp.pad(kernel, ((0, 0), (0, Vp - V)))
    pad_m = Mp - m_true
    if pad_m:
        idx = jnp.pad(idx, (0, pad_m))
        lse = jnp.pad(lse, (0, pad_m), constant_values=1.0)
        g = jnp.pad(g, (0, pad_m))  # zero cotangent -> zero dz for pad rows
    idx2 = idx.reshape(Mp, 1)
    lse2 = lse.astype(jnp.float32).reshape(Mp, 1)
    g2 = g.astype(jnp.float32).reshape(Mp, 1)

    dh = pl.pallas_call(
        functools.partial(_dh_from_z_kernel, true_v=V, tile_v=tile_v),
        out_shape=jax.ShapeDtypeStruct((Mp, C), jnp.float32),
        grid=(Mp // tile_m, Vp // tile_v),
        in_specs=[
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, tile_v), lambda i, j: (i, j), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.VMEM((tile_m, C), jnp.float32)],
        interpret=interpret,
    )(idx2, g2, lse2, z, kernel)
    return dh[:m_true]


@functools.partial(
    jax.jit, static_argnames=("tile_m", "tile_v", "interpret", "dtype")
)
def pallas_logprob(
    h: jnp.ndarray,        # [M, C] (any float dtype; accumulated fp32)
    kernel: jnp.ndarray,   # [C, V]
    idx: jnp.ndarray,      # [M] int32
    *,
    tile_m: int = 256,
    tile_v: int = 1024,
    interpret: bool = False,
    dtype=jnp.float32,     # MXU input dtype; fp32 accumulation regardless
) -> jnp.ndarray:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # Cast in HBM so VMEM blocks (and HBM reads) shrink under bf16; the
    # kernel's dot accumulates fp32 either way. ~16MB VMEM/core budget:
    # w block tile_v*C*bytes x2 (double buffer) dominates.
    h = h.astype(dtype)
    kernel = kernel.astype(dtype)
    M, C = h.shape
    V = kernel.shape[1]
    pad_m = (-M) % tile_m
    pad_v = (-V) % tile_v
    Mp, Vp = M + pad_m, V + pad_v
    if pad_m:
        h = jnp.pad(h, ((0, pad_m), (0, 0)))
        idx = jnp.pad(idx, (0, pad_m))
    if pad_v:
        kernel = jnp.pad(kernel, ((0, 0), (0, pad_v)))
    # 1-D int32 operands trip XLA/Mosaic tiling-layout mismatches; keep idx
    # 2-D throughout.
    idx2 = idx.reshape(Mp, 1)

    grid = (Mp // tile_m, Vp // tile_v)
    out, lse = pl.pallas_call(
        functools.partial(_kernel, true_v=V, tile_v=tile_v),
        out_shape=(
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
            jax.ShapeDtypeStruct((Mp, 1), jnp.float32),
        ),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, C), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((C, tile_v), lambda i, j: (0, j), memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_m, 1), lambda i, j: (i, 0), memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.VMEM((tile_m, 1), jnp.float32),
            pltpu.VMEM((tile_m, 1), jnp.float32),
            pltpu.VMEM((tile_m, 1), jnp.float32),
        ],
        interpret=interpret,
    )(idx2, h, kernel)
    return out[:M, 0], lse[:M, 0]
