"""Helpers shared by the Pallas op modules (attention_core, rounding,
ffn_block).

The dot_general dimension-numbers constants use unambiguous names — the
modules previously each defined private ``_NT``-style constants whose
meanings DISAGREED between files (a@b.T in one, a.T@b in another), an
accident waiting for any cross-module copy-paste.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

DIMS_AB = (((1,), (0,)), ((), ()))   # a @ b      : [m,k] x [k,n] -> [m,n]
DIMS_ABT = (((1,), (1,)), ((), ()))  # a @ b.T    : [m,k] x [n,k] -> [m,n]
DIMS_ATB = (((0,), (0,)), ((), ()))  # a.T @ b    : [k,m] x [k,n] -> [m,n]


def on_tpu() -> bool:
    """True on a real TPU backend (incl. the axon remote tunnel)."""
    return any(d.platform in ("tpu", "axon") for d in jax.devices())


def dot_f32(a, b, dims):
    """dot_general with fp32 accumulation regardless of operand dtype."""
    return jax.lax.dot_general(a, b, dims, preferred_element_type=jnp.float32)


def dropout_bits(shape, keep_scale, rate):
    """In-kernel dropout mask from the seeded TPU PRNG: ``keep_scale``
    where kept, 0 where dropped. Callers must have issued pltpu.prng_seed
    first; the mask is a pure function of the seeded stream position.

    The comparison is done in SIGNED int32 with a threshold shifted by
    -2^31. Mosaic lowers 32-bit integer comparisons as signed regardless
    of the uint32 dtype, so the naive ``bits >= rate * 2**32`` form kept
    only (0.5 - rate) of the elements (measured on v5e 2026-08-17: keep
    fraction 0.200 at rate=0.3). Reinterpreting the uniform bits as int32
    and comparing against ``rate * 2**32 - 2**31`` gives the correct
    1 - rate keep probability under either signedness convention."""
    from jax.experimental.pallas import tpu as pltpu

    bits = pltpu.prng_random_bits(shape)  # uniform 32-bit
    bits_i32 = jax.lax.bitcast_convert_type(bits, jnp.int32)
    thresh = jnp.int32(int(rate * (2 ** 32)) - 2 ** 31)
    return jnp.where(bits_i32 >= thresh, keep_scale, 0.0)
