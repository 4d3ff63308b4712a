#!/usr/bin/env python
"""Tile sweep for the rounding-loss op at flagship shape (M=12928, C=768,
V=30522): Pallas forward (tile_m x tile_v) and XLA-chunked backward (tile).

Round-1 shipped tile_m=256/tile_v=1024; the round-2 breakdown put the
forward at ~48% MXU (each program computes only ~0.4 GFLOP — launch/
accumulator overhead dominates). Run:  python bench/rounding_sweep.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    from diffusion_image_captioning_tpu.ops.rounding import (
        _xla_chunked_bwd,
        _xla_chunked_fwd,
    )
    from diffusion_image_captioning_tpu.ops.rounding_pallas import pallas_logprob

    M, C, V = 12928, 768, 30522
    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(M, C)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(C, V)) * 0.02, jnp.float32)
    idx = jnp.asarray(rng.integers(0, V, (M,)).astype(np.int32))

    def timed(fn, iters=20):
        out = fn()
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    print("== Pallas forward (tile_m x tile_v) ==")
    for tm in (256, 512, 1024):
        for tv in (1024, 2048, 4096):
            f = jax.jit(
                lambda tm=tm, tv=tv: pallas_logprob(
                    h, W, idx, tile_m=tm, tile_v=tv, dtype=jnp.bfloat16
                )[0]
            )
            try:
                ms = timed(f)
                print(f"  tile {tm:5d} x {tv:5d}: {ms:6.2f} ms")
            except Exception as e:  # noqa: BLE001 — sweep survives OOM tiles
                print(f"  tile {tm:5d} x {tv:5d}: FAILED {type(e).__name__}")

    print("== XLA scan forward (tile) ==")
    for tv in (1024, 2048, 4096):
        f = jax.jit(
            lambda tv=tv: _xla_chunked_fwd(h, W, idx, tv, jnp.bfloat16)[0]
        )
        print(f"  tile {tv:5d}: {timed(f):6.2f} ms")

    print("== XLA scan backward dh-only (tile) ==")
    lse = jax.jit(
        lambda: pallas_logprob(h, W, idx, tile_m=256, tile_v=1024,
                               dtype=jnp.bfloat16)[1]
    )()
    g = jnp.ones((M,), jnp.float32)
    for tv in (1024, 2048, 4096):
        f = jax.jit(
            lambda tv=tv: _xla_chunked_bwd(
                h, W, idx, lse, g, tv, jnp.bfloat16
            )[0]
        )
        print(f"  tile {tv:5d}: {timed(f):6.2f} ms")


if __name__ == "__main__":
    main()
