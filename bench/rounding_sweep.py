#!/usr/bin/env python
"""Tile sweep for the rounding-loss op at flagship shape (M=12928, C=768,
V=30522): Pallas forward (tile_m x tile_v) and XLA-chunked backward (tile).

Round-1 shipped tile_m=256/tile_v=1024; the round-2 breakdown put the
forward at ~48% MXU (each program computes only ~0.4 GFLOP — launch/
accumulator overhead dominates). Run:  python bench/rounding_sweep.py

Each Pallas (tile_m, tile_v) config is a FRESH Mosaic program and runs in
a sacrificial child under a timeout — remote Mosaic compiles can HANG
instead of erroring (CLAUDE.md; ops/pallas_guard.py pattern). The XLA
scan variants can't hang and run in the parent.
"""

import argparse
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

M, C, V = 12928, 768, 30522


def _inputs():
    import jax.numpy as jnp
    import numpy as np

    rng = np.random.default_rng(0)
    h = jnp.asarray(rng.normal(size=(M, C)), jnp.float32)
    W = jnp.asarray(rng.normal(size=(C, V)) * 0.02, jnp.float32)
    idx = jnp.asarray(rng.integers(0, V, (M,)).astype(np.int32))
    return h, W, idx


def _timed(fn, iters=20):
    import jax

    out = fn()
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def child_pallas(tm: int, tv: int) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    from diffusion_image_captioning_tpu.ops.rounding_pallas import pallas_logprob

    h, W, idx = _inputs()
    f = jax.jit(
        lambda: pallas_logprob(h, W, idx, tile_m=tm, tile_v=tv,
                               dtype=jnp.bfloat16)[0]
    )
    print(f"  tile {tm:5d} x {tv:5d}: {_timed(f):6.2f} ms", flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--one", nargs=2, type=int, default=None,
                   metavar=("TM", "TV"), help="child mode: one Pallas config")
    p.add_argument("--timeout", type=float, default=600.0)
    args = p.parse_args()
    if args.one:
        child_pallas(*args.one)
        return

    print("== Pallas forward (tile_m x tile_v, watchdogged children) ==")
    for tm in (256, 512, 1024):
        for tv in (1024, 2048, 4096):
            try:
                r = subprocess.run(
                    [sys.executable, "-u", os.path.abspath(__file__),
                     "--one", str(tm), str(tv)],
                    timeout=args.timeout, capture_output=True, text=True,
                )
                if r.returncode == 0 and r.stdout.strip():
                    print(r.stdout.strip().splitlines()[-1], flush=True)
                else:
                    err = (r.stderr or "").strip().splitlines()
                    print(f"  tile {tm:5d} x {tv:5d}: FAILED "
                          f"{err[-1][:80] if err else ''}", flush=True)
            except subprocess.TimeoutExpired:
                print(f"  tile {tm:5d} x {tv:5d}: TIMEOUT {args.timeout}s "
                      "(possible Mosaic hang)", flush=True)

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    from diffusion_image_captioning_tpu.ops.rounding import (
        _xla_chunked_bwd,
        _xla_chunked_fwd,
    )
    from diffusion_image_captioning_tpu.ops.rounding_pallas import pallas_logprob

    h, W, idx = _inputs()

    print("== XLA scan forward (tile) ==")
    for tv in (1024, 2048, 4096):
        f = jax.jit(
            lambda tv=tv: _xla_chunked_fwd(h, W, idx, tv, jnp.bfloat16)[0]
        )
        print(f"  tile {tv:5d}: {_timed(f):6.2f} ms")

    print("== XLA scan backward dh-only (tile) ==")
    # the production-shape pallas_logprob is guard-probed/cached by bench.py
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
        print(f"  tile {tv:5d}: {_timed(f):6.2f} ms")


if __name__ == "__main__":
    main()
