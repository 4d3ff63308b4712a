#!/usr/bin/env python
"""Sweep the attention-kernel tile size R (= TN*L flat rows) x the Mosaic
scoped-VMEM limit, on the real TPU, at flagship shapes.

Round 1 shipped R=360 because R=432's backward needed 16.26 MB scoped VMEM
against Mosaic's 16 MB DEFAULT limit inside the train-step jit — but v5e
has 128 MB physical VMEM and pltpu.CompilerParams(vmem_limit_bytes) lifts
the default (the headroom it preserves is for double buffering these
single-block-per-step kernels barely use). Standalone round-1 numbers said
R=432 is ~0.6 ms/layer faster forward (docs/PERF.md).

Each (tile, vmem) config runs in a SACRIFICIAL CHILD under a timeout:
fresh kernel forms can HANG the remote Mosaic compiler (CLAUDE.md;
ops/pallas_guard.py). The child checks numerics vs the XLA oracle before
timing. Usage:  python bench/attn_tile_sweep.py
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

CONFIGS = [  # (tile_rows, vmem_mb; 0 = Mosaic default)
    (360, 0),
    (360, 64),
    (432, 64),
    (576, 64),
    (720, 100),
    (864, 100),
]


def child(tile: int, vmem: int) -> None:
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    from diffusion_image_captioning_tpu.ops import attn_block as ab

    H, dh, L, N = 12, 64, 18, 808  # flagship: 800 x_t rows + 8 x_1 rows
    D = H * dh
    ks = jax.random.split(jax.random.PRNGKey(0), 8)
    x = jax.random.normal(ks[0], (N * L, D), jnp.bfloat16)
    wqkv = jax.random.normal(ks[1], (D, 3 * D)) * 0.02
    bqkv = jnp.zeros((3 * D,))
    wout = jax.random.normal(ks[2], (D, D)) * 0.02
    bout = jnp.zeros((D,))
    gamma = jnp.ones((D,))
    beta = jnp.zeros((D,))
    mask = jnp.ones((N, L), jnp.float32)
    rng = jax.random.PRNGKey(3)

    def block(x, wqkv, bqkv, wout, bout, gamma, beta, rate, rng):
        return ab.attn_ln_block(
            x, wqkv, bqkv, wout, bout, gamma, beta, mask,
            n_heads=H, seq_len=L, dropout_rate=rate, dropout_rng=rng,
        )

    args = (x, wqkv, bqkv, wout, bout, gamma, beta)

    # numerics vs XLA oracle (rate 0)
    f0 = jax.jit(lambda *a: block(*a, 0.0, None))
    out = f0(*args)
    oracle = ab._xla_block(
        x, wqkv, bqkv, wout, bout, gamma, beta, mask, H=H, L=L, eps=1e-12
    )
    err = float(
        jnp.abs(out.astype(jnp.float32) - oracle.astype(jnp.float32)).max()
    )
    assert err < 5e-2, f"fwd mismatch vs oracle: {err}"

    def loss(a, rng):
        return block(*a, 0.1, rng).astype(jnp.float32).sum()

    g = jax.jit(jax.grad(loss))
    _ = jax.block_until_ready(g(args, rng))

    def timed(fn, *a, iters=30, warm=3):
        o = None
        for _ in range(warm):
            o = fn(*a)
        jax.block_until_ready(o)
        t0 = time.perf_counter()
        for _ in range(iters):
            o = fn(*a)
        jax.block_until_ready(o)
        return (time.perf_counter() - t0) / iters * 1e3

    fd = jax.jit(lambda *a: block(*a, 0.1, rng))
    t_fwd = timed(fd, *args)
    t_fb = timed(g, args, rng)
    print(json.dumps({
        "tile": tile, "vmem_mb": vmem, "fwd_ms": round(t_fwd, 3),
        "fwd_bwd_ms": round(t_fb, 3), "max_err": err,
    }))


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--child", action="store_true")
    p.add_argument("--tile", type=int, default=360)
    p.add_argument("--vmem", type=int, default=0)
    p.add_argument("--timeout", type=float, default=900.0)
    a = p.parse_args()
    if a.child:
        child(a.tile, a.vmem)
        return
    for tile, vmem in CONFIGS:
        env = dict(os.environ)
        env["DIC_ATTN_TILE_ROWS"] = str(tile)
        env["DIC_ATTN_VMEM_MB"] = str(vmem)
        try:
            r = subprocess.run(
                [sys.executable, __file__, "--child",
                 "--tile", str(tile), "--vmem", str(vmem)],
                timeout=a.timeout, capture_output=True, text=True, env=env,
            )
            line = [l for l in r.stdout.splitlines() if l.startswith("{")]
            if r.returncode == 0 and line:
                print(line[-1], flush=True)
            else:
                tail = (r.stderr or "").strip().splitlines()[-4:]
                print(json.dumps({
                    "tile": tile, "vmem_mb": vmem, "error": " | ".join(tail)
                }), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({
                "tile": tile, "vmem_mb": vmem,
                "error": f"TIMEOUT {a.timeout}s (possible Mosaic hang)",
            }), flush=True)


if __name__ == "__main__":
    main()
