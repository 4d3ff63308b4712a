#!/usr/bin/env python
"""Whole-block-kernel question, settled with artifacts (VERDICT round-2
item 2): full-train-step A/B of the fused-FFN Pallas forward at several
row-tile sizes against the shipped XLA FFN composition.

Context: with ``use_pallas_attn_block`` ON (the round-2 default) the
attention half of every transformer block already runs as ONE fused Pallas
forward. Turning ``use_pallas_ffn`` ON therefore makes the ENTIRE block a
composition of two fused Pallas forwards — the "whole-layer kernel" modulo
one [M, D] boundary between them (~45 MB/layer of HBM round-trip ≈ 0.05 ms
at 819 GB/s, which bounds what a monolithic single-kernel block could add
on top of this composition; its VMEM cost — all four weight matrices
resident, ~14 MB bf16, plus activations — is why the composition is the
right "best variant" to measure).

Round 1 measured the FFN kernel at TR=128 rows: standalone fwd win (2.5 vs
3.1 ms) but full-step REGRESSION (58.1 vs 53.3 ms). Hypotheses worth
retesting on the round-3 tree: (a) the step composition changed (attn_block
landed after that measurement), (b) 128-row tiles give each program only
~1.2 GFLOP — bigger tiles (256/512, VMEM limit raised past Mosaic's 16 MB
default) amortize launch/stream overhead like the rounding-kernel analysis
suggests.

Each (tile, vmem) config is a FRESH Mosaic program -> sacrificial child
under a timeout (remote Mosaic compiles can HANG, CLAUDE.md). The child
checks numerics vs the XLA oracle at small shape before timing the full
flagship step.

Run:  python bench/ffn_step_sweep.py            (real TPU)
      python bench/ffn_step_sweep.py --one xla  (child mode)
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

# name -> (use_pallas_ffn, DIC_FFN_TILE_ROWS, DIC_FFN_VMEM_MB)
VARIANTS = {
    "xla": (False, 128, 0),            # shipped default (ffn XLA composition)
    "pallas_tr128": (True, 128, 0),    # round-1 form, re-measured on this tree
    "pallas_tr256_v32": (True, 256, 32),
    "pallas_tr512_v64": (True, 512, 64),
}


def child(name: str, iters: int) -> None:
    use_pallas, tr, vmem = VARIANTS[name]
    # env must be set before the ops module is imported
    os.environ["DIC_FFN_TILE_ROWS"] = str(tr)
    os.environ["DIC_FFN_VMEM_MB"] = str(vmem)

    import jax
    import jax.numpy as jnp
    import numpy as np

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )

    if use_pallas:
        # numerics vs the XLA oracle at a small shape (deterministic)
        from diffusion_image_captioning_tpu.ops.ffn_block import ffn_ln_block

        rng = np.random.default_rng(0)
        M, D, H = 2 * tr + 64, 768, 3072
        x = jnp.asarray(rng.normal(size=(M, D)), jnp.bfloat16)
        w1 = jnp.asarray(rng.normal(size=(D, H)) * 0.02, jnp.float32)
        b1 = jnp.asarray(rng.normal(size=(H,)) * 0.02, jnp.float32)
        w2 = jnp.asarray(rng.normal(size=(H, D)) * 0.02, jnp.float32)
        b2 = jnp.asarray(rng.normal(size=(D,)) * 0.02, jnp.float32)
        ga = jnp.ones((D,), jnp.float32)
        be = jnp.zeros((D,), jnp.float32)
        got = jax.jit(
            lambda x: ffn_ln_block(x, w1, b1, w2, b2, ga, be)
        )(x)
        want = jax.jit(
            lambda x: ffn_ln_block(x, w1, b1, w2, b2, ga, be, force_xla=True)
        )(x)
        err = float(
            jnp.max(jnp.abs(got.astype(jnp.float32) - want.astype(jnp.float32)))
        )
        assert err < 3e-2, f"numerics mismatch vs oracle: {err}"

    from bench import synthetic_batch
    from diffusion_image_captioning_tpu import train as tr_mod
    from diffusion_image_captioning_tpu.config import Config
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser

    cfg = Config(
        epoch_num=15, rounding_weight=0.3, compute_dtype="bfloat16",
        use_pallas_ffn=use_pallas,
    )
    model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
    tx = tr_mod.make_optimizer(cfg)
    state = tr_mod.init_train_state(cfg, params, tx)
    step = tr_mod.make_train_step(model, cfg, tx)
    batch = synthetic_batch(cfg)
    lam = jnp.asarray(cfg.rounding_weight, jnp.float32)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, lam)
    jax.block_until_ready(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, lam)
    jax.block_until_ready(metrics["total"])
    dt = (time.perf_counter() - t0) / iters
    print(json.dumps({
        "variant": name, "step_ms": round(dt * 1e3, 2),
        "steps_per_sec": round(1 / dt, 2),
        "loss": round(float(metrics["total"]), 3),
    }), flush=True)


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--one", default=None, choices=list(VARIANTS))
    p.add_argument("--iters", type=int, default=30)
    p.add_argument("--timeout", type=float, default=1800.0)
    args = p.parse_args()
    if args.one:
        child(args.one, args.iters)
        return
    for name in VARIANTS:
        try:
            r = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__),
                 "--one", name, "--iters", str(args.iters)],
                timeout=args.timeout, capture_output=True, text=True,
            )
            if r.returncode == 0 and r.stdout.strip():
                print(r.stdout.strip().splitlines()[-1], flush=True)
            else:
                err = (r.stderr or "").strip().splitlines()
                print(json.dumps({
                    "variant": name,
                    "error": (err[-1][:160] if err else f"rc={r.returncode}"),
                }), flush=True)
        except subprocess.TimeoutExpired:
            print(json.dumps({
                "variant": name,
                "error": f"TIMEOUT {args.timeout}s (possible Mosaic hang)",
            }), flush=True)


if __name__ == "__main__":
    main()
