#!/usr/bin/env python
"""De-fusion experiments on the full flagship step: does breaking two of
XLA's mixed matmul+elementwise fusions raise MXU utilization?

The round-2 per-op audit (docs/PERF.md) attributes the step's two biggest
sub-peak groups to fusions that mix a big matmul with elementwise work:

  * the per-parameter AdamW updates are FUSED with their weight-gradient
    matmuls (52-65% of MXU bound);
  * the FFN lin1 matmul carries the GELU epilogue (~51%).

`jax.lax.optimization_barrier` forces materialization between the two
halves, letting the matmuls compile as pure MXU kernels at the price of one
HBM round-trip of the interface values (grads: 177 MB fp32 ~ 0.43 ms;
h: [14544, 3072] fp32 per layer ~ 0.22 ms x 6). If the fusions are what
caps utilization, the barrier variants come out ahead.

Variants ride env toggles read at import (train._OPT_BARRIER,
ffn_block._GELU_BARRIER), so each runs in a fresh child process. XLA-only
changes (no fresh Mosaic program) — children can't hang, but keep the
timeout for safety.

Run:  python bench/fusion_barrier_sweep.py      (real TPU)
"""

import argparse
import json
import os
import subprocess
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

VARIANTS = {
    "baseline": {},
    "opt_barrier": {"DIC_OPT_BARRIER": "1"},
    "gelu_barrier": {"DIC_GELU_BARRIER": "1"},
    "both": {"DIC_OPT_BARRIER": "1", "DIC_GELU_BARRIER": "1"},
}


def child(name: str, iters: int) -> None:
    os.environ.update(VARIANTS[name])

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    from bench import synthetic_batch
    from diffusion_image_captioning_tpu import train as tr_mod
    from diffusion_image_captioning_tpu.config import Config
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser

    cfg = Config(epoch_num=15, rounding_weight=0.3, compute_dtype="bfloat16")
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
                "error": f"TIMEOUT {args.timeout}s",
            }), flush=True)


if __name__ == "__main__":
    main()
