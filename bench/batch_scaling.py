#!/usr/bin/env python
"""Throughput scaling vs batch size — where the single-chip plateau lives.

docs/PERF.md establishes that the reference-exact flagship step (effective
batch 800 = batch_size 8 x sample_size 100) plateaus at ~49-52 ms, i.e.
~55-60% of the ~25-28 ms pure-MXU floor, because its [14544, 768] matmul
shapes leave the XLA emitter with small output windows and the attention
kernel with block-diagonal padding. This probe measures how much of that
gap is the *shape* rather than the framework: the identical train step at
batch_size 8/16/32 (effective batch 800/1600/3200 — the framework's
"throughput mode"; the reference is hard-wired to 800 at
CLIP-DDPM.py:57,74), reporting per-step time, caption rows/s, and modeled
MFU from an explicit matmul FLOP count.

FLOP model (bf16 MXU work only, per optimizer step):
  encoder fwd : M_enc * n_layers * 2*(4*D^2 + 2*D*H)   [qkv+out proj + FFN]
  encoder bwd : 2x fwd (dx + dW passes)
  rounding    : fwd 2*M_r*D*V  + bwd (save-z) 2*M_r*V*D
where M_enc = (S+1)*B*fused_length flat token rows, M_r = (S+1)*B*L.
Attention score/context matmuls (4*L*D per token) are <0.5% and ignored.
v5e-1 bf16 peak: 197 TFLOP/s.

Run: python bench/batch_scaling.py   (real TPU; ~3 fresh step compiles)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

V5E_BF16_TFLOPS = 197.0


def step_matmul_tflops(cfg) -> float:
    rows = (cfg.sample_size + 1) * cfg.batch_size
    m_enc = rows * cfg.fused_length
    m_r = rows * cfg.max_length
    d, h, v = cfg.dim, cfg.hidden_dim, cfg.vocab_size
    enc_fwd = m_enc * cfg.n_layers * 2 * (4 * d * d + 2 * d * h)
    rounding = 2 * (2 * m_r * d * v)  # fwd + save-z bwd (no recompute)
    return (enc_fwd * 3 + rounding) / 1e12


def measure(cfg, n_steps: int = 30) -> float:
    """Median-free steady-state step seconds (same protocol as bench.py)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from diffusion_image_captioning_tpu import train as tr

    model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
    tx = tr.make_optimizer(cfg)
    state = tr.init_train_state(cfg, params, tx)
    step = tr.make_train_step(model, cfg, tx)

    from bench import synthetic_batch

    batch = synthetic_batch(cfg)
    lam = jnp.asarray(cfg.rounding_weight, jnp.float32)
    key = jax.random.PRNGKey(1)
    for _ in range(3):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, lam)
    jax.block_until_ready(metrics["total"])
    t0 = time.perf_counter()
    for _ in range(n_steps):
        key, k = jax.random.split(key)
        state, metrics = step(state, batch, k, lam)
    jax.block_until_ready(metrics["total"])
    return (time.perf_counter() - t0) / n_steps


def main() -> None:
    import dataclasses

    import jax

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    jax.config.update("jax_compilation_cache_dir", os.path.join(repo, ".jax_cache"))

    from diffusion_image_captioning_tpu.config import Config
    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config

    on_tpu = any(d.platform in ("tpu", "axon") for d in jax.devices())
    base = Config(
        epoch_num=15,
        rounding_weight=0.3,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    if on_tpu:
        base = guard_config(base)

    results = []
    for bs in (8, 16, 32):
        cfg = dataclasses.replace(base, batch_size=bs)
        tflops = step_matmul_tflops(cfg)
        try:
            dt = measure(cfg, n_steps=30 if on_tpu else 2)
        except Exception as e:  # noqa: BLE001 — an OOM at a large batch is a finding
            results.append(
                {"batch_size": bs, "error": f"{type(e).__name__}: {e}"[:200]}
            )
            continue
        eff = cfg.sample_size * bs
        r = {
            "batch_size": bs,
            "effective_batch": eff,
            "step_ms": round(dt * 1e3, 2),
            "steps_per_sec": round(1 / dt, 2),
            "caption_rows_per_sec": round(eff / dt),
            "matmul_tflops_per_step": round(tflops, 2),
            "mfu_pct": round(100 * tflops / dt / V5E_BF16_TFLOPS, 1),
        }
        results.append(r)
        print(json.dumps(r), flush=True)

    base_r = results[0]
    if "error" not in base_r:
        for r in results[1:]:
            if "error" in r:
                continue
            r["rows_per_sec_vs_b8"] = round(
                r["caption_rows_per_sec"] / base_r["caption_rows_per_sec"], 2
            )
    print(json.dumps({"batch_scaling": results}))


if __name__ == "__main__":
    main()
