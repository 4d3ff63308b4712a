#!/usr/bin/env python
"""Sweep XLA *compiler options* on the full flagship train step (real TPU).

The per-op audit (docs/PERF.md) showed the FFN matmul fusions running at
~50-72% MXU with small 48-73-row output windows — an emitter/scheduling
artifact, not a math one. XLA's TPU emitter sizes those windows against
the scoped-VMEM budget, which in this image cannot be changed via
XLA_FLAGS (a startup hook scrubs the env var before jax snapshots it) but
CAN be set per-executable via `lowered.compile(compiler_options=...)` —
the same mechanism the attention kernel sweep used at the Mosaic level
(bench/attn_tile_sweep.py).

Sweeps:
  * xla_tpu_scoped_vmem_limit_kib: 16 MB default vs 24/32/48/64 MB —
    larger budgets let fusions pick bigger output windows (better MXU
    occupancy) at the cost of double-buffering headroom;
  * the latency-hiding scheduler off (baseline sanity: it should be a
    regression if the default is doing its job).

Method matches bench.py: donated state, 3 warmup + 20 timed iterations,
block_until_ready on the final metric. Only full-step numbers decide
keep/revert (per-call noise is ~±30%, docs/PERF.md). Run:

    python bench/xla_options_sweep.py
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
    from diffusion_image_captioning_tpu import train as tr
    from diffusion_image_captioning_tpu.config import Config
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config

    on_tpu = any(d.platform in ("tpu", "axon") for d in jax.devices())
    cfg = Config(
        epoch_num=15,
        rounding_weight=0.3,
        compute_dtype="bfloat16" if on_tpu else "float32",
    )
    if on_tpu:
        cfg = guard_config(cfg)

    model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
    tx = tr.make_optimizer(cfg)
    step = tr.make_train_step(model, cfg, tx)

    # The timed loops donate the TrainState, which deletes the underlying
    # param buffers — snapshot to host once and rebuild fresh device arrays
    # per option set.
    params_host = jax.tree.map(np.asarray, params)

    def fresh_state():
        return tr.init_train_state(
            cfg, jax.tree.map(jnp.asarray, params_host), tx
        )

    rng = np.random.default_rng(0)
    B = cfg.batch_size
    batch = {
        "input_ids": rng.integers(
            0, cfg.vocab_size, (B, cfg.max_length)
        ).astype(np.int32),
        "attention_mask": np.ones((B, cfg.max_length), np.int32),
        "image_clip": rng.normal(size=(B, cfg.clip_dim)).astype(np.float32),
        "text_clip": rng.normal(size=(B, cfg.clip_dim)).astype(np.float32),
    }
    lam = jnp.asarray(cfg.rounding_weight, jnp.float32)
    key = jax.random.PRNGKey(1)

    configs = [
        ("default", None),
        ("vmem24m", {"xla_tpu_scoped_vmem_limit_kib": "24576"}),
        ("vmem32m", {"xla_tpu_scoped_vmem_limit_kib": "32768"}),
        ("vmem48m", {"xla_tpu_scoped_vmem_limit_kib": "49152"}),
        ("vmem64m", {"xla_tpu_scoped_vmem_limit_kib": "65536"}),
        ("no_lhs", {"xla_latency_hiding_scheduler_rerun": "0",
                    "xla_tpu_enable_latency_hiding_scheduler": "false"}),
    ]

    # One lowering, compiled per option set. The donated TrainState must be
    # re-created per run (each timed loop consumes it).
    lowered = step.lower(fresh_state(), batch, key, lam)

    print(f"platform={'tpu' if on_tpu else 'cpu'}  (full train step, ms)")
    for name, opts in configs:
        try:
            t0 = time.perf_counter()
            compiled = (
                lowered.compile()
                if opts is None
                else lowered.compile(compiler_options=opts)
            )
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001 — keep sweeping
            print(f"{name:10s} compile failed: {type(e).__name__}: {e}")
            continue
        state = fresh_state()
        k = key
        try:
            for _ in range(3):
                k, sk = jax.random.split(k)
                state, metrics = compiled(state, batch, sk, lam)
            jax.block_until_ready(metrics["total"])
            t0 = time.perf_counter()
            n = 20
            for _ in range(n):
                k, sk = jax.random.split(k)
                state, metrics = compiled(state, batch, sk, lam)
            jax.block_until_ready(metrics["total"])
            ms = (time.perf_counter() - t0) / n * 1e3
        except Exception as e:  # noqa: BLE001
            print(f"{name:10s} run failed: {type(e).__name__}: {e}")
            continue
        print(
            f"{name:10s} {ms:7.2f} ms/step  ({1e3 / ms:5.2f} steps/s; "
            f"compile {compile_s:.0f} s)"
        )


if __name__ == "__main__":
    main()
