#!/usr/bin/env python
"""Config-variant robustness sweep: every documented structural variant
compiles and takes one finite full-size train step on the TPU.

Round 1 ran this from /tmp probes (docs/PERF.md "All 14 documented config
variants..."); this is the checked-in version, re-runnable after kernel
changes. Each variant runs in-process sequentially; the Pallas guard
downgrades any kernel whose watchdog probe fails first.

Run:  python bench/variants_sweep.py [--fast]
(--fast: 3 timing iters instead of 10)
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)

VARIANTS = {
    "flagship": {},
    "no_pallas_attn_block": {"use_pallas_attn_block": False},
    "xla_attention": {"use_pallas_attention": False, "use_pallas_attn_block": False},
    "no_fused_rounding": {"use_fused_rounding_loss": False},
    "recompute_rounding": {"rounding_save_z": False},
    "fusion_add": {"clip_adding_method": "add"},
    "fusion_none": {"clip_adding_method": "none"},
    "cfg_w1": {"classifier_free_weight": 1.0},
    "train_embedding": {"train_embedding": True, "freeze_embedding": False},
    "x_t_interval": {"x_0_prediction": False},
    "loss_series_sum": {"loss_func": "series_sum"},
    "loss_mse_series_mean": {"loss_func": "mse_series_mean"},
    "loss_mse_series_sum": {"loss_func": "mse_series_sum"},
    "max_prob_rounding": {"rounding_max_prob": True, "freeze_embedding": False},
    "dynamic_lambda": {"dynamic_rounding_weight": 1.0},
    "fresh_noise": {"shared_qsample_noise": False},
    "pallas_ffn": {"use_pallas_ffn": True},
    "remat": {"remat_denoiser": True},
}


def run_variant(name, overrides, iters):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from diffusion_image_captioning_tpu import train as tr
    from diffusion_image_captioning_tpu.config import Config
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser
    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config

    cfg = guard_config(Config(epoch_num=15, rounding_weight=0.3, **overrides))
    model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
    tx = tr.make_optimizer(cfg)
    state = tr.init_train_state(cfg, params, tx)
    step = tr.make_train_step(model, cfg, tx)
    rng = np.random.default_rng(0)
    B = cfg.batch_size
    batch = {
        "input_ids": rng.integers(0, cfg.vocab_size, (B, cfg.max_length)).astype(
            np.int32
        ),
        "attention_mask": np.ones((B, cfg.max_length), np.int32),
        "image_clip": rng.normal(size=(B, cfg.clip_dim)).astype(np.float32),
        "text_clip": rng.normal(size=(B, cfg.clip_dim)).astype(np.float32),
    }
    lam = jnp.asarray(cfg.rounding_weight, jnp.float32)
    key = jax.random.PRNGKey(1)
    t0 = time.time()
    for _ in range(2):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k, lam)
    jax.block_until_ready(m["total"])
    compile_s = time.time() - t0
    total = float(m["total"])
    assert np.isfinite(total), f"{name}: non-finite loss {total}"
    t0 = time.perf_counter()
    for _ in range(iters):
        key, k = jax.random.split(key)
        state, m = step(state, batch, k, lam)
    jax.block_until_ready(m["total"])
    ms = (time.perf_counter() - t0) / iters * 1e3
    print(
        f"{name:<24} {ms:7.2f} ms/step  loss={total:9.3f}  "
        f"(compile {compile_s:.0f}s)",
        flush=True,
    )


def main() -> None:
    if "--one" in sys.argv:
        # child mode: run exactly one variant in THIS process
        import jax

        jax.config.update(
            "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
        )
        name = sys.argv[sys.argv.index("--one") + 1]
        iters = 3 if "--fast" in sys.argv else 10
        run_variant(name, VARIANTS[name], iters)
        return

    # parent mode: one watchdogged subprocess per variant — variant shapes
    # are fresh Mosaic programs and the remote compiler can HANG, so an
    # in-process sweep could wedge unrecoverably (ops/pallas_guard.py).
    import subprocess

    fast = ["--fast"] if "--fast" in sys.argv else []
    timeout_s = float(os.environ.get("DIC_SWEEP_TIMEOUT", "2400"))
    failures = []
    for name in VARIANTS:
        try:
            proc = subprocess.run(
                [sys.executable, "-u", os.path.abspath(__file__), "--one", name]
                + fast,
                timeout=timeout_s,
                capture_output=True,
                text=True,
            )
            out = proc.stdout.strip()
            if proc.returncode == 0 and out:
                print(out.splitlines()[-1], flush=True)
            else:
                failures.append(name)
                tail = (proc.stderr or "").strip().splitlines()[-2:]
                print(f"{name:<24} FAILED rc={proc.returncode}: {' | '.join(tail)}",
                      flush=True)
        except subprocess.TimeoutExpired:
            failures.append(name)
            print(f"{name:<24} TIMED OUT after {timeout_s:.0f}s", flush=True)
    print(f"\n{len(VARIANTS) - len(failures)}/{len(VARIANTS)} variants ok")
    if failures:
        sys.exit(1)


if __name__ == "__main__":
    main()
