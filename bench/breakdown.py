#!/usr/bin/env python
"""Per-component step-time breakdown on the real TPU (checked-in version of
the round-1 /tmp probes — docs/PERF.md "Methodology").

Times, at flagship shapes (effective batch 800 + 8 x_1 rows, L=18, D=768,
V=30522):

  * the full train step (the only number bench.py reports);
  * denoiser encoder forward and forward+backward;
  * fused rounding loss forward and forward+backward;
  * the attention core per call (fwd / fwd+bwd);
  * the bare optimizer update.

Per-call remote timings carry ~±30% run-to-run noise; only the full-step
number decides keep/revert (docs/PERF.md). Run:  python bench/breakdown.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def timed(fn, *args, iters=20, warmup=3):
    import jax

    out = None
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


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
    from diffusion_image_captioning_tpu.ops.attention_core import attention_core
    from diffusion_image_captioning_tpu.ops.rounding import fused_logprob

    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--attn_block", type=int, default=None,
                   help="override use_pallas_attn_block (0/1)")
    p.add_argument("--skip", default="",
                   help="comma list: encoder,rounding,attention,opt")
    args = p.parse_args()
    skip = set(args.skip.split(","))

    from diffusion_image_captioning_tpu.ops.pallas_guard import guard_config

    # guard_config probes each enabled Pallas kernel in a watchdogged
    # subprocess first — a fresh/changed kernel form can HANG the remote
    # Mosaic compiler, which would wedge this in-process probe otherwise
    cfg = guard_config(Config(epoch_num=15, rounding_weight=0.3))
    if args.attn_block is not None:
        cfg = cfg.replace(use_pallas_attn_block=bool(args.attn_block))
        if args.attn_block:
            cfg = guard_config(cfg)
    model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
    tx = tr.make_optimizer(cfg)
    # the train step DONATES its state: build it from copied leaves so
    # `params` stays alive for the component probes below
    state = tr.init_train_state(cfg, jax.tree.map(jnp.array, params), tx)

    from bench import synthetic_batch

    B, S, L = cfg.batch_size, cfg.sample_size, cfg.max_length
    batch = synthetic_batch(cfg)
    lam = jnp.asarray(0.3, jnp.float32)

    # --- full step ---
    step = tr.make_train_step(model, cfg, tx)
    key = jax.random.PRNGKey(1)

    def run_step(st):
        nonlocal key
        key, k = jax.random.split(key)
        st, m = step(st, batch, k, lam)
        return st, m

    # steady-state without donation hazards: keep threading the state
    st = state
    for _ in range(3):
        st, m = run_step(st)
    jax.block_until_ready(m["total"])
    t0 = time.perf_counter()
    for _ in range(20):
        st, m = run_step(st)
    jax.block_until_ready(m["total"])
    full_ms = (time.perf_counter() - t0) / 20 * 1e3
    print(f"full train step:        {full_ms:7.2f} ms  ({1e3/full_ms:.1f} steps/s)")

    # --- encoder fwd / fwd+bwd (the fused S*B+B forward of the step) ---
    if "encoder" in skip:
        return
    N = S * B + B
    Lf = cfg.fused_length
    x = jax.random.normal(jax.random.PRNGKey(2), (N, L, cfg.in_channel), jnp.float32)
    clip = jnp.tile(
        jnp.asarray(batch["image_clip"])[:, None, :], (S + 1, 1, 1)
    )
    mask = jnp.ones((N, L), jnp.float32)
    cmask = jnp.tile(jnp.asarray([1.0, 0.0], jnp.float32), (N, 1))

    @jax.jit
    def enc_fwd(p, x):
        out = model.apply(
            {"params": p}, x, clip, clip, mask, cmask,
            deterministic=True, return_logits=False,
        )
        return out.hidden

    @jax.jit
    def enc_loss(p, x):
        return enc_fwd(p, x).astype(jnp.float32).sum()

    enc_grad = jax.jit(jax.grad(enc_loss, argnums=1))
    print(f"encoder fwd ({N}x{Lf}): {timed(enc_fwd, params, x):7.2f} ms")
    print(f"encoder fwd+bwd:        {timed(enc_grad, params, x):7.2f} ms")

    # --- rounding loss ---
    if "rounding" in skip:
        return
    M = N * L
    h = jax.random.normal(jax.random.PRNGKey(3), (M, cfg.dim), jnp.float32)
    W = params["lm_head_kernel"]
    idx = jnp.asarray(
        rng.integers(0, cfg.vocab_size, (M,)).astype(np.int32)
    )

    @jax.jit
    def r_fwd(h, W):
        return fused_logprob(h, W, idx, 1024, "auto", cfg.compute_dtype).sum()

    r_grad = jax.jit(jax.grad(r_fwd, argnums=0))       # frozen-W (flagship)
    r_grad_w = jax.jit(jax.grad(r_fwd, argnums=(0, 1)))  # trainable-W variant
    print(f"rounding fwd (M={M}):   {timed(r_fwd, h, W):7.2f} ms")
    print(f"rounding fwd+bwd dh:    {timed(r_grad, h, W):7.2f} ms")
    print(f"rounding fwd+bwd dh,dW: {timed(r_grad_w, h, W):7.2f} ms")

    # --- attention core per call ---
    if "attention" in skip:
        return
    D = cfg.dim
    qkv = jax.random.normal(
        jax.random.PRNGKey(4), (N * Lf, 3 * D), jnp.bfloat16
    )
    amask = jnp.ones((N, Lf), jnp.float32)

    @jax.jit
    def a_fwd(q):
        return attention_core(q, amask, n_heads=cfg.n_heads, seq_len=Lf)

    @jax.jit
    def a_loss(q):
        return a_fwd(q).astype(jnp.float32).sum()

    a_grad = jax.jit(jax.grad(a_loss))
    print(f"attention fwd/call:     {timed(a_fwd, qkv):7.2f} ms")
    print(f"attention fwd+bwd/call: {timed(a_grad, qkv):7.2f} ms")

    # --- bare optimizer (on `st`: the ORIGINAL state was donated away) ---
    grads = jax.tree.map(jnp.ones_like, st.trainable)

    @jax.jit
    def opt(s, g):
        updates, opt_state = tx.update(g, s.opt_state, s.trainable)
        return s.replace(
            trainable=jax.tree.map(lambda a, b: a + b, s.trainable, updates),
            opt_state=opt_state,
        )

    print(f"optimizer update:       {timed(opt, st, grads):7.2f} ms")


if __name__ == "__main__":
    main()
