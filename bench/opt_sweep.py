#!/usr/bin/env python
"""Optimizer-update timing at flagship shapes (44.3M trainable params,
84 leaves). The round-2 device trace showed the per-leaf AdamW fusions
costing ~7-8 ms/step (~16% of HBM speed-of-light) — this probe A/Bs:

  * optax.inject_hyperparams(adamw)  (shipped round 1)
  * optax.adamw with a static lr     (is dynamic-lr the problem?)
  * flat-vector AdamW (ops/flat_adamw.py): one fused update over a single
    raveled parameter vector

Each timed WITH donation (state donated like the real step).
Run:  python bench/opt_sweep.py
"""

import os
import sys
import time

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def main() -> None:
    import functools

    import jax
    import jax.numpy as jnp
    import optax

    jax.config.update(
        "jax_compilation_cache_dir", os.path.join(_REPO, ".jax_cache")
    )
    from diffusion_image_captioning_tpu import train as tr
    from diffusion_image_captioning_tpu.config import Config
    from diffusion_image_captioning_tpu.models.denoiser import init_denoiser

    cfg = Config(epoch_num=15, rounding_weight=0.3)
    _, params = init_denoiser(cfg, jax.random.PRNGKey(0))
    trainable, _ = tr.partition_params(params, cfg)
    n = sum(x.size for x in jax.tree.leaves(trainable))
    print(f"trainable: {n/1e6:.1f}M params, {len(jax.tree.leaves(trainable))} leaves")
    grads = jax.tree.map(lambda a: jnp.ones_like(a) * 1e-3, trainable)

    def timed(tx, tag, iters=30):
        opt_state = tx.init(trainable)

        @functools.partial(jax.jit, donate_argnums=(0, 1))
        def step(p, s, g):
            updates, s2 = tx.update(g, s, p)
            return optax.apply_updates(p, updates), s2

        p = jax.tree.map(jnp.array, trainable)
        s = opt_state
        for _ in range(3):
            p, s = step(p, s, grads)
        jax.block_until_ready(p)
        t0 = time.perf_counter()
        for _ in range(iters):
            p, s = step(p, s, grads)
        jax.block_until_ready(p)
        print(f"{tag:<28} {(time.perf_counter()-t0)/iters*1e3:6.2f} ms")

    timed(tr.make_optimizer(cfg), "inject_hyperparams(adamw)")
    timed(
        optax.adamw(1e-4, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01),
        "optax.adamw static lr",
    )

    from diffusion_image_captioning_tpu.ops.flat_adamw import flat_adamw

    timed(
        optax.inject_hyperparams(flat_adamw)(
            learning_rate=1e-4, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01
        ),
        "inject_hyperparams(flat)",
    )
    timed(
        flat_adamw(1e-4, b1=0.9, b2=0.999, eps=1e-8, weight_decay=0.01),
        "flat_adamw static lr",
    )


if __name__ == "__main__":
    main()
