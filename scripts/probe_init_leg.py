#!/usr/bin/env python
"""A/B the flagship init leg (VERDICT round-4 next #4): eager vs
DIC_JIT_INIT=1 jitted init_denoiser + optimizer/state init, on whatever
backend JAX selects (run on the real TPU for the number that matters —
the eager form dispatches hundreds of initializer ops through the tunnel
and is part of the measured 63.5 s "model init + restore" pipeline leg,
runs_combined_v3/segment_a1.log).

Run each mode in its OWN process (backend + trace caches are
process-global):

    timeout 600 python scripts/probe_init_leg.py          # eager
    DIC_JIT_INIT=1 timeout 600 python scripts/probe_init_leg.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

t0 = time.monotonic()
import jax  # noqa: E402

from diffusion_image_captioning_tpu.config import Config  # noqa: E402
from diffusion_image_captioning_tpu.models.denoiser import init_denoiser  # noqa: E402
from diffusion_image_captioning_tpu import train as tr  # noqa: E402

cfg = Config()
mode = "jit" if os.environ.get("DIC_JIT_INIT") else "eager"
t1 = time.monotonic()
model, params = init_denoiser(cfg, jax.random.PRNGKey(0))
jax.block_until_ready(jax.tree.leaves(params))
t2 = time.monotonic()
tx = tr.make_optimizer(cfg)
state = tr.init_train_state(cfg, params, tx)
jax.block_until_ready(jax.tree.leaves(state.trainable))
jax.block_until_ready(jax.tree.leaves(state.opt_state))
t3 = time.monotonic()
print(
    f"init-leg probe mode={mode} backend={jax.default_backend()} "
    f"import+backend={t1 - t0:.1f}s init_denoiser={t2 - t1:.1f}s "
    f"opt+state={t3 - t2:.1f}s total={t3 - t0:.1f}s"
)
