"""Shared tiny configurations for tests.

One canonical tiny config is reused across test files so jit cache entries
(in-memory and the persistent .jax_cache) are shared — the host has a single
CPU core and every distinct XLA program is expensive to compile.
"""

from diffusion_image_captioning_tpu.config import Config

TINY = Config(
    dim=32,
    n_layers=2,
    n_heads=4,
    hidden_dim=64,
    vocab_size=50,
    max_length=8,
    batch_size=4,
    sample_size=6,
    compute_dtype="float32",
    epoch_num=3,
    step_tot=100,
)
