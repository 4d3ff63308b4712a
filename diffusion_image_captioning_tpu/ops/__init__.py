"""Hand-optimized TPU ops (Pallas kernels + memory-bounded XLA fallbacks)."""

from diffusion_image_captioning_tpu.ops.rounding import fused_logprob  # noqa: F401
