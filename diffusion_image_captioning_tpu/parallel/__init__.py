"""Parallelism layer (SURVEY.md section 2.14 — new capability, absent in the
reference): device mesh, named shardings, distributed init."""

from diffusion_image_captioning_tpu.parallel.mesh import (  # noqa: F401
    make_mesh,
    batch_sharding,
    param_shardings,
    replicated,
)
