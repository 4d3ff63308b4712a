"""Model layer (SURVEY.md L2): denoiser transformer, CLIP fusion, CLIP ViT."""

from diffusion_image_captioning_tpu.models.denoiser import (  # noqa: F401
    CLIPDiffusionLM,
    DenoiserOutput,
    init_denoiser,
)
