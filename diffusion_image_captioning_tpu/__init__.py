"""TPU-native CLIP-Diffusion-LM framework.

A brand-new JAX/Flax/pjit/Pallas implementation of the capabilities of the
reference project `xu-shitong/diffusion-image-captioning` (a PyTorch research
codebase training a continuous-embedding denoising-diffusion language model for
image captioning, conditioned on CLIP features). Nothing here is a port: the
reference defines the *contract* (configs, math, log formats, metrics); the
implementation is clean-room, TPU-first JAX.

Layer map (mirrors SURVEY.md section 1):
  L0 runtime   -> jax devices / Mesh / memory stats     (parallel/, utils/)
  L1 data      -> data/ (flickr, textonly, coco, synthetic, tokenizers)
  L2 model     -> models/ (denoiser transformer, fusion, clip encoder)
  L3 diffusion -> schedules.py, diffusion.py
  L4 loss      -> losses.py (+ ops/ fused kernels)
  L5 train/eval-> train.py, sample.py, eval.py
  L6 tracking  -> logging_utils.py, checkpoint.py
  L7 entry     -> scripts/ CLIs
"""

__version__ = "0.1.0"

from diffusion_image_captioning_tpu.config import Config, model_name  # noqa: F401
