"""Data layer (SURVEY.md L1): tokenizers, dataset pipelines, batching.

Host-side, numpy-based, fixed-shape — the TPU-idiomatic replacement for the
reference's torch Dataset/DataLoader stack (CLIP-DDPM.py:167-221). All batches
are dense numpy arrays of static shape so every jitted function compiles once.
"""

from diffusion_image_captioning_tpu.data.tokenizers import (  # noqa: F401
    DictTokenizer,
    WordPieceTokenizer,
    build_caption_vocab,
)
from diffusion_image_captioning_tpu.data.batcher import Batcher, split_indices  # noqa: F401
